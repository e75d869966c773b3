from fsharp_dataframe_spark.streaming.ops import (  # noqa: F401
    read_stream_parquet,
    run_to_memory,
    stream_corpus_stats,
    stream_decontaminate,
    stream_exact_dedup,
    stream_repetition_filter,
    stream_fill_forward,
    stream_latest_by,
    stream_resample_equiv,
    stream_sample_time,
    stream_session_windows,
    stream_text_quality,
)
