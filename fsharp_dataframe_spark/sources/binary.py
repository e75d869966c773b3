"""binaryFile source — raw media/blob ingest for the multimodal tier.

Spark's built-in ``binaryFile`` format reads whole files as rows of
(path, modificationTime, length, content) with NO decoding on the
scan; ``read_media`` maps that onto the engine's media schema
(functions/multimodal.MEDIA_SCHEMA shape) so the output plugs straight
into ``extract_features`` / ``frame_sample_plan``.

Scale notes:
- One file = one row = one task unit; Spark packs small files into
  partitions up to ``spark.sql.files.maxPartitionBytes``.  Payload
  bytes dominate partition size, so size that conf DOWN (e.g. 32 MB)
  for media directories — the same guidance as multimodal.py's module
  docstring — or large batches of 100 KB images produce multi-GB Arrow
  batches in the featurize step.
- ``binaryFile`` refuses writes by design (it is read-only); persisted
  media tables should be written as parquet with the payload as a
  binary column (sources/parquet.save_parquet), which this module's
  schema makes a one-liner.
- ``pathGlobFilter`` prunes AT LISTING TIME (no bytes read for
  non-matching files) — always pass it when a directory mixes
  modalities.

No reference analog (the reference is CSV-only, src/FrameUtils.fs) —
parity-plus, like JSONL/ORC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# extension → mime, the listing-time modality map (decode-free: the
# payload is opaque until a featurizer touches it)
_EXT_MIME = {
    "png": "image/png", "jpg": "image/jpeg", "jpeg": "image/jpeg",
    "gif": "image/gif", "bmp": "image/bmp", "webp": "image/webp",
    "wav": "audio/wav", "mp3": "audio/mpeg", "flac": "audio/flac",
    "ogg": "audio/ogg", "mp4": "video/mp4", "mkv": "video/x-matroska",
    "webm": "video/webm", "avi": "video/x-msvideo",
}


def read_binary_files(spark: SparkSession, path: str,
                      glob: str | None = None) -> DataFrame:
    """Raw binaryFile scan: (path, modificationTime, length, content)."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)


def read_media(spark: SparkSession, path: str,
               glob: str | None = None) -> DataFrame:
    """Media-shaped ingest: (media_id, payload, meta, source_path).

    media_id is xxhash64 of the file path — deterministic across
    re-listings and stable when new files are added (a row_number
    would renumber the whole corpus on every append).  meta.mime is
    mapped from the file extension; width/height/n_frames/duration
    stay NULL until a decode pass fills them (decoding belongs in the
    featurize step, not the scan).
    """
    raw = read_binary_files(spark, path, glob)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    mime = F.create_map(*[
        F.lit(x) for kv in _EXT_MIME.items() for x in kv
    ])[ext]
    return raw.select(
        F.xxhash64(F.col("path")).alias("media_id"),
        F.col("content").alias("payload"),
        F.struct(
            mime.alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit(None).cast("double").alias("duration_s"),
        ).alias("meta"),
        F.col("path").alias("source_path"),
    )
