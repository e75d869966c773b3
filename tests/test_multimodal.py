"""Multimodal column plumbing: batch schema, determinism, PIL gating
(functions/multimodal.py)."""

import pytest
from pyspark.sql import functions as F

from fsharp_dataframe_spark.functions.multimodal import (
    DecoderUnavailable, extract_features, frame_sample_plan, make_fake_media,
)


def _has_pil():
    try:
        import PIL  # noqa: F401
        return True
    except ImportError:
        return False


def test_extract_features_schema_and_determinism(spark):
    media = make_fake_media(spark, n=16)
    out = extract_features(media, feat_dim=8)
    assert [f.name for f in out.schema.fields] == ["media_id", "feat", "decode_ok"]
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 16
    for r in rows.values():
        assert len(r["feat"]) == 8
        assert r["decode_ok"] is True
    # deterministic across runs
    rows2 = {r["media_id"]: r["feat"] for r in extract_features(media, feat_dim=8).collect()}
    assert all(rows2[i] == rows[i]["feat"] for i in rows)


def test_extract_features_real_decode_gating(spark):
    media = make_fake_media(spark, n=4)
    if _has_pil():
        # fake payloads are not decodable images: fallback + decode_ok=False
        out = extract_features(media, real_decode=True).collect()
        assert all(r["decode_ok"] is False for r in out)
    else:
        with pytest.raises(DecoderUnavailable):
            extract_features(media, real_decode=True)
    # auto never raises, regardless of environment
    out = extract_features(media, real_decode="auto").collect()
    assert len(out) == 4


@pytest.mark.skipif(not _has_pil(), reason="pillow not installed")
def test_extract_features_decodes_real_png(spark):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (8, 8), color=200).save(buf, format="PNG")
    df = spark.createDataFrame(
        [(0, buf.getvalue(), None)],
        "media_id long, payload binary, meta struct<mime:string>")
    r = extract_features(df, real_decode=True).collect()[0]
    assert r["decode_ok"] is True
    assert all(abs(x - 200.0) < 1e-3 for x in r["feat"])


def test_frame_sample_plan_fanout(spark):
    media = make_fake_media(spark, n=10)
    out = frame_sample_plan(media, every_n=1)
    # every media row fans out to >= 1 sampled frame
    counts = out.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    assert len(counts) == 10
    assert all(r["n"] >= 1 for r in counts)


def test_read_media_binary_source(spark, tmp_path):
    from fsharp_dataframe_spark.functions.multimodal import extract_features
    from fsharp_dataframe_spark.sources.binary import read_media

    d = tmp_path / "media"
    d.mkdir()
    (d / "a.png").write_bytes(bytes(range(64)))
    (d / "b.wav").write_bytes(bytes(range(128)))
    (d / "notes.txt").write_text("not media")

    out = read_media(spark, str(d), glob="*.{png,wav}")
    rows = {r["source_path"].rsplit("/", 1)[-1]: r for r in out.collect()}
    assert set(rows) == {"a.png", "b.wav"}
    assert rows["a.png"]["meta"]["mime"] == "image/png"
    assert rows["b.wav"]["meta"]["mime"] == "audio/wav"
    assert bytes(rows["a.png"]["payload"]) == bytes(range(64))
    # ids deterministic across re-listings
    again = {r["source_path"]: r["media_id"] for r in
             read_media(spark, str(d), glob="*.{png,wav}").collect()}
    assert all(again[r["source_path"]] == r["media_id"] for r in rows.values())
    # plugs into the featurize pipeline unchanged
    feats = extract_features(out).collect()
    assert len(feats) == 2 and all(len(r["feat"]) == 8 for r in feats)


def test_resize_media_fake_path_deterministic(spark):
    from fsharp_dataframe_spark.functions.multimodal import (
        make_fake_media, resize_media,
    )

    media = make_fake_media(spark, n=12)
    out = resize_media(media, 4, 4).collect()
    by_id = {r["media_id"]: r for r in out}
    src = {r["media_id"]: r for r in media.collect()}
    assert set(by_id) == set(src)
    for mid, r in by_id.items():
        mime = src[mid]["meta"]["mime"]
        if mime.startswith("image/"):
            # stride-resampled to exactly 16 bytes, meta updated
            p = src[mid]["payload"]
            step = len(p) / 16
            assert r["payload"] == bytes(p[int(j * step)] for j in range(16))
            assert r["meta"]["width"] == 4 and r["meta"]["height"] == 4
        else:
            # non-images pass through untouched
            assert r["payload"] == src[mid]["payload"]
            assert r["meta"] == src[mid]["meta"]
