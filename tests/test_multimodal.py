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
    # fake patterned payloads are not decodable images: in EVERY
    # environment (PIL or stdlib-PNG tier) they degrade to the byte
    # fallback with decode_ok=False — no executor exception
    media = make_fake_media(spark, n=4)
    out = extract_features(media, real_decode=True).collect()
    assert all(r["decode_ok"] is False for r in out)
    out = extract_features(media, real_decode="auto").collect()
    assert len(out) == 4


def test_extract_features_decodes_real_png(spark):
    # genuine PNG bytes from the stdlib encoder run the real-decode
    # happy path in every environment (PIL tier when pillow is
    # installed, stdlib tier otherwise) — no skip either way
    from fsharp_dataframe_spark.functions.png import encode_png

    payload = encode_png(bytes([200] * 64), 8, 8, channels=1)
    df = spark.createDataFrame(
        [(0, payload, None)],
        "media_id long, payload binary, meta struct<mime:string>")
    r = extract_features(df, real_decode=True).collect()[0]
    assert r["decode_ok"] is True
    assert all(abs(x - 200.0) < 1e-3 for x in r["feat"])


def test_png_codec_roundtrip_and_filters():
    import random
    import struct
    import zlib

    from fsharp_dataframe_spark.functions.png import (
        PNG_MAGIC, decode_gray, decode_png, encode_png,
    )

    rng = random.Random(7)
    for channels in (1, 2, 3, 4):
        px = bytes(rng.randrange(256) for _ in range(6 * 5 * channels))
        data = encode_png(px, 6, 5, channels)
        assert data.startswith(PNG_MAGIC)
        w, h, c, out = decode_png(data)
        assert (w, h, c) == (6, 5, channels)
        assert out == px
    # all five scanline filters must unfilter correctly: hand-build a
    # PNG whose rows use filters 0..4 over known grayscale pixels
    width, height = 4, 5
    rows = [bytes(rng.randrange(256) for _ in range(width))
            for _ in range(height)]

    def filt(ftype, row, prev):
        out = bytearray([ftype])
        for i, x in enumerate(row):
            left = row[i - 1] if i else 0
            up = prev[i]
            ul = prev[i - 1] if i else 0
            if ftype == 0:
                out.append(x)
            elif ftype == 1:
                out.append((x - left) & 0xFF)
            elif ftype == 2:
                out.append((x - up) & 0xFF)
            elif ftype == 3:
                out.append((x - ((left + up) >> 1)) & 0xFF)
            else:  # paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                out.append((x - pred) & 0xFF)
        return bytes(out)

    raw = b""
    prev = bytes(width)
    for ftype, row in zip([0, 1, 2, 3, 4], rows):
        raw += filt(ftype, row, prev)
        prev = row

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    png = (PNG_MAGIC
           + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    w, h, lum = decode_gray(png)
    assert (w, h) == (width, height)
    assert bytes(lum) == b"".join(rows)
    # luminance for RGB follows the 601-2 integer formula
    rgb = encode_png(bytes([100, 150, 200] * 4), 2, 2, channels=3)
    _, _, lum = decode_gray(rgb)
    assert lum == [(100 * 299 + 150 * 587 + 200 * 114) // 1000] * 4


@pytest.mark.skipif(not _has_pil(), reason="pillow not installed")
def test_png_codec_agrees_with_pil():
    # when PIL is present, both decode tiers must read the same pixels
    import io
    import random

    import numpy as np
    from PIL import Image

    from fsharp_dataframe_spark.functions.png import decode_png, encode_png

    rng = random.Random(9)
    px = bytes(rng.randrange(256) for _ in range(16 * 8 * 3))
    data = encode_png(px, 16, 8, channels=3)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    _, _, _, ours = decode_png(data)
    assert pil.tobytes() == ours


def test_resize_media_real_png_payload(spark):
    # a genuine PNG payload takes the REAL resize tier (stdlib nearest
    # neighbor or PIL) — meta updated, payload is a decodable PNG of
    # the target size with the nearest-neighbor pixel mapping
    from fsharp_dataframe_spark.functions.multimodal import resize_media
    from fsharp_dataframe_spark.functions.png import decode_png, encode_png

    src_px = bytes((x * 16 + y) % 256 for y in range(8) for x in range(8))
    payload = encode_png(src_px, 8, 8, channels=1)
    df = spark.createDataFrame(
        [(0, payload, {"mime": "image/png", "width": 8, "height": 8,
                       "n_frames": 1, "duration_s": None})],
        "media_id long, payload binary, "
        "meta struct<mime:string,width:int,height:int,n_frames:int,duration_s:double>")
    r = resize_media(df, 4, 4, real_decode=True).collect()[0]
    assert r["meta"]["width"] == 4 and r["meta"]["height"] == 4
    w, h, c, px = decode_png(bytes(r["payload"]))
    assert (w, h) == (4, 4)
    if not _has_pil():  # stdlib tier: exact nearest-neighbor mapping
        assert c == 1
        expect = bytes(src_px[(ty * 8 // 4) * 8 + (tx * 8 // 4)]
                       for ty in range(4) for tx in range(4))
        assert px == expect


def test_frame_sample_decode_tiers(spark):
    """decode=True is real for FSV1 containers (r11: routes through
    video_frame_hashes), degrades per row for non-FSV1 payloads, and
    stays a clearly-marked DecoderUnavailable stub when no payload
    column exists to decode (inter-coded formats need ffmpeg/pyav)."""
    media = make_fake_media(spark, n=4)
    with pytest.raises(DecoderUnavailable):
        frame_sample_plan(media.drop("payload"), decode=True)
    # patterned-byte payloads are not FSV1: per-row degradation
    got = frame_sample_plan(media, decode=True).collect()
    assert len(got) == 4
    assert all(r["dhash"] is None and not r["decode_ok"] for r in got)
    # FSV1 containers really decode — identical to video_frame_hashes
    from fsharp_dataframe_spark.functions.multimodal import (
        make_fake_video_media, video_frame_hashes,
    )

    vids = make_fake_video_media(spark, 6)
    via_plan = {(r["media_id"], r["frame_idx"]): r["dhash"]
                for r in frame_sample_plan(vids, every_n=2,
                                           decode=True).collect()}
    direct = {(r["media_id"], r["frame_idx"]): r["dhash"]
              for r in video_frame_hashes(vids, every_n=2).collect()}
    assert via_plan == direct and via_plan


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


def test_band_means_tiny_images_never_nan(spark):
    import math

    from fsharp_dataframe_spark.functions.multimodal import _band_means
    import numpy as np

    # fewer rows than bands: array_split would mean() empty slices to
    # NaN with decode_ok=True — features must stay finite
    arr = np.array([[10.0, 20.0], [30.0, 40.0]], dtype=np.float32)
    feats = _band_means(arr, 8)
    assert len(feats) == 8 and all(math.isfinite(f) for f in feats)
    assert feats[0] == 15.0 and feats[-1] == 35.0
    assert _band_means(np.zeros((0, 2), dtype=np.float32), 8) is None


def test_decode_png_rejects_bombs_and_forged_headers(spark):
    import struct
    import zlib

    import pytest

    from fsharp_dataframe_spark.functions.png import PNG_MAGIC, decode_png

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    # forged IHDR declaring a 1-gigapixel image must be rejected
    # BEFORE any allocation
    ihdr = struct.pack(">IIBBBBB", 40_000, 40_000, 8, 0, 0, 0, 0)
    bomb = (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 1000))
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="too large"):
        decode_png(bomb)

    # over-long compressed stream vs declared size: length mismatch,
    # not a giant allocation
    ihdr2 = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    over = (PNG_MAGIC + chunk(b"IHDR", ihdr2)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 1_000_000))
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="mismatch"):
        decode_png(over)


def test_decode_png_cpu_cap_default_and_override():
    """The pixel cap guards CPU, not just memory (the Average/Paeth
    unfilter is a per-byte interpreted loop): the default is 4 MP and
    configurable per call — a trusted caller can raise it, and the
    raise happens BEFORE any allocation either way."""
    import struct
    import zlib

    import pytest

    from fsharp_dataframe_spark.functions.png import (
        _MAX_PIXELS, PNG_MAGIC, decode_png, encode_png,
    )

    assert _MAX_PIXELS == 4_000_000

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    # 5 MP grayscale: over the default cap, under an explicit 8 MP one
    ihdr = struct.pack(">IIBBBBB", 2500, 2000, 8, 0, 0, 0, 0)
    big = (PNG_MAGIC + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(
               b"".join(b"\x00" * 2501 for _ in range(2000))))
           + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="too large"):
        decode_png(big)
    w, h, c, px = decode_png(big, max_pixels=8_000_000)
    assert (w, h, c) == (2500, 2000, 1) and len(px) == 5_000_000

    # vectorized Sub/Up on a multi-channel image round-trips through
    # an encoder that uses those filters (hand-filtered stream)
    import random
    rng = random.Random(11)
    wdt, hgt, ch = 64, 48, 4
    pix = bytes(rng.randrange(256) for _ in range(wdt * hgt * ch))
    stride = wdt * ch
    raw, prev = b"", bytes(stride)
    for y in range(hgt):
        row = pix[y * stride:(y + 1) * stride]
        if y % 2:
            raw += b"\x02" + bytes((row[i] - prev[i]) & 0xFF
                                   for i in range(stride))
        else:
            raw += b"\x01" + bytes(
                (row[i] - (row[i - ch] if i >= ch else 0)) & 0xFF
                for i in range(stride))
        prev = row
    png = (PNG_MAGIC
           + chunk(b"IHDR", struct.pack(">IIBBBBB", wdt, hgt, 8, 6, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    assert decode_png(png)[3] == pix


def test_corpus_scale_png_fixture_decodes_and_batches(spark):
    """r6 VERDICT ask #8: the real-decode tier exercised at corpus row
    counts (thousands of REAL stdlib-encoded PNGs, generated on the
    executors), with (a) every payload decoding through the real tier,
    (b) the closed-form band means replayed exactly, and (c) an Arrow
    batch-size assertion — the batches reaching the featurize UDF obey
    spark.sql.execution.arrow.maxRecordsPerBatch, so executor memory
    per batch is bounded regardless of corpus size."""
    from fsharp_dataframe_spark.functions.multimodal import (
        extract_features, make_fake_png_media,
    )

    n = 3000
    media = make_fake_png_media(spark, n=n)
    feats = extract_features(media, real_decode=True)
    agg = feats.agg(
        F.count("*").alias("rows"),
        F.sum(F.when(F.col("decode_ok"), 1).otherwise(0)).alias("ok"),
        F.sum(F.when(
            F.abs(F.element_at("feat", 1).cast("double")
                  - ((F.col("media_id") % 256)
                     + (F.col("media_id") + 1) % 256
                     + (F.col("media_id") + 2) % 256
                     + (F.col("media_id") + 3) % 256) / 4.0) < 1e-6, 1)
            .otherwise(0)).alias("feat_exact")).first()
    assert agg["rows"] == agg["ok"] == agg["feat_exact"] == n

    # Arrow batch-size assertion: cap maxRecordsPerBatch and observe
    # the actual batch lengths the UDF receives
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
    try:
        one_part = make_fake_png_media(spark, n=n).coalesce(1)

        def probe(batches):
            import pandas as pd

            for pdf in batches:
                yield pd.DataFrame({"batch_len": [len(pdf)]})

        lens = [r["batch_len"] for r in
                one_part.mapInPandas(probe, "batch_len long").collect()]
        assert sum(lens) == n
        assert max(lens) <= 512          # the cap binds
        assert len(lens) >= n // 512     # and actually splits the data
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
