"""Tests for the bulk-job runner (T6), Excel bridge gating (S3), and
multimodal plumbing (schema, batch shape, metadata pruning)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kaspi_etl_spark import jobs
from kaspi_etl_spark.llm import multimodal
from kaspi_etl_spark.sources import readers


def test_bulk_job_progress_and_results(spark):
    df = spark.createDataFrame(
        [(f"SKU_{i}", i) for i in range(10)], "sku string, v long"
    )
    runner = jobs.BulkJobRunner()
    job = runner.run(df, "sku", lambda chunk: chunk.count(), chunk_size=4)
    assert job.status == "done"
    assert job.total == 10 and job.processed == 10
    assert job.progress == 1.0
    assert sum(job.results) == 10  # 4 + 4 + 2
    assert runner.jobs[job.job_id] is job


def test_bulk_job_never_collects_keys_to_driver(spark, monkeypatch):
    """High-cardinality key column: only the per-bucket counts (one row
    per chunk) may reach the driver — never the key list itself."""
    df = spark.createDataFrame([(f"K{i}",) for i in range(1000)], "sku string")
    seen: list[int] = []
    cls = type(df)  # concrete DataFrame class (base class method is overridden)
    orig = cls.collect

    def spy(self):
        rows = orig(self)
        seen.append(len(rows))
        return rows

    monkeypatch.setattr(cls, "collect", spy)
    runner = jobs.BulkJobRunner()
    job = runner.run(df, "sku", lambda chunk: 0, chunk_size=100)
    assert job.status == "done"
    assert job.total == 1000 and job.processed == 1000
    assert seen and max(seen) <= 10  # bucket counts only (n_chunks rows)


def test_bulk_job_failure_recorded(spark):
    df = spark.createDataFrame([("a", 1)], "sku string, v long")
    runner = jobs.BulkJobRunner()

    def boom(chunk):
        raise ValueError("nope")

    job = runner.run(df, "sku", boom)
    assert job.status == "failed" and "nope" in job.error


def test_write_xlsx_roundtrip(spark, tmp_path):
    """CSV <-> XLSX round-trip (S16 export parity with the reference's
    exceljs route). Skipped where openpyxl is absent — the writer is
    import-gated exactly like the Excel reader bridge."""
    pytest.importorskip("openpyxl")
    import pandas as pd

    from kaspi_etl_spark.ops import export as export_ops

    df = spark.createDataFrame(
        [("M1", "P1", "red/M", "Alpha", 12990, "2025-01-01", False),
         ("M1", "P2", "blue/L", "Out of stock", 0, "", False)],
        "masterProductId string, productId string, label string, name string,"
        " price long, deliveryDate string, isPriceBot boolean",
    )
    xlsx = tmp_path / "export.xlsx"
    export_ops.write_xlsx(df, str(xlsx))
    back = pd.read_excel(xlsx, engine="openpyxl")
    assert len(back) == 2
    assert sorted(back["productId"]) == ["P1", "P2"]
    assert int(back.loc[back["productId"] == "P1", "price"].iloc[0]) == 12990


def test_write_xlsx_gated_without_openpyxl(spark, tmp_path):
    try:
        import openpyxl  # noqa: F401

        pytest.skip("openpyxl present; gating branch not reachable")
    except ImportError:
        pass
    from kaspi_etl_spark.ops import export as export_ops

    df = spark.createDataFrame([("a",)], "x string")
    with pytest.raises(NotImplementedError, match="openpyxl"):
        export_ops.write_xlsx(df, str(tmp_path / "x.xlsx"))


def test_excel_bridge_gated(spark, tmp_path):
    try:
        import openpyxl  # noqa: F401

        has_openpyxl = True
    except ImportError:
        has_openpyxl = False
    if has_openpyxl:
        pytest.skip("openpyxl present; gating branch not reachable")
    fake = tmp_path / "orders.xlsx"
    fake.write_bytes(b"not really xlsx")
    with pytest.raises((NotImplementedError, ValueError, Exception)):
        readers.read_excel_bridge(spark, str(fake))


def test_media_feature_extraction_stub(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    media = multimodal.media_from_documents(docs)
    assert [f.name for f in media.schema.fields] == [
        f.name for f in multimodal.MEDIA_SCHEMA.fields
    ]
    feats = multimodal.extract_features(media, dim=8)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(len(r.feature) == 8 for r in rows)
    # deterministic stub: same input -> same features
    again = {r.media_id: r.feature for r in multimodal.extract_features(media, dim=8).collect()}
    assert all(again[r.media_id] == r.feature for r in rows)


def _make_wav(sampwidth: int, channels: int, samples_per_ch: list[list[int]]) -> bytes:
    """Build a real PCM WAV payload with stdlib wave (the encoder side of
    the decode kernel under test)."""
    import struct
    import wave as wave_mod
    from io import BytesIO

    buf = BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(8000)
        n = len(samples_per_ch[0])
        frames = bytearray()
        for i in range(n):
            for ch in range(channels):
                v = samples_per_ch[ch][i]
                if sampwidth == 2:
                    frames += struct.pack("<h", v)
                else:
                    frames += struct.pack("B", v)
        w.writeframes(bytes(frames))
    return buf.getvalue()


def test_wav_decode_kernel_real_bytes(spark):
    """The audio kernel decodes REAL RIFF/WAVE bytes inside the
    media_features mapInPandas path: DC segments of known amplitude give
    exactly-known per-slice RMS (16384/32768 = 0.5, 8192/32768 = 0.25)."""
    from pyspark.sql import Row

    assert multimodal.WAV_DECODER_AVAILABLE
    # mono 16-bit: first half amplitude 16384, second half 8192
    mono = _make_wav(2, 1, [[16384] * 400 + [8192] * 400])
    # stereo 16-bit: L=16384, R=0 -> mixed mono amplitude 8192
    stereo = _make_wav(2, 2, [[16384] * 800, [0] * 800])
    # not a WAV: must take the byte-histogram stub path, not crash
    text = b"plain text payload, definitely not RIFF"
    rows = [
        Row(media_id=1, kind="audio", mime="audio/wav", content=mono,
            meta=Row(width=0, height=0, duration_ms=100, codec="pcm_s16le")),
        Row(media_id=2, kind="audio", mime="audio/wav", content=stereo,
            meta=Row(width=0, height=0, duration_ms=100, codec="pcm_s16le")),
        Row(media_id=3, kind="image", mime="application/octet-stream",
            content=text,
            meta=Row(width=16, height=16, duration_ms=0, codec="fake")),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r.media_id: r for r in multimodal.extract_features(media, dim=8).collect()}
    assert out[1].feature[:4] == [0.5] * 4 and out[1].feature[4:] == [0.25] * 4
    assert out[2].feature == [0.25] * 8
    assert out[1].n_bytes == len(mono)
    # the non-WAV payload matches the stub kernel exactly (feature is
    # array<float>, so round the float64 expectation through float32)
    import numpy as np

    expected = np.asarray(
        multimodal._fake_decode_features(text, 8), dtype=np.float32
    ).tolist()
    assert out[3].feature == expected


def test_wav_decode_kernel_edge_payloads(spark):
    """8-bit WAVs decode (unsigned, midpoint 128); truncated/corrupt RIFF
    falls back to the stub instead of failing the batch."""
    eight = _make_wav(1, 1, [[192] * 256])  # amplitude 64/128 = 0.5
    assert multimodal._wav_features(eight, dim=4) == [0.5] * 4
    corrupt = b"RIFF\x00\x00\x00\x00WAVEgarbage-not-a-real-chunk"
    assert multimodal._wav_features(corrupt, dim=4) is None
    assert multimodal._decode_features(corrupt, 4) == multimodal._fake_decode_features(corrupt, 4)
    # 24-bit samples are out of kernel scope -> None (fallback), not junk
    wav24 = _make_wav(2, 1, [[0] * 8]).replace(b"\x02\x00\x10\x00", b"\x02\x00\x18\x00")
    assert multimodal._wav_features(wav24, dim=4) in (None, [0.0] * 4)


def test_media_metadata_query_prunes_binary(spark, sf_dir):
    """Metadata-only aggregation must not read the binary content column
    (parquet column pruning) — checked via the scan's ReadSchema."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = multimodal.media_from_documents(docs)
    summary = multimodal.metadata_summary(media)
    plan = summary._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert scan_lines and all("text" not in ln.split("ReadSchema")[-1] for ln in scan_lines)


def test_media_resize_only_images(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    media = multimodal.media_from_documents(docs)
    out = multimodal.resize_images(media, width=32, height=32).collect()
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(out) == n_images
    assert all(r.out_width == 32 and len(r.content) > 0 for r in out)
    # deterministic stub
    again = multimodal.resize_images(media, width=32, height=32).collect()
    assert {r.media_id: bytes(r.content) for r in out} == {
        r.media_id: bytes(r.content) for r in again
    }


def test_media_frame_sampling_expands_rows(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    media = multimodal.media_from_documents(docs)
    frames = multimodal.sample_frames(media, every_ms=5000)
    rows = frames.collect()
    vids = media.filter(F.col("kind") == "video").count()
    assert len(rows) >= vids  # one-to-many expansion
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r.frame_idx)
    for idxs in by_media.values():
        assert sorted(idxs) == list(range(len(idxs)))  # contiguous frame ids


def _make_bmp(width: int, height: int, rows_bgr: list[list[tuple[int, int, int]]]) -> bytes:
    """Build a real uncompressed 24-bit BMP (bottom-up, padded rows) from
    top-down BGR pixel rows — the encoder side of what _parse_bmp reads."""
    import struct

    stride = ((width * 3 + 3) // 4) * 4
    pad = stride - width * 3
    body = bytearray()
    for row in reversed(rows_bgr):  # bottom-up storage
        for b, g, r in row:
            body += bytes((b, g, r))
        body += b"\x00" * pad
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return bytes(header) + bytes(body)


def test_bmp_decode_kernel_real_bytes(spark):
    """The image kernel decodes REAL BMP bytes inside media_features:
    solid-luminance bands give exactly-known per-band means (white
    (255,255,255) -> lum 255 via integer BT.601, black -> 0)."""
    from pyspark.sql import Row

    # 2x4: top two rows white, bottom two rows black
    white, black = (255, 255, 255), (0, 0, 0)
    img = _make_bmp(2, 4, [[white] * 2, [white] * 2, [black] * 2, [black] * 2])
    rows = [
        Row(media_id=1, kind="image", mime="image/bmp", content=img,
            meta=Row(width=2, height=4, duration_ms=0, codec="bmp")),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r.media_id: r for r in multimodal.extract_features(media, dim=4).collect()}
    # integer luminance of white: (29+150+77)=256, so (256*255)>>8 = 255
    assert out[1].feature == [1.0, 1.0, 0.0, 0.0]
    assert out[1].n_bytes == len(img)


def test_bmp_decode_rejects_non_bmp_and_compressed():
    assert multimodal._bmp_features(b"nope", 4) is None
    img = _make_bmp(2, 2, [[(1, 2, 3)] * 2] * 2)
    # flip the compression field (offset 30) to BI_RLE8: must reject
    bad = img[:30] + b"\x01\x00\x00\x00" + img[34:]
    assert multimodal._bmp_features(bad, 4) is None
    # truncated pixel data: must reject, not crash
    assert multimodal._bmp_features(img[:-3], 4) is None


def test_bmp_resize_kernel_roundtrip(spark):
    """resize_images produces a VALID BMP whose pixels are the
    nearest-neighbour sample of the source (checked by re-parsing the
    output with the same parser)."""
    from pyspark.sql import Row

    # 4x2 source: left half red, right half blue (BGR tuples)
    red, blue = (0, 0, 255), (255, 0, 0)
    img = _make_bmp(4, 2, [[red, red, blue, blue]] * 2)
    rows = [
        Row(media_id=7, kind="image", mime="image/bmp", content=img,
            meta=Row(width=4, height=2, duration_ms=0, codec="bmp")),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.resize_images(media, width=2, height=1).collect()
    assert len(out) == 1 and out[0].out_width == 2 and out[0].out_height == 1
    px = multimodal._parse_bmp(bytes(out[0].content))
    assert px is not None and px.shape == (1, 2, 3)
    assert tuple(px[0, 0]) == red and tuple(px[0, 1]) == blue


def test_bmp_resize_top_down_and_fallback():
    import struct

    img = _make_bmp(2, 2, [[(9, 9, 9)] * 2, [(1, 1, 1)] * 2])
    # rewrite height as negative (top-down) with rows reordered: same pixels
    td = img[:18] + struct.pack("<ii", 2, -2) + img[26:54]
    body = bytes((9, 9, 9, 9, 9, 9, 0, 0)) + bytes((1, 1, 1, 1, 1, 1, 0, 0))
    td += body
    px = multimodal._parse_bmp(td)
    assert px is not None and tuple(px[0, 0]) == (9, 9, 9) and tuple(px[1, 0]) == (1, 1, 1)
    # non-BMP payloads fall back to the stub subsample
    stub = multimodal._resize_dispatch(b"not an image", 16, 16, 4, 4)
    assert stub == multimodal._fake_resize(b"not an image", 16, 16, 4, 4)


def _solid_bmp(b: int, g: int, r: int) -> bytes:
    return _make_bmp(2, 2, [[(b, g, r)] * 2] * 2)


def test_bmp_video_split_and_sampling():
    frames_px = [(10 * i, 20 * i, 30 * i) for i in range(5)]
    video = b"".join(_solid_bmp(*px) for px in frames_px)
    parts = multimodal.split_bmp_video(video)
    assert parts is not None and len(parts) == 5
    # 10s clip sampled every 2.5s -> 4 samples mapping onto frames 0..3
    sampled = multimodal._bmp_video_frames(video, 10000, 2500)
    assert [(i, ms) for i, ms, _ in sampled] == [
        (0, 0),
        (1, 2500),
        (2, 5000),
        (3, 7500),
    ]
    for k, (_, _, frame) in enumerate(sampled):
        px = multimodal._parse_bmp(frame)
        assert tuple(int(v) for v in px[0, 0]) == frames_px[k]
    # invalid containers fall through to the stub path
    assert multimodal.split_bmp_video(b"not a video") is None
    assert multimodal.split_bmp_video(video + b"trailing-garbage") is None


def test_video_kernel_samples_real_frames_in_spark(spark):
    """sample_frames decodes REAL concatenated-BMP video payloads inside
    the mapInPandas path: each emitted frame is itself a valid BMP that
    the image kernel can decode downstream."""
    video = b"".join(_solid_bmp(40 * i, 0, 0) for i in range(4))
    media = spark.createDataFrame(
        [(1, "video", "video/x-bmp-seq", bytearray(video), (2, 2, 8000, "bmpseq"))],
        schema=multimodal.MEDIA_SCHEMA,
    )
    rows = multimodal.sample_frames(media, every_ms=2000).collect()
    assert [r.frame_idx for r in rows] == [0, 1, 2, 3]
    for k, r in enumerate(rows):
        px = multimodal._parse_bmp(bytes(r.frame))
        assert int(px[0, 0][0]) == 40 * k  # blue channel identifies frame


def test_encode_bmp_parse_roundtrip():
    import numpy as np

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    back = multimodal._parse_bmp(multimodal.encode_bmp(px))
    assert (back == px).all()


# --- PNG kernel (stdlib zlib + numpy; VERDICT r5 advisory #3) ---------------


def _filtered_png(px_rgb, filters):
    """Hand-build a PNG whose scanlines use the GIVEN filter types, by
    applying each filter's forward transform — exercises the decoder's
    unfilter paths independently of what encode_png happens to emit."""
    import struct
    import zlib

    import numpy as np

    h, w, ch = px_rgb.shape
    assert len(filters) == h
    raw = bytearray()
    rec = px_rgb.reshape(h, w * ch).astype(np.int32)
    for y, f in enumerate(filters):
        row = rec[y]
        prev = rec[y - 1] if y > 0 else np.zeros(w * ch, dtype=np.int32)
        filt = np.zeros(w * ch, dtype=np.int32)
        for x in range(w * ch):
            a = row[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[x] = (row[x] - pred) & 0xFF
        raw += bytes([f]) + bytes(filt.astype(np.uint8).tobytes())

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    color = {1: 0, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    )


def test_png_parse_all_filter_types():
    """All five PNG scanline filters reverse correctly (the decoder's
    core): a 5-row image with one row per filter type round-trips."""
    import numpy as np

    rng = np.random.default_rng(7)
    px_rgb = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    png = _filtered_png(px_rgb, filters=[0, 1, 2, 3, 4])
    got = multimodal._parse_png(png)  # BGR top-down
    assert got is not None
    assert np.array_equal(got, px_rgb[:, :, ::-1])


def test_png_encode_parse_roundtrip():
    import numpy as np

    rng = np.random.default_rng(11)
    px_bgr = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    again = multimodal._parse_png(multimodal.encode_png(px_bgr))
    assert np.array_equal(again, px_bgr)


def test_png_gray_and_rgba_and_rejects():
    import numpy as np

    # grayscale replicates into all three channels
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4, 1)
    png = _filtered_png(gray, filters=[0, 1, 2])
    got = multimodal._parse_png(png)
    assert got.shape == (3, 4, 3)
    assert np.array_equal(got[:, :, 0], gray[:, :, 0])
    assert np.array_equal(got[:, :, 1], gray[:, :, 0])
    # RGBA drops alpha
    rgba = np.zeros((2, 2, 4), dtype=np.uint8)
    rgba[..., 0] = 10  # R
    rgba[..., 2] = 30  # B
    rgba[..., 3] = 200  # alpha
    got = multimodal._parse_png(_filtered_png(rgba, filters=[0, 4]))
    assert got.shape == (2, 2, 3)
    assert tuple(got[0, 0]) == (30, 0, 10)  # BGR
    # rejects: not a PNG, truncated IDAT, 16-bit depth
    assert multimodal._parse_png(b"BM not a png") is None
    good = multimodal.encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    assert multimodal._parse_png(good[:40]) is None
    import struct

    bad_depth = bytearray(good)
    # IHDR data starts at offset 16; depth byte is at 16+8
    bad_depth[24] = 16
    assert multimodal._parse_png(bytes(bad_depth)) is None


def test_png_decode_kernel_in_spark_pipeline(spark):
    """media_features decodes real PNG bytes through the same
    mapInPandas path as WAV/BMP: solid bands give exactly-known means,
    and resize_images emits a VALID PNG (format-preserving)."""
    import numpy as np
    from pyspark.sql import Row

    px = np.zeros((4, 2, 3), dtype=np.uint8)
    px[:2] = 255  # top half white, bottom half black
    png = multimodal.encode_png(px)
    rows = [
        Row(media_id=42, kind="image", mime="image/png", content=png,
            meta=Row(width=2, height=4, duration_ms=0, codec="png")),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r.media_id: r for r in multimodal.extract_features(media, dim=4).collect()}
    assert out[42].feature == [1.0, 1.0, 0.0, 0.0]

    resized = multimodal.resize_images(media, width=1, height=2).collect()
    assert len(resized) == 1
    back = multimodal._parse_png(bytes(resized[0].content))
    assert back is not None and back.shape == (2, 1, 3)
    assert tuple(back[0, 0]) == (255, 255, 255)
    assert tuple(back[1, 0]) == (0, 0, 0)
