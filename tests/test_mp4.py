"""MP4 (ISO BMFF) container kernel (kaspi_etl_spark/llm/mp4.py) —
self-contained: write_mp4 builds valid MJPEG-in-MP4 fixtures, parse_mp4
reads back metadata + the full sample index, and the Spark-side
sample_frames path extracts frames that the JPEG codec pixel-decodes.

Reference anchor: round-5 review "codec'd media (mp4) still stubbed" —
the container and Motion-JPEG are now real; H.264 pixel decode is the
one remaining genuine stub (needs libavcodec).
"""

from __future__ import annotations

import numpy as np
import pytest

from kaspi_etl_spark.llm import multimodal as mm
from kaspi_etl_spark.llm.jpeg import encode_jpeg, parse_jpeg
from kaspi_etl_spark.llm.mp4 import extract_sample, parse_mp4, write_mp4


def _mjpeg_video(n: int = 6, w: int = 32, h: int = 24, fps: int = 5):
    """(mp4_bytes, [frame_px]) — each frame's top-left pixel encodes its
    index in the blue channel so sampled frames are identifiable."""
    frames_px, frames = [], []
    for i in range(n):
        px = np.zeros((h, w, 3), np.uint8)
        px[:, :, 0] = (i * 40) % 256  # solid blue level = frame id
        frames_px.append(px)
        frames.append(encode_jpeg(px, quality=95))
    return write_mp4(frames, fps=fps, codec=b"jpeg", width=w, height=h), frames_px


def test_metadata_and_sample_index_round_trip():
    mp4, _ = _mjpeg_video(n=7, fps=5)
    info = parse_mp4(mp4)
    assert info is not None
    assert info["duration_ms"] == 7 * 200
    (track,) = info["tracks"]
    assert track["handler"] == "vide"
    assert track["codec"] == "jpeg"
    assert (track["width"], track["height"]) == (32, 24)
    assert track["n_samples"] == 7
    # the index gives exact per-sample timing and ranged-read extents
    assert [s[0] for s in track["samples"]] == [i * 200 for i in range(7)]
    for s in track["samples"]:
        payload = extract_sample(mp4, s)
        assert payload is not None and parse_jpeg(payload) is not None


def test_extracted_samples_pixel_decode():
    mp4, frames_px = _mjpeg_video(n=5)
    track = parse_mp4(mp4)["tracks"][0]
    for i, s in enumerate(track["samples"]):
        px = parse_jpeg(extract_sample(mp4, s))
        assert abs(int(px[0, 0, 0]) - int(frames_px[i][0, 0, 0])) <= 2


def test_garbage_and_fragmented_rejected():
    for payload in (b"", b"\x00" * 64, b"hello" * 100, bytes(range(256)) * 4):
        assert parse_mp4(payload) is None
    mp4, _ = _mjpeg_video(n=2)
    assert parse_mp4(mp4[:40]) is None  # truncated before moov
    # a moof box marks a fragmented file: index lives in trun, rejected
    import struct

    moof = struct.pack(">I", 8) + b"moof"
    assert parse_mp4(mp4 + moof) is None


def test_frames_dispatch_uses_container_timing():
    """_mp4_video_frames samples by the container's stts timing: frame
    on screen at t = largest sample time <= t."""
    mp4, frames_px = _mjpeg_video(n=6, fps=5)  # 200ms/frame, 1200ms total
    out = mm._mp4_video_frames(mp4, every_ms=400)
    assert out is not None
    assert [(idx, ms) for idx, ms, _ in out] == [(0, 0), (1, 400), (2, 800)]
    # t=400 shows sample 2 (time 400), t=800 shows sample 4 (time 800)
    for (_, ms, frame), want in zip(out, [0, 2, 4]):
        px = parse_jpeg(frame)
        assert abs(int(px[0, 0, 0]) - int(frames_px[want][0, 0, 0])) <= 2


def test_sample_frames_spark_e2e(spark):
    """sample_frames extracts REAL MP4 samples inside mapInPandas, and
    the emitted frames feed the JPEG image kernel downstream — the full
    video -> frames -> features pipeline with zero external codecs."""
    mp4, _ = _mjpeg_video(n=6, fps=5)
    media = spark.createDataFrame(
        [(1, "video", "video/mp4", bytearray(mp4), (32, 24, 1200, "mjpeg"))],
        schema=mm.MEDIA_SCHEMA,
    )
    rows = mm.sample_frames(media, every_ms=400).collect()
    assert [r.frame_idx for r in rows] == [0, 1, 2]
    feature_df = mm.extract_features(
        spark.createDataFrame(
            [
                (int(r.frame_idx), "image", "image/jpeg", r.frame, (32, 24, 0, "jpeg"))
                for r in rows
            ],
            schema=mm.MEDIA_SCHEMA,
        )
    )
    feats = {r.media_id: r.feature for r in feature_df.collect()}
    # solid frames: luminance bands are flat, and frame 2 (blue=80)
    # is brighter than frame 0 (blue=0) in every band
    assert all(len(v) == 8 for v in feats.values())
    assert all(b2 > b0 for b0, b2 in zip(feats[0], feats[2]))


def test_bmp_video_still_wins_dispatch():
    """Dispatch order: concatenated-BMP payloads keep their kernel; MP4
    payloads route to the MP4 kernel; garbage falls to the stub."""
    mp4, _ = _mjpeg_video(n=2, fps=1)
    out = mm._frames_dispatch(mp4, duration_ms=999999, every_ms=1000)
    assert parse_jpeg(out[0][2]) is not None  # mp4 kernel ran (jpeg frames)
    stub = mm._frames_dispatch(b"not media at all", 10000, 5000)
    assert all(parse_jpeg(f) is None for _, _, f in stub)


def test_probe_media_reads_real_headers(spark):
    """probe_media extracts dimensions/duration from payload headers —
    for every real container format — and flags unknowns."""
    mp4, _ = _mjpeg_video(n=4, fps=4, w=48, h=20)
    jpg = encode_jpeg(np.zeros((10, 14, 3), np.uint8))
    png = mm.encode_png(np.zeros((7, 9, 3), np.uint8))
    bmp = mm.encode_bmp(np.zeros((5, 6, 3), np.uint8))
    import io as _io
    import wave as _wave

    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00" * 4000)  # 500 ms
    wav = buf.getvalue()
    rows = [
        (1, "video", "video/mp4", bytearray(mp4), (0, 0, 0, "x")),
        (2, "image", "image/jpeg", bytearray(jpg), (0, 0, 0, "x")),
        (3, "image", "image/png", bytearray(png), (0, 0, 0, "x")),
        (4, "image", "image/bmp", bytearray(bmp), (0, 0, 0, "x")),
        (5, "audio", "audio/wav", bytearray(wav), (0, 0, 0, "x")),
        (6, "image", "junk", bytearray(b"nonsense"), (0, 0, 0, "x")),
    ]
    media = spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)
    got = {r.media_id: r for r in mm.probe_media(media).collect()}
    assert (got[1].container, got[1].probe_width, got[1].probe_height) == ("mp4", 48, 20)
    assert got[1].probe_duration_ms == 1000 and got[1].n_streams == 1
    assert (got[2].container, got[2].probe_width, got[2].probe_height) == ("jpeg", 14, 10)
    assert (got[3].container, got[3].probe_width, got[3].probe_height) == ("png", 9, 7)
    assert (got[4].container, got[4].probe_width, got[4].probe_height) == ("bmp", 6, 5)
    assert (got[5].container, got[5].probe_duration_ms) == ("wav", 500)
    assert got[6].container == "unknown"
