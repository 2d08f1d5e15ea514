"""Baseline JPEG codec (kaspi_etl_spark/llm/jpeg.py) — self-contained
round-trip tests (the encoder removes any external-fixture dependency)
plus skip-guarded decodes of real-world files found on the host.

Reference anchor: round-5 review "codec'd media (JPEG) still stubbed";
nearest reference surface scripts/etl_catalog_api.py:155-166 (catalog
image URLs). The Spark-side integration (mapInPandas batch shape,
dispatch, format-preserving resize) is covered in test_multimodal.py.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from kaspi_etl_spark.llm.jpeg import encode_jpeg, parse_jpeg
from kaspi_etl_spark.llm import multimodal as mm

# real JPEGs that happen to ship with this host's CPython/IPython test
# data — decoded when present, skipped when not (no fixture is copied
# into the repo; the round-trip tests below are the portable coverage)
_HOST_FIXTURES = [
    (
        "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/"
        "test/imghdrdata/python.jpg",
        (16, 16, 3),  # 3-component 4:2:0
    ),
    (
        "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/"
        "site-packages/IPython/core/tests/2x2.jpg",
        (2, 2, 3),  # single-component grayscale
    ),
]


def _gradient(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            yy * 255 // max(1, h - 1),
            xx * 255 // max(1, w - 1),
            (yy + xx) * 255 // max(1, h + w - 2),
        ],
        axis=2,
    ).astype(np.uint8)


@pytest.mark.parametrize("sub", ["444", "420"])
def test_round_trip_smooth_image(sub):
    img = _gradient(29, 37)  # deliberately not a multiple of 8 or 16
    enc = encode_jpeg(img, quality=95, subsampling=sub)
    assert enc[:3] == b"\xff\xd8\xff" and enc[-2:] == b"\xff\xd9"
    dec = parse_jpeg(enc)
    assert dec is not None and dec.shape == img.shape
    mae = np.abs(dec.astype(int) - img.astype(int)).mean()
    assert mae < 8.0, (sub, mae)


def test_round_trip_grayscale():
    yy, xx = np.mgrid[0:21, 0:17]
    g = ((yy * 7 + xx * 3) % 256).astype(np.uint8)
    dec = parse_jpeg(encode_jpeg(g, quality=95))
    assert dec is not None and dec.shape == (21, 17, 3)
    # grayscale decodes to replicated channels
    assert np.array_equal(dec[:, :, 0], dec[:, :, 1])
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).mean() < 8.0


@pytest.mark.parametrize("sub", ["444", "420"])
def test_restart_markers_change_nothing(sub):
    """DRI/RSTn: decode with restarts is bit-identical to without —
    restarts only re-align and reset DC predictors."""
    img = _gradient(67, 83)
    base = parse_jpeg(encode_jpeg(img, quality=92, subsampling=sub))
    for ri in (1, 3, 7):
        enc = encode_jpeg(img, quality=92, subsampling=sub, restart_interval=ri)
        assert enc.count(b"\xff\xdd") == 1  # DRI present
        dec = parse_jpeg(enc)
        assert dec is not None and np.array_equal(dec, base), (sub, ri)


def test_flat_images_degenerate_huffman():
    """Single-symbol Huffman alphabets (all-EOB AC stream) stay valid."""
    for v in (0, 255):
        dec = parse_jpeg(encode_jpeg(np.full((16, 16, 3), v, np.uint8)))
        assert dec is not None
        assert np.abs(dec.astype(int) - v).max() <= 2


def test_quality_monotonic_size():
    img = (np.indices((48, 48)).sum(axis=0) * 37 % 256).astype(np.uint8)
    img = np.repeat(img[:, :, None], 3, axis=2)
    sizes = [len(encode_jpeg(img, quality=q)) for q in (25, 75, 98)]
    assert sizes == sorted(sizes)


def test_garbage_and_truncation_return_none_never_raise():
    for payload in (
        b"",
        b"\xff\xd8",
        b"\xff\xd8\xff\xd9",
        b"hello world" * 10,
        bytes(range(256)),
    ):
        assert parse_jpeg(payload) is None
    enc = encode_jpeg(_gradient(32, 32), quality=90)
    for cut in (4, 20, len(enc) // 2, len(enc) - 3):
        parse_jpeg(enc[:cut])  # None or partial — must not raise


@pytest.mark.parametrize("path,shape", _HOST_FIXTURES)
def test_decodes_real_world_jpegs(path, shape):
    if not os.path.exists(path):
        pytest.skip("host fixture not present")
    dec = parse_jpeg(open(path, "rb").read())
    assert dec is not None and dec.shape == shape


def test_multimodal_dispatch_picks_jpeg_kernel():
    """The feature/resize dispatch decodes JPEG payloads for real: the
    luminance-band features match the BMP encoding of the SAME pixels
    (both kernels share _luminance_bands), and resize is
    format-preserving (JPEG in -> valid JPEG out at the new dims)."""
    img = _gradient(40, 24)
    enc = encode_jpeg(img, quality=98, subsampling="444")
    feats_jpeg = mm._decode_features(enc, dim=8)
    px = parse_jpeg(enc)  # decoded pixels (with codec loss)
    feats_ref = mm._decode_features(mm.encode_bmp(px), dim=8)
    assert feats_jpeg == pytest.approx(feats_ref, abs=1e-6)
    out = mm._resize_dispatch(enc, 24, 40, 12, 10)
    assert out[:3] == b"\xff\xd8\xff"
    resized = parse_jpeg(out)
    assert resized is not None and resized.shape == (10, 12, 3)
