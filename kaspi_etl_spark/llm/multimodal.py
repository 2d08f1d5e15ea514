"""Multimodal columns — image/audio/video as opaque binary with typed
metadata; decode/feature-extract as Arrow-batched Pandas stages.

Decode kernels by modality:
  - audio (PCM WAV): REAL — stdlib ``wave`` + numpy, no external codecs
    needed. ``extract_features`` decodes RIFF/WAVE payloads to per-slice
    RMS energy vectors; see ``_wav_features``.
  - image (uncompressed BMP): REAL — header parse + numpy pixel math, no
    codec needed. ``extract_features`` turns 24-bit BI_RGB payloads into
    per-band mean-luminance vectors (``_bmp_features``) and
    ``resize_images`` does nearest-neighbour resampling that re-emits a
    valid BMP (``_bmp_resize``).
  - image (PNG): REAL — stdlib ``zlib`` inflate + numpy scanline
    unfiltering (all five PNG filter types), 8-bit gray/RGB/RGBA,
    non-interlaced (``_parse_png``); ``encode_png`` writes valid PNGs
    back, so the resize path stays format-preserving.
  - image (JPEG): REAL — baseline sequential decode AND encode in pure
    stdlib struct + numpy (``llm/jpeg.py``): Huffman entropy layer,
    batched-einsum IDCT/DCT, any integer h/v subsampling (4:4:4/4:2:2/
    4:2:0), grayscale, restart markers. Progressive/arithmetic/12-bit
    fall through to the stub (those genuinely want libjpeg).
  - video (concatenated BMP): REAL — the container is back-to-back
    uncompressed BMP frames, each self-delimiting via its header's
    file-size field, so ``sample_frames`` walks, splits, and emits
    complete decodable BMP frames (``_bmp_video_frames``) with no codec
    dependency.
  - video (MP4/ISO BMFF): container REAL — ``llm/mp4.py`` parses the
    box tree and the full sample index (stts/stsc/stsz/stco), so
    ``sample_frames`` does ranged sample extraction with the
    container's own timing. Motion-JPEG tracks then pixel-decode
    end-to-end through ``llm/jpeg.py``; H.264-family samples are
    extracted but not pixel-decoded (libavcodec territory — the one
    remaining genuine stub, behind ``DECODERS_AVAILABLE``).
Everything Spark-side — schemas, partition sizing, mapInPandas batch
shape, metadata pushdown — is real and tested for every modality.

Scale notes: binary payloads dominate partition size, so reads should set
spark.sql.files.maxPartitionBytes low enough that a batch of decoded
frames fits executor memory; metadata-only queries must prune the binary
column (parquet column pruning makes them cheap — verified in tests by
checking the scan's ReadSchema excludes `content`).
"""

from __future__ import annotations

import io
import wave
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODERS_AVAILABLE = False  # image/video codecs absent in this environment

try:  # the WAV path needs only stdlib wave + numpy
    import numpy as _np

    WAV_DECODER_AVAILABLE = True
except ImportError:  # pragma: no cover - numpy is baked into this env
    WAV_DECODER_AVAILABLE = False

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a deterministic media table from the documents fixture: text
    bytes stand in for encoded payloads (STUB content, real schema)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
            (F.col("doc_id") % 60000).cast("int").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )


def _fake_decode_features(content: bytes, dim: int = 8) -> list[float]:
    """STUB decode kernel: deterministic byte-histogram 'features'.

    Production: replace with PIL.Image.open / pyav etc. The signature
    (bytes -> fixed-dim float vector) is what the real kernel must keep
    — ``_wav_features`` below is the real-kernel instance of it.
    """
    if DECODERS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("plug real decoder here")
    import math

    buckets = [0] * dim
    for b in content[:4096]:
        buckets[b % dim] += 1
    total = max(1, sum(buckets))
    # floor(x*1e6 + 0.5)/1e6: explicit half-up in IEEE doubles, so any
    # SQL oracle can reproduce it op-for-op (Python round() half-even
    # and DuckDB round() half-away disagree on exact .5 ties).
    return [
        math.floor(b / total * 1_000_000 + 0.5) / 1_000_000 for b in buckets
    ]


def _wav_features(content: bytes, dim: int = 8) -> list[float] | None:
    """REAL audio decode kernel: PCM WAV via stdlib ``wave`` + numpy.

    Decodes 8/16-bit PCM, mixes channels to mono (mean), splits the
    signal into ``dim`` contiguous time slices and returns each slice's
    RMS energy normalized to full scale — a fixed-dim float vector in
    [0, 1], the same contract as the stub kernel. Returns None for
    payloads that are not (valid) RIFF/WAVE so the caller can fall back;
    vectorized numpy throughout, no per-sample Python.
    """
    if not (
        len(content) >= 12
        and content[:4] == b"RIFF"
        and content[8:12] == b"WAVE"
    ):
        return None
    try:
        with wave.open(io.BytesIO(content), "rb") as w:
            n_channels, sampwidth = w.getnchannels(), w.getsampwidth()
            frames = w.readframes(w.getnframes())
    except (wave.Error, EOFError):
        return None
    if sampwidth == 2:
        x = _np.frombuffer(frames, dtype="<i2").astype(_np.float64)
        full_scale = 32768.0
    elif sampwidth == 1:  # 8-bit WAV is unsigned, midpoint 128
        x = _np.frombuffer(frames, dtype=_np.uint8).astype(_np.float64) - 128.0
        full_scale = 128.0
    else:  # 24/32-bit: outside this kernel's scope
        return None
    if n_channels > 1:
        n = (x.size // n_channels) * n_channels
        x = x[:n].reshape(-1, n_channels).mean(axis=1)
    if x.size == 0:
        return [0.0] * dim
    out = []
    for i in range(dim):
        lo, hi = i * x.size // dim, (i + 1) * x.size // dim
        sl = x[lo:hi]
        out.append(
            float(_np.sqrt(_np.mean(sl * sl)) / full_scale) if sl.size else 0.0
        )
    return out


def _parse_bmp(content: bytes):
    """Parse an uncompressed 24-bit BI_RGB BMP into (height, width, 3)
    uint8 BGR. Returns None for anything that is not such a BMP (wrong
    magic, compressed, other bit depths, truncated pixel data) so callers
    can fall back. Bottom-up rows (positive height) are flipped to
    top-down; top-down (negative height) pass through."""
    import struct

    if len(content) < 54 or content[:2] != b"BM":
        return None
    pix_off = struct.unpack_from("<I", content, 10)[0]
    dib = struct.unpack_from("<I", content, 14)[0]
    if dib < 40:  # BITMAPCOREHEADER etc.: out of scope
        return None
    w, h = struct.unpack_from("<ii", content, 18)
    planes, bpp = struct.unpack_from("<HH", content, 26)
    comp = struct.unpack_from("<I", content, 30)[0]
    if planes != 1 or bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    top_down = h < 0
    h = abs(h)
    stride = ((w * 3 + 3) // 4) * 4
    need = pix_off + stride * h
    if len(content) < need:
        return None
    rows = _np.frombuffer(content, dtype=_np.uint8, count=stride * h, offset=pix_off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    return rows if top_down else rows[::-1]


def _luminance_bands(px, dim: int) -> list[float]:
    """(h, w, 3) uint8 BGR -> ``dim`` vertical bands of mean luminance
    (ITU-R BT.601 integer weights 77/150/29 over 256) in [0, 1]."""
    x = px.astype(_np.uint32)
    # BGR order: luminance = (29*B + 150*G + 77*R) / 256
    lum = (29 * x[:, :, 0] + 150 * x[:, :, 1] + 77 * x[:, :, 2]) >> 8
    h = lum.shape[0]
    out = []
    for i in range(dim):
        lo, hi = i * h // dim, (i + 1) * h // dim
        band = lum[lo:hi]
        out.append(float(band.mean() / 255.0) if band.size else 0.0)
    return out


def _bmp_features(content: bytes, dim: int = 8) -> list[float] | None:
    """REAL image decode kernel: uncompressed 24-bit BMP -> luminance
    band vector — same bytes-in, fixed-dim-vector-out contract as the
    WAV and stub kernels. Vectorized numpy; None for non-BMP payloads."""
    px = _parse_bmp(content)
    if px is None:
        return None
    return _luminance_bands(px, dim)


# --- PNG (stdlib zlib + numpy — no external codec) --------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: bytes, h: int, w: int, ch: int):
    """Reverse PNG scanline filtering -> (h, w*ch) uint8.

    Filters None(0) and Up(2) vectorize outright; Sub(1) is a per-channel
    cumulative sum (addition is associative mod 256, so the mod can wait
    until the end); Average(3) and Paeth(4) depend on the already-
    reconstructed left pixel AND need the mod applied per step, so those
    rows walk pixels — numpy row math everywhere else keeps the common
    case (filters 0-2, what most encoders emit for synthetic data) fast.
    """
    stride = w * ch
    if len(raw) < h * (stride + 1):
        return None
    out = _np.zeros((h, stride), dtype=_np.int32)
    pos = 0
    for y in range(h):
        f = raw[pos]
        row = _np.frombuffer(raw, dtype=_np.uint8, count=stride, offset=pos + 1).astype(
            _np.int32
        )
        pos += stride + 1
        prev = out[y - 1] if y > 0 else _np.zeros(stride, dtype=_np.int32)
        if f == 0:
            rec = row
        elif f == 2:  # Up
            rec = (row + prev) & 0xFF
        elif f == 1:  # Sub: cumsum per channel lane, mod deferred
            rec = row.reshape(-1, ch).cumsum(axis=0).reshape(-1) & 0xFF
        elif f == 3:  # Average
            rec = _np.zeros(stride, dtype=_np.int32)
            for x in range(stride):
                left = rec[x - ch] if x >= ch else 0
                rec[x] = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = _np.zeros(stride, dtype=_np.int32)
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (row[x] + pred) & 0xFF
        else:
            return None
        out[y] = rec
    return out.astype(_np.uint8)


def _parse_png(content: bytes):
    """Parse an 8-bit non-interlaced gray/RGB/RGBA PNG into (h, w, 3)
    uint8 BGR top-down — the same array contract as ``_parse_bmp``, so
    the banding/resize math downstream is shared. Pure stdlib ``zlib``
    inflate + numpy filter reversal; returns None for anything else
    (16-bit, palette, interlaced, truncated, non-PNG)."""
    import struct
    import zlib

    if len(content) < 8 + 25 or content[:8] != _PNG_SIG:
        return None
    pos = 8
    w = h = None
    ch = 0
    idat = bytearray()
    while pos + 8 <= len(content):
        length, ctype = struct.unpack_from(">I4s", content, pos)
        pos += 8
        if pos + length + 4 > len(content):
            return None
        data = content[pos : pos + length]
        pos += length + 4  # skip CRC
        if ctype == b"IHDR":
            if length != 13:
                return None
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
                return None
            ch = {0: 1, 2: 3, 6: 4}.get(color)
            if ch is None or w == 0 or h == 0:
                return None
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if w is None or not idat:
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    px = _png_unfilter(raw, h, w, ch)
    if px is None:
        return None
    px = px.reshape(h, w, ch)
    if ch == 1:
        px = _np.repeat(px, 3, axis=2)  # gray -> BGR
    elif ch == 4:
        px = px[:, :, :3]  # drop alpha
    if px.shape[2] == 3 and ch != 1:
        px = px[:, :, ::-1]  # PNG stores RGB; pipeline contract is BGR
    return _np.ascontiguousarray(px)


def encode_png(px) -> bytes:
    """Encode a (h, w, 3) uint8 BGR top-down array as a valid 8-bit RGB
    PNG (filter 0 scanlines, one zlib IDAT) — the inverse of
    ``_parse_png``, keeping the resize path format-preserving."""
    import struct
    import zlib

    h, w = px.shape[:2]
    rgb = px[:, :, ::-1]  # BGR -> RGB
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _jpeg_px(content: bytes):
    """Decode baseline JPEG via the stdlib+numpy codec in
    ``kaspi_etl_spark.llm.jpeg`` — same (h, w, 3) BGR contract as
    ``_parse_bmp``/``_parse_png``. Exception-hardened: a malformed
    stream must fall through to the stub, never poison the batch."""
    if len(content) < 3 or content[:3] != b"\xff\xd8\xff":
        return None
    try:
        from kaspi_etl_spark.llm.jpeg import parse_jpeg

        return parse_jpeg(content)
    except Exception:
        return None


def _jpeg_features(content: bytes, dim: int = 8) -> list[float] | None:
    """REAL DCT-codec image decode kernel: baseline JPEG -> luminance
    band vector. Pure stdlib struct + numpy (``llm/jpeg.py``)."""
    px = _jpeg_px(content)
    if px is None:
        return None
    return _luminance_bands(px, dim)


def _jpeg_resize(content: bytes, dst_w: int, dst_h: int) -> bytes | None:
    """REAL JPEG resize kernel: decode, nearest-neighbour resample,
    re-encode as baseline JPEG (format-preserving, like PNG/BMP)."""
    px = _jpeg_px(content)
    if px is None or dst_w <= 0 or dst_h <= 0:
        return None
    from kaspi_etl_spark.llm.jpeg import encode_jpeg

    src_h, src_w = px.shape[:2]
    ys = (_np.arange(dst_h) * src_h) // dst_h
    xs = (_np.arange(dst_w) * src_w) // dst_w
    return encode_jpeg(_np.ascontiguousarray(px[ys][:, xs]), quality=90)


def _png_features(content: bytes, dim: int = 8) -> list[float] | None:
    """REAL compressed-image decode kernel: PNG -> luminance band vector
    via ``_parse_png`` — zero new dependencies (stdlib zlib + numpy)."""
    px = _parse_png(content)
    if px is None:
        return None
    return _luminance_bands(px, dim)


def _png_resize(content: bytes, dst_w: int, dst_h: int) -> bytes | None:
    """REAL PNG resize kernel: decode, nearest-neighbour resample,
    re-encode as PNG (format-preserving, like the BMP kernel)."""
    px = _parse_png(content)
    if px is None or dst_w <= 0 or dst_h <= 0:
        return None
    src_h, src_w = px.shape[:2]
    ys = (_np.arange(dst_h) * src_h) // dst_h
    xs = (_np.arange(dst_w) * src_w) // dst_w
    return encode_png(_np.ascontiguousarray(px[ys][:, xs]))


def encode_bmp(px) -> bytes:
    """Encode a (h, w, 3) uint8 BGR top-down array as a minimal valid
    uncompressed 24-bit BMP (54-byte header, 4-byte-aligned bottom-up
    rows) — the inverse of ``_parse_bmp``."""
    import struct

    h, w = px.shape[:2]
    stride = ((w * 3 + 3) // 4) * 4
    pad = stride - w * 3
    body = bytearray()
    for row in px[::-1]:  # bottom-up storage
        body += row.tobytes() + b"\x00" * pad
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return bytes(header) + bytes(body)


def _bmp_resize(content: bytes, dst_w: int, dst_h: int) -> bytes | None:
    """REAL image resize kernel: nearest-neighbour resample of an
    uncompressed 24-bit BMP, re-encoded via ``encode_bmp``. Returns None
    for non-BMP payloads so callers can fall back to the stub."""
    px = _parse_bmp(content)
    if px is None or dst_w <= 0 or dst_h <= 0:
        return None
    src_h, src_w = px.shape[:2]
    ys = (_np.arange(dst_h) * src_h) // dst_h
    xs = (_np.arange(dst_w) * src_w) // dst_w
    out = px[ys][:, xs]  # (dst_h, dst_w, 3) BGR top-down
    return encode_bmp(_np.ascontiguousarray(out))


def _decode_features(content: bytes, dim: int = 8) -> list[float]:
    """Per-payload dispatch: real WAV decode for RIFF/WAVE, real PNG
    decode (zlib + numpy), real baseline-JPEG decode (stdlib + numpy
    DCT codec, ``llm/jpeg.py``), real BMP decode for uncompressed
    24-bit BMP; byte-histogram stub otherwise (mp4/webm — video codecs
    absent here; progressive JPEG falls through too)."""
    if WAV_DECODER_AVAILABLE:
        feats = _wav_features(content, dim)
        if feats is None:
            feats = _png_features(content, dim)
        if feats is None:
            feats = _jpeg_features(content, dim)
        if feats is None:
            feats = _bmp_features(content, dim)
        if feats is not None:
            return feats
    return _fake_decode_features(content, dim)


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas so one task processes a whole Arrow batch of payloads —
    the per-row Python cost is amortized and the binary column never
    round-trips through JVM object rows. PCM WAV and uncompressed BMP
    payloads decode for real (``_wav_features`` / ``_bmp_features``);
    other payloads use the stub kernel.
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [
                _decode_features(c if isinstance(c, bytes) else bytes(c), dim)
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def _fake_resize(content: bytes, src_w: int, src_h: int, dst_w: int, dst_h: int) -> bytes:
    """STUB resize kernel: deterministic byte subsample proportional to
    the area ratio (production: PIL thumbnail/resize). Keeps the real
    contract: bytes in, bytes out, output size scales with dst area."""
    if DECODERS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("plug real image resize here")
    ratio = max(1, (src_w * src_h) // max(1, dst_w * dst_h))
    return content[::ratio][: max(1, dst_w * dst_h // 8)]


def _resize_dispatch(content: bytes, src_w: int, src_h: int, dst_w: int, dst_h: int) -> bytes:
    """Real nearest-neighbour resize for PNG (``_png_resize``), baseline
    JPEG (``_jpeg_resize``), and uncompressed BMP payloads
    (``_bmp_resize``), each format-preserving; stub byte-subsample for
    everything else."""
    if WAV_DECODER_AVAILABLE:  # numpy present
        out = _png_resize(content, dst_w, dst_h)
        if out is None:
            out = _jpeg_resize(content, dst_w, dst_h)
        if out is None:
            out = _bmp_resize(content, dst_w, dst_h)
        if out is not None:
            return out
    return _fake_resize(content, src_w, src_h, dst_w, dst_h)


def resize_images(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Image resize stage over mapInPandas: only rows with kind='image'
    are decoded; the filter happens BEFORE the Python boundary so audio
    and video bytes never cross into Arrow."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                c = row["content"]
                # NULL content maps to b"" (bytes(None) would kill the
                # whole Arrow batch) — same rule as media_phash
                c = (
                    c
                    if isinstance(c, (bytes, bytearray))
                    else b"" if c is None else bytes(c)
                )
                out.append(
                    {
                        "media_id": row["media_id"],
                        "kind": row["kind"],
                        "out_width": width,
                        "out_height": height,
                        "content": _resize_dispatch(
                            c, row["meta"]["width"], row["meta"]["height"], width, height
                        ),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return media.filter(F.col("kind") == "image").mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ms", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def _fake_frames(content: bytes, duration_ms: int, every_ms: int) -> list[tuple[int, int, bytes]]:
    """STUB frame sampler: one deterministic byte slice per sampled
    timestamp (production: pyav/ffmpeg keyframe extraction)."""
    if DECODERS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("plug real frame extraction here")
    n = max(1, duration_ms // every_ms)
    out = []
    for i in range(min(n, 16)):
        start = (i * 97) % max(1, len(content))
        out.append((i, i * every_ms, content[start : start + 32]))
    return out


def split_bmp_video(content: bytes) -> list[bytes] | None:
    """Split a concatenated-BMP video container into its frames.

    The container is simply back-to-back uncompressed BMP files — each
    frame is self-delimiting via the file-size field at byte offset 2 of
    its own header, so the walk is O(frames) with no index structure.
    Returns None unless the WHOLE payload parses as one or more valid
    BMPs (so arbitrary binary payloads fall through to the stub)."""
    import struct

    frames: list[bytes] = []
    pos = 0
    while pos < len(content):
        if content[pos : pos + 2] != b"BM" or pos + 6 > len(content):
            return None
        size = struct.unpack_from("<I", content, pos + 2)[0]
        if size < 54 or pos + size > len(content):
            return None
        frame = content[pos : pos + size]
        if _parse_bmp(frame) is None:
            return None
        frames.append(frame)
        pos += size
    return frames or None


def _bmp_video_frames(
    content: bytes, duration_ms: int, every_ms: int
) -> list[tuple[int, int, bytes]] | None:
    """REAL video frame-sampling kernel over the concatenated-BMP
    container: decode the frame list, then for each sample timestamp
    (every ``every_ms``, capped at 16 samples like the stub) emit the
    frame whose position corresponds to that fraction of the duration.
    Each emitted frame is a complete, valid BMP — downstream
    ``_bmp_features``/``_bmp_resize`` consume it directly. Returns None
    for payloads that are not concatenated BMPs."""
    frames = split_bmp_video(content)
    if frames is None:
        return None
    n_frames = len(frames)
    n_samples = min(max(1, duration_ms // every_ms), 16)
    out = []
    for i in range(n_samples):
        t = i * every_ms
        idx = min(t * n_frames // max(1, duration_ms), n_frames - 1)
        out.append((i, t, frames[idx]))
    return out


def _mp4_video_frames(
    content: bytes, every_ms: int
) -> list[tuple[int, int, bytes]] | None:
    """REAL MP4 frame-sampling kernel: parse the ISO BMFF sample index
    (``llm/mp4.py``) and emit the encoded sample whose decode time is
    nearest-below each sampled timestamp. Timing comes from the
    container's own ``stts``/``mdhd``, not the metadata column. For
    Motion-JPEG tracks the emitted frames are complete baseline JPEGs
    that ``_jpeg_features``/``_jpeg_resize`` decode to pixels; for
    H.264-family tracks the sample extraction is still real (ranged
    reads via the index) but pixel decode needs libavcodec. Returns
    None for non-MP4 payloads and for fragmented files."""
    try:
        from kaspi_etl_spark.llm.mp4 import extract_sample, parse_mp4

        info = parse_mp4(content)
    except Exception:
        return None
    if info is None:
        return None
    track = next(
        (t for t in info["tracks"] if t["handler"] == "vide" and t["samples"]),
        None,
    )
    if track is None:
        return None
    import bisect

    duration_ms = max(1, info["duration_ms"])
    n_samples = min(max(1, duration_ms // every_ms), 16)
    times = [s[0] for s in track["samples"]]
    out = []
    for i in range(n_samples):
        t = i * every_ms
        # largest sample time <= t (the frame on screen at t)
        idx = max(0, bisect.bisect_right(times, t) - 1)
        payload = extract_sample(content, track["samples"][idx])
        if payload is None:
            return None
        out.append((i, t, payload))
    return out


def _frames_dispatch(
    content: bytes, duration_ms: int, every_ms: int
) -> list[tuple[int, int, bytes]]:
    """Real concatenated-BMP sampling or real MP4 sample-index sampling
    when the payload parses, stub byte slices otherwise — same dispatch
    contract as the feature/resize kernels."""
    if WAV_DECODER_AVAILABLE:  # numpy present
        out = _bmp_video_frames(content, duration_ms, every_ms)
        if out is None:
            out = _mp4_video_frames(content, every_ms)
        if out is not None:
            return out
    return _fake_frames(content, duration_ms, every_ms)


def sample_frames(media: DataFrame, every_ms: int = 5000) -> DataFrame:
    """Frame sampling for kind='video': mapInPandas row -> N frame rows
    (a UDTF-shaped expansion). Batch output is flattened frames, so
    downstream per-frame featurization parallelizes on frame rows."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                c = row["content"]
                # NULL content maps to b"" — same rule as media_phash
                c = (
                    c
                    if isinstance(c, (bytes, bytearray))
                    else b"" if c is None else bytes(c)
                )
                for idx, ms, frame in _frames_dispatch(
                    c, int(row["meta"]["duration_ms"]), every_ms
                ):
                    rows.append(
                        {
                            "media_id": row["media_id"],
                            "frame_idx": idx,
                            "frame_ms": ms,
                            "frame": frame,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAMES_SCHEMA.fields])

    return media.filter(F.col("kind") == "video").mapInPandas(run, schema=FRAMES_SCHEMA)


PROBE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("container", T.StringType()),  # wav|png|bmp|jpeg|mp4|unknown
        T.StructField("probe_width", T.IntegerType()),
        T.StructField("probe_height", T.IntegerType()),
        T.StructField("probe_duration_ms", T.IntegerType()),
        T.StructField("n_streams", T.IntegerType()),
    ]
)


def _probe_payload(content: bytes) -> tuple[str, int | None, int | None, int | None, int]:
    """Header-only metadata probe (ffprobe-shaped): identify the
    container and read its REAL dimensions/duration from the payload,
    not from the metadata column. Never decodes pixel/sample data —
    probing a 100 TB corpus must cost header bytes, not decode CPU."""
    import struct as _struct

    try:
        if len(content) >= 12 and content[:4] == b"RIFF" and content[8:12] == b"WAVE":
            with wave.open(io.BytesIO(content), "rb") as w:
                rate = w.getframerate()
                dur = w.getnframes() * 1000 // max(1, rate)
                return ("wav", None, None, int(dur), 1)
        if len(content) >= 33 and content[:8] == _PNG_SIG:
            w_, h_ = _struct.unpack_from(">II", content, 16)
            return ("png", int(w_), int(h_), None, 1)
        if len(content) >= 26 and content[:2] == b"BM":
            w_, h_ = _struct.unpack_from("<ii", content, 18)
            return ("bmp", int(w_), abs(int(h_)), None, 1)
        if len(content) >= 3 and content[:3] == b"\xff\xd8\xff":
            # walk markers to SOF for dimensions (no entropy decode)
            pos = 2
            while pos + 4 <= len(content):
                if content[pos] != 0xFF:
                    break
                m = content[pos + 1]
                if m in (0x01,) or 0xD0 <= m <= 0xD9:
                    pos += 2
                    continue
                seg_len = _struct.unpack_from(">H", content, pos + 2)[0]
                if m in (0xC0, 0xC1, 0xC2):
                    h_, w_ = _struct.unpack_from(">HH", content, pos + 5)
                    return ("jpeg", int(w_), int(h_), None, 1)
                if m == 0xDA:
                    break
                pos += 2 + seg_len
            return ("jpeg", None, None, None, 1)
        if len(content) >= 12 and content[4:8] == b"ftyp":
            from kaspi_etl_spark.llm.mp4 import parse_mp4

            info = parse_mp4(content)
            if info is not None:
                vid = next(
                    (t for t in info["tracks"] if t["handler"] == "vide"), None
                )
                return (
                    "mp4",
                    int(vid["width"]) if vid else None,
                    int(vid["height"]) if vid else None,
                    int(info["duration_ms"]),
                    len(info["tracks"]),
                )
            return ("mp4", None, None, None, 0)
    except Exception:
        pass
    return ("unknown", None, None, None, 0)


def probe_media(media: DataFrame) -> DataFrame:
    """ffprobe-shaped metadata extraction from the payload itself —
    catches metadata-column drift (wrong dims, wrong duration) that a
    trust-the-catalog pipeline would propagate. Arrow-batched like the
    other kernels; header-only, so it's cheap even on payloads the
    pixel kernels would refuse."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                c = c if isinstance(c, bytes) else bytes(c)
                container, w_, h_, dur, ns = _probe_payload(c)
                rows.append(
                    {
                        "media_id": mid,
                        "container": container,
                        "probe_width": w_,
                        "probe_height": h_,
                        "probe_duration_ms": dur,
                        "n_streams": ns,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in PROBE_SCHEMA.fields])

    return media.mapInPandas(run, schema=PROBE_SCHEMA)


def metadata_summary(media: DataFrame) -> DataFrame:
    """Metadata-only aggregation — must NOT read the binary column (column
    pruning keeps the scan narrow; tests assert `content` is pruned from
    ReadSchema)."""
    return media.groupBy("kind").agg(
        F.count("*").cast("long").alias("n"),
        F.avg(F.col("meta.width").cast("double")).alias("avg_width"),
        F.max("meta.duration_ms").alias("max_duration_ms"),
    )


# ---------------------------------------------------------------------------
# Perceptual hash (pHash) image dedup
# ---------------------------------------------------------------------------

PHASH_SIDE = 32  # DCT input side
PHASH_BITS = 64  # 8x8 low-frequency block -> 64-bit signature
_DCT32 = None


def _dct32_matrix():
    """Orthonormal DCT-II basis for side 32, built once: deterministic
    IEEE doubles from numpy cos — both the hash and its tests share the
    exact same matrix, so signatures are bit-stable across runs."""
    global _DCT32
    if _DCT32 is None:
        n = PHASH_SIDE
        k = _np.arange(n).reshape(-1, 1)
        x = _np.arange(n).reshape(1, -1)
        m = _np.cos(_np.pi * (2 * x + 1) * k / (2 * n))
        m[0] *= _np.sqrt(1.0 / n)
        m[1:] *= _np.sqrt(2.0 / n)
        _DCT32 = m
    return _DCT32


def _px_any(content: bytes):
    """Pixel decode dispatch over every REAL codec in the module (PNG,
    baseline JPEG, BMP); None for payloads none of them claim."""
    px = _parse_png(content)
    if px is None:
        px = _jpeg_px(content)
    if px is None:
        px = _parse_bmp(content)
    return px


def _fake_px32(content: bytes):
    """STUB pixel kernel for non-image payloads: a deterministic 32x32
    'image' tiled from the leading bytes — same role as
    _fake_decode_features (the plumbing stays real and testable; only
    the decode is faked where no codec applies)."""
    buf = (content or b"\x00")[: PHASH_SIDE * PHASH_SIDE]
    reps = -(-(PHASH_SIDE * PHASH_SIDE) // max(1, len(buf)))
    arr = _np.frombuffer((buf * reps)[: PHASH_SIDE * PHASH_SIDE], dtype=_np.uint8)
    return arr.reshape(PHASH_SIDE, PHASH_SIDE).astype(_np.float64)


def phash64(content: bytes) -> int:
    """64-bit perceptual hash of an encoded image payload: decode ->
    grayscale -> nearest-resample to 32x32 -> 2D orthonormal DCT ->
    top-left 8x8 low-frequency block -> threshold at the block median
    (DC excluded) -> one bit per coefficient. Near-identical images
    (re-encode, mild resize, small crops) land within a few bits;
    unrelated images differ by ~32 (the classic pHash construction).
    All math is deterministic float64 numpy; returns a SIGNED 64-bit
    int (bit 63 may be set) ready for a BIGINT column."""
    px = _px_any(content)
    if px is None:
        g = _fake_px32(content)
    else:
        g = px.astype(_np.float64).mean(axis=2)
        src_h, src_w = g.shape
        ys = (_np.arange(PHASH_SIDE) * src_h) // PHASH_SIDE
        xs = (_np.arange(PHASH_SIDE) * src_w) // PHASH_SIDE
        g = g[ys][:, xs]
    c = _dct32_matrix()
    d = c @ g @ c.T
    block = d[:8, :8].copy().reshape(-1)
    med = _np.median(block[1:])  # DC term excluded from the vote
    bits = 0
    for i, v in enumerate(block):
        if i and v > med:
            bits |= 1 << i
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("phash", T.LongType()),
    ]
)


def media_phash(media: DataFrame) -> DataFrame:
    """Arrow-batched pHash over the binary content column (same
    mapInPandas plumbing as extract_features): one Python stage, then
    everything downstream — banding, pair joins, Hamming verify — is
    JVM-side integer work."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            # NULL content maps to b"" (the _fake_px32 stub tolerates empty
            # bytes) — bytes(None) would kill the whole Arrow batch
            hashes = [
                phash64(
                    c
                    if isinstance(c, (bytes, bytearray))
                    else b"" if c is None else bytes(c)
                )
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "phash": pd.Series(hashes, dtype="int64"),
                }
            )

    return media.mapInPandas(run, schema=PHASH_SCHEMA)


def phash_hamming_pairs(
    hashes: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "phash",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-duplicate image pairs by banded Hamming join over the 64-bit
    pHash: 4 bands of 16 bits (pigeonhole — Hamming <= 3 guarantees one
    identical band), equi-join on identical bands, exact
    bit_count(XOR) verify. The same banding shape as text SimHash
    (llm.dedup.simhash_pairs) — never an all-pairs comparison, so the
    dedup scales like any LSH bucket join."""
    chunk_bits = PHASH_BITS // bands
    mask = (1 << chunk_bits) - 1
    chunks = hashes.select(
        id_col,
        hash_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_idx"),
                        F.shiftrightunsigned(F.col(hash_col), i * chunk_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("c"),
    ).select(id_col, hash_col, "c.chunk_idx", "c.chunk")
    a = chunks.alias("a")
    b = chunks.alias("b")
    hamming = F.bit_count(F.col(f"a.{hash_col}").bitwiseXOR(F.col(f"b.{hash_col}")))
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
