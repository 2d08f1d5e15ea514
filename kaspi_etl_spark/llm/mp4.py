"""MP4 (ISO BMFF) container parsing and writing — pure stdlib struct.

Retires the "mp4 stays stubbed" container half of the round-5 media gap.
What is and isn't real here, precisely:

  - ``parse_mp4`` REALLY parses the container: box walk, ``mvhd`` /
    ``tkhd`` / ``mdhd`` / ``hdlr`` / ``stsd`` metadata, and the full
    sample index (``stts`` decode times, ``stsc`` sample-to-chunk runs,
    ``stsz`` sizes, ``stco``/``co64`` chunk offsets) expanded to one
    (time_ms, offset, size) triple per sample. That index is exactly
    what a 100 TB frame-sampling pipeline needs: it turns "decode the
    whole video" into ranged reads of just the sampled frames.
  - Motion-JPEG tracks (sample entry fourcc ``jpeg``/``mjpa``) decode
    END-TO-END: each extracted sample is a complete baseline JPEG and
    ``llm/jpeg.py`` decodes it to pixels. H.264/H.265/AV1 samples are
    extracted as encoded bytes but NOT pixel-decoded (those genuinely
    need libavcodec); callers fall back to the stub for them.
  - ``write_mp4`` emits a minimal valid single-track video MP4 (ftyp +
    moov + mdat, one chunk, constant frame duration) so the round-trip
    test is self-contained — the same no-external-fixture pattern as
    ``jpeg.encode_jpeg``.

Box layout facts used here are from the public ISO/IEC 14496-12 spec.
Version-1 (64-bit) mvhd/mdhd/tkhd and co64 are handled; fragmented mp4
(moof) returns None — a fragmented index lives in trun boxes, which is
out of scope for this kernel.
"""

from __future__ import annotations

import struct


def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                return
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            body = pos + 16
            if size < 16:
                return
        elif size == 0:  # to end of enclosing box
            size = end - pos
        elif size < 8:
            return
        if pos + size > end:
            return
        yield fourcc, body, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, fourcc: bytes):
    for fc, b, e in _iter_boxes(data, start, end):
        if fc == fourcc:
            return b, e
    return None


def _fullbox(data: bytes, pos: int) -> tuple[int, int]:
    """(version, flags) of a full box whose body starts at pos."""
    v = data[pos]
    flags = int.from_bytes(data[pos + 1 : pos + 4], "big")
    return v, flags


def parse_mp4(content: bytes):
    """Parse an unfragmented ISO BMFF file. Returns None if the payload
    is not mp4-shaped; otherwise::

        {"duration_ms": int,
         "tracks": [{"handler": "vide"|"soun"|...,
                     "codec": str,          # sample entry fourcc
                     "width": int, "height": int,   # 0 for non-video
                     "timescale": int, "n_samples": int,
                     "samples": [(time_ms, offset, size), ...]}]}
    """
    n = len(content)
    if n < 16:
        return None
    top = list(_iter_boxes(content, 0, n))
    fourccs = [fc for fc, _, _ in top]
    if b"ftyp" not in fourccs or b"moov" not in fourccs:
        return None
    if b"moof" in fourccs:
        return None  # fragmented: sample index lives in trun, out of scope
    moov_b, moov_e = next((b, e) for fc, b, e in top if fc == b"moov")

    mvhd = _find(content, moov_b, moov_e, b"mvhd")
    if mvhd is None:
        return None
    v, _ = _fullbox(content, mvhd[0])
    if v == 1:
        mv_timescale, mv_duration = struct.unpack_from(
            ">IQ", content, mvhd[0] + 4 + 16
        )
    else:
        mv_timescale, mv_duration = struct.unpack_from(
            ">II", content, mvhd[0] + 4 + 8
        )
    if mv_timescale == 0:
        return None

    tracks = []
    for fc, tb, te in _iter_boxes(content, moov_b, moov_e):
        if fc != b"trak":
            continue
        trk = _parse_trak(content, tb, te)
        if trk is not None:
            tracks.append(trk)
    if not tracks:
        return None
    return {
        "duration_ms": mv_duration * 1000 // mv_timescale,
        "tracks": tracks,
    }


def _parse_trak(data: bytes, tb: int, te: int):
    tkhd = _find(data, tb, te, b"tkhd")
    mdia = _find(data, tb, te, b"mdia")
    if tkhd is None or mdia is None:
        return None
    v, _ = _fullbox(data, tkhd[0])
    # width/height are the last two 16.16 fixed-point fields of tkhd
    w_fix, h_fix = struct.unpack_from(">II", data, tkhd[1] - 8)
    width, height = w_fix >> 16, h_fix >> 16

    mdhd = _find(data, mdia[0], mdia[1], b"mdhd")
    hdlr = _find(data, mdia[0], mdia[1], b"hdlr")
    minf = _find(data, mdia[0], mdia[1], b"minf")
    if mdhd is None or hdlr is None or minf is None:
        return None
    v, _ = _fullbox(data, mdhd[0])
    if v == 1:
        timescale = struct.unpack_from(">I", data, mdhd[0] + 4 + 16)[0]
    else:
        timescale = struct.unpack_from(">I", data, mdhd[0] + 4 + 8)[0]
    if timescale == 0:
        return None
    handler = data[hdlr[0] + 8 : hdlr[0] + 12].decode("latin1")

    stbl_parent = _find(data, minf[0], minf[1], b"stbl")
    if stbl_parent is None:
        return None
    sb, se = stbl_parent

    stsd = _find(data, sb, se, b"stsd")
    codec = ""
    if stsd is not None and stsd[1] - stsd[0] >= 16:
        codec = data[stsd[0] + 12 : stsd[0] + 16].decode("latin1").strip()

    stts = _find(data, sb, se, b"stts")
    stsz = _find(data, sb, se, b"stsz")
    stsc = _find(data, sb, se, b"stsc")
    stco = _find(data, sb, se, b"stco")
    co64 = _find(data, sb, se, b"co64")
    if stts is None or stsz is None or stsc is None or (stco is None and co64 is None):
        return None

    # stsz -> per-sample sizes
    fixed_size, count = struct.unpack_from(">II", data, stsz[0] + 4)
    if fixed_size:
        sizes = [fixed_size] * count
    else:
        sizes = list(
            struct.unpack_from(f">{count}I", data, stsz[0] + 12)
        )

    # stts -> per-sample decode times (in timescale units)
    n_ent = struct.unpack_from(">I", data, stts[0] + 4)[0]
    times: list[int] = []
    t = 0
    for i in range(n_ent):
        cnt, delta = struct.unpack_from(">II", data, stts[0] + 8 + 8 * i)
        for _ in range(cnt):
            times.append(t)
            t += delta
    if len(times) < count:
        return None

    # stco/co64 -> chunk offsets
    if stco is not None:
        n_chunks = struct.unpack_from(">I", data, stco[0] + 4)[0]
        chunk_offsets = list(
            struct.unpack_from(f">{n_chunks}I", data, stco[0] + 8)
        )
    else:
        n_chunks = struct.unpack_from(">I", data, co64[0] + 4)[0]
        chunk_offsets = list(
            struct.unpack_from(f">{n_chunks}Q", data, co64[0] + 8)
        )

    # stsc runs -> samples-per-chunk for every chunk
    n_runs = struct.unpack_from(">I", data, stsc[0] + 4)[0]
    runs = [
        struct.unpack_from(">III", data, stsc[0] + 8 + 12 * i)
        for i in range(n_runs)
    ]
    spc = [0] * n_chunks
    for ri, (first, per, _desc) in enumerate(runs):
        last = runs[ri + 1][0] - 1 if ri + 1 < n_runs else n_chunks
        for c in range(first - 1, min(last, n_chunks)):
            spc[c] = per

    # expand to per-sample (time_ms, offset, size)
    samples = []
    si = 0
    for ci in range(n_chunks):
        off = chunk_offsets[ci]
        for _ in range(spc[ci]):
            if si >= count:
                break
            samples.append((times[si] * 1000 // timescale, off, sizes[si]))
            off += sizes[si]
            si += 1
    if si != count:
        return None

    return {
        "handler": handler,
        "codec": codec,
        "width": width,
        "height": height,
        "timescale": timescale,
        "n_samples": count,
        "samples": samples,
    }


def extract_sample(content: bytes, sample: tuple[int, int, int]) -> bytes | None:
    """Ranged read of one sample: (time_ms, offset, size) -> bytes."""
    _ms, off, size = sample
    if off + size > len(content):
        return None
    return content[off : off + size]


# --------------------------------------------------------------------------
# Writer (round-trip fixture generator; also a valid general encoder for
# pre-encoded sample streams)
# --------------------------------------------------------------------------


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full(fourcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(
        fourcc, bytes([version]) + flags.to_bytes(3, "big") + body
    )


def write_mp4(
    frames: list[bytes],
    fps: int = 10,
    codec: bytes = b"jpeg",
    width: int = 0,
    height: int = 0,
) -> bytes:
    """Write a minimal valid single-video-track unfragmented MP4: all
    samples in one chunk, constant frame duration. ``frames`` are
    already-encoded sample payloads (e.g. baseline JPEGs for an MJPEG
    track)."""
    if not frames or fps <= 0:
        raise ValueError("need at least one frame and fps > 0")
    timescale = 1000
    delta = timescale // fps
    duration = delta * len(frames)

    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)  # volume 1.0
        + b"\x00" * 10
        + struct.pack(
            ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
        )  # identity matrix
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _full(
        b"tkhd",
        0,
        3,  # enabled | in-movie
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(
            ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
        )
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd",
        0,
        0,
        struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0),
    )
    hdlr = _full(
        b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00"
    )
    # visual sample entry
    entry = (
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(codec, entry))
    stts = _full(
        b"stts", 0, 0, struct.pack(">III", 1, len(frames), delta)
    )
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, len(frames), 1))
    stsz = _full(
        b"stsz",
        0,
        0,
        struct.pack(">II", 0, len(frames))
        + b"".join(struct.pack(">I", len(f)) for f in frames),
    )

    def build(chunk_offset: int) -> bytes:
        stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        dref = _full(
            b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")
        )
        dinf = _box(b"dinf", dref)
        minf = _box(b"minf", vmhd + dinf + stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", tkhd + mdia)
        return _box(b"moov", mvhd + trak)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    moov_len = len(build(0))  # stco value doesn't change moov's size
    first_sample = len(ftyp) + moov_len + 8  # mdat header is 8 bytes
    moov = build(first_sample)
    mdat = _box(b"mdat", b"".join(frames))
    return ftyp + moov + mdat
