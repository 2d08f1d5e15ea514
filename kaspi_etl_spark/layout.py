"""Multi-dimensional data layout: Z-order clustering for scan pruning.

The lakehouse OPTIMIZE ZORDER pattern (Delta/Iceberg): interleave the
bits of several key columns into one sort key so that files and row
groups written in that order have NARROW min/max ranges on EVERY keyed
column — parquet predicate pushdown can then prune files for filters on
any of them, not just the leading sort column.

Everything is pure ``pyspark.sql.functions`` bit arithmetic (shift/and/
or) inside whole-stage codegen; the write path is repartitionByRange on
the z-value + a within-partition sort, so the only shuffle is the range
partitioner's (sampled, balanced) exchange.

Scale notes: at 100 TB the z-value costs a few dozen integer ops per
row — negligible against the write itself; range partitioning keeps
output files balanced even under skewed keys because the partitioner
samples the z-value distribution, not any single column's.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .litcache import array_lit


def zorder_value(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each column into a Z-value.

    Columns must already be non-negative integers on comparable scales
    (callers map domains onto the grid first — e.g. ``pct_rank * 2^bits``
    or a modulus). Bit b of column c lands at position b * len(cols) + c,
    so sorting by the result alternates locality between all columns.
    Pure integer Column arithmetic — codegen'd, no UDF.
    """
    m = len(cols)
    if m == 0:
        raise ValueError("zorder_value needs at least one column")
    if m * bits > 63:
        raise ValueError(
            f"zorder_value: {m} columns x {bits} bits = {m * bits} interleaved "
            "bits does not fit a signed 64-bit key; lower bits or split columns"
        )
    out = F.lit(0).cast("long")
    for c_idx, col in enumerate(cols):
        masked = col.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for b in range(bits):
            bit = F.shiftright(masked, b).bitwiseAND(F.lit(1))
            out = out + (bit * F.lit(1 << (b * m + c_idx)))
    return out


def zorder_sql(cols: list[str], bits: int = 16) -> str:
    """The DuckDB/ANSI mirror of ``zorder_value`` over column names —
    generated term-for-term so oracles can replay the interleave."""
    m = len(cols)
    terms = []
    for c_idx, name in enumerate(cols):
        masked = f"({name} & {(1 << bits) - 1})"
        for b in range(bits):
            terms.append(
                f"((({masked} >> {b}) & 1) * {1 << (b * m + c_idx)})"
            )
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``.

    repartitionByRange on the z-value assigns each output file a
    contiguous z-range (the partitioner samples the distribution, so
    files are balanced under skew); the within-partition sort makes row
    groups inside each file contiguous too. Filters on ANY of ``cols``
    then prune most files via parquet min/max stats — the property
    ``tests/test_layout.py`` asserts against an unclustered write.
    """
    z = zorder_value([F.col(c) for c in cols], bits).alias("_z")
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# Hilbert curve: the locality-tighter alternative to Z-order.
# ---------------------------------------------------------------------------
#
# Z-order's bit interleave has "seams": consecutive z-values can jump
# across the whole key space (at quadrant boundaries the curve
# teleports), so a value-range filter maps to more files than the same
# range under a Hilbert layout, where EVERY consecutive pair of curve
# positions is grid-adjacent (unit Manhattan step — property-tested).
# Delta Lake added HILBERT clustering for exactly this reason.
#
# Implementation shape — a 4-state DFA over the EXISTING z-interleave,
# processed a BYTE at a time through two 1024-entry lookup tables:
#
#   hilbert_d = fold over 4 bytes of z: d = (d << 8) | D_LUT[state, byte]
#                                       state = T_LUT[state, byte]
#
# Why not the textbook xy2d loop as unrolled Column expressions: each
# of the 16 iterations references the previous x/y/state MULTIPLE
# times, and Catalyst's CollapseProject / codegen inlining can expand
# such chains exponentially at PLAN time (measured on the LSH plane
# kernels — see llm/similarity.py). The byte-DFA needs only 4 steps,
# each referencing the previous state twice, so the fully-inlined
# expression stays ~2^4 small terms; the LUTs are single array
# Literals (constant-folded), the same discipline as the sigmoid /
# flog2 tables. The DFA is generated at import time from the group
# algebra of the curve's quadrant transforms and verified against an
# independent textbook implementation in tests/test_layout.py.

HILBERT_BITS = 16  # per dimension; 32-bit z, 32-bit d


def _hilbert_luts() -> tuple[list[int], list[int]]:
    """(T_LUT, D_LUT), each flat 4*256: next state / 8 d-bits for one
    byte of z-interleave (4 quadrant levels, MSB-first) under each of
    the 4 orientation states."""
    # A state is the transform accumulated from higher levels, as an
    # explicit truth table: (rx, ry) raw quadrant bits -> (ex, ey)
    # effective bits in curve orientation.
    ident = {(0, 0): (0, 0), (1, 0): (1, 0), (0, 1): (0, 1), (1, 1): (1, 1)}
    swap = {k: (k[1], k[0]) for k in ident}
    flipswap = {k: (k[1] ^ 1, k[0] ^ 1) for k in ident}

    def compose(outer, inner):  # r -> outer(inner(r))
        return {k: outer[inner[k]] for k in inner}

    def step(state, rx, ry):
        ex, ey = state[(rx, ry)]
        d2 = (3 * ex) ^ ey
        if ey == 0:
            local = flipswap if ex == 1 else swap
            state = compose(local, state)
        return d2, state

    # enumerate reachable states (the 4-element orbit of the identity)
    states = [ident]
    frontier = [ident]
    while frontier:
        s = frontier.pop()
        for rx in (0, 1):
            for ry in (0, 1):
                _, nxt = step(s, rx, ry)
                if nxt not in states:
                    states.append(nxt)
                    frontier.append(nxt)
    assert len(states) == 4, f"expected 4 Hilbert states, got {len(states)}"

    t_lut = [0] * (4 * 256)
    d_lut = [0] * (4 * 256)
    for si, s0 in enumerate(states):
        for byte in range(256):
            s, dbits = s0, 0
            for j in range(4):  # quadrants MSB-first within the byte
                ry = (byte >> (7 - 2 * j)) & 1
                rx = (byte >> (6 - 2 * j)) & 1
                d2, s = step(s, rx, ry)
                dbits = (dbits << 2) | d2
            t_lut[si * 256 + byte] = states.index(s)
            d_lut[si * 256 + byte] = dbits
    return t_lut, d_lut


HILBERT_T_LUT, HILBERT_D_LUT = _hilbert_luts()


def hilbert_xy2d_int(x: int, y: int, bits: int = HILBERT_BITS) -> int:
    """Pure-Python mirror of ``hilbert_value`` (driver-side scalar use +
    the bit-parity anchor for tests)."""
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    state, d = 0, 0
    for k in range(bits // 4):
        byte = (z >> (2 * bits - 8 * (k + 1))) & 255
        d = (d << 8) | HILBERT_D_LUT[state * 256 + byte]
        state = HILBERT_T_LUT[state * 256 + byte]
    return d


def hilbert_value(x: Column, y: Column, bits: int = HILBERT_BITS) -> Column:
    """Hilbert curve index of the low ``bits`` bits of two non-negative
    integer columns (domain mapping is the caller's, as in
    ``zorder_value``). Pure integer Column arithmetic + two literal
    lookup tables; ``bits`` must be a multiple of 4 (byte-DFA)."""
    if bits % 4 != 0 or not 4 <= bits <= 31:
        raise ValueError("hilbert_value: bits must be a multiple of 4 in [4, 31]")
    z = zorder_value([x, y], bits)
    t_lit = array_lit(HILBERT_T_LUT, "int")
    d_lit = array_lit(HILBERT_D_LUT, "bigint")
    state = F.lit(0).cast("int")
    d = F.lit(0).cast("long")
    for k in range(bits // 4):
        shift = 2 * bits - 8 * (k + 1)
        byte = F.shiftright(z, shift).bitwiseAND(F.lit(255))
        # try_element_at needs an INT index (z and byte are LONG)
        idx = (state * F.lit(256) + byte + F.lit(1)).cast("int")
        d = F.shiftleft(d, 8) + F.try_element_at(d_lit, idx)
        state = F.try_element_at(t_lit, idx)
    return d


def hilbert_sql(x: str, y: str, bits: int = HILBERT_BITS) -> str:
    """DuckDB mirror of ``hilbert_value``: chained scalar subexpressions
    over the shared LUT literals. Generated step-for-step; callers
    interpolate ``{TL}`` / ``{DL}`` CTE columns carrying the two table
    literals (single copy each — see sql_hilbert_lut_cte)."""
    if bits % 4 != 0 or not 4 <= bits <= 31:
        raise ValueError("hilbert_sql: bits must be a multiple of 4 in [4, 31]")
    z = zorder_sql([x, y], bits)
    state = "0"
    d = "CAST(0 AS BIGINT)"
    for k in range(bits // 4):
        shift = 2 * bits - 8 * (k + 1)
        byte = f"((({z}) >> {shift}) & 255)"
        idx = f"(({state}) * 256 + {byte} + 1)"
        d = f"(({d}) * 256 + list_extract({{DL}}, {idx}))"
        state = f"list_extract({{TL}}, {idx})"
    return d


def sql_hilbert_lut_cte() -> str:
    """One CTE row carrying both LUT literals (reference them as h.tl /
    h.dl after a CROSS JOIN) so the 1024-entry arrays appear once in
    the statement, not once per DFA step."""
    tl = "[" + ",".join(str(v) for v in HILBERT_T_LUT) + "]"
    dl = "[" + ",".join(str(v) for v in HILBERT_D_LUT) + "]"
    return f"SELECT {tl} AS tl, {dl} AS dl"


def write_hilbert(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    bits: int = HILBERT_BITS,
    num_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered by the Hilbert index of
    (x, y) — same range-partition + within-partition sort shape as
    ``write_zordered``, tighter per-file min/max ranges on both keys."""
    h = hilbert_value(F.col(x), F.col(y), bits).alias("_h")
    (
        df.withColumn("_h", h)
        .repartitionByRange(num_files, F.col("_h"))
        .sortWithinPartitions("_h")
        .drop("_h")
        .write.mode("overwrite")
        .parquet(path)
    )
