"""Count-Min Sketch — deterministic mergeable heavy-hitter counting.

Unlike the HLL distinct sketch (ops/incremental.py, opaque Datasketches
binary), a CMS is just a d x w grid of counters: cell(i, j) = Σ count of
tokens t with hash_i(t) mod w == j. Every cell is an integer SUM, so the
sketch is (a) bit-exact reproducible across engines — the registered
query oracle-checks the full grid against DuckDB — (b) mergeable by
cellwise addition (union of corpora = sum of sketches), and (c) tiny
(d*w longs) regardless of corpus size.

Point estimate for a token = min over its d cells; always >= the true
count (collisions only add), within eps*N with high probability for
w >= e/eps. At 100 TB: the grid build is one map-side explode + one
groupBy of at most d*w groups — constant-size shuffle output.

Hashes reuse dedup.md5_long with per-row salts so the d rows are
independent and the DuckDB mirror is the existing md5 expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_long

CMS_DEPTH = 3
CMS_WIDTH = 64


def _row_cells(tok: Column, depth: int, width: int) -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("row_idx"),
                F.pmod(md5_long(tok, f"cms{i}"), F.lit(width))
                .cast("long")
                .alias("col_idx"),
            )
            for i in range(depth)
        ]
    )


def cms_build(
    tokens: DataFrame,
    token_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the sketch grid from a token stream: one row per non-empty
    cell, (row_idx, col_idx, cell_count)."""
    cells = tokens.select(
        F.explode(_row_cells(F.col(token_col), depth, width)).alias("c")
    )
    return (
        cells.select("c.row_idx", "c.col_idx")
        .groupBy("row_idx", "col_idx")
        .agg(F.count("*").cast("long").alias("cell_count"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Sketch of the concatenated corpora: cellwise sum."""
    return (
        a.unionByName(b)
        .groupBy("row_idx", "col_idx")
        .agg(F.sum("cell_count").cast("long").alias("cell_count"))
    )


# ---------------------------------------------------------------------------
# HDR-histogram-style quantile sketch (exact integer bucketing)
# ---------------------------------------------------------------------------
#
# DDSketch/HDR-histogram shape with an EXACT bucketing rule: instead of
# floor(log_gamma(x)) (an IEEE log whose last-ulp behaviour near bucket
# boundaries could diverge between engines), the bucket of a non-negative
# integer v is derived from its binary length — pure integer arithmetic,
# bit-identical in Spark (bin/shiftright) and any SQL oracle (printf %b,
# >>). One octave = 2^HDR_SUB_BITS sub-buckets, so the bucket lower bound
# is within a factor (1 + 2^-HDR_SUB_BITS) of the true value: guaranteed
# ~6% max relative error for HDR_SUB_BITS=4, at ~16 buckets per octave.
#
#   v < 16           -> bucket_id = v (exact singleton buckets)
#   v >= 16, e=bitlen(v)-1, s=e-4 -> bucket_id = 16*s + (v >> s)
#
# ids are monotone in v, so quantiles come from a cumulative sum over
# bucket_id order. The grid is mergeable by cellwise count addition —
# union of datasets = sum of sketches — which is what makes it a sketch
# rather than a full sort at 100 TB: the shuffle output is bounded by
# 16 buckets/octave * 63 octaves regardless of input size.

HDR_SUB_BITS = 4
HDR_BASE = 1 << HDR_SUB_BITS  # 16


def hdr_bucket_id(values: DataFrame, value_col: str = "v") -> DataFrame:
    """Tag each non-negative integer value with its sketch bucket id.
    Exact integer arithmetic only (bitlen via bin-string length + shift).
    """
    e = (F.length(F.bin(F.col(value_col))) - 1).cast("long")
    tagged = values.select(F.col(value_col).alias("v")).withColumn("e", e)
    return tagged.withColumn(
        "bucket_id",
        F.when(F.col("v") < HDR_BASE, F.col("v")).otherwise(
            HDR_BASE * (F.col("e") - HDR_SUB_BITS)
            + F.expr(f"shiftright(v, cast(e - {HDR_SUB_BITS} as int))")
        ),
    ).select("v", "bucket_id")


def hdr_build(values: DataFrame, value_col: str = "v") -> DataFrame:
    """Sketch grid: (bucket_id, bucket_count). Map-side partial agg
    collapses to <= 16 buckets/octave before the (tiny) shuffle."""
    return (
        hdr_bucket_id(values, value_col)
        .groupBy("bucket_id")
        .agg(F.count("*").cast("long").alias("bucket_count"))
    )


def hdr_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Sketch of the concatenated datasets: cellwise count sum."""
    return (
        a.unionByName(b)
        .groupBy("bucket_id")
        .agg(F.sum("bucket_count").cast("long").alias("bucket_count"))
    )


def hdr_rep_expr(bucket_col: str = "bucket_id") -> Column:
    """Bucket representative (exact lower bound of the bucket's value
    range): id itself below 16, else (id - 16*s) << s with s = id//16 - 1.
    """
    b = F.col(bucket_col)
    return F.when(b < HDR_BASE, b).otherwise(
        F.expr(
            f"shiftleft({bucket_col} - {HDR_BASE} * (({bucket_col} div {HDR_BASE}) - 1), "
            f"cast(({bucket_col} div {HDR_BASE}) - 1 as int))"
        )
    )


def hdr_quantiles(
    values: DataFrame,
    value_col: str = "v",
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Quantile estimates from the sketch: for each q, the representative
    of the first bucket whose cumulative count reaches ceil(q * N).
    Guaranteed within one bucket width (~2^-HDR_SUB_BITS relative) of the
    exact quantile.

    Scale shape: the ONLY full-data pass is hdr_build's bounded groupBy.
    The total count N comes from an unbounded frame in the SAME
    single-partition window stage as the cumulative sum (computing N as
    a separate values.agg() would re-scan the full input — the plan had
    two parquet scans until this was fused), so everything after the
    grid groupBy runs on <= ~1000 rows: window, a per-bucket explode of
    the q list, and a final tiny groupBy. No joins at all.
    """
    buckets = hdr_build(values, value_col)
    from pyspark.sql import Window

    w_cum = Window.orderBy("bucket_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("bucket_id").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = buckets.select(
        "bucket_id",
        F.sum("bucket_count").over(w_cum).alias("cum"),
        F.sum("bucket_count").over(w_all).cast("long").alias("n"),
    )
    est = (
        cum.select(
            "bucket_id",
            "cum",
            F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
            F.col("n"),
        )
        .withColumn("target_rank", F.ceil(F.col("q") * F.col("n")).cast("long"))
        .filter(F.col("cum") >= F.col("target_rank"))
        .groupBy("q", "target_rank")
        .agg(F.min("bucket_id").alias("bucket_id"))
    )
    return est.select(
        "q", "target_rank", hdr_rep_expr().cast("long").alias("est_value")
    )


def hdr_group_quantiles(
    values: DataFrame,
    group_col: str,
    value_col: str = "v",
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-group quantile estimates from per-group sketch grids — the
    scalable replacement for per-group sorts: a window-rank exact
    quantile sorts every group's full value list, while this reduces
    each group to <= ~1000 bucket counts first. With millions of groups
    at 100 TB the full-data shuffle carries (group, bucket_id) keyed
    counts after map-side partial agg; the window stage partitioned by
    group then runs on grid rows only.

    Output: (group_col, q, target_rank, est_value) per group x q.
    """
    from pyspark.sql import Window

    e = (F.length(F.bin(F.col(value_col))) - 1).cast("long")
    tagged = values.select(
        group_col, F.col(value_col).alias("v")
    ).withColumn("e", e)
    bucketed = tagged.withColumn(
        "bucket_id",
        F.when(F.col("v") < HDR_BASE, F.col("v")).otherwise(
            HDR_BASE * (F.col("e") - HDR_SUB_BITS)
            + F.expr(f"shiftright(v, cast(e - {HDR_SUB_BITS} as int))")
        ),
    )
    buckets = bucketed.groupBy(group_col, "bucket_id").agg(
        F.count("*").cast("long").alias("bucket_count")
    )
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy("bucket_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = (
        Window.partitionBy(group_col)
        .orderBy("bucket_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    cum = buckets.select(
        group_col,
        "bucket_id",
        F.sum("bucket_count").over(w_cum).alias("cum"),
        F.sum("bucket_count").over(w_all).cast("long").alias("n"),
    )
    est = (
        cum.select(
            group_col,
            "bucket_id",
            "cum",
            F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
            F.col("n"),
        )
        .withColumn("target_rank", F.ceil(F.col("q") * F.col("n")).cast("long"))
        .filter(F.col("cum") >= F.col("target_rank"))
        .groupBy(group_col, "q", "target_rank")
        .agg(F.min("bucket_id").alias("bucket_id"))
    )
    return est.select(
        group_col,
        "q",
        "target_rank",
        hdr_rep_expr().cast("long").alias("est_value"),
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    token_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate counts for probe tokens: min over the token's d
    cells (missing cell -> 0). The sketch side is d*w rows at most —
    always broadcastable."""
    probe_cells = probes.select(
        token_col, F.explode(_row_cells(F.col(token_col), depth, width)).alias("c")
    ).select(token_col, "c.row_idx", "c.col_idx")
    return (
        probe_cells.join(F.broadcast(sketch), ["row_idx", "col_idx"], "left")
        .groupBy(token_col)
        .agg(
            F.min(F.coalesce(F.col("cell_count"), F.lit(0)))
            .cast("long")
            .alias("est_count")
        )
    )


# --- Bloom filter -----------------------------------------------------------

BLOOM_BITS = 1 << 14  # 16384 bits, stored 63 per word (see below)
BLOOM_HASHES = 4
# 63 usable bits per word, not 64: bit index 63 would need 1 << 63,
# which overflows signed-BIGINT engines that check (DuckDB) — and the
# sign bit buys nothing at this sketch size.
BLOOM_WORD_BITS = 63


def _bloom_positions(key: Column, n_hashes: int, m_bits: int) -> list[Column]:
    """The k bit positions of a key — independent salted md5_long hashes,
    portable to any engine that can mirror the md5 expression."""
    return [md5_long(key, f"bf{i}") % F.lit(m_bits) for i in range(n_hashes)]


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_BITS,
    n_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """Build a Bloom filter as (word_idx BIGINT, word BIGINT) rows.

    Each key contributes its k bit positions (exploded map-side); the
    only shuffle is a groupBy over at most m_bits/64 word groups — the
    sketch is constant-size no matter how many keys went in, and two
    filters over the same (m, k) merge by word-wise BIT_OR (set union).
    Words with no set bits are absent (sparse representation).
    """
    pos = F.explode(
        F.array(*_bloom_positions(F.col(key_col).cast("string"), n_hashes, m_bits))
    ).alias("_pos")
    return (
        keys.select(pos)
        # a NULL member key hashes to NULL positions — without this filter
        # the build emits a (NULL, NULL) word row that crashes the literal
        # probe's int() loop; NULL keys are simply not members
        .filter(F.col("_pos").isNotNull())
        .select(
            # integer DIV/% (never a double division + cast: DuckDB casts
            # round, not floor); shiftleft by a COLUMN needs the SQL form
            F.expr(f"_pos DIV {BLOOM_WORD_BITS}").alias("word_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(_pos % {BLOOM_WORD_BITS} AS INT))"
            ).alias("_bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_bit").alias("word"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union of two same-shape Bloom filters: word-wise BIT_OR."""
    return (
        a.unionByName(b)
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )


def bloom_probe(
    probes: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_BITS,
    n_hashes: int = BLOOM_HASHES,
    out_col: str = "might_contain",
) -> DataFrame:
    """Membership test: adds ``out_col`` (boolean; false negatives never,
    false positives at the usual Bloom rate).

    Each probe row explodes to its k positions, equi-joins the (tiny,
    broadcast) word table on word_idx, and counts positions whose bit is
    set — might_contain iff all k are. The probe side never shuffles
    beyond the per-key count aggregate; at scale this is the classic
    pre-join pruning filter that drops most of a fact table before an
    expensive shuffle join.
    """
    key = F.col(key_col).cast("string")
    ex = probes.select(
        key_col,
        F.explode(F.array(*_bloom_positions(key, n_hashes, m_bits))).alias("_pos"),
    ).select(
        key_col,
        F.expr(f"_pos DIV {BLOOM_WORD_BITS}").alias("word_idx"),
        F.expr(f"CAST(_pos % {BLOOM_WORD_BITS} AS INT)").alias("_bit"),
    )
    hits = (
        ex.join(F.broadcast(bloom), "word_idx", "left")
        .select(
            key_col,
            F.expr(
                "CAST((shiftright(coalesce(word, CAST(0 AS BIGINT)), _bit) & 1) = 1"
                " AS INT)"
            ).alias("_hit"),
        )
        .groupBy(key_col)
        # every exploded position row must hit — phrased as sum == count
        # so DUPLICATE probe keys stay correct (a key occurring r times
        # contributes r * n_hashes rows; "== n_hashes" would flip both
        # ways for r > 1 — caught by the 10x stress run)
        .agg((F.sum("_hit") == F.count(F.lit(1))).alias(out_col))
    )
    joined = probes.join(hits, key_col, "left")
    # a NULL probe key hashes to NULL positions and can never be a
    # member — answer False, not NULL (the boolean contract)
    return joined.withColumn(out_col, F.coalesce(F.col(out_col), F.lit(False)))


def bloom_sql_positions(key_expr: str, n_hashes: int = BLOOM_HASHES, m_bits: int = BLOOM_BITS) -> list[str]:
    """DuckDB mirrors of ``_bloom_positions`` over a SQL expression."""
    return [
        f"(('0x' || substr(md5({key_expr} || 'bf{i}'), 1, 15))::BIGINT % {m_bits})"
        for i in range(n_hashes)
    ]


def bloom_probe_literal(
    probes: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_BITS,
    n_hashes: int = BLOOM_HASHES,
    out_col: str = "might_contain",
) -> DataFrame:
    """Map-side membership test: the word table (at most
    m_bits/BLOOM_WORD_BITS + 1 longs — a few KB) collects to the driver
    once and bakes into the plan as a dense literal array, so the probe
    is a pure scalar expression per row: no explode, no join, no
    shuffle. This is the true pre-join pruning form at 100 TB (the
    filter rides inside the fact table's scan stage); use
    ``bloom_probe`` when m_bits is too large to broadcast as literals.

    The bounded driver read is the same class as the k-means
    convergence read — O(sketch), never O(data).
    """
    n_words = m_bits // BLOOM_WORD_BITS + 1
    dense = [0] * n_words
    for r in bloom.collect():  # bounded: sketch-sized
        if r["word_idx"] is None or r["word"] is None:
            continue  # legacy sketch built before the NULL-key filter
        if not 0 <= int(r["word_idx"]) < n_words:
            raise ValueError(
                f"bloom word_idx {r['word_idx']} out of range for m_bits="
                f"{m_bits} ({n_words} words) — probe called with a "
                "different m_bits than the sketch was built with"
            )
        dense[int(r["word_idx"])] = int(r["word"])
    # one array Literal (constant-folded), NOT F.array(*lits) — a
    # CreateArray of hundreds of literals is re-built per input row
    arr = F.lit(dense).cast("array<bigint>")
    key = F.col(key_col).cast("string")
    out = probes.withColumn("_bw", arr)
    for i, pos in enumerate(_bloom_positions(key, n_hashes, m_bits)):
        out = out.withColumn(f"_p{i}", pos)
    cond = " AND ".join(
        f"(shiftright(element_at(_bw, CAST(_p{i} DIV {BLOOM_WORD_BITS} AS INT) + 1),"
        f" CAST(_p{i} % {BLOOM_WORD_BITS} AS INT)) & 1) = 1"
        for i in range(n_hashes)
    )
    return out.withColumn(
        out_col, F.coalesce(F.expr(cond), F.lit(False))
    ).drop("_bw", *[f"_p{i}" for i in range(n_hashes)])


# --- KMV (k-minimum-values) distinct sketch ---------------------------------

KMV_K = 64
KMV_SPACE = 1 << 60  # md5_long range


def kmv_sketch(
    df: DataFrame, group_col: str, key_col: str, k: int = KMV_K
) -> DataFrame:
    """Per-group KMV distinct sketch: the k smallest distinct 60-bit key
    hashes. Mergeable (union = k smallest of the concatenation) and —
    unlike the opaque HLL binary — exact integers end to end, so any
    SQL engine reproduces the sketch AND the estimate bit-for-bit.

    Estimator: when a group holds fewer than k distinct hashes the
    count is exact; otherwise DV ~= (k - 1) * SPACE / kth_min — the
    classic KMV unbiased form, computed as one integer division.

    Shape: distinct -> per-group bottom-k via a rank window (compiles
    to WindowGroupLimit: each partition keeps k rows per group before
    the exchange) -> per-group max+count. No per-group full sort, no
    collect; state is O(k) per group forever.
    """
    return kmv_estimate(kmv_bottom(df, group_col, key_col, k), k)


def kmv_bottom(
    df: DataFrame, group_col: str, key_col: str, k: int = KMV_K
) -> DataFrame:
    """The sketch STATE: per-group k smallest distinct key hashes as
    (group, h) rows — what gets persisted and merged."""
    from pyspark.sql import Window

    hashed = (
        df.select(
            F.col(group_col),
            md5_long(F.col(key_col).cast("string"), "kmv").alias("_h"),
        )
        # NULL keys hash to NULL; Spark sorts NULLs FIRST ascending while
        # SQL engines commonly sort them LAST — drop them outright to
        # match count-distinct's null-ignoring semantics on both engines
        .filter(F.col("_h").isNotNull())
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy(F.col("_h").asc())
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(group_col, "_h")
    )


def kmv_merge(a: DataFrame, b: DataFrame, group_col: str, k: int = KMV_K) -> DataFrame:
    """Union of two KMV states: the k smallest of the combined distinct
    hash sets — identical to sketching the unioned input directly
    (property-tested), so shards/streams sketch independently and merge."""
    from pyspark.sql import Window

    u = a.unionByName(b).filter(F.col("_h").isNotNull()).distinct()
    w = Window.partitionBy(group_col).orderBy(F.col("_h").asc())
    return (
        u.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(group_col, "_h")
    )


def kmv_estimate(bottom: DataFrame, k: int = KMV_K) -> DataFrame:
    """Estimate from a KMV state (see kmv_sketch for the math)."""
    group_col = [c for c in bottom.columns if c != "_h"][0]
    return bottom.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_kept"),
        F.max("_h").cast("long").alias("kth_min"),
    ).select(
        group_col,
        "n_kept",
        "kth_min",
        F.when(F.col("n_kept") < k, F.col("n_kept"))
        .otherwise(
            # explicit floor: a bare decimal -> BIGINT cast truncates in
            # Spark but rounds in DuckDB — pin the floor in the expression
            F.expr(
                f"CAST(floor(({k} - 1) * CAST({KMV_SPACE} AS DECIMAL(38,0))"
                " / kth_min) AS BIGINT)"
            )
        )
        .alias("dv_estimate"),
    )


# --- HyperLogLog distinct sketch (exact-integer registers & estimator) ------
#
# The classic HLL (Flajolet et al. 2007) with every engine-divergent
# piece made exact-integer so the DuckDB oracle reproduces the SKETCH
# and the ESTIMATE bit-for-bit (the same discipline as KMV above —
# unlike library HLLs whose register binaries are opaque):
#
#   * register index  = h % m            (low p bits of the 60-bit md5 hash)
#   * rho             = Q - bitlen(h//m) (leading-zero rank of the high
#                       51 bits, Q = 60 - p + 1; bitlen via length(bin()),
#                       pure integer — no floating log)
#   * harmonic sum    = sum 2^-M_j kept as the SCALED integer
#                       S = sum 2^(Q - M_j) + V * 2^Q  (V = empty
#                       registers); max m * 2^Q = 2^61 < BIGINT
#   * raw estimate    = floor(alpha_m * m^2 * 2^Q / S) with the
#                       numerator folded into ONE 21-digit decimal
#                       constant computed here and interpolated into
#                       both engines' expressions
#   * linear counting (raw <= 2.5m and V > 0) = round(m * ln(m/V)),
#                       precomputed for all m possible V values into a
#                       shared literal array — no runtime ln anywhere,
#                       so last-ulp libm differences cannot split engines
#
# Register state is (group, reg_idx, reg_max): mergeable by MAX — union
# of corpora = cellwise max — and O(m) per group forever. At 100 TB the
# build is one map-side projection + a groupBy whose output is bounded
# by m rows per group (the same constant-size-shuffle shape as CMS).
# Standard error ~1.04/sqrt(m) = 4.6% at p=9.

import math as _math

HLL_P = 9
HLL_M = 1 << HLL_P  # 512 registers
HLL_HASH_BITS = 60  # md5_long range
HLL_Q = HLL_HASH_BITS - HLL_P + 1  # max rho = 52
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# floor(alpha * 2^(2p + Q)) — the whole numerator alpha * m^2 * 2^Q
HLL_ALPHA_NUM = _math.floor(_HLL_ALPHA * (1 << (2 * HLL_P + HLL_Q)))
# linear-counting table: LC[v] = round(m * ln(m / v)), v = 1..m
HLL_LC = [int(round(HLL_M * _math.log(HLL_M / v))) for v in range(1, HLL_M + 1)]
HLL_LC_THRESHOLD = 5 * HLL_M // 2  # raw <= 2.5m -> try linear counting


def hll_registers(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """Per-group HLL register state (group, reg_idx, reg_max). NULL keys
    are not members (count-distinct semantics), mirroring KMV."""
    hashed = df.select(
        F.col(group_col),
        md5_long(F.col(key_col).cast("string"), "hll").alias("_h"),
    ).filter(F.col("_h").isNotNull())
    w = F.expr(f"_h DIV {HLL_M}")
    rho = (
        F.when(w == F.lit(0), F.lit(HLL_Q))
        .otherwise(F.lit(HLL_Q) - F.length(F.bin(w)).cast("int"))
        .cast("int")
    )
    return (
        hashed.select(
            group_col,
            (F.col("_h") % HLL_M).cast("long").alias("reg_idx"),
            rho.alias("rho"),
        )
        .groupBy(group_col, "reg_idx")
        .agg(F.max("rho").alias("reg_max"))
    )


def hll_merge(a: DataFrame, b: DataFrame, group_col: str) -> DataFrame:
    """Union of two register states: cellwise MAX — identical to
    sketching the concatenated inputs (property-tested)."""
    return (
        a.unionByName(b)
        .groupBy(group_col, "reg_idx")
        .agg(F.max("reg_max").alias("reg_max"))
    )


def hll_estimate(registers: DataFrame, group_col: str) -> DataFrame:
    """Estimate from a register state: (group, v_zero, s_scaled,
    dv_estimate) — see the header comment for the exact-integer math."""
    two_q = 1 << HLL_Q
    agg = registers.groupBy(group_col).agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({HLL_Q} - reg_max AS INT))")
        )
        .cast("long")
        .alias("_s_present"),
        F.count("*").cast("long").alias("_n_present"),
    )
    based = agg.select(
        group_col,
        (F.lit(HLL_M) - F.col("_n_present")).cast("long").alias("v_zero"),
        (F.col("_s_present") + (F.lit(HLL_M) - F.col("_n_present")) * F.lit(two_q))
        .cast("long")
        .alias("s_scaled"),
    )
    raw = F.expr(
        f"CAST(floor(CAST('{HLL_ALPHA_NUM}' AS DECIMAL(38,0)) / s_scaled) AS BIGINT)"
    )
    # one array Literal (constant-folded), same as bloom_probe_literal
    lc = F.try_element_at(
        F.lit(HLL_LC).cast("array<bigint>"), F.col("v_zero").cast("int")
    )
    return based.select(
        group_col,
        "v_zero",
        "s_scaled",
        F.when((F.col("v_zero") > 0) & (raw <= F.lit(HLL_LC_THRESHOLD)), lc)
        .otherwise(raw)
        .cast("long")
        .alias("dv_estimate"),
    )


def hll_sketch(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """Per-group HLL distinct estimate in one call (build + estimate)."""
    return hll_estimate(hll_registers(df, group_col, key_col), group_col)
