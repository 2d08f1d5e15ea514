"""Z-order layout: interleave correctness and the pruning property the
clustering exists for (narrow per-file min/max on every keyed column)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from kaspi_etl_spark import layout


def test_zorder_value_interleaves_bits(spark):
    df = spark.range(1).select(
        layout.zorder_value([F.lit(3), F.lit(1)], bits=2).alias("z"),
        layout.zorder_value([F.lit(0b101), F.lit(0b011)], bits=3).alias("z2"),
    )
    row = df.collect()[0]
    # x=0b11 -> bits at positions 0,2; y=0b01 -> bit at position 1
    assert row["z"] == 0b111
    # x=0b101 -> positions 0,4; y=0b011 -> positions 1,3
    assert row["z2"] == 0b11011


def test_zorder_sql_mirrors_column_form(spark, sf_dir):
    import duckdb

    expr = layout.zorder_sql(["x", "y"], 5)
    got = duckdb.sql(
        f"SELECT {expr} AS z FROM (SELECT 21 AS x, 13 AS y)"
    ).fetchone()[0]
    want = (
        spark.range(1)
        .select(layout.zorder_value([F.lit(21), F.lit(13)], 5).alias("z"))
        .collect()[0]["z"]
    )
    assert got == want


def _file_ranges(path: str, col: str) -> list[tuple[int, int]]:
    out = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        schema_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        i = schema_idx[col]
        lo = min(md.row_group(g).column(i).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(i).statistics.max for g in range(md.num_row_groups))
        out.append((lo, hi))
    return out


def test_write_zordered_narrows_file_ranges(spark, tmp_path):
    n = 1 << 14
    # two independent uniform keys in shuffled row order (domain 2^12)
    df = spark.range(n).select(
        ((F.col("id") * 2654435761) % (1 << 12)).alias("a"),
        ((F.col("id") * 40503) % (1 << 12)).alias("b"),
    )
    plain, zpath = str(tmp_path / "plain"), str(tmp_path / "zord")
    df.repartition(64).write.parquet(plain)
    # 64 z-range files over a 2-D curve -> every file is a ~512-wide
    # tile in BOTH dimensions (an 8-file split would only halve one)
    layout.write_zordered(df, zpath, ["a", "b"], bits=12, num_files=64)

    # same rows either way
    back = spark.read.parquet(zpath)
    assert back.count() == n
    assert (
        back.selectExpr("sum(a) s", "sum(b) t").collect()
        == df.selectExpr("sum(a) s", "sum(b) t").collect()
    )

    def avg_width(path, col):
        rngs = _file_ranges(path, col)
        return sum(hi - lo for lo, hi in rngs) / len(rngs)

    # BOTH columns get narrow per-file ranges under z-order; a random
    # layout leaves every file covering nearly the full domain
    for col in ("a", "b"):
        assert avg_width(zpath, col) < 0.25 * avg_width(plain, col), col


def test_write_zordered_prunes_row_groups(spark, tmp_path):
    n = 1 << 14
    df = spark.range(n).select(
        ((F.col("id") * 2654435761) % (1 << 12)).alias("a"),
        ((F.col("id") * 40503) % (1 << 12)).alias("b"),
    )
    zpath = str(tmp_path / "zord")
    layout.write_zordered(df, zpath, ["a", "b"], bits=12, num_files=64)
    # a selective filter on the SECOND column must touch a minority of files
    lo, hi = 100, 200
    touched = [
        1
        for (flo, fhi) in _file_ranges(zpath, "b")
        if not (fhi < lo or flo > hi)
    ]
    assert len(touched) <= 16  # of 64 files
    got = spark.read.parquet(zpath).filter(F.col("b").between(lo, hi)).count()
    assert got == df.filter(F.col("b").between(lo, hi)).count()


# --- Hilbert curve -----------------------------------------------------------


def _xy2d_textbook(n_bits, x, y):
    """Independent Wikipedia-form implementation — the parity anchor
    for the byte-DFA."""
    d = 0
    s = 1 << (n_bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_dfa_matches_textbook():
    import random

    rng = random.Random(99)
    for _ in range(5000):
        x, y = rng.randrange(1 << 16), rng.randrange(1 << 16)
        assert layout.hilbert_xy2d_int(x, y) == _xy2d_textbook(16, x, y)
    # corners
    for x, y in [(0, 0), (65535, 65535), (0, 65535), (65535, 0)]:
        assert layout.hilbert_xy2d_int(x, y) == _xy2d_textbook(16, x, y)


def test_hilbert_full_grid_is_adjacent_bijection():
    """The defining locality property: sorting the full 32x32 grid by
    curve index yields a path where every consecutive pair is one
    Manhattan step apart, visiting every cell exactly once."""
    pts = sorted(
        (layout.hilbert_xy2d_int(x, y), x, y)
        for x in range(32)
        for y in range(32)
    )
    assert [p[0] for p in pts] == list(range(1024))  # bijection onto 0..1023
    assert all(
        abs(a[1] - b[1]) + abs(a[2] - b[2]) == 1 for a, b in zip(pts, pts[1:])
    )


def test_hilbert_column_matches_python_mirror(spark):
    df = spark.range(500).select(
        ((F.col("id") * 2654435761) % (1 << 16)).alias("x"),
        ((F.col("id") * 40503) % (1 << 16)).alias("y"),
    )
    got = df.select(
        "x", "y", layout.hilbert_value(F.col("x"), F.col("y")).alias("h")
    ).collect()
    for r in got:
        assert r["h"] == layout.hilbert_xy2d_int(r["x"], r["y"])


def test_hilbert_sql_mirrors_column_form(spark):
    import duckdb

    expr = layout.hilbert_sql("x", "y", 8)
    got = duckdb.sql(
        f"WITH h AS ({layout.sql_hilbert_lut_cte()}) "
        f"SELECT {expr.replace('{TL}', 'h.tl').replace('{DL}', 'h.dl')} AS d "
        "FROM (SELECT 173 AS x, 91 AS y) CROSS JOIN h"
    ).fetchone()[0]
    want = (
        spark.range(1)
        .select(layout.hilbert_value(F.lit(173), F.lit(91), 8).alias("d"))
        .collect()[0]["d"]
    )
    assert got == want == layout.hilbert_xy2d_int(173, 91, 8)


def test_write_hilbert_narrows_file_ranges_at_least_as_much_as_zorder(
    spark, tmp_path
):
    """Hilbert clustering must deliver the same pruning property as
    Z-order (narrow per-file min/max on BOTH keys vs a random layout);
    on average its tiles are at least as tight."""
    n = 1 << 14
    df = spark.range(n).select(
        ((F.col("id") * 2654435761) % (1 << 12)).alias("a"),
        ((F.col("id") * 40503) % (1 << 12)).alias("b"),
    )
    plain = str(tmp_path / "plain")
    hpath = str(tmp_path / "hilb")
    df.repartition(64).write.parquet(plain)
    layout.write_hilbert(df, hpath, "a", "b", bits=12, num_files=64)

    back = spark.read.parquet(hpath)
    assert back.count() == n
    assert (
        back.selectExpr("sum(a) s", "sum(b) t").collect()
        == df.selectExpr("sum(a) s", "sum(b) t").collect()
    )

    def avg_width(path, col):
        rngs = _file_ranges(path, col)
        return sum(hi - lo for lo, hi in rngs) / len(rngs)

    for col in ("a", "b"):
        assert avg_width(hpath, col) < 0.25 * avg_width(plain, col), col
