"""Dress rehearsal of the external driver's correctness gate.

The driver runs the FIRST 50 entries of ``__spark_entry__.queries()`` on
a VANILLA SparkSession (none of session.py's confs — notably no
InferFiltersFromGenerate exclusion and no pinned UTC timezone) and
compares against ``oracle_sql()`` on DuckDB at sf0.01. This script does
exactly that, so a gate rotation or a session-conf-dependent bug is
caught BEFORE the round ends.

Usage: python tools/gate_rehearsal.py [--sf DIR] [--n N]
"""

from __future__ import annotations

import argparse
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def canon(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    return str(v)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--n", type=int, default=50)
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    names = list(qs)[: args.n]
    failures = []
    for name in names:
        try:
            df = qs[name](spark, args.sf)
            # The DRIVER canonicalizes with pandas sort_values per
            # column, which raises "unhashable type: 'list'" on
            # array/map/struct cells (the r6 embeddings_int8_codes red
            # gate). This rehearsal's tuple-sort would survive them, so
            # enforce the driver's real constraint explicitly: gated
            # queries emit SCALAR columns only.
            complex_cols = [
                f.name
                for f in df.schema.fields
                if f.dataType.typeName() in ("array", "map", "struct")
            ]
            if complex_cols:
                raise TypeError(
                    f"non-scalar gate columns {complex_cols}: the driver "
                    "harness cannot canonicalize them — posexplode or emit "
                    "a scalar image (see embeddings_int8_codes)"
                )
            cols = df.columns
            order = sorted(range(len(cols)), key=lambda i: cols[i])
            s_rows = sorted(
                tuple(canon(r[i]) for i in order)
                for r in (tuple(x) for x in df.collect())
            )
            if name not in oracles:
                print(f"{name}: rows-only ({len(s_rows)} rows)")
                continue
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
            o_rows = sorted(
                tuple(canon(r[i]) for i in oorder) for r in res.fetchall()
            )
            ok = (
                len(s_rows) == len(o_rows)
                and sorted(cols) == sorted(ocols)
                and s_rows == o_rows
            )
            print(f"{name}: {'OK' if ok else 'MISMATCH'} ({len(s_rows)} rows)")
            if not ok:
                failures.append(name)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {str(e)[:200]}")
            failures.append(name)
    print(f"\n{len(names) - len(failures)}/{len(names)} green; failures: {failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
