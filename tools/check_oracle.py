"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark at sf0.01 and the matching
``oracle_sql()`` on DuckDB over the same parquet, then compares row count,
column names, and an order-insensitive value comparison (exact for
ints/strings, tight tolerance report for floats so we can see how close the
deterministic-arithmetic discipline gets us — the goal is bit-exact).

Usage: python tools/check_oracle.py [--sf DIR] [query ...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    """Sort columns by name, then rows; stringify values canonically."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def canon(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return repr(v)
        if isinstance(v, bool):
            return str(v)
        return str(v)

    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(name: str, spark_df, con) -> dict:
    from kaspi_etl_spark import registry  # noqa: F401

    t0 = time.time()
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    t_spark = time.time() - t0
    import __spark_entry__ as entrymod

    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        return {"name": name, "status": "rows_only", "rows": len(s_rows), "spark_sec": round(t_spark, 2)}
    t0 = time.time()
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    t_duck = time.time() - t0

    result = {
        "name": name,
        "rows": len(s_rows),
        "oracle_rows": len(d_rows),
        "spark_sec": round(t_spark, 2),
        "duck_sec": round(t_duck, 2),
    }
    if sorted(s_cols) != sorted(d_cols):
        result["status"] = "SCHEMA_MISMATCH"
        result["spark_cols"] = sorted(s_cols)
        result["duck_cols"] = sorted(d_cols)
        return result
    if len(s_rows) != len(d_rows):
        result["status"] = "ROWCOUNT_MISMATCH"
        return result
    sn = normalize(s_rows, s_cols)
    dn = normalize(d_rows, d_cols)
    if sn == dn:
        result["status"] = "OK"
    else:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b]
        result["status"] = "VALUE_MISMATCH"
        result["n_diff"] = len(diffs)
        result["first_diff"] = diffs[0] if diffs else None
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--json", help="write per-query results as a JSON file")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from kaspi_etl_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duck_con(args.sf)
    qs = entrymod.queries()
    names = args.queries or list(qs)
    failures = 0
    results = []
    for name in names:
        if name not in qs:
            print(f"{name}: NOT REGISTERED")
            failures += 1
            continue
        try:
            df = qs[name](spark, args.sf)
            r = compare(name, df, con)
        except Exception as e:  # noqa: BLE001
            r = {"name": name, "status": "ERROR", "error": str(e)[:2000]}
        ok = r.get("status") in ("OK", "rows_only")
        failures += 0 if ok else 1
        results.append(r)
        print(r)
    print(f"\n{len(names) - failures}/{len(names)} passed")
    if args.json:
        import json

        payload = {
            "sf_dir": args.sf,
            "passed": len(names) - failures,
            "total": len(names),
            "results": results,
        }
        Path(args.json).write_text(json.dumps(payload, indent=1, default=str) + "\n")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
