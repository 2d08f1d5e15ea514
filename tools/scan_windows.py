"""Scan every registered query's optimized logical plan for unpartitioned
Window nodes (the single-partition global-sort hazard) and print, per
query, how many such windows it has and a snippet of each window's order
spec — the input to the global plan guard's reviewed allowlist."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kaspi_etl_spark.registry import QUERIES  # noqa: E402
from kaspi_etl_spark.session import get_spark  # noqa: E402


def unpartitioned_windows(df):
    plan = df._jdf.queryExecution().optimizedPlan()
    hits = []

    def walk(node):
        if node.getClass().getSimpleName() == "Window":
            if node.partitionSpec().isEmpty():
                order = node.orderSpec().mkString(", ")
                hits.append(order[:120])
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(plan)
    return hits


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("window-scan")
    out = {}
    for name, fn in QUERIES.items():
        try:
            hits = unpartitioned_windows(fn(spark, sf))
        except Exception as e:  # noqa: BLE001
            hits = [f"ERROR: {e}"[:200]]
        if hits:
            out[name] = hits
    print(json.dumps(out, indent=1))
    print(f"\n{len(out)} queries with unpartitioned windows", file=sys.stderr)


if __name__ == "__main__":
    main()
