"""Dump per-query formatted physical plans to individual files.

Usage: python tools/dump_plan_files.py --out plans/r11 --suffix before [q ...]
With no query names: every bench HEADLINE query. Plans are built at
--sf (default sf0.1) without executing anything.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="plans/r11")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from bench import HEADLINE

    from kaspi_etl_spark.registry import QUERIES
    from kaspi_etl_spark.session import get_spark

    spark = get_spark("plan-dump")
    names = args.queries or HEADLINE
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        try:
            df = QUERIES[name](spark, args.sf)
            txt = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001
            txt = f"PLAN FAILED: {type(exc).__name__}: {exc}\n"
        (out / f"{name}_{args.suffix}.txt").write_text(txt)
        print(name, flush=True)


if __name__ == "__main__":
    main()
