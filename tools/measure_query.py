"""Isolated per-query measurement — the guide-§1 loop in one command.

For each named query: run it R times through the NOOP sink (computes
every column of every row, no driver serialization — guide §1.4), record
wall + executor-CPU seconds per run, and optionally dump the formatted
physical plan to a file (for plans/r11/<q>_before|after.txt).

Usage:
  python tools/measure_query.py [--sf DIR] [--runs 3] [--plans-dir plans/r11]
                                [--suffix before] [--action noop|count] q [q ...]

Prints one line per run and a per-query min summary. Separate from
bench.py on purpose: bench.py is the driver's comparable artifact
(count() action, interleaved passes); this is the optimization loop's
microscope.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _cpu_sec(spark) -> float | None:
    try:
        base = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        url = f"{base}/api/v1/applications/{app_id}/stages?status=complete"
        with urllib.request.urlopen(url, timeout=5) as resp:
            stages = json.load(resp)
        return sum(s.get("executorCpuTime", 0) for s in stages) / 1e9
    except Exception:
        return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--action", choices=["noop", "count"], default="noop")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from kaspi_etl_spark.registry import QUERIES
    from kaspi_etl_spark.session import get_spark

    spark = get_spark(
        "measure",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.codegen.cache.maxEntries": "100000",
        },
    )
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()

    summary: dict[str, dict] = {}
    for name in args.queries:
        fn = QUERIES[name]
        walls, cpus = [], []
        for r in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} run{r}")
            c0 = _cpu_sec(spark)
            t0 = time.time()
            df = fn(spark, args.sf)
            if args.action == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            wall = time.time() - t0
            c1 = _cpu_sec(spark)
            cpu = c1 - c0 if c0 is not None and c1 is not None else float("nan")
            walls.append(wall)
            cpus.append(cpu)
            print(f"{name} run{r}: wall {wall:.2f}s cpu {cpu:.2f}s", flush=True)
        spark.sparkContext.setJobDescription(None)
        summary[name] = {
            "wall_min": round(min(walls), 3),
            "cpu_min": round(min(cpus), 3),
        }
        if args.plans_dir:
            pd = Path(args.plans_dir)
            pd.mkdir(parents=True, exist_ok=True)
            df = fn(spark, args.sf)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            (pd / f"{name}_{args.suffix}.txt").write_text(txt)
    print("== summary (min over runs) ==")
    for name, s in summary.items():
        print(f"{name}: wall {s['wall_min']}s cpu {s['cpu_min']}s")


if __name__ == "__main__":
    main()
