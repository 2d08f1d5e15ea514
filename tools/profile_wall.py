"""Wall-time attribution for one query — where do the seconds go?

Splits a query's wall into: DataFrame build (py4j + analysis),
`explain` (optimizer + physical planning), and action execution; then
lists every stage of the action with task count, executor run/cpu time,
and launch gaps (scheduling/driver latency between stages).

Usage:
  python tools/profile_wall.py [--sf DIR] [--runs 2] [--action noop|count] q [q ...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _stages(spark):
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as resp:
        return json.load(resp)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--action", choices=["noop", "count"], default="noop")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from kaspi_etl_spark.registry import QUERIES
    from kaspi_etl_spark.session import get_spark

    spark = get_spark(
        "profile_wall",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.codegen.cache.maxEntries": "100000",
        },
    )
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()

    for name in args.queries:
        fn = QUERIES[name]
        for r in range(args.runs):
            seen = {s["stageId"] for s in _stages(spark)}
            t0 = time.time()
            df = fn(spark, args.sf)
            t1 = time.time()
            df.explain("cost")  # force optimization w/o execution
            t2 = time.time()
            if args.action == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            t3 = time.time()
            new = [s for s in _stages(spark) if s["stageId"] not in seen]
            new.sort(key=lambda s: s.get("firstTaskLaunchedTime", ""))
            print(
                f"\n=== {name} run{r}: build {t1-t0:.2f}s "
                f"optimize {t2-t1:.2f}s execute {t3-t2:.2f}s "
                f"total {t3-t0:.2f}s | {len(new)} stages"
            )
            for s in new:
                rt = s.get("executorRunTime", 0) / 1e3
                ct = s.get("executorCpuTime", 0) / 1e9
                print(
                    f"  stage {s['stageId']:>5} tasks {s['numCompleteTasks']:>4} "
                    f"run {rt:6.2f}s cpu {ct:6.2f}s  sub {s.get('submissionTime','')[11:23]} "
                    f"launch {s.get('firstTaskLaunchedTime','')[11:23]} "
                    f"done {s.get('completionTime','')[11:23]} {s.get('name','')[:60]}"
                )


if __name__ == "__main__":
    main()
