"""One-off profiler: run the bucketed LSH pair stage on a scaled corpus
and print per-stage executor CPU so the dominant cost is measured, not
guessed. Usage: python tools/profile_lsh.py [K]."""

from __future__ import annotations

import json
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from kaspi_etl_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    spark = get_spark(
        "profile-lsh",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4062"},
    )
    from kaspi_etl_spark.llm import similarity as sim
    from tools.stress_curve import scaled_union

    emb0 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )

    def rot(df, i):
        s, flip = i % 63, i >= 63
        v = F.col("v")
        if flip:
            v = F.reverse(v)
        if s:
            v = F.concat(F.slice(v, s + 1, 64 - s), F.slice(v, 1, s))
        return df.withColumn("v", v)

    emb = scaled_union(emb0, k, "vec_id", 10_000_000, rot).localCheckpoint()
    n = emb.count()
    print(f"# corpus: {n} vectors")

    pairs = sim.cosine_near_dup_pairs_bucketed(
        emb, threshold=0.99, id_col="vec_id", vec_col="v", dim=64
    )
    # also surface the intermediate candidate volume
    print("# pairs:", pairs.count())

    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    stages = json.load(urllib.request.urlopen(url, timeout=10))
    stages.sort(key=lambda s: -s.get("executorCpuTime", 0))
    for s in stages[:12]:
        print(
            json.dumps(
                {
                    "stage": s["stageId"],
                    "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 1),
                    "wall_s": round(s.get("executorRunTime", 0) / 1e3, 1),
                    "in": s.get("inputRecords", 0),
                    "shuffle_read": s.get("shuffleReadRecords", 0),
                    "shuffle_write": s.get("shuffleWriteRecords", 0),
                    "out": s.get("outputRecords", 0),
                    "name": (s.get("name") or "")[:80],
                }
            )
        )


if __name__ == "__main__":
    main()
