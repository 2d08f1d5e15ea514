"""Synthesize an FK-consistent ~sf1 dataset from K shifted copies of
sf0.1 (VERDICT r9 "what's missing #4": /root/testdata tops out at sf0.1,
so the sf1 bench row is self-made).

Every copy shifts each key FAMILY by the same offset on both sides of
every foreign key (orderkey in orders AND lineitem, custkey in customer
AND orders, ...), so joins see K disjoint, internally consistent
universes — row counts scale by K while join fan-outs stay the real
per-key fan-outs. Content columns are DISTINCT across copies (vowel
permutations for text, cyclic rotations for embeddings — the
stress_curve discipline): pair-discovery operators scale in documents
instead of exploding on exact duplicates. region/nation stay fixed
(TPC-H dims are constant across scale factors).

Usage: python tools/make_sf1.py [--k 10] [--out .bigdata/sf1]
"""

from __future__ import annotations

import argparse
import itertools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from kaspi_etl_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"

O_OFF = 100_000_000  # orderkey
C_OFF = 10_000_000  # custkey
P_OFF = 10_000_000  # partkey
S_OFF = 1_000_000  # suppkey
E_OFF = 100_000_000  # event_id
U_OFF = 10_000_000  # user_id
D_OFF = 10_000_000  # doc_id
V_OFF = 10_000_000  # vec_id

SHIFTS = {
    "customer": {"c_custkey": C_OFF},
    "supplier": {"s_suppkey": S_OFF},
    "part": {"p_partkey": P_OFF},
    "orders": {"o_orderkey": O_OFF, "o_custkey": C_OFF},
    "lineitem": {"l_orderkey": O_OFF, "l_partkey": P_OFF, "l_suppkey": S_OFF},
    "events": {"event_id": E_OFF, "user_id": U_OFF},
    "documents": {"doc_id": D_OFF},
    "embeddings": {"vec_id": V_OFF},
}

VOWEL_PERMS = ["".join(p) for p in itertools.permutations("aeiou")]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default=".bigdata/sf1")
    args = ap.parse_args()
    spark = get_spark("make-sf1")
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    for t in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            str(out / f"{t}.parquet")
        )
        print(f"{t}: copied", flush=True)

    for t, shifts in SHIFTS.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for i in range(args.k):
            p = base
            for col, off in shifts.items():
                p = p.withColumn(col, F.col(col) + F.lit(i * off))
            if t == "documents":
                perm = VOWEL_PERMS[i % len(VOWEL_PERMS)]
                p = p.withColumn("text", F.translate(F.col("text"), "aeiou", perm))
            if t == "embeddings":
                s = i % 63
                if s:
                    v = F.col("embedding")
                    p = p.withColumn(
                        "embedding",
                        F.concat(F.slice(v, s + 1, 64 - s), F.slice(v, 1, s)),
                    )
            parts.append(p)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.write.mode("overwrite").parquet(str(out / f"{t}.parquet"))
        print(f"{t}: x{args.k} -> {df.count()} rows", flush=True)


if __name__ == "__main__":
    main()
