"""Bulk jobs with progress counters (T6).

Reference: BUNDLE/app/api/pricebot/pricebot/bulk/route.ts:16-34 — create a
job record, process items asynchronously in chunks, increment `processed`,
mark `done`.

Spark design: the driver owns the job record; each chunk runs as a Spark
job tagged with a job group (cancelable via
``sparkContext.cancelJobGroup``). For streaming pipelines the same
progress surface comes from StreamingQueryListener instead.
"""

from __future__ import annotations

import math
import uuid
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame


@dataclass
class BulkJob:
    job_id: str
    total: int
    processed: int = 0
    status: str = "running"  # running | done | cancelled | failed
    error: str | None = None
    results: list[Any] = field(default_factory=list)

    @property
    def progress(self) -> float:
        return self.processed / self.total if self.total else 1.0


class BulkJobRunner:
    """Chunked bulk processing over a keyed DataFrame with a progress
    counter per chunk — the reference's queueMicrotask loop, with Spark
    job groups standing in for the microtask queue."""

    def __init__(self) -> None:
        self.jobs: dict[str, BulkJob] = {}

    def run(
        self,
        df: DataFrame,
        key_col: str,
        process_chunk: Callable[[DataFrame], Any],
        chunk_size: int = 100,
    ) -> BulkJob:
        """Process ``df`` in ~chunk_size-key chunks of ``key_col``.

        Chunks are hash ranges (pmod(xxhash64(key), n_chunks)) computed
        distributedly — the driver never enumerates the distinct keys,
        so a high-cardinality key column cannot blow driver memory. Only
        two scalars-per-chunk reach the driver: the bucket id and its
        exact key count (n_chunks entries, i.e. total/chunk_size — tiny
        relative to the key list the naive form would collect).
        """
        from pyspark.sql import functions as F

        spark = df.sparkSession
        keys = df.select(key_col).distinct()
        total = keys.count()
        job = BulkJob(job_id=uuid.uuid4().hex[:12], total=total)
        self.jobs[job.job_id] = job
        n_chunks = max(1, math.ceil(total / chunk_size))
        bucket = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_chunks))
        # Exact per-bucket key counts in ONE distributed agg (n_chunks
        # rows to the driver), so progress stays exact without a count
        # job per chunk.
        bucket_counts = {
            int(r["b"]): int(r["cnt"])
            for r in keys.groupBy(bucket.alias("b"))
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        try:
            for i in range(n_chunks):
                if bucket_counts.get(i, 0) == 0:
                    continue
                spark.sparkContext.setJobGroup(job.job_id, f"bulk chunk {i}", True)
                try:
                    chunk_df = df.filter(bucket == i)
                    job.results.append(process_chunk(chunk_df))
                finally:
                    # PySpark has no clearJobGroup; reset the local property
                    spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)
                job.processed += bucket_counts[i]
            job.status = "done"
        except Exception as exc:  # noqa: BLE001
            job.status = "failed"
            job.error = str(exc)[:500]
        return job

    def cancel(self, spark, job_id: str) -> None:
        spark.sparkContext.cancelJobGroup(job_id)
        if job_id in self.jobs and self.jobs[job_id].status == "running":
            self.jobs[job_id].status = "cancelled"
