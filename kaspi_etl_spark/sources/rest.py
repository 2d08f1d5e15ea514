"""REST API source/sink bridges (S10/S11).

Reference: scripts/etl_catalog_api.py:39-66 — paginated GET /products with
retry/backoff (source) and per-row POST /products/create (sink).

Spark design: the source is a driver-side fetch -> createDataFrame (the
retry policy is client behavior, not engine semantics); the sink is a
side-effecting foreachPartition with a bounded in-partition batch, so
POST fan-out scales with partitions, mirroring the reference's MAX_PAR=5
bounded queue (BUNDLE/.../offers/route.ts:142-170) via repartition(n).

The HTTP transport is injected so the pipeline is testable without a
network; the default transport needs `requests`, gated behind import-try
per the no-new-dependency rule.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _default_transport(url: str, params: dict | None = None) -> list[dict]:
    try:
        import requests  # noqa: PLC0415
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "REST source needs the `requests` package or an injected transport"
        ) from exc
    resp = requests.get(url, params=params, timeout=30)
    resp.raise_for_status()
    data = resp.json()
    # Duck-typed list probing (F20): candidates items|content|data.items.
    for key in ("items", "content", "products"):
        if isinstance(data, dict) and isinstance(data.get(key), list):
            return data[key]
    if isinstance(data, dict) and isinstance(data.get("data"), dict):
        inner = data["data"]
        for key in ("items", "content", "products"):
            if isinstance(inner.get(key), list):
                return inner[key]
    return data if isinstance(data, list) else []


def read_rest_pages(
    spark: SparkSession,
    url: str,
    schema: T.StructType,
    max_pages: int = 100,
    page_param: str = "page",
    transport: Callable[[str, dict | None], list[dict]] | None = None,
    retries: int = 3,
    backoff_s: float = 4.0,
) -> DataFrame:
    """S10: paginated JSON-list source with retry/backoff
    (etl_catalog_api.py:39-51). Stops at the first empty page."""
    transport = transport or _default_transport
    rows: list[dict] = []
    for page in range(max_pages):
        for attempt in range(retries):
            try:
                batch = transport(url, {page_param: page})
                break
            except NotImplementedError:
                raise
            except Exception:  # noqa: BLE001 - retry any transport error
                if attempt == retries - 1:
                    raise
                time.sleep(backoff_s * (2**attempt))
        if not batch:
            break
        rows.extend(batch)
    return spark.createDataFrame(rows, schema)


def write_rest_per_row(
    df: DataFrame,
    post_fn: Callable[[dict[str, Any]], None],
    parallelism: int = 5,
) -> None:
    """S11: side-effecting REST sink — one POST per row, fan-out bounded
    by partition count (the reference's MAX_PAR). ``post_fn`` must be
    picklable (executed on executors)."""

    def _post_partition(rows: Iterable[Any]) -> None:
        for row in rows:
            post_fn(row.asDict())

    df.repartition(parallelism).foreachPartition(_post_partition)
