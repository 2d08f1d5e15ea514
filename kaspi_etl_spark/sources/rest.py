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


# ---------------------------------------------------------------------------
# Recursive "seller-like array" probe (F20 full variant)
# Reference: BUNDLE/app/api/pricebot/pricebot/opponents/route.ts:182-249 —
# known dotted paths first, then a breadth-first search of the whole JSON
# tree for the first array containing seller-shaped objects, then the
# candidate-key coalescing map to (merchantId, merchantName, price, isYou).
# ---------------------------------------------------------------------------

_PICK_PATHS = (
    "items",
    "content",
    "data.items",
    "data.content",
    "data",
    "list",
    "offers",
    "offers.items",
    "results",
    "rows",
    "page.content",
)


def pick_array_key(obj: Any) -> list:
    """First known dotted path that resolves to a list (route.ts:183-204)."""
    for key in _PICK_PATHS:
        cur = obj
        for part in key.split("."):
            cur = cur.get(part) if isinstance(cur, dict) else None
        if isinstance(cur, list):
            return cur
    return []


def is_seller_like(o: Any) -> bool:
    """Duck-typed seller shape (route.ts:205-211): some price-ish key AND
    some merchant-ish key."""
    if not isinstance(o, dict):
        return False
    has_price = (
        "price" in o
        or "offerPrice" in o
        or "value" in o
        or isinstance(o.get("prices"), list)
    )
    has_merchant = any(
        k in o
        for k in ("merchantId", "merchantUID", "sellerId", "merchantName", "seller", "name")
    )
    return has_price and has_merchant


def find_first_seller_array(node: Any) -> list:
    """BFS the JSON tree for the first array with a seller-like element
    (route.ts:212-228). Arrays that aren't seller arrays still get their
    object elements explored."""
    from collections import deque

    queue = deque([node])
    while queue:
        cur = queue.popleft()
        if isinstance(cur, list):
            if any(is_seller_like(v) for v in cur):
                return cur
            queue.extend(v for v in cur if isinstance(v, (dict, list)))
        elif isinstance(cur, dict):
            queue.extend(cur.values())
    return []


def _num(v: Any) -> float | None:
    try:
        f = float(v)
    except (TypeError, ValueError):
        return None
    return f if f == f and f not in (float("inf"), float("-inf")) else None


def extract_sellers(js: Any, merchant_id: str | None = None) -> list[dict]:
    """Full probe: known paths, else recursive search, then the
    candidate-key coalescing map (route.ts:239-249). Rows missing both
    id and name are dropped, exactly like the reference's filter."""
    offers = pick_array_key(js) if isinstance(js, dict) else []
    if not offers and isinstance(js, list):
        offers = js
    # Reference parity (route.ts:228-229): the BFS probe triggers only
    # when the known paths yield an EMPTY array — a non-empty known-path
    # array is mapped as-is even if its rows don't look seller-like
    # (rows with a name but no price key pass the filter with price 0).
    if not offers:
        found = find_first_seller_array(js)
        if found:
            offers = found
    out = []
    for o in offers:
        if not isinstance(o, dict):
            continue
        oid = next(
            (o[k] for k in ("merchantId", "merchantUID", "id", "sellerId")
             if o.get(k) is not None), "",
        )
        name = next(
            (o[k] for k in ("merchantName", "name", "merchant", "seller")
             if o.get(k) is not None), "",
        )
        # nullish-coalescing parity: explicit null falls through like JS ??
        raw_price = next(
            (o[k] for k in ("price", "offerPrice", "value") if o.get(k) is not None), 0
        )
        price = _num(raw_price)
        if price is None and isinstance(o.get("prices"), list):
            price = next(
                (_num(x.get("price")) for x in o["prices"]
                 if isinstance(x, dict) and _num(x.get("price")) is not None),
                None,
            )
        s_id = str(oid or name or "")
        s_name = str(name or oid or "")
        if not s_id or not s_name:
            continue
        out.append(
            {
                "merchantId": s_id,
                "merchantName": s_name,
                "price": price if price is not None else 0.0,
                "isYou": bool(merchant_id) and str(oid or "") == str(merchant_id),
            }
        )
    return out


SELLER_PROBE_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("merchantId", T.StringType()),
            T.StructField("merchantName", T.StringType()),
            T.StructField("price", T.DoubleType()),
            T.StructField("isYou", T.BooleanType()),
        ]
    )
)


def sellers_from_json_udf(merchant_id: str | None = None):
    """Pandas UDF form for captured-JSON columns: json string ->
    array<struct> of coalesced sellers; explode() for the UDTF shape.
    Recursion over arbitrary JSON is the justified Python boundary here —
    fixed-path probing stays expression-side (registry events_json_probe).
    """
    import json

    from pyspark.sql.functions import pandas_udf

    def _probe(col):
        def run(s):
            if not s:
                return []
            try:
                return extract_sellers(json.loads(s), merchant_id)
            except (ValueError, RecursionError):
                return []

        return col.map(run)

    return pandas_udf(_probe, SELLER_PROBE_SCHEMA)


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
