"""Scale utilities: skew-salted joins, TTL-cached frames, SQL views.

These are the knobs SURVEY.md 4 prescribes for the 100 TB deployment on
top of AQE's automatics:

- ``salted_join`` for joins whose key histogram is so skewed that even
  AQE's skew-join splitting leaves stragglers (one key >> one partition).
- ``TTLCache`` for the reference's 2-5 minute result caches
  (server/cache.ts:4-13, dashboard.py:13 @st.cache_data) expressed as
  persisted DataFrames with driver-side expiry.
- ``register_views`` so every canonical table is queryable with plain
  ``spark.sql`` — the engine's ANSI-SQL surface.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Skew-salted join
# ---------------------------------------------------------------------------


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join robust to heavy key skew: the skewed side gets a random
    salt in [0, salt_buckets); the other side is exploded across every
    salt value. The hot key's rows then spread over ``salt_buckets``
    partitions instead of one straggler task.

    The salt is derived (hash of the full row via monotonically spread
    partition id + row position is overkill; a uniform random is fine
    because correctness never depends on salt value) — here we use
    pmod(hash of a uniform physical row id) so the result is
    deterministic for testing. Use for joins where `other` is small
    enough that a salt_buckets-fold blowup is acceptable but too big or
    too skewed to broadcast outright.

    Only ``inner`` and ``left`` (outer) joins are supported: the explode
    duplicates every `other` row across all salt buckets, so a right or
    full outer join would emit ``salt_buckets`` copies of each unmatched
    `other` row. Those shapes need a different strategy (e.g. AQE skew
    join, or salting the other side).
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "right/full outer would duplicate unmatched rows of the "
            "exploded side across salt buckets"
        )
    salted_big = skewed.withColumn(
        "_salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    salted_small = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return salted_big.join(salted_small, [key, "_salt"], how).drop("_salt")


# ---------------------------------------------------------------------------
# TTL cache (T5)
# ---------------------------------------------------------------------------


class TTLCache:
    """Driver-side TTL cache of persisted DataFrames — the Spark shape of
    the reference's in-memory result caches. ``get`` returns the cached
    (materialized) frame if younger than ttl, else rebuilds, persists,
    and unpersists the stale one."""

    def __init__(self, ttl_seconds: float, clock: Callable[[], float] = time.time) -> None:
        self.ttl = ttl_seconds
        self._clock = clock
        self._entries: dict[str, tuple[float, DataFrame]] = {}

    def get(self, key: str, build: Callable[[], DataFrame]) -> DataFrame:
        now = self._clock()
        hit = self._entries.get(key)
        if hit is not None and now - hit[0] < self.ttl:
            return hit[1]
        if hit is not None:
            hit[1].unpersist()
        df = build().persist()
        df.count()  # materialize eagerly, like the reference's caches
        self._entries[key] = (now, df)
        return df

    def invalidate(self, key: str | None = None) -> None:
        items = [key] if key else list(self._entries)
        for k in items:
            if k in self._entries:
                self._entries.pop(k)[1].unpersist()


# ---------------------------------------------------------------------------
# SQL surface
# ---------------------------------------------------------------------------


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every canonical testdata table plus the derived domain
    tables as temp views, so the whole engine surface is reachable from
    ``spark.sql``."""
    from . import registry
    from .schemas import TESTDATA_TABLES

    for name in TESTDATA_TABLES:
        if name == "events":
            registry.read_events(spark, sf_dir).createOrReplaceTempView(name)
        else:
            spark.read.parquet(f"{sf_dir}/{name}.parquet").createOrReplaceTempView(name)
    derived = {
        "orders_kaspi": registry.orders_kaspi,
        "sales_sku": registry.sales_sku,
        "sellers": registry.sellers_table,
        "stock": registry.stock_table,
        "pricebot_settings": registry.settings_table,
        "opponents": registry.opponents_table,
        "customers_fit": registry.customers_fit,
        "watch_events": registry.watch_events,
    }
    for name, fn in derived.items():
        fn(spark, sf_dir).createOrReplaceTempView(name)
    return list(TESTDATA_TABLES) + list(derived)
