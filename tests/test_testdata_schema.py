"""Guard against external testdata schema drift.

Twice now an environment assumption silently rotted (r1: media oracle shape;
r3: events.ts changed from TIMESTAMP(NANOS) to timestamp[us]) and broke a
dozen downstream tests with confusing errors. This test pins what the readers
actually rely on, via pyarrow (no Spark session — runs in milliseconds), so
any future drift fails loudly in ONE named place.

Columns are asserted exactly; dtypes are asserted only where a reader
branches on them or a query does arithmetic that a silent type change would
corrupt. `events.ts` is allowed any of the forms the type-adaptive
`registry.read_events` handles.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

SF_DIRS = sorted(glob.glob("/root/testdata/sf*"))

EXPECTED_COLUMNS = {
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    "orders": [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ],
    "lineitem": [
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    ],
    "events": ["event_id", "ts", "user_id", "event_type", "value", "props"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "embeddings": ["vec_id", "embedding", "label"],
}

# ts forms registry.read_events adapts to: µs/ns timestamps (tz'd or not) or
# raw int64 epoch-nanos.
ALLOWED_EVENT_TS = {"timestamp[us]", "timestamp[ns]", "timestamp[us, tz=UTC]",
                    "timestamp[ns, tz=UTC]", "int64"}


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=[os.path.basename(d) for d in SF_DIRS])
def test_testdata_schemas_match_reader_expectations(sf_dir: str) -> None:
    for table, cols in EXPECTED_COLUMNS.items():
        path = f"{sf_dir}/{table}.parquet"
        assert os.path.exists(path), f"{path} missing"
        schema = pq.read_schema(path)
        assert schema.names == cols, (
            f"{path}: columns drifted — got {schema.names}, readers expect {cols}"
        )

    ev = pq.read_schema(f"{sf_dir}/events.parquet")
    ts = str(ev.field("ts").type)
    assert ts in ALLOWED_EVENT_TS, (
        f"events.ts dtype '{ts}' not handled by registry.read_events — "
        f"extend the adaptive branch (allowed: {sorted(ALLOWED_EVENT_TS)})"
    )

    emb = pq.read_schema(f"{sf_dir}/embeddings.parquet")
    emb_t = str(emb.field("embedding").type)
    assert emb_t.startswith("list<") and ("float" in emb_t or "double" in emb_t), (
        f"embeddings.embedding dtype '{emb_t}' — ANN/dedup kernels expect a "
        "list of float/double"
    )

    docs = pq.read_schema(f"{sf_dir}/documents.parquet")
    assert str(docs.field("text").type) == "string"
