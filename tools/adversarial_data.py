"""Build an adversarial mutation of a testdata scale-factor directory.

The generator's data is polite: unique keys, no NULLs, no ties,
pure-ASCII prose, clean functional dependencies. Oracle/Spark couplings
can pass on that data while silently diverging on real data (the review
lens that found round-5's rep_signals and as-of-tie bugs). This tool
produces a HOSTILE copy of sf0.01 so the full check_oracle sweep can be
replayed on it:

- duplicate composite keys (lineitem (orderkey, linenumber) dups,
  events (user_id, ts) dups)
- tied sort keys (prices, dates, timestamps truncated onto each other)
- NULLs in every optional column (FKs, measures, categories, JSON)
- empty / whitespace-only / unicode (Cyrillic, CJK, emoji, combining
  accents) / punctuation-heavy document text; broken text<->n_chars FD
- unknown domain values (returnflag 'Z', empty event_type)
- one massively skewed key (20%% of orders on one customer, 20%% of
  events on one user)
- zero vectors + exact-duplicate vectors in embeddings
- malformed JSON in events.props

Everything is deterministic index arithmetic (no RNG): mutation m
applies where key %% M == r, so a failure reproduces exactly and the
mutated rows are identifiable from the key alone.

Usage:
    python tools/adversarial_data.py [--src /root/testdata/sf0.01]
                                     [--dst .advdata/sf0.01adv]
then:
    python tools/check_oracle.py --sf .advdata/sf0.01adv --json ORACLE_ADV.json
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

UNICODE_TEXTS = [
    "Привет мир это тестовый документ с кириллицей и еще словами про мир",
    "東京タワー は 高い です 東京 の 夜景 が 見える 場所 です",
    "naïve café émigré déjà vu – em—dash and  nbsp and é combining",
    "emoji soup 😀😀 🚀 🎉 mixed with words and 🤖 robots everywhere 😀",
]

PUNCT_TEXT = "!!! ??? ,,, ;;; ::: --- ((( ))) \"quoted\" 'single' %%% $$$ ###"


def _obj(df: pd.DataFrame, col: str) -> None:
    """Make a column assignable with None/arbitrary objects without
    pandas silently coercing dtypes (int -> float, None -> NaT...)."""
    df[col] = df[col].astype(object)


def mutate_documents(df: pd.DataFrame) -> pd.DataFrame:
    for c in ("text", "lang", "source"):
        _obj(df, c)
    k = df["doc_id"] % 23
    df.loc[k == 1, "text"] = ""
    df.loc[k == 2, "text"] = "   \t\n  "
    for i, ut in enumerate(UNICODE_TEXTS):
        df.loc[k == 3 + i, "text"] = ut  # 3..6
    df.loc[k == 7, "text"] = PUNCT_TEXT
    # exact duplicate of a neighbour's text (dedup family stress) —
    # n_chars deliberately NOT updated anywhere: the text<->n_chars FD
    # is broken for every mutated row
    prev = df["text"].shift(1)
    df.loc[k == 8, "text"] = prev[k == 8]
    df.loc[k == 9, "lang"] = None
    df.loc[k == 10, "source"] = None
    df.loc[k == 11, "text"] = "word " * 50  # trailing space, repeated token
    df.loc[k == 12, "text"] = "x" * 2000  # one giant token, no spaces
    return df


def mutate_events(df: pd.DataFrame) -> pd.DataFrame:
    for c in ("value", "props", "user_id", "event_type"):
        _obj(df, c)
    k = df["event_id"] % 19
    # tied timestamps: truncate to the hour
    ts_floor = df["ts"].dt.floor("h")
    df["ts"] = df["ts"].where(k != 1, ts_floor)
    df.loc[k == 2, "value"] = None
    df.loc[k == 3, "props"] = None
    df.loc[k == 4, "props"] = "not json {"
    df.loc[k == 5, "user_id"] = None
    df.loc[k == 6, "event_type"] = ""
    # duplicate (user_id, ts) composite keys: copy from the previous row
    df = df.reset_index(drop=True)
    src = np.clip(np.arange(len(df)) - 1, 0, None)
    dup_mask = (k == 7).to_numpy()
    df.loc[dup_mask, "user_id"] = df["user_id"].to_numpy()[src[dup_mask]]
    df.loc[dup_mask, "ts"] = df["ts"].to_numpy()[src[dup_mask]]
    # one massively skewed user: 20% of all events
    skew_mask = ((df["event_id"] % 5) == 0) & ~df["user_id"].isna()
    df.loc[skew_mask, "user_id"] = 1
    return df


def mutate_orders(df: pd.DataFrame) -> pd.DataFrame:
    for c in ("o_custkey", "o_orderpriority"):
        _obj(df, c)
    k = df["o_orderkey"] % 13
    df.loc[k == 1, "o_custkey"] = None
    df.loc[k == 2, "o_totalprice"] = 1000.0  # ties
    date_floor = df["o_orderdate"].dt.to_period("M").dt.to_timestamp()
    df["o_orderdate"] = df["o_orderdate"].where(k != 3, date_floor)
    df.loc[k == 4, "o_orderpriority"] = None
    # skew: 20% of orders on the smallest custkey
    min_cust = int(pd.to_numeric(df["o_custkey"], errors="coerce").min())
    skew_mask = ((df["o_orderkey"] % 5) == 0) & df["o_custkey"].notna()
    df.loc[skew_mask, "o_custkey"] = min_cust
    return df


def mutate_lineitem(df: pd.DataFrame) -> pd.DataFrame:
    for c in ("l_discount",):
        _obj(df, c)
    k = df["l_orderkey"] * 7 + df["l_linenumber"]
    k = k % 29
    df.loc[k == 2, "l_discount"] = None
    df.loc[k == 3, "l_extendedprice"] = 100.0  # ties
    date_floor = df["l_shipdate"].dt.to_period("M").dt.to_timestamp()
    df["l_shipdate"] = df["l_shipdate"].where(k != 4, date_floor)
    df.loc[k == 5, "l_returnflag"] = "Z"  # unknown domain value
    df.loc[k == 6, "l_quantity"] = 0.0
    # duplicate full rows -> duplicate (orderkey, linenumber) composite keys
    dups = df[k == 1]
    return pd.concat([df, dups], ignore_index=True)


def mutate_customer(df: pd.DataFrame) -> pd.DataFrame:
    for c in ("c_acctbal", "c_mktsegment"):
        _obj(df, c)
    k = df["c_custkey"] % 11
    df.loc[k == 1, "c_acctbal"] = None
    df.loc[k == 2, "c_mktsegment"] = None
    df.loc[k == 3, "c_name"] = "Клиент Ñame 東京 😀"
    df.loc[k == 4, "c_acctbal"] = 7500.0  # exactly on the bloom threshold
    return df


def mutate_part(df: pd.DataFrame) -> pd.DataFrame:
    for c in ("p_retailprice",):
        _obj(df, c)
    df = df.reset_index(drop=True)
    k = df["p_partkey"] % 11
    # duplicate names across different partkeys (entity-resolution stress)
    src = np.clip(np.arange(len(df)) - 1, 0, None)
    m = (k == 1).to_numpy()
    df.loc[m, "p_name"] = df["p_name"].to_numpy()[src[m]]
    df.loc[k == 2, "p_retailprice"] = None
    df.loc[k == 3, "p_name"] = "détail pièce München 東京"
    df.loc[k == 4, "p_size"] = 0
    return df


def mutate_supplier(df: pd.DataFrame) -> pd.DataFrame:
    _obj(df, "s_acctbal")
    k = df["s_suppkey"] % 7
    df.loc[k == 1, "s_acctbal"] = None
    return df


def mutate_embeddings(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reset_index(drop=True)
    _obj(df, "label")
    k = df["vec_id"] % 17
    dim = len(df["embedding"].iloc[0])
    zero = [0.0] * dim
    df["embedding"] = df["embedding"].apply(list)
    df.loc[k == 1, "embedding"] = df.loc[k == 1, "embedding"].apply(lambda _: list(zero))
    # exact duplicate of the previous vector
    src = np.clip(np.arange(len(df)) - 1, 0, None)
    m = (k == 2).to_numpy()
    emb = df["embedding"].to_numpy()
    for i in df.index[m]:
        df.at[i, "embedding"] = list(emb[src[i]])
    df.loc[k == 3, "label"] = None
    return df


MUTATORS = {
    "documents": mutate_documents,
    "events": mutate_events,
    "orders": mutate_orders,
    "lineitem": mutate_lineitem,
    "customer": mutate_customer,
    "part": mutate_part,
    "supplier": mutate_supplier,
    "embeddings": mutate_embeddings,
    # region/nation: tiny reference dims every join hangs off — mutating
    # them breaks referential integrity everywhere at once, which hides
    # rather than reveals per-query couplings. Copied verbatim.
}


def build(src: str, dst: str) -> None:
    Path(dst).mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        schema = tbl.schema
        fn = MUTATORS.get(t)
        if fn is None:
            pq.write_table(tbl, f"{dst}/{t}.parquet")
            print(f"{t}: copied verbatim ({tbl.num_rows} rows)")
            continue
        df = fn(tbl.to_pandas())
        out = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
        pq.write_table(out, f"{dst}/{t}.parquet")
        print(f"{t}: {tbl.num_rows} -> {out.num_rows} rows (mutated)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.01")
    ap.add_argument("--dst", default=".advdata/sf0.01adv")
    args = ap.parse_args()
    build(args.src, args.dst)


if __name__ == "__main__":
    main()
