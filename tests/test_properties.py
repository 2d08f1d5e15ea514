"""Property-based tests (hypothesis) for the scalar library and dedup
invariants — each example sends one batched DataFrame through Spark."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from kaspi_etl_spark import clean
from kaspi_etl_spark.llm import dedup

FAST = settings(max_examples=10, deadline=None)


def py_delivery_fee(price: int, weight_g: float) -> int:
    # scripts/etl_sales.py:28-33 reimplemented independently
    if price >= 15000:
        base = 0
    elif price >= 10000:
        base = 699
    elif price >= 5000:
        base = 799
    else:
        base = 999
    return base + max(0, math.ceil(weight_g / 1000.0) - 3) * 399


@FAST
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200_000),
            st.floats(min_value=0, max_value=20_000, allow_nan=False),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_delivery_fee_matches_python(spark, rows):
    df = spark.createDataFrame(rows, "price long, weight_g double")
    got = [
        r[0]
        for r in df.select(
            clean.delivery_fee_kzt(F.col("price"), F.col("weight_g"))
        ).collect()
    ]
    want = [py_delivery_fee(p, w) for p, w in rows]
    assert got == want


@FAST
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False).map(
            lambda x: f"{x:.4f}".replace(".", ",")
        ),
        min_size=1,
        max_size=50,
    )
)
def test_decimal_comma_roundtrip(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = [r[0] for r in df.select(clean.decimal_comma_to_double("v")).collect()]
    want = [float(v.replace(",", ".")) for v in vals]
    assert got == want


@FAST
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40),
        min_size=1,
        max_size=30,
    )
)
def test_exact_dedup_partitions_ids(spark, texts):
    """exact_dedup groups must cover every doc exactly once, and each
    group's keep_id must be the minimum id of its content class."""
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.exact_dedup(df).collect()
    assert sum(r.dup_count for r in out) == len(texts)
    by_content: dict[str, list[int]] = {}
    for i, t in enumerate(texts):
        by_content.setdefault(t, []).append(i)
    want_keep = {min(v) for v in by_content.values()}
    assert {r.keep_id for r in out} == want_keep


@FAST
@given(st.lists(st.sampled_from(["w1", "w2", "w3", "w4"]), min_size=0, max_size=12))
def test_shingles_match_python(spark, words):
    text = " ".join(words)
    df = spark.createDataFrame([(text,)], "t string")
    got = df.select(dedup.word_shingles(F.col("t"), 3).alias("s")).collect()[0].s
    toks = text.strip().lower().split() if text.strip() else [""]
    n = max(len(toks) - 3, 0)
    want = []
    for i in range(n + 1):
        sh = " ".join(toks[i : i + 3])
        if sh not in want:
            want.append(sh)
    assert got == want


@FAST
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["p1", "p2"]),
            st.sampled_from(["A", "a ", "B", "c"]),
            st.integers(min_value=0, max_value=500),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_dedupe_sellers_invariants(spark, rows):
    """Dedupe output: exactly one row per (product, lower(trim(name)))
    key, each the minimum of the pinned total order."""
    data = [(p, n, pr, str(i)) for i, (p, n, pr) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "productId string, name string, price long, deliveryDate string"
    )
    from kaspi_etl_spark.ops.offers import dedupe_sellers

    out = dedupe_sellers(df, tie_breakers=["deliveryDate"]).collect()
    keys = [(r.productId, r.name.strip().lower()) for r in out]
    assert len(keys) == len(set(keys))
    want_keys = {(p, n.strip().lower()) for p, n, _ in rows}
    assert set(keys) == want_keys
    # winner has the minimal (pos-flag, price) in its key class
    for r in out:
        cls = [
            pr
            for p, n, pr in rows
            if (p, n.strip().lower()) == (r.productId, r.name.strip().lower())
        ]
        pos = [x for x in cls if x > 0]
        assert r.price == (min(pos) if pos else min(cls))


@FAST
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=60, max_value=220),
            st.integers(min_value=2, max_value=12) | st.none(),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_kids_sizing_confidence_bounds(spark, rows):
    from kaspi_etl_spark.ops.sizing import kids_size_chart, recommend_kids_sizes

    data = [(i, h, a) for i, (h, a) in enumerate(rows)]
    customers = spark.createDataFrame(data, "customer_id long, height_cm int, age int")
    out = recommend_kids_sizes(customers, kids_size_chart(spark)).collect()
    assert len(out) == len(rows)  # exactly one recommendation each
    for r in out:
        # Reference quirk reproduced faithfully: the closest-size
        # fallback max(0.3, 1 - dist/20) can EXCEED the in-range 0.8
        # (e.g. 1cm outside a boundary -> 0.95).
        assert 0.3 <= r.confidence_score <= 1.0
        assert r.recommended_size in {"22", "24", "26", "28", "30", "32", "34"}


# --- Round-2 additions ------------------------------------------------------

_json_scalars = st.one_of(
    st.none(), st.booleans(), st.integers(-10**6, 10**6),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=12),
)
_json_values = st.recursive(
    _json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(
            st.sampled_from(
                ["items", "price", "name", "merchantId", "data", "x", "prices",
                 "seller", "value", "offerPrice", "content"]
            ),
            children,
            max_size=4,
        ),
    ),
    max_leaves=25,
)


@FAST
@given(_json_values)
def test_recursive_seller_probe_total(js):
    """extract_sellers must be total over arbitrary JSON: never raises,
    and every emitted row has a non-empty id and name and a float price
    (the reference's output contract after its filter)."""
    from kaspi_etl_spark.sources import rest

    out = rest.extract_sellers(js)
    for s in out:
        assert s["merchantId"] and s["merchantName"]
        assert isinstance(s["price"], float) and s["price"] == s["price"]
        assert isinstance(s["isYou"], bool)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
            min_size=8, max_size=8,
        ),
        min_size=2, max_size=12, unique_by=tuple,
    )
)
def test_bucketed_cosine_pairs_subset_of_exact(spark, vecs):
    """The LSH-bucketed near-dup pairs are candidates VERIFIED by exact
    cosine, so on any input they must be a subset of the all-pairs form
    (no false positives, ever — recall is probabilistic, precision is
    not)."""
    from kaspi_etl_spark.llm import similarity as sim

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, v array<double>",
    )
    exact = {
        (r.id_a, r.id_b)
        for r in sim.cosine_near_dup_pairs(
            df, threshold=0.9, id_col="vec_id", vec_col="v"
        ).collect()
    }
    bucketed = {
        (r.id_a, r.id_b)
        for r in sim.cosine_near_dup_pairs_bucketed(
            df, threshold=0.9, id_col="vec_id", vec_col="v", dim=8
        ).collect()
    }
    assert bucketed <= exact


def _py_scd2(snaps):
    """Independent reference: per key, sorted by day, collapse equal-value
    runs into (value, from, to, is_current, version) intervals."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, d, v in snaps:
        by_key[k].append((d, v))
    out = []
    for k, rows in by_key.items():
        rows.sort()
        runs = []
        for d, v in rows:
            if not runs or runs[-1][1] != v:
                runs.append([d, v])
        for i, (d, v) in enumerate(runs):
            to = runs[i + 1][0] if i + 1 < len(runs) else None
            out.append((k, v, d, to, to is None, i + 1))
    return sorted(out, key=lambda t: (t[0], t[5]))


@FAST
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=20),  # day number
            st.integers(min_value=0, max_value=3),  # small value domain
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: (t[0], t[1]),  # unique per (key, day)
    )
)
def test_scd2_matches_python_reference(spark, snaps):
    import datetime

    from kaspi_etl_spark.ops import purchases

    base = datetime.date(2024, 1, 1)
    rows = [
        (k, base + datetime.timedelta(days=d), float(v)) for k, d, v in snaps
    ]
    df = spark.createDataFrame(rows, "sku string, d date, cost double")
    got = sorted(
        (
            (r["sku"], r["cost"], r["effective_from"], r["effective_to"],
             r["is_current"], r["version"])
            for r in purchases.scd2_history(df, "sku", "d", ["cost"]).collect()
        ),
        key=lambda t: (t[0], t[5]),
    )
    want = [
        (
            k,
            float(v),
            base + datetime.timedelta(days=d),
            (base + datetime.timedelta(days=to)) if to is not None else None,
            cur,
            ver,
        )
        for k, v, d, to, cur, ver in _py_scd2(snaps)
    ]
    assert got == want


def py_duplicate_spans(docs: list[tuple[int, str]], n: int = 8):
    """Independent brute-force reference for dedup.duplicate_spans."""
    import re as _re
    from collections import Counter, defaultdict

    spans_by_doc: dict[int, list[str]] = {}
    for doc_id, text in docs:
        words = _re.split(r"\s+", text.strip().lower()) if text.strip() else [""]
        if len(words) < n:
            continue
        spans_by_doc[doc_id] = [
            " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
        ]
    doc_sets: dict[str, set[int]] = defaultdict(set)
    for doc_id, spans in spans_by_doc.items():
        for s in set(spans):
            doc_sets[s].add(doc_id)
    out = {}
    for doc_id, spans in spans_by_doc.items():
        c = Counter(spans)
        shared = {s for s in c if len(doc_sets[s]) >= 2}
        out[doc_id] = (
            len(spans),
            sum(k for s, k in c.items() if s in shared),
            len(shared),
        )
    return out


@FAST
@given(
    st.lists(
        st.lists(
            st.sampled_from("a b c d aa bb".split()), min_size=0, max_size=14
        ).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
def test_duplicate_spans_matches_bruteforce(spark, texts):
    docs = [(i, t) for i, t in enumerate(texts)]
    expected = py_duplicate_spans(docs, n=8)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_spans, r.n_dup_spans, r.n_shared_hashes)
        for r in dedup.duplicate_spans(df).collect()
    }
    assert got == expected


# --- PII regex parity vs Python re (independent engine #3) -----------------

# ASCII only: Java regex (Spark) treats \d and \b as ASCII while
# Python re is Unicode-aware — a Unicode digit or letter adjacent to a
# match would make the two engines legitimately disagree
_PII_TEXT = st.text(
    alphabet="ABCXYZabcxyz0123456789 @.+-()[]_%",
    max_size=120,
)


@FAST
@given(st.lists(_PII_TEXT, min_size=1, max_size=30))
def test_pii_counts_match_python_re(spark, texts):
    import re

    from kaspi_etl_spark.llm import pii

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_email"], r["n_card"], r["n_phone"], r["n_ipv4"])
        for r in pii.pii_profile(df).collect()
    }
    for i, t in rows:
        want = tuple(
            len(re.findall(pat, t))
            for pat, _ in (
                pii.PII_PATTERNS["email"],
                pii.PII_PATTERNS["card"],
                pii.PII_PATTERNS["phone"],
                pii.PII_PATTERNS["ipv4"],
            )
        )
        assert got[i] == want, (t, got[i], want)


# --- Bloom filter: never a false negative, any key set ----------------------


@FAST
@given(
    st.lists(st.integers(min_value=-(10**12), max_value=10**12),
             min_size=1, max_size=100, unique=True)
)
def test_bloom_never_false_negative(spark, keys):
    from kaspi_etl_spark.llm import sketch

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    bloom = sketch.bloom_build(df, "k")
    out = sketch.bloom_probe(df, bloom, "k").collect()
    assert all(r["might_contain"] for r in out)


# --- Concatenated-BMP video: split inverts concat for any frame set ---------


@FAST
@given(
    st.lists(
        st.tuples(st.integers(1, 5), st.integers(1, 5),
                  st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)),
        min_size=1,
        max_size=6,
    )
)
def test_bmp_video_split_roundtrip(frames):
    import numpy as np

    from kaspi_etl_spark.llm import multimodal

    encoded = []
    for w, h, b, g, r in frames:
        px = np.zeros((h, w, 3), dtype=np.uint8)
        px[:, :] = (b, g, r)
        encoded.append(multimodal.encode_bmp(px))
    video = b"".join(encoded)
    parts = multimodal.split_bmp_video(video)
    assert parts == encoded


# --- Z-order: equal inputs -> equal z; single-column z is identity-ordered --


@FAST
@given(st.lists(st.integers(min_value=0, max_value=(1 << 16) - 1),
                min_size=1, max_size=50))
def test_zorder_single_column_preserves_order(spark, vals):
    from kaspi_etl_spark import layout

    df = spark.createDataFrame([(v,) for v in vals], "a long")
    out = df.select(
        "a", layout.zorder_value([F.col("a")], bits=16).alias("z")
    ).collect()
    # with one column the interleave is the identity on the masked bits
    assert all(r["z"] == r["a"] for r in out)


# --- As-of join vs an independent brute force --------------------------------


@FAST
@given(
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)),
             min_size=1, max_size=25),
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)),
             min_size=0, max_size=25),
)
def test_asof_join_matches_brute_force(spark, lefts, rights):
    from kaspi_etl_spark.ops import asof

    rights = list({(k, t) for k, t in rights})  # unique (key, ts): the
    # documented determinism precondition (equal-ts right rows tie-break
    # by internal order otherwise)
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)], "k long, ts long, lid long"
    )
    rdf = spark.createDataFrame(
        [(k, t, k * 1000 + t) for k, t in rights], "k long, ts long, v long"
    )
    out = {
        r["lid"]: r["v_asof"]
        for r in asof.asof_join(ldf, rdf, key="k", value_cols=["v"]).collect()
    }
    for i, (k, t) in enumerate(lefts):
        cand = [(rt, k * 1000 + rt) for rk, rt in rights if rk == k and rt <= t]
        want = max(cand)[1] if cand else None
        assert out[i] == want, (k, t, out[i], want)


@FAST
@given(
    st.lists(
        st.integers(min_value=1, max_value=(1 << 60) - 1),
        min_size=1,
        max_size=60,
    )
)
def test_flog2_accuracy_and_monotone_random(spark, xs):
    """flog2 stays within one LUT quantum of true log2 and is monotone
    over arbitrary BIGINT inputs (the kernel under every LM score)."""
    from kaspi_etl_spark.llm import lm

    df = spark.createDataFrame([(v,) for v in xs], "x long")
    got = {r["x"]: r["l"] for r in lm.with_flog2(df, "x", "l").collect()}
    for v in xs:
        assert abs(got[v] / lm.FLOG2_ONE - math.log2(v)) <= 1.5 / lm.FLOG2_TABLE
        # the driver-side Python mirror must agree bit-for-bit (FS
        # linkage weights are computed with it)
        assert lm.flog2_int(v) == got[v]
    ordered = sorted(set(xs))
    assert all(
        got[a] <= got[b] for a, b in zip(ordered, ordered[1:])
    )


@FAST
@given(
    st.lists(
        st.integers(min_value=-(1 << 40), max_value=1 << 40),
        min_size=1,
        max_size=60,
    )
)
def test_sigmoid_lut_probe_bounds_random(spark, zs):
    """The classifier's clamp->index->lookup stays in bounds and within
    LUT quantization of the true sigmoid for arbitrary margins."""
    from kaspi_etl_spark.llm import classifier as C

    df = spark.createDataFrame([(v,) for v in zs], "z long")
    got = {r["z"]: r["p"] for r in df.select("z", C._p_expr().alias("p")).collect()}
    for z in zs:
        p = got[z]
        assert p is not None and 0 <= p <= (1 << C.LR_P)
        true = 1.0 / (1.0 + math.exp(-max(-8.0, min(8.0, z / (1 << C.LR_S)))))
        assert abs(p / (1 << C.LR_P) - true) <= 0.02


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**40), max_value=2**40),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=5, deadline=None)
def test_total_order_row_number_property(spark, rows):
    """Random (value, weight-ish) rows incl. heavy ties and negatives:
    the distributed rank must equal the global-window rank."""
    from pyspark.sql import Window

    from kaspi_etl_spark.llm.dedup import md5_long
    from kaspi_etl_spark.ranks import total_order_row_number

    data = [(f"id{i}", v) for i, (v, _) in enumerate(rows)]
    df = spark.createDataFrame(data, "k string, v long")
    got = sorted(
        (r.k, r.rn)
        for r in total_order_row_number(df, "v", "k", salt="p", hash_bits=3).collect()
    )
    w = Window.orderBy(
        F.col("v").asc(), md5_long(F.col("k").cast("string"), salt="p").asc(), F.col("k").asc()
    )
    want = sorted(
        (r.k, r.rn)
        for r in df.withColumn("rn", F.row_number().over(w).cast("long")).collect()
    )
    assert got == want


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**45), min_size=1, max_size=50, unique=True
    )
)
@settings(max_examples=5, deadline=None)
def test_binned_prefix_sum_property(spark, keys):
    """Random distinct keys: binned prefix sum == global-window running
    sum regardless of clustering."""
    from pyspark.sql import Window

    from kaspi_etl_spark.ranks import binned_prefix_sum

    data = [(k, (k % 7) + 1) for k in keys]
    df = spark.createDataFrame(data, "k long, w long")
    got = sorted((r.k, r.cum) for r in binned_prefix_sum(df, "k", "w", n_bins=16).collect())
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = sorted(
        (r.k, r.cum) for r in df.withColumn("cum", F.sum("w").over(w).cast("long")).collect()
    )
    assert got == want


@FAST
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),   # basket id
            st.integers(min_value=0, max_value=9),   # item id
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=4),           # min_support
    st.sampled_from([None, 2, 4]),                   # hub cap
)
def test_basket_pairs_matches_bruteforce(spark, rows, min_support, cap):
    from itertools import combinations

    from kaspi_etl_spark.ops import basket as basket_ops

    df = spark.createDataFrame(rows, "o long, item long")
    got = sorted(
        tuple(r)
        for r in basket_ops.basket_pairs(
            df, min_support=min_support, max_basket_items=cap
        ).collect()
    )
    # pure-Python mirror: distinct rows, cap baskets, count all pairs,
    # filter support — the UNPRUNED reference semantics
    baskets: dict[int, set[int]] = {}
    for o, i in set(rows):
        baskets.setdefault(o, set()).add(i)
    if cap is not None:
        baskets = {o: s for o, s in baskets.items() if len(s) <= cap}
    co: dict[tuple[int, int], int] = {}
    for s in baskets.values():
        for a, b in combinations(sorted(s), 2):
            co[(a, b)] = co.get((a, b), 0) + 1
    want = sorted(
        (a, b, c) for (a, b), c in co.items() if c >= min_support
    )
    assert got == want


@FAST
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from("ab cd"),  # tiny vocab + spaces
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_repetition_profile_matches_bruteforce(spark, texts):
    from collections import Counter

    from kaspi_etl_spark.llm.text import repetition_profile

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_profile(df).collect()}

    for i, t in rows:
        words = t.strip().lower().split() if t and t.strip() else []
        r = got[i]
        assert r.n_words == len(words)

        def stats(n):
            grams = [
                " ".join(words[j : j + n]) for j in range(len(words) - n + 1)
            ] if len(words) >= n else []
            if not grams:
                return 0, 0
            c = Counter(grams)
            tot = len(grams)
            top = 1_000_000 * max(c.values()) // tot
            dup = 1_000_000 * sum(v for v in c.values() if v >= 2) // tot
            return top, dup

        t2, _ = stats(2)
        t3, _ = stats(3)
        _, d5 = stats(5)
        assert (r.top2gram_ppm, r.top3gram_ppm, r.dup5gram_ppm) == (t2, t3, d5)
        assert r.rep_pass == (t2 <= 200_000 and t3 <= 180_000 and d5 <= 150_000)


@FAST
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=8),
        ),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=1, max_value=3),
)
def test_kcore_matches_bruteforce_peel(spark, raw_edges, k):
    from kaspi_etl_spark.ops.graph import kcore_peel

    edges = [(a, b) for a, b in raw_edges if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, "src long, dst long")
    rounds = 8
    got = {r.node: r.deg for r in kcore_peel(df, k=k, rounds=rounds).collect()}
    # python mirror: synchronous peel, same fixed-round semantics
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    for _ in range(rounds):
        deg = {n: sum(1 for m in adj[n] if m in alive) for n in alive}
        alive = {n for n in alive if deg[n] >= k}
    want = {
        n: sum(1 for m in adj[n] if m in alive) for n in alive
    }
    want = {n: d for n, d in want.items() if d > 0}
    assert got == want


@FAST
@given(
    st.lists(
        st.text(alphabet=st.sampled_from("ab c"), min_size=0, max_size=24),
        min_size=1,
        max_size=10,
    )
)
def test_fragment_stitch_matches_bruteforce(spark, texts):
    from kaspi_etl_spark.llm.dedup import fragment_stitch_pairs

    k = 2
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.prev_id, r.next_id)
        for r in fragment_stitch_pairs(df, k=k, max_fanout=64).collect()
    )
    heads, tails = {}, {}
    for i, t in rows:
        words = t.strip().lower().split() if t and t.strip() else []
        if len(words) >= k:
            heads[i] = " ".join(words[:k])
            tails[i] = " ".join(words[-k:])
    want = sorted(
        (a, b)
        for a in tails
        for b in heads
        if a != b and tails[a] == heads[b]
    )
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["web", "wiki", "code", None]),  # skewed keys
            st.integers(min_value=0, max_value=50),  # weight
            st.floats(min_value=-100, max_value=100, allow_nan=False),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=15, deadline=None)
def test_keyed_rank_primitives_match_brute_force(spark, rows):
    """keyed_hash_order_prefix and keyed_value_order_row_number must be
    value-identical to the per-key window forms they replace, on
    arbitrary key skews including NULL key groups and tied values."""
    from kaspi_etl_spark.llm.dedup import md5_long
    from kaspi_etl_spark.ranks import (
        keyed_hash_order_prefix,
        keyed_value_order_row_number,
    )

    data = [(f"id{i:03d}", k, w, round(v, 3)) for i, (k, w, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "id string, k string, w long, v double")

    got_p = keyed_hash_order_prefix(df, ["k"], "w", "id", salt="pp", bucket_bits=3)
    wp = Window.partitionBy("k").orderBy(
        md5_long(F.coalesce(F.col("id").cast("string"), F.lit("")), salt="pp"),
        "id",
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want_p = df.withColumn("cum", F.sum("w").over(wp).cast("long"))
    assert sorted(got_p.select("id", "cum").collect()) == sorted(
        want_p.select("id", "cum").collect()
    )

    got_r = keyed_value_order_row_number(
        df, ["k"], ["v", "id"], out_col="rn", count_col="kn", n_bins=4
    )
    wr = Window.partitionBy("k").orderBy(F.col("v").asc(), F.col("id").asc())
    want_r = df.withColumn("rn", F.row_number().over(wr).cast("long")).withColumn(
        "kn", F.count(F.lit(1)).over(Window.partitionBy("k")).cast("long")
    )
    assert sorted(got_r.select("id", "rn", "kn").collect()) == sorted(
        want_r.select("id", "rn", "kn").collect()
    )
