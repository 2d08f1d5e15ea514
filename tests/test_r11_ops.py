"""Round-11 operators: Benford first-digit audit, Kaplan-Meier survival,
competence curriculum schedule, span-corruption masks — planted-case
unit pins (the registry oracles carry the full value checks)."""

from __future__ import annotations

import datetime as dt
import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kaspi_etl_spark.registry import (
    _BENFORD_PPM,
    q_customer_survival_km,
    q_docs_curriculum_schedule,
    q_docs_span_corruption,
    q_orders_benford_audit,
)


def _write_orders(tmp_path, rows):
    """rows: (custkey, orderdate, totalprice)"""
    pq.write_table(
        pa.table(
            {
                "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_orderdate": pa.array([r[1] for r in rows], pa.date32()),
                "o_totalprice": pa.array([float(r[2]) for r in rows], pa.float64()),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    return str(tmp_path)


def _write_docs(tmp_path, rows):
    """rows: (doc_id, text)"""
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


# --- Benford audit -----------------------------------------------------------


def test_benford_counts_and_chi2_planted(spark, tmp_path):
    d0 = dt.date(2020, 1, 1)
    amounts = [1, 10, 199, 2, 25, 3]  # digits 1:3, 2:2, 3:1
    sf = _write_orders(tmp_path, [(i, d0, a) for i, a in enumerate(amounts)])
    out = {r.digit: r for r in q_orders_benford_audit(spark, sf).collect()}
    assert len(out) == 9  # every digit row present even with 0 observations
    n = len(amounts)
    expect_obs = {1: 3, 2: 2, 3: 1}
    for d in range(1, 10):
        r = out[d]
        obs = expect_obs.get(d, 0)
        assert r.n_obs == obs
        assert r.obs_ppm == (1_000_000 * obs) // n
        exp_ppm = _BENFORD_PPM[d - 1]
        assert r.exp_ppm == exp_ppm
        diff = 1_000_000 * obs - n * exp_ppm
        assert r.chi2_contrib_ppm == (diff * diff) // (n * exp_ppm)


def test_benford_ignores_nonpositive_and_rounds(spark, tmp_path):
    d0 = dt.date(2020, 1, 1)
    # 0.4 rounds to 0 (dropped), 0.6 rounds to 1, -5 dropped
    sf = _write_orders(tmp_path, [(1, d0, 0.4), (2, d0, 0.6), (3, d0, -5.0)])
    out = {r.digit: r for r in q_orders_benford_audit(spark, sf).collect()}
    assert out[1].n_obs == 1
    assert sum(r.n_obs for r in out.values()) == 1


# --- Kaplan-Meier survival ---------------------------------------------------


def test_km_hand_computed_curve(spark, tmp_path):
    rows = [
        # A: T=60, last 2020-03-01 -> gap 305 days -> event
        (1, dt.date(2020, 1, 1), 10.0),
        (1, dt.date(2020, 3, 1), 10.0),
        # B: T=30, gap 335 -> event
        (2, dt.date(2020, 1, 1), 10.0),
        (2, dt.date(2020, 1, 31), 10.0),
        # C: T=183, gap 30 -> censored
        (3, dt.date(2020, 6, 1), 10.0),
        (3, dt.date(2020, 12, 1), 10.0),
        # D: single order on the corpus max date -> T=0, censored
        (4, dt.date(2020, 12, 31), 10.0),
    ]
    sf = _write_orders(tmp_path, rows)
    out = {r.t_days: r for r in q_customer_survival_km(spark, sf).collect()}
    assert sorted(out) == [0, 30, 60, 183]
    assert (out[0].n_risk, out[0].n_events, out[0].n_censored) == (4, 0, 1)
    assert (out[30].n_risk, out[30].n_events) == (3, 1)
    assert (out[60].n_risk, out[60].n_events) == (2, 1)
    assert (out[183].n_risk, out[183].n_censored) == (1, 1)
    # survival: 1, 2/3, 1/3, 1/3 -> log2: 0, -0.585, -1.585, -1.585
    assert out[0].log2_survival == 0.0
    assert math.isclose(out[30].log2_survival, math.log2(2 / 3), abs_tol=2e-4)
    assert math.isclose(out[60].log2_survival, math.log2(1 / 3), abs_tol=2e-4)
    assert out[183].log2_survival == out[60].log2_survival  # censoring: flat


def test_km_survival_zero_goes_null(spark, tmp_path):
    d0 = dt.date(2020, 1, 1)
    rows = [
        # both customers churn with the same lifetime -> d = n at that t
        (1, d0, 10.0),
        (1, dt.date(2020, 1, 11), 10.0),
        (2, d0, 10.0),
        (2, dt.date(2020, 1, 11), 10.0),
        # anchor customer fixing max_date far in the future, lifetime 0
        # and ALSO an event (gap > 90 needs a later max date holder)...
        (3, dt.date(2021, 1, 1), 10.0),
    ]
    sf = _write_orders(tmp_path, rows)
    out = {r.t_days: r for r in q_customer_survival_km(spark, sf).collect()}
    # t=0: customer 3, censored (last order on max date). t=10: both die.
    assert (out[10].n_risk, out[10].n_events) == (2, 2)
    assert out[10].log2_surv_scaled is None  # survival exactly 0
    assert out[10].log2_survival is None


# --- curriculum schedule -----------------------------------------------------


def test_curriculum_stage_membership_and_positions(spark, tmp_path):
    docs = [
        (1, "a"),  # 1 token  -> bucket 0 (lo=1, hi=8, width=2)
        (2, "a b c d"),  # 4 -> bucket 1
        (3, "a b c d e f"),  # 6 -> bucket 2
        (4, "a b c d e f g h"),  # 8 -> bucket 3
    ]
    sf = _write_docs(tmp_path, docs)
    rows = q_docs_curriculum_schedule(spark, sf).collect()
    by_stage = {}
    for r in rows:
        by_stage.setdefault(r.stage, []).append(r)
    assert {s: sorted(r.doc_id for r in v) for s, v in by_stage.items()} == {
        0: [1],
        1: [1, 2],
        2: [1, 2, 3],
        3: [1, 2, 3, 4],
    }
    for s, v in by_stage.items():
        # positions are a 1..n permutation, ordered easy-bucket-first
        assert sorted(r.position for r in v) == list(range(1, len(v) + 1))
        for r1 in v:
            for r2 in v:
                if r1.bucket < r2.bucket:
                    assert r1.position < r2.position


def test_curriculum_single_length_degenerates_to_one_bucket(spark, tmp_path):
    sf = _write_docs(tmp_path, [(i, "x y z") for i in range(5)])
    rows = q_docs_curriculum_schedule(spark, sf).collect()
    assert all(r.bucket == 0 for r in rows)
    # every stage contains all docs with a full 1..5 position permutation
    for s in range(4):
        pos = sorted(r.position for r in rows if r.stage == s)
        assert pos == [1, 2, 3, 4, 5]


# --- span corruption ---------------------------------------------------------


def test_span_corruption_spans_stay_in_chunk(spark, tmp_path):
    words = [f"w{i}" for i in range(45)]
    sf = _write_docs(tmp_path, [(7, " ".join(words))])
    rows = q_docs_span_corruption(spark, sf).collect()
    assert sorted(r.span_idx for r in rows) == [0, 1]  # 45 // 20 = 2 chunks
    for r in rows:
        lo, hi = 20 * r.span_idx, 20 * r.span_idx + 17
        assert lo <= r.start_pos <= hi  # span fits inside its own chunk
        assert r.span_len == 3
        assert r.masked_text == " ".join(
            words[r.start_pos : r.start_pos + 3]
        )


def test_span_corruption_short_docs_emit_nothing(spark, tmp_path):
    sf = _write_docs(tmp_path, [(1, " ".join(f"w{i}" for i in range(19))), (2, "")])
    assert q_docs_span_corruption(spark, sf).count() == 0


# --- DP histogram release ----------------------------------------------------


def _write_customers(tmp_path, rows):
    """rows: (custkey, mktsegment, nationkey)"""
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
                "c_mktsegment": pa.array([r[1] for r in rows], pa.string()),
                "c_nationkey": pa.array([r[2] for r in rows], pa.int64()),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    return str(tmp_path)


def test_dp_histogram_noise_matches_python_mirror(spark, tmp_path):
    import hashlib

    from kaspi_etl_spark.llm.lm import FLOG2_ONE, flog2_int
    from kaspi_etl_spark.registry import (
        _DP_EPS_L,
        _DP_SEED,
        q_customers_dp_histogram,
    )

    rows = [(i, ["AUTO", "HOUSE"][i % 2], i % 3) for i in range(30)]
    sf = _write_customers(tmp_path, rows)
    out = {(r.segment, r.nation): r for r in q_customers_dp_histogram(spark, sf).collect()}
    assert len(out) == 6

    def md5_long(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def geom(ck: str, salt: str) -> int:
        h = md5_long(ck + salt)
        return (60 * FLOG2_ONE - flog2_int(h + 1)) // _DP_EPS_L

    from collections import Counter

    truth = Counter((seg, nat) for _, seg, nat in rows)
    for (seg, nat), r in out.items():
        ck = f"{seg}#{nat}"
        want = geom(ck, _DP_SEED + "a") - geom(ck, _DP_SEED + "b")
        assert r.noise == want, (seg, nat)
        assert r.noisy_count == truth[(seg, nat)] + want


def test_dp_histogram_noise_is_seeded_and_varied(spark, tmp_path):
    from kaspi_etl_spark.registry import q_customers_dp_histogram

    rows = [(i, f"S{i % 7}", i % 5) for i in range(70)]
    sf = _write_customers(tmp_path, rows)
    a = sorted(map(tuple, q_customers_dp_histogram(spark, sf).collect()))
    b = sorted(map(tuple, q_customers_dp_histogram(spark, sf).collect()))
    assert a == b  # reproducible release: same seed -> same noise
    noises = {r[2] for r in a}
    assert len(noises) > 1  # the draw actually varies across cells


# --- packing report ----------------------------------------------------------


def test_pack_report_single_long_doc(spark, tmp_path):
    from kaspi_etl_spark.registry import q_token_pack_report

    sf = _write_docs(tmp_path, [(1, " ".join(f"w{i}" for i in range(1024)))])
    rows = q_token_pack_report(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    # one 1024-token doc -> two full 512 sequences, both holding a
    # boundary-crossing span of the same single doc
    assert (r.n_docs, r.n_seqs, r.tokens) == (1, 2, 1024)
    assert r.min_fill == 512 and r.fill_ppm == 1_000_000
    assert r.boundary_docs == 2


def test_pack_report_exact_fit_docs_never_cross(spark, tmp_path):
    from kaspi_etl_spark.registry import q_token_pack_report

    docs = [(i, " ".join(f"w{j}" for j in range(512))) for i in range(4)]
    sf = _write_docs(tmp_path, docs)
    rows = q_token_pack_report(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_docs, r.n_seqs, r.tokens) == (1, 4, 2048)
    assert r.boundary_docs == 0  # every doc lands exactly on a boundary
    assert r.fill_ppm == 1_000_000


# --- retention matrix --------------------------------------------------------


def _write_events(tmp_path, rows):
    """rows: (event_id, ts, user_id)"""
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array(["view"] * len(rows), pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    return str(tmp_path)


def test_retention_matrix_hand_case(spark, tmp_path):
    from kaspi_etl_spark.registry import q_events_retention_matrix

    mon0 = dt.datetime(2020, 1, 6)  # a Monday
    wk = dt.timedelta(weeks=1)
    rows = [
        # cohort A (week 0): users 1,2. user 1 returns weeks 1 and 2;
        # user 2 returns week 2 only.
        (1, mon0, 1),
        (2, mon0 + dt.timedelta(days=2), 2),
        (3, mon0 + wk, 1),
        (4, mon0 + 2 * wk, 1),
        (5, mon0 + 2 * wk + dt.timedelta(days=3), 2),
        # cohort B (week 1): user 3, never returns
        (6, mon0 + wk + dt.timedelta(days=1), 3),
    ]
    sf = _write_events(tmp_path, rows)
    out = {
        (r.cohort_week, r.week_offset): r
        for r in q_events_retention_matrix(spark, sf).collect()
    }
    a, b = dt.date(2020, 1, 6), dt.date(2020, 1, 13)
    assert out[(a, 0)].cohort_size == 2 and out[(a, 0)].retention_ppm == 1_000_000
    assert out[(a, 1)].n_active == 1 and out[(a, 1)].retention_ppm == 500_000
    assert out[(a, 2)].n_active == 2 and out[(a, 2)].retention_ppm == 1_000_000
    assert out[(b, 0)].cohort_size == 1
    assert (b, 1) not in out  # user 3 never returns


# --- RAKE keyphrases ---------------------------------------------------------


def test_rake_scores_multiword_phrases_above_lone_words(spark, tmp_path):
    from kaspi_etl_spark.registry import q_docs_rake_keyphrases

    # "deep learning" co-occurs as a run twice; "the" is a stopword so
    # "systems" appears as a lone candidate.
    docs = [
        (1, "deep learning beats the baseline"),
        (2, "deep learning and the systems"),
    ]
    sf = _write_docs(tmp_path, docs)
    rows = {r.phrase: r for r in q_docs_rake_keyphrases(spark, sf).collect()}
    # candidates: "deep learning beats" (len 3), "baseline",
    # "deep learning" (len 2, after 'and' is a stopword), "systems"
    assert "deep learning beats" in rows
    assert "systems" in rows
    # RAKE favors words living in longer runs: deep/learning degree >
    # freq, so any multiword phrase outscores a lone single word
    assert rows["deep learning"].score > rows["systems"].score
    # score arithmetic: hand-check "systems" (freq 1, degree 1)
    assert rows["systems"].score == 1_000_000


def test_rake_all_stopword_doc_emits_nothing(spark, tmp_path):
    from kaspi_etl_spark.registry import q_docs_rake_keyphrases

    sf = _write_docs(tmp_path, [(1, "the and of to"), (2, None)])
    assert q_docs_rake_keyphrases(spark, sf).count() == 0


# --- ABC analysis ------------------------------------------------------------


def _write_lineitem(tmp_path, rows):
    """rows: (partkey, extendedprice)"""
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_extendedprice": pa.array(
                    [float(r[1]) for r in rows], pa.float64()
                ),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    return str(tmp_path)


def test_abc_analysis_hand_case(spark, tmp_path):
    from kaspi_etl_spark.registry import q_sku_abc_analysis

    # revenues: 70, 20, 6, 4 (total 100) in DESC order ->
    # exclusive prefixes 0, 70, 90, 96 -> A (0<80), B (70<95... wait:
    # A while prev < 80: sku1 prev 0 -> A; sku2 prev 70 -> B? 70*5=350
    # < 400 -> A! (prev < 80% of total). sku3 prev 90 -> B (90<95).
    # sku4 prev 96 -> C.
    rows = [(1, 70.0), (2, 20.0), (3, 6.0), (4, 4.0)]
    sf = _write_lineitem(tmp_path, rows)
    out = {r.sku: r for r in q_sku_abc_analysis(spark, sf).collect()}
    assert out[1].abc == "A" and out[2].abc == "A"
    assert out[3].abc == "B"
    assert out[4].abc == "C"
    assert out[4].cum_rev == 100 and out[4].cum_share_ppm == 1_000_000


# --- UniMax mixing -----------------------------------------------------------


def test_unimax_water_filling_hand_case(spark, tmp_path):
    from kaspi_etl_spark.registry import q_corpus_mix_unimax

    def words(n):
        return " ".join(f"w{i}" for i in range(n))

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array([words(10), words(100), words(100)], pa.string()),
                "source": pa.array(["tiny", "webA", "webB"], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = {r.source: r for r in q_corpus_mix_unimax(spark, str(tmp_path)).collect()}
    # total 210, budget 105. caps sorted: 10, 100, 100.
    # tiny: 10*3=30 <= 105 -> capped at 10. webA (rank 2 by name tie):
    # 100*2=200 > 95 -> uncapped. leftover 95 over 2 -> 47 each, +1 to
    # the first uncapped rank.
    assert out["tiny"].capped and out["tiny"].alloc == 10
    assert not out["webA"].capped and not out["webB"].capped
    assert sorted([out["webA"].alloc, out["webB"].alloc]) == [47, 48]
    assert sum(r.alloc for r in out.values()) == 105  # exactly the budget


def test_unimax_budget_exceeding_caps_allocates_caps(spark, tmp_path):
    from kaspi_etl_spark.registry import q_corpus_mix_unimax

    # Two equal sources: budget = total/2 = one source's size; both
    # sources' caps exceed the uniform share -> nobody capped, equal split.
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(
                    [" ".join(f"a{i}" for i in range(40))] * 2, pa.string()
                ),
                "source": pa.array(["s1", "s2"], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = {r.source: r for r in q_corpus_mix_unimax(spark, str(tmp_path)).collect()}
    assert out["s1"].alloc == out["s2"].alloc == 20


# --- langid confusion --------------------------------------------------------


def test_langid_confusion_flags_mislabels(spark, tmp_path):
    from kaspi_etl_spark.registry import q_docs_langid_confusion

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                # doc 1: English markers, labeled en -> agree.
                # doc 2: English markers, labeled fr -> disagree.
                "text": pa.array(
                    ["the cat and the dog is in the house",
                     "the bird and the fish is near the tree"],
                    pa.string(),
                ),
                "lang": pa.array(["en", "fr"], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = {(r.lang_label, r.lang_pred): r
           for r in q_docs_langid_confusion(spark, str(tmp_path)).collect()}
    assert out[("en", "en")].agree and out[("en", "en")].n_docs == 1
    assert not out[("fr", "en")].agree and out[("fr", "en")].n_docs == 1


# --- diff-in-diff ------------------------------------------------------------


def test_diff_in_diff_cell_means_and_estimate(spark, tmp_path):
    import hashlib

    from kaspi_etl_spark.registry import q_events_diff_in_diff

    def treat(u):
        return int(hashlib.md5(f"{u}did".encode()).hexdigest()[:15], 16) % 2

    # pick user ids for each arm deterministically
    t_users = [u for u in range(50) if treat(u) == 1][:2]
    c_users = [u for u in range(50) if treat(u) == 0][:2]
    pre, post = dt.datetime(2020, 1, 1), dt.datetime(2020, 12, 31)
    rows = []
    eid = 0
    # treated: pre mean 1.00, post mean 3.00; control: 1.00 -> 1.50
    for u in t_users:
        rows += [(eid := eid + 1, pre, u, 1.0), (eid := eid + 1, post, u, 3.0)]
    for u in c_users:
        rows += [(eid := eid + 1, pre, u, 1.0), (eid := eid + 1, post, u, 1.5)]
    sf = _write_events(tmp_path, [(i, ts, u) for i, ts, u, _ in rows])
    # rewrite with the real values (helper writes value=1.0)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array(["view"] * len(rows), pa.string()),
                "value": pa.array([r[3] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    out = q_events_diff_in_diff(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    # means in cents * 1e6: 100e6, 300e6, 100e6, 150e6
    assert (r.m_t_pre, r.m_t_post) == (100_000_000, 300_000_000)
    assert (r.m_c_pre, r.m_c_post) == (100_000_000, 150_000_000)
    # DiD = (300 - 100) - (150 - 100) = 150 cents
    assert r.did_scaled == 150_000_000


def test_diff_in_diff_missing_cell_is_null(spark, tmp_path):
    import hashlib

    from kaspi_etl_spark.registry import q_events_diff_in_diff

    def treat(u):
        return int(hashlib.md5(f"{u}did".encode()).hexdigest()[:15], 16) % 2

    u_t = next(u for u in range(50) if treat(u) == 1)
    rows = [
        (1, dt.datetime(2020, 1, 1), u_t),
        (2, dt.datetime(2020, 6, 1), u_t),
    ]
    sf = _write_events(tmp_path, rows)
    out = q_events_diff_in_diff(spark, sf).collect()
    assert len(out) == 1 and out[0].did_scaled is None  # no control cells


# --- in-context pack ---------------------------------------------------------


def test_incontext_pack_clusters_are_contiguous(spark):
    from kaspi_etl_spark.registry import q_docs_incontext_pack

    sf = "/root/testdata/sf0.001"
    rows = q_docs_incontext_pack(spark, sf).collect()
    assert rows
    # global order is cluster-ascending: the token interval [start, end)
    # of cluster c must end before cluster c+1 begins
    lo, hi = {}, {}
    for r in rows:
        start = r.seq_id * 512 + r.seq_offset - r.doc_offset
        lo[r.cluster] = min(lo.get(r.cluster, 1 << 60), start)
        hi[r.cluster] = max(hi.get(r.cluster, -1), r.seq_id * 512 + r.seq_offset + r.n_in_seq)
    cs = sorted(lo)
    for a, b in zip(cs, cs[1:]):
        assert hi[a] <= lo[b] + 0  # no interleaving between clusters
    # spans tile each sequence without overlap
    by_seq = {}
    for r in rows:
        by_seq.setdefault(r.seq_id, []).append((r.seq_offset, r.n_in_seq))
    for sid, spans in by_seq.items():
        spans.sort()
        pos = spans[0][0]
        for off, n in spans:
            assert off == pos
            pos = off + n
