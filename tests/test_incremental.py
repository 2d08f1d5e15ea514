"""Incremental aggregate state (ops/incremental.py) and weighted
sampling — merge-equals-recompute properties and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaspi_etl_spark.ops import incremental as inc
from kaspi_etl_spark.registry import QUERIES


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v long")


def _by_key(state_df):
    return {
        r["k"]: (r["n_rows"], r["sum_val"], r["min_val"], r["max_val"])
        for r in state_df.collect()
    }


def test_merge_equals_full_recompute(spark):
    rows = [("a", 1), ("a", 5), ("b", 2), ("b", -7), ("c", 0), ("a", 9)]
    full = inc.partial_state(_df(spark, rows), ["k"], "v")
    merged = inc.merge_states(
        inc.partial_state(_df(spark, rows[:2]), ["k"], "v"),
        inc.partial_state(_df(spark, rows[2:]), ["k"], "v"),
        ["k"],
    )
    assert _by_key(merged) == _by_key(full)


def test_merge_is_commutative_and_handles_disjoint_keys(spark):
    a = inc.partial_state(_df(spark, [("a", 1), ("b", 2)]), ["k"], "v")
    b = inc.partial_state(_df(spark, [("b", 10), ("z", 3)]), ["k"], "v")
    ab, ba = _by_key(inc.merge_states(a, b, ["k"])), _by_key(inc.merge_states(b, a, ["k"]))
    assert ab == ba
    assert ab["z"] == (1, 3, 3, 3)  # key only in one state survives merge
    assert ab["b"] == (2, 12, 2, 10)


def test_merge_with_empty_batch_is_identity(spark):
    a = inc.partial_state(_df(spark, [("a", 4), ("a", 6)]), ["k"], "v")
    empty = inc.partial_state(_df(spark, []), ["k"], "v")
    assert _by_key(inc.merge_states(a, empty, ["k"])) == _by_key(a)


def test_finalize_avg(spark):
    a = inc.finalize(inc.partial_state(_df(spark, [("a", 4), ("a", 6)]), ["k"], "v"))
    row = a.collect()[0]
    assert row["avg_val"] == 5.0


def test_weighted_sample_is_top_k_not_global_sort(spark, sf_dir):
    df = QUERIES["docs_weighted_sample"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert len(rows) == 100
    # priorities ascending and deterministic across re-runs
    prios = [r["priority"] for r in rows]
    assert prios == sorted(prios)
    rows2 = QUERIES["docs_weighted_sample"](spark, sf_dir).collect()
    assert [r["doc_id"] for r in rows2] == [r["doc_id"] for r in rows]


def test_hll_sketch_state_merges_without_double_count(spark):
    # two batches with OVERLAPPING distinct users: a naive distinct-count
    # merge would double-count; the HLL union must not.
    rows_a = [("d1", i, i % 50) for i in range(200)]
    rows_b = [("d1", i, 25 + i % 50) for i in range(200)]  # users 25..74
    mk = lambda rows: spark.createDataFrame(rows, "k string, v long, user long")  # noqa: E731
    a = inc.partial_state_sketch(mk(rows_a), ["k"], "v", "user")
    b = inc.partial_state_sketch(mk(rows_b), ["k"], "v", "user")
    merged = inc.finalize_sketch(inc.merge_states_sketch(a, b, ["k"])).collect()[0]
    # true distinct = 75 (0..74); lg_k=12 HLL is ~2% rse at this scale
    assert abs(merged["n_distinct_approx"] - 75) <= 5
    assert merged["n_rows"] == 400
    # merged sketch must equal the sketch built over all data in one pass
    full = inc.finalize_sketch(
        inc.partial_state_sketch(mk(rows_a + rows_b), ["k"], "v", "user")
    ).collect()[0]
    assert merged["n_distinct_approx"] == full["n_distinct_approx"]


def test_incremental_stream_job_converges_to_batch_recompute(spark):
    import os
    import shutil
    import tempfile
    import time as _time

    from kaspi_etl_spark.streaming import incremental as sinc

    src = tempfile.mkdtemp(prefix="inc_src_")
    state = tempfile.mkdtemp(prefix="inc_state_") + "/state"
    ckpt = tempfile.mkdtemp(prefix="inc_ckpt_")
    schema = "day string, amount long"
    try:
        batches = [
            [("2024-01-01", 10), ("2024-01-01", 20), ("2024-01-02", 5)],
            [("2024-01-01", 7)],
            [("2024-01-02", 100), ("2024-01-03", 1)],
        ]
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "overwrite"
            ).json(f"{src}/tick_{i}")
            _time.sleep(1.2)  # distinct mtimes -> stable batch order

        q = sinc.incremental_agg_stream_job(
            spark,
            source_dir=f"{src}/tick_*",
            state_path=state,
            checkpoint_dir=ckpt,
            schema=schema,
            keys=["day"],
            val_col="amount",
            max_files_per_trigger=1,  # force one merge per batch
        ).start()
        q.awaitTermination(120)

        got = {
            r["day"]: (r["n_rows"], r["sum_val"], r["min_val"], r["max_val"])
            for r in spark.read.parquet(state).collect()
        }
        all_rows = [r for b in batches for r in b]
        full = inc.partial_state(
            spark.createDataFrame(all_rows, schema), ["day"], "amount"
        )
        want = {
            r["day"]: (r["n_rows"], r["sum_val"], r["min_val"], r["max_val"])
            for r in full.collect()
        }
        assert got == want
    finally:
        for d in (src, os.path.dirname(state), ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_bloom_stream_job_converges_to_batch_build(spark):
    import shutil as _shutil
    import tempfile
    import time as _time

    from kaspi_etl_spark.llm import sketch
    from kaspi_etl_spark.streaming import incremental as sinc

    src = tempfile.mkdtemp(prefix="bloom_src_")
    state = tempfile.mkdtemp(prefix="bloom_state_") + "/state"
    ckpt = tempfile.mkdtemp(prefix="bloom_ckpt_")
    schema = "k long"
    try:
        batches = [[(i,) for i in range(0, 50)], [(i,) for i in range(40, 90)]]
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "overwrite"
            ).json(f"{src}/tick_{i}")
            _time.sleep(1.2)

        q = sinc.bloom_stream_job(
            spark,
            source_dir=f"{src}/tick_*",
            state_path=state,
            checkpoint_dir=ckpt,
            schema=schema,
            key_col="k",
        ).start()
        q.awaitTermination(120)

        streamed = spark.read.parquet(state)
        batch = sketch.bloom_build(
            spark.createDataFrame([(i,) for i in range(0, 90)], schema), "k"
        )
        # streamed state == one-shot batch build, word for word (BIT_OR
        # merge is order/replay-insensitive)
        assert sorted(map(tuple, streamed.collect())) == sorted(
            map(tuple, batch.collect())
        )
        # and it answers membership with no false negatives mid-pipeline
        probes = spark.createDataFrame([(i,) for i in range(0, 120)], schema)
        out = {r["k"]: r["might_contain"]
               for r in sketch.bloom_probe(probes, streamed, "k").collect()}
        assert all(out[i] for i in range(90))
    finally:
        _shutil.rmtree(src, ignore_errors=True)
        _shutil.rmtree(ckpt, ignore_errors=True)
        _shutil.rmtree(state, ignore_errors=True)


def test_incremental_job_restart_processes_only_new_files(spark):
    """Exactly-once across restarts: run the job to completion, add more
    source files, run AGAIN with the SAME checkpoint — the old batches
    must not re-merge (state equals the one-shot recompute, not a
    double-count)."""
    import shutil as _shutil
    import tempfile
    import time as _time

    from kaspi_etl_spark.ops import incremental as inc
    from kaspi_etl_spark.streaming import incremental as sinc

    src = tempfile.mkdtemp(prefix="rs_src_")
    state = tempfile.mkdtemp(prefix="rs_state_") + "/state"
    ckpt = tempfile.mkdtemp(prefix="rs_ckpt_")
    schema = "day string, amount long"
    try:
        first = [("d1", 10), ("d1", 5), ("d2", 7)]
        spark.createDataFrame(first, schema).coalesce(1).write.mode(
            "overwrite"
        ).json(f"{src}/tick_0")

        def run():
            q = sinc.incremental_agg_stream_job(
                spark,
                source_dir=f"{src}/tick_*",
                state_path=state,
                checkpoint_dir=ckpt,
                schema=schema,
                keys=["day"],
                val_col="amount",
            ).start()
            q.awaitTermination(120)

        run()
        _time.sleep(1.2)
        second = [("d1", 100), ("d3", 1)]
        spark.createDataFrame(second, schema).coalesce(1).write.mode(
            "overwrite"
        ).json(f"{src}/tick_1")
        run()  # restart on the same checkpoint

        got = {
            r["day"]: (r["n_rows"], r["sum_val"])
            for r in spark.read.parquet(state).collect()
        }
        full = inc.partial_state(
            spark.createDataFrame(first + second, schema), ["day"], "amount"
        )
        want = {
            r["day"]: (r["n_rows"], r["sum_val"]) for r in full.collect()
        }
        assert got == want  # tick_0 merged exactly once despite the restart
    finally:
        for d in (src, ckpt):
            _shutil.rmtree(d, ignore_errors=True)
        _shutil.rmtree(state, ignore_errors=True)


def test_state_swap_crash_recovery(spark, tmp_path):
    """A crash BETWEEN the two swap renames leaves state_path absent with
    a __old_* backup on disk; the next merge must rename the backup back
    (recovery-is-a-rename) instead of silently rebuilding from only new
    batches — which for the Bloom state would mean false negatives from
    a sketch whose contract is 'false negatives never' (ADVICE r5)."""
    import os

    from kaspi_etl_spark.llm import sketch
    from kaspi_etl_spark.streaming import incremental as sinc

    state = str(tmp_path / "bloom_state")
    b0 = spark.createDataFrame([(i,) for i in range(0, 40)], "k long")
    b1 = spark.createDataFrame([(i,) for i in range(40, 80)], "k long")
    sinc.merge_bloom_batch(spark, b0, state, "k")
    # simulate the crash window: state renamed away, new state never landed
    os.rename(state, state + "__old_deadbeef")
    assert not os.path.exists(state)
    sinc.merge_bloom_batch(spark, b1, state, "k")
    got = sorted(map(tuple, spark.read.parquet(state).collect()))
    want = sorted(map(tuple, sketch.bloom_build(
        spark.createDataFrame([(i,) for i in range(0, 80)], "k long"), "k"
    ).collect()))
    assert got == want  # batch 0's members survived the crash
    assert not os.path.exists(state + "__old_deadbeef")

    # the aggregate-state merge shares the same swap + recovery
    agg_state = str(tmp_path / "agg_state")
    rows0 = [("d1", 10), ("d2", 5)]
    rows1 = [("d1", 7)]
    schema = "day string, amount long"
    sinc.merge_batch_into_state(
        spark, spark.createDataFrame(rows0, schema), agg_state, ["day"], "amount"
    )
    os.rename(agg_state, agg_state + "__old_cafe")
    sinc.merge_batch_into_state(
        spark, spark.createDataFrame(rows1, schema), agg_state, ["day"], "amount"
    )
    got_agg = {
        r["day"]: (r["n_rows"], r["sum_val"])
        for r in spark.read.parquet(agg_state).collect()
    }
    assert got_agg["d1"] == (2, 17) and got_agg["d2"] == (1, 5)


def test_hll_stream_job_converges_to_batch_registers(spark):
    import shutil as _shutil
    import tempfile
    import time as _time

    from kaspi_etl_spark.llm import sketch
    from kaspi_etl_spark.streaming import incremental as sinc

    src = tempfile.mkdtemp(prefix="hll_src_")
    state = tempfile.mkdtemp(prefix="hll_state_") + "/state"
    ckpt = tempfile.mkdtemp(prefix="hll_ckpt_")
    schema = "g string, k long"
    try:
        batches = [
            [("a", i) for i in range(0, 400)] + [("b", i) for i in range(0, 50)],
            # overlap: replays/overlaps must not double-count
            [("a", i) for i in range(300, 700)] + [("b", i) for i in range(40, 80)],
        ]
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "overwrite"
            ).json(f"{src}/tick_{i}")
            _time.sleep(1.2)

        q = sinc.hll_stream_job(
            spark,
            source_dir=f"{src}/tick_*",
            state_path=state,
            checkpoint_dir=ckpt,
            schema=schema,
            group_col="g",
            key_col="k",
        ).start()
        q.awaitTermination(120)

        streamed = spark.read.parquet(state)
        union = spark.createDataFrame(
            [("a", i) for i in range(0, 700)] + [("b", i) for i in range(0, 80)],
            schema,
        )
        direct = sketch.hll_registers(union, "g", "k")
        assert sorted(map(tuple, streamed.collect())) == sorted(
            map(tuple, direct.collect())
        )
        est = {r["g"]: r["dv_estimate"]
               for r in sketch.hll_estimate(streamed, "g").collect()}
        assert abs(est["a"] - 700) <= 0.15 * 700
        assert abs(est["b"] - 80) <= 15
    finally:
        _shutil.rmtree(src, ignore_errors=True)


def test_cms_stream_job_replay_does_not_double_count(spark):
    import shutil as _shutil
    import tempfile
    import time as _time

    from kaspi_etl_spark.llm import sketch
    from kaspi_etl_spark.streaming import incremental as sinc

    src = tempfile.mkdtemp(prefix="cms_src_")
    state = tempfile.mkdtemp(prefix="cms_state_") + "/state"
    ckpt = tempfile.mkdtemp(prefix="cms_ckpt_")
    schema = "token string"
    try:
        batches = [
            [("a",)] * 30 + [("b",)] * 5,
            [("a",)] * 10 + [("c",)] * 20,
        ]
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "overwrite"
            ).json(f"{src}/tick_{i}")
            _time.sleep(1.2)

        q = sinc.cms_stream_job(
            spark,
            source_dir=f"{src}/tick_*",
            state_path=state,
            checkpoint_dir=ckpt,
            schema=schema,
            token_col="token",
            max_files_per_trigger=1,  # force one file batch per micro-batch
        ).start()
        q.awaitTermination(120)

        streamed = spark.read.parquet(state)
        union = spark.createDataFrame(
            batches[0] + batches[1], schema
        )
        direct = sketch.cms_build(union, "token")
        assert sorted(map(tuple, streamed.collect())) == sorted(
            map(tuple, direct.collect())
        )
        # simulate a replay of the LAST batch (crash after state swap,
        # before checkpoint commit): a SUM state would double-count
        # without the in-state marker; with it the merge is a no-op
        last = spark.createDataFrame(batches[1], schema)
        sinc.merge_cms_batch(spark, last, state, batch_id=1)
        replayed = spark.read.parquet(state)
        assert sorted(map(tuple, replayed.collect())) == sorted(
            map(tuple, direct.collect())
        )
        # estimates over the streamed grid match exact counts (tiny set)
        probes = spark.createDataFrame([("a",), ("b",), ("c",)], schema)
        est = {r["token"]: r["est_count"]
               for r in sketch.cms_estimate(streamed, probes).collect()}
        assert est["a"] >= 40 and est["b"] >= 5 and est["c"] >= 20
    finally:
        _shutil.rmtree(src, ignore_errors=True)


def test_assoc_stream_job_state_equals_batch_rules(spark):
    import tempfile
    import time as _time

    from kaspi_etl_spark.ops import basket
    from kaspi_etl_spark.streaming import incremental as sinc

    src = tempfile.mkdtemp(prefix="assoc_src_")
    state = tempfile.mkdtemp(prefix="assoc_state_") + "/state"
    ckpt = tempfile.mkdtemp(prefix="assoc_ckpt_")
    schema = "o long, item long"
    # order-COMPLETE batches (the documented contract): orders 1-3 in
    # tick 0, orders 4-6 in tick 1
    batches = [
        [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 30)],
        [(4, 10), (4, 20), (5, 20), (5, 30), (6, 10), (6, 20)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).json(f"{src}/tick_{i}")
        _time.sleep(1.2)

    q = sinc.assoc_stream_job(
        spark,
        source_dir=f"{src}/tick_*",
        state_path=state,
        checkpoint_dir=ckpt,
        schema=schema,
        max_files_per_trigger=1,
    ).start()
    q.awaitTermination(120)

    key = lambda r: (r.antecedent, r.consequent)  # noqa: E731
    streamed = {
        key(r): (r.support_cnt, r.n_antecedent, r.n_consequent, r.n_baskets,
                 r.conf_ppm, r.lift_ppm)
        for r in sinc.assoc_rules_from_state(spark, state, min_support=2).collect()
    }
    union = spark.createDataFrame(batches[0] + batches[1], schema)
    direct = {
        key(r): (r.support_cnt, r.n_antecedent, r.n_consequent, r.n_baskets,
                 r.conf_ppm, r.lift_ppm)
        for r in basket.association_rules(union, min_support=2).collect()
    }
    assert streamed == direct and len(streamed) > 0

    # replay the LAST batch (crash between state swap and checkpoint
    # commit): SUM counts would double without the in-state marker
    last = spark.createDataFrame(batches[1], schema)
    sinc.merge_assoc_batch(spark, last, state, batch_id=1)
    replayed = {
        key(r): (r.support_cnt, r.n_antecedent, r.n_consequent, r.n_baskets,
                 r.conf_ppm, r.lift_ppm)
        for r in sinc.assoc_rules_from_state(spark, state, min_support=2).collect()
    }
    assert replayed == direct


def test_novelty_stream_job_scores_against_prior_batches_only(spark):
    import shutil as _shutil
    import tempfile
    import time as _time

    from kaspi_etl_spark.llm import dedup, sketch
    from kaspi_etl_spark.streaming import incremental as sinc

    src = tempfile.mkdtemp(prefix="nov_src_")
    state = tempfile.mkdtemp(prefix="nov_state_") + "/state"
    scores = tempfile.mkdtemp(prefix="nov_scores_")
    ckpt = tempfile.mkdtemp(prefix="nov_ckpt_")
    schema = "doc_id long, text string"
    t1 = "alpha beta gamma delta epsilon zeta"
    t2 = "eta theta iota kappa lambda mu"
    t3 = "completely different words entirely here now"
    try:
        batches = [
            [(1, t1), (2, t2)],
            [(11, t1), (13, t3)],  # 11 repeats batch-0 text, 13 is new
        ]
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "overwrite"
            ).json(f"{src}/tick_{i}")
            _time.sleep(1.2)

        q = sinc.novelty_stream_job(
            spark,
            source_dir=f"{src}/tick_*",
            state_path=state,
            scores_path=scores,
            checkpoint_dir=ckpt,
            schema=schema,
            max_files_per_trigger=1,
        ).start()
        q.awaitTermination(120)

        got = {
            r.doc_id: r for r in spark.read.parquet(f"{scores}/batch=*").collect()
        }
        assert set(got) == {1, 2, 11, 13}
        # batch 0 scored against an EMPTY filter: everything novel
        assert got[1].novelty_ppm == 1_000_000
        assert got[2].novelty_ppm == 1_000_000
        # batch 1: repeated text fully seen, new text fully novel
        assert got[11].novelty_ppm == 0
        assert got[13].novelty_ppm == 1_000_000

        # final state equals a one-shot batch build over all docs
        union = spark.createDataFrame(batches[0] + batches[1], schema)
        direct = sketch.bloom_build(
            dedup.doc_shingle_rows(union).select("shingle"), "shingle"
        )
        streamed = spark.read.parquet(state)
        assert sorted(map(tuple, streamed.collect())) == sorted(
            map(tuple, direct.collect())
        )

        # replay of the last batch (crash after swap, before checkpoint
        # commit): marker makes it a no-op for BOTH outputs
        last = spark.createDataFrame(batches[1], schema)
        sinc.merge_novelty_batch(spark, last, 1, state, scores)
        replay_scores = {
            r.doc_id: r.novelty_ppm
            for r in spark.read.parquet(f"{scores}/batch=*").collect()
        }
        assert replay_scores[11] == 0 and replay_scores[13] == 1_000_000
        assert sorted(map(tuple, spark.read.parquet(state).collect())) == sorted(
            map(tuple, direct.collect())
        )
    finally:
        _shutil.rmtree(src, ignore_errors=True)
        _shutil.rmtree(scores, ignore_errors=True)


def test_minhash_index_stream_job_equals_batch_probe(spark):
    import shutil as _shutil
    import tempfile
    import time as _time

    from kaspi_etl_spark.llm import dedup
    from kaspi_etl_spark.streaming import incremental as sinc

    src = tempfile.mkdtemp(prefix="mhi_src_")
    index = tempfile.mkdtemp(prefix="mhi_idx_") + "/index"
    matches = tempfile.mkdtemp(prefix="mhi_m_")
    ckpt = tempfile.mkdtemp(prefix="mhi_ckpt_")
    schema = "doc_id long, text string"
    base = "the quick brown fox jumps over the lazy dog again and again today"
    other = "completely unrelated sentence with distinct vocabulary all around"
    try:
        batches = [
            [(1, base), (2, other)],
            # 11 is a near-dup of 1 (one word appended); 13 is novel
            [(11, base + " tail"), (13, "yet more fully disjoint words here")],
        ]
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "overwrite"
            ).json(f"{src}/tick_{i}")
            _time.sleep(1.2)

        q = sinc.minhash_index_stream_job(
            spark,
            source_dir=f"{src}/tick_*",
            index_path=index,
            matches_path=matches,
            checkpoint_dir=ckpt,
            schema=schema,
            max_files_per_trigger=1,
        ).start()
        q.awaitTermination(120)

        got = spark.read.parquet(f"{matches}/batch=*").drop("batch").collect()
        # streamed matches == the gated batch operator probing tick-1
        # against tick-0 (batch 0 probes an empty index: no rows)
        t0 = spark.createDataFrame(batches[0], schema)
        t1 = spark.createDataFrame(batches[1], schema)
        direct = dedup.minhash_index_probe(t0, t1).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, direct))
        assert len(direct) >= 1  # the near-dup pair (11, 1) was found
        assert {(r.batch_id, r.index_id) for r in direct} == {(11, 1)}

        # replay of the last batch: probe filters batch < 1, writes
        # overwrite the same partitions — byte-identical state + matches
        sinc.minhash_index_step(spark, t1, 1, index, matches)
        again = spark.read.parquet(f"{matches}/batch=*").drop("batch").collect()
        assert sorted(map(tuple, again)) == sorted(map(tuple, direct))
    finally:
        for d in (src, matches):
            _shutil.rmtree(d, ignore_errors=True)


def test_compact_minhash_index_preserves_probe_results(spark):
    import os
    import shutil as _shutil
    import tempfile

    from kaspi_etl_spark.streaming import incremental as sinc

    index = tempfile.mkdtemp(prefix="mhc_idx_") + "/index"
    matches = tempfile.mkdtemp(prefix="mhc_m_")
    schema = "doc_id long, text string"
    base = "the quick brown fox jumps over the lazy dog again and again today"
    try:
        b0 = spark.createDataFrame([(1, base), (2, "unrelated words here")], schema)
        b1 = spark.createDataFrame([(5, "other disjoint content body")], schema)
        b2 = spark.createDataFrame([(11, base + " tail")], schema)
        sinc.minhash_index_step(spark, b0, 0, index, matches)
        sinc.minhash_index_step(spark, b1, 1, index, matches)
        before = sorted(
            map(tuple, spark.read.parquet(f"{matches}/batch=*").drop("batch").collect())
        )
        # compact batches 0..1 (strictly below the next batch id 2)
        sinc.compact_minhash_index(spark, index, upto_batch=1)
        assert sorted(os.listdir(f"{index}/bands")) == ["batch=1"]
        # probing batch 2 sees the SAME index content post-compaction
        sinc.minhash_index_step(spark, b2, 2, index, matches)
        got = spark.read.parquet(f"{matches}/batch=2").collect()
        assert {(r.batch_id, r.index_id) for r in got} == {(11, 1)}
        # and the earlier matches are untouched
        after = sorted(
            map(
                tuple,
                spark.read.parquet(f"{matches}/batch={{0,1}}")
                .drop("batch")
                .collect(),
            )
        )
        assert after == before
    finally:
        _shutil.rmtree(matches, ignore_errors=True)


def test_quality_gate_stream_job_matches_batch_and_replays(spark):
    import shutil as _shutil
    import tempfile
    import time as _time

    from kaspi_etl_spark.llm import classifier
    from kaspi_etl_spark.streaming import incremental as sinc

    src = tempfile.mkdtemp(prefix="qg_src_")
    out = tempfile.mkdtemp(prefix="qg_out_")
    ckpt = tempfile.mkdtemp(prefix="qg_ckpt_")
    schema = "doc_id long, text string"
    long_doc = " ".join(f"w{i}" for i in range(40))
    spam_doc = "w1 w2 " * 20  # positive-class tokens, top-2-gram dominated
    short_doc = "tiny doc"
    try:
        # freeze a model offline on a corpus with long-vs-short labels
        train_rows = [(i, long_doc if i % 2 else short_doc) for i in range(40)]
        train = spark.createDataFrame(train_rows, schema)
        weights = classifier.train(
            train, (F.length("text") > 50).cast("long")
        )

        batches = [
            [(1, long_doc), (2, short_doc)],
            [(11, spam_doc), (12, long_doc), (13, None)],
        ]
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "overwrite"
            ).json(f"{src}/tick_{i}")
            _time.sleep(1.2)

        q = sinc.quality_gate_stream_job(
            spark,
            source_dir=f"{src}/tick_*",
            weights=weights,
            out_path=out,
            checkpoint_dir=ckpt,
            schema=schema,
            max_files_per_trigger=1,
        ).start()
        q.awaitTermination(120)

        got = {r.doc_id: r for r in spark.read.parquet(f"{out}/batch=*").collect()}
        assert set(got) == {1, 2, 11, 12}  # NULL-text row dropped
        assert got[1].admit and got[12].admit
        assert not got[2].admit  # classifier-negative (short)
        # classifier says yes (positive-class vocabulary) but the
        # repetition gate vetoes: admit must be False
        assert got[11].pred == 1 and not got[11].rep_pass and not got[11].admit
        # streamed values == the batch operators run directly
        union = spark.createDataFrame(
            batches[0] + batches[1], schema
        ).filter(F.col("text").isNotNull())
        direct = {
            r.doc_id: r
            for r in classifier.predict(union, weights).collect()
        }
        for d, r in got.items():
            assert r.p_scaled == direct[d].p_scaled
            assert r.pred == direct[d].pred
        # replay of the last batch overwrites idempotently
        last = spark.createDataFrame(batches[1], schema)
        sinc.quality_gate_step(spark, last, 1, weights, out)
        again = {r.doc_id: r for r in spark.read.parquet(f"{out}/batch=*").collect()}
        assert {d: r.p_scaled for d, r in again.items()} == {
            d: r.p_scaled for d, r in got.items()
        }
    finally:
        _shutil.rmtree(src, ignore_errors=True)
        _shutil.rmtree(out, ignore_errors=True)


def test_srm_monitor_stream_matches_batch_and_replays(spark):
    import shutil as _shutil
    import tempfile
    import time as _time

    from kaspi_etl_spark.ops.behavior import srm_stats
    from kaspi_etl_spark.streaming import incremental as sinc

    src = tempfile.mkdtemp(prefix="srm_src_")
    out = tempfile.mkdtemp(prefix="srm_out_") + "/srm"
    state = tempfile.mkdtemp(prefix="srm_state_") + "/units"
    ckpt = tempfile.mkdtemp(prefix="srm_ckpt_")
    schema = "event_type string, user_id long"
    batches = [
        [("click", u) for u in range(100)],
        # duplicates of batch 0's users plus new ones: set semantics
        # must count each (event_type, user) once
        [("click", u) for u in range(50, 150)] + [("view", u) for u in range(30)],
        [("view", None)],  # NULL user is a real unit
    ]
    try:
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "overwrite"
            ).json(f"{src}/tick_{i}")
            _time.sleep(1.2)
        q = sinc.srm_monitor_stream_job(
            spark,
            source_dir=f"{src}/tick_*",
            state_path=state,
            out_path=out,
            checkpoint_dir=ckpt,
            schema=schema,
            max_files_per_trigger=1,
        ).start()
        q.awaitTermination(120)

        got = {r.event_type: r for r in spark.read.parquet(out).collect()}
        union = spark.createDataFrame(
            [r for b in batches for r in b], schema
        ).select("event_type", "user_id").distinct()
        want = {r.event_type: r for r in srm_stats(union).collect()}
        assert set(got) == set(want) == {"click", "view"}
        for k in got:
            assert (got[k].n_units, got[k].n_a, got[k].n_b, got[k].chi2_ppm) == (
                want[k].n_units,
                want[k].n_a,
                want[k].n_b,
                want[k].chi2_ppm,
            )
        assert got["click"].n_units == 150  # dedup across batches
        assert got["view"].n_units == 31  # NULL user counted

        # replaying the LAST batch is idempotent (set-union state)
        last = spark.createDataFrame(batches[2], schema)
        sinc.srm_monitor_step(spark, last, 2, state, out)
        again = {r.event_type: r for r in spark.read.parquet(out).collect()}
        assert {k: v.n_units for k, v in again.items()} == {
            k: v.n_units for k, v in got.items()
        }
    finally:
        for p in (src, out, state, ckpt):
            _shutil.rmtree(p, ignore_errors=True)


def test_benford_monitor_stream_matches_batch_and_replays(spark):
    import tempfile
    import time as _time

    from kaspi_etl_spark.ops.behavior import benford_stats
    from kaspi_etl_spark.streaming import incremental as sinc

    src = tempfile.mkdtemp(prefix="bf_src_")
    out = tempfile.mkdtemp(prefix="bf_out_") + "/audit"
    state = tempfile.mkdtemp(prefix="bf_state_") + "/counts"
    ckpt = tempfile.mkdtemp(prefix="bf_ckpt_")
    schema = "amt long"
    batches = [
        [(a,) for a in [1, 12, 123, 2, 25, 31]],
        [(a,) for a in [9, 94, 100, 110, 7]],
        [(a,) for a in [0, -5, 1999]],  # non-positive amounts drop
    ]
    try:
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "overwrite"
            ).json(f"{src}/tick_{i}")
            _time.sleep(1.2)
        q = sinc.benford_monitor_stream_job(
            spark,
            source_dir=f"{src}/tick_*",
            state_path=state,
            out_path=out,
            checkpoint_dir=ckpt,
            schema=schema,
            max_files_per_trigger=1,
        ).start()
        q.awaitTermination(120)

        got = {r.digit: r for r in spark.read.parquet(out).collect()}
        union = spark.createDataFrame(
            [r for b in batches for r in b], schema
        )
        want = {r.digit: r for r in benford_stats(union, "amt").collect()}
        assert set(got) == set(want) == set(range(1, 10))
        for d in got:
            assert (got[d].n_obs, got[d].obs_ppm, got[d].chi2_contrib_ppm) == (
                want[d].n_obs,
                want[d].obs_ppm,
                want[d].chi2_contrib_ppm,
            )
        assert got[1].n_obs == 6  # 1, 12, 123, 100, 110, 1999
        assert sum(r.n_obs for r in got.values()) == 12  # 0 and -5 dropped

        # replaying the LAST batch overwrites its own partition: counts
        # unchanged (exactly-once without set semantics)
        last = spark.createDataFrame(batches[2], schema)
        sinc.benford_monitor_step(spark, last, 2, state, out)
        again = {r.digit: r.n_obs for r in spark.read.parquet(out).collect()}
        assert again == {d: r.n_obs for d, r in got.items()}
    finally:
        import shutil as _shutil

        # remove exactly the four mkdtemp roots (out/state are files
        # INSIDE their mkdtemp dirs — strip only the appended suffix)
        for p in (src, out.rsplit("/", 1)[0], state.rsplit("/", 1)[0], ckpt):
            _shutil.rmtree(p, ignore_errors=True)
