"""Scale stress harness: run the heavy pipelines on K x sf0.1 data built
by unioning id-shifted copies (no writes outside /tmp). Verifies no
scale cliffs (OOM, quadratic blowups, collect bottlenecks) beyond the
bench SF and reports rows/sec so scaling factors are visible.

Usage: python tools/stress.py [K] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from kaspi_etl_spark.llm import dedup, text  # noqa: E402
from kaspi_etl_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def scaled_docs(spark, k: int):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    parts = [
        base.select((F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"), "text")
        for i in range(k)
    ]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = set(sys.argv[2:])
    spark = get_spark("stress")
    docs = scaled_docs(spark, k)
    n_docs = docs.count()
    # Pair-finding stages always run AFTER exact dedup in a real
    # pipeline (running them on a corpus with verbatim copies is
    # deliberately quadratic: every copy pairs with every other).
    survivors = dedup.exact_dedup_keep(docs).localCheckpoint()
    n_surv = survivors.count()
    print(f"# stress corpus: {n_docs} docs ({k} x sf0.1), {n_surv} after exact dedup")

    def run(name, fn, base=n_docs):
        if only and name not in only:
            return
        t0 = time.time()
        n = fn().count()
        dt = time.time() - t0
        print(f"{name}: {dt:.1f}s  ({n} rows, {base / dt:.0f} docs/s)")

    run("exact_dedup", lambda: dedup.exact_dedup(docs))
    run(
        "minhash_lsh_pairs",
        lambda: dedup.minhash_near_dup_pairs(survivors, num_hashes=8, bands=4, threshold=0.5),
        n_surv,
    )
    run(
        "ngram_jaccard_pairs",
        lambda: dedup.ngram_jaccard_pairs(survivors, threshold=0.5),
        n_surv,
    )
    run("simhash_pairs", lambda: dedup.simhash_pairs(survivors, max_hamming=3), n_surv)
    run(
        "quality_features",
        lambda: text.quality_features(docs),
    )
    run(
        "dedup_clusters",
        lambda: dedup.connected_components(
            dedup.minhash_near_dup_pairs(survivors, num_hashes=8, bands=4, threshold=0.5)
        ),
        n_surv,
    )

    # Embedding path: K x sf0.1 vectors through the bucketed cosine
    # near-dup pipeline (candidate buckets + exact verify — the scale
    # shape that replaced the all-pairs join).
    from kaspi_etl_spark.llm import similarity as sim  # noqa: E402

    base_emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    emb_parts = [
        base_emb.select((F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"), "v")
        for i in range(k)
    ]
    emb = emb_parts[0]
    for p in emb_parts[1:]:
        emb = emb.unionByName(p)
    emb = emb.localCheckpoint()
    n_emb = emb.count()
    print(f"# stress embeddings: {n_emb} vectors ({k} x sf0.1)")
    run(
        "cosine_pairs_bucketed",
        lambda: sim.cosine_near_dup_pairs_bucketed(
            emb, threshold=0.99, id_col="vec_id", vec_col="v", dim=64
        ),
        n_emb,
    )
    run(
        "semantic_clusters",
        lambda: dedup.connected_components(
            sim.cosine_near_dup_pairs_bucketed(
                emb, threshold=0.99, id_col="vec_id", vec_col="v", dim=64
            ).select("id_a", "id_b")
        ),
        n_emb,
    )

    # Late-r5 operators at K x scale: Bloom build+probe over K x 600k
    # lineitem keys, z-order clustering write of the scaled key frame,
    # the dyadic EWMA over the scaled daily series, and the composed
    # corpus-cleaning pipeline over the duplicated docs.
    from kaspi_etl_spark import layout  # noqa: E402
    from kaspi_etl_spark.llm import pii, sketch, web  # noqa: E402

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    li_parts = [
        li.select(
            (F.col("l_orderkey") + F.lit(i * 100_000_000)).alias("k"),
            (F.col("l_partkey") + F.lit(i * 10_000_000)).alias("p"),
        )
        for i in range(k)
    ]
    keys = li_parts[0]
    for pt in li_parts[1:]:
        keys = keys.unionByName(pt)
    keys = keys.localCheckpoint()
    n_keys = keys.count()
    print(f"# stress keys: {n_keys} rows ({k} x sf0.1 lineitem)")

    if not only or "bloom" in only:
        t0 = time.time()
        # ~1.2k distinct member keys: a 16384-bit sketch holds them at
        # ~30% fill (size the sketch to the member set — %100 here would
        # saturate it and flag everything)
        members = keys.filter(F.col("k") % 1000 == 0).select("k")
        bloom = sketch.bloom_build(members, "k").localCheckpoint()
        t1 = time.time()
        probed = sketch.bloom_probe(keys, bloom, "k")
        n_might = probed.filter(F.col("might_contain")).count()
        t2 = time.time()
        n_lit = (
            sketch.bloom_probe_literal(keys, bloom, "k")
            .filter(F.col("might_contain"))
            .count()
        )
        t3 = time.time()
        assert n_lit == n_might
        print(
            f"bloom: build {t1 - t0:.1f}s, join-probe {t2 - t1:.1f}s "
            f"({n_keys / (t2 - t1):.0f} rows/s), literal-probe {t3 - t2:.1f}s "
            f"({n_keys / (t3 - t2):.0f} rows/s), {n_might} might-contain"
        )

    if not only or "zorder" in only:
        import shutil
        import tempfile

        zdir = tempfile.mkdtemp(prefix="stress_z_") + "/t"
        t0 = time.time()
        layout.write_zordered(keys, zdir, ["k", "p"], bits=20, num_files=64)
        dt = time.time() - t0
        print(f"zorder_write: {dt:.1f}s ({n_keys} rows, {n_keys / dt:.0f} rows/s)")
        shutil.rmtree(zdir.rsplit("/", 1)[0], ignore_errors=True)

    if not only or "media" in only:
        # Real-codec decode throughput through the Arrow batch path:
        # distinct baseline JPEGs (k x 400) and MJPEG-MP4 videos
        # (k x 40, 10 frames each) — the numbers that matter when the
        # corpus is payload-heavy. Payload bytes ride one localCheckpoint
        # so generation cost is excluded from the timed stage.
        import numpy as np  # noqa: E402

        from kaspi_etl_spark.llm import multimodal as mm  # noqa: E402
        from kaspi_etl_spark.llm.jpeg import encode_jpeg  # noqa: E402
        from kaspi_etl_spark.llm.mp4 import write_mp4  # noqa: E402

        n_imgs = 400 * k
        yy, xx = np.mgrid[0:48, 0:48]
        rows = []
        for i in range(n_imgs):
            px = np.stack(
                [(yy * 5 + i) % 256, (xx * 5 + 2 * i) % 256, (yy + xx + 3 * i) % 256],
                axis=2,
            ).astype(np.uint8)
            rows.append(
                (i, "image", "image/jpeg", bytearray(encode_jpeg(px, quality=85)),
                 (48, 48, 0, "jpeg"))
            )
        media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA).repartition(32)
        media = media.localCheckpoint()
        total_mb = sum(len(r[3]) for r in rows) / 1e6
        t0 = time.time()
        n_feat = mm.extract_features(media).count()
        dt = time.time() - t0
        assert n_feat == n_imgs
        print(
            f"jpeg_decode: {dt:.1f}s ({n_imgs} imgs, {n_imgs / dt:.0f} imgs/s, "
            f"{total_mb / dt:.1f} MB/s encoded)"
        )

        n_vids = 40 * k
        vrows = []
        for i in range(n_vids):
            frames = [
                encode_jpeg(
                    np.full((32, 32, 3), (i * 17 + f * 11) % 256, np.uint8),
                    quality=85,
                )
                for f in range(10)
            ]
            vrows.append(
                (i, "video", "video/mp4",
                 bytearray(write_mp4(frames, fps=2, codec=b"jpeg", width=32, height=32)),
                 (32, 32, 5000, "mjpeg"))
            )
        vids = spark.createDataFrame(vrows, mm.MEDIA_SCHEMA).repartition(32)
        vids = vids.localCheckpoint()
        t0 = time.time()
        n_frames = mm.sample_frames(vids, every_ms=1000).count()
        dt = time.time() - t0
        print(
            f"mp4_sample: {dt:.1f}s ({n_vids} videos -> {n_frames} frames, "
            f"{n_frames / dt:.0f} frames/s)"
        )

    if not only or "pipeline" in only:
        t0 = time.time()
        cleaned = dedup.exact_dedup_keep(
            pii.redact_documents(
                web.filter_blocked_domains(
                    docs.withColumn("source", F.lit("s")), ["spam.example.com"]
                )
            )
        )
        n_clean = cleaned.count()
        dt = time.time() - t0
        print(
            f"corpus_pipeline: {dt:.1f}s ({n_docs} docs in, {n_clean} out, "
            f"{n_docs / dt:.0f} docs/s)"
        )


if __name__ == "__main__":
    main()
