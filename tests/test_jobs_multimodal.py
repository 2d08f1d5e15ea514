"""Tests for the bulk-job runner (T6), Excel bridge gating (S3), and
multimodal plumbing (schema, batch shape, metadata pruning)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kaspi_etl_spark import jobs
from kaspi_etl_spark.llm import multimodal
from kaspi_etl_spark.sources import readers


def test_bulk_job_progress_and_results(spark):
    df = spark.createDataFrame(
        [(f"SKU_{i}", i) for i in range(10)], "sku string, v long"
    )
    runner = jobs.BulkJobRunner()
    job = runner.run(df, "sku", lambda chunk: chunk.count(), chunk_size=4)
    assert job.status == "done"
    assert job.total == 10 and job.processed == 10
    assert job.progress == 1.0
    assert sum(job.results) == 10  # 4 + 4 + 2
    assert runner.jobs[job.job_id] is job


def test_bulk_job_never_collects_keys_to_driver(spark, monkeypatch):
    """High-cardinality key column: only the per-bucket counts (one row
    per chunk) may reach the driver — never the key list itself."""
    df = spark.createDataFrame([(f"K{i}",) for i in range(1000)], "sku string")
    seen: list[int] = []
    cls = type(df)  # concrete DataFrame class (base class method is overridden)
    orig = cls.collect

    def spy(self):
        rows = orig(self)
        seen.append(len(rows))
        return rows

    monkeypatch.setattr(cls, "collect", spy)
    runner = jobs.BulkJobRunner()
    job = runner.run(df, "sku", lambda chunk: 0, chunk_size=100)
    assert job.status == "done"
    assert job.total == 1000 and job.processed == 1000
    assert seen and max(seen) <= 10  # bucket counts only (n_chunks rows)


def test_bulk_job_failure_recorded(spark):
    df = spark.createDataFrame([("a", 1)], "sku string, v long")
    runner = jobs.BulkJobRunner()

    def boom(chunk):
        raise ValueError("nope")

    job = runner.run(df, "sku", boom)
    assert job.status == "failed" and "nope" in job.error


def test_write_xlsx_roundtrip(spark, tmp_path):
    """CSV <-> XLSX round-trip (S16 export parity with the reference's
    exceljs route). Skipped where openpyxl is absent — the writer is
    import-gated exactly like the Excel reader bridge."""
    pytest.importorskip("openpyxl")
    import pandas as pd

    from kaspi_etl_spark.ops import export as export_ops

    df = spark.createDataFrame(
        [("M1", "P1", "red/M", "Alpha", 12990, "2025-01-01", False),
         ("M1", "P2", "blue/L", "Out of stock", 0, "", False)],
        "masterProductId string, productId string, label string, name string,"
        " price long, deliveryDate string, isPriceBot boolean",
    )
    xlsx = tmp_path / "export.xlsx"
    export_ops.write_xlsx(df, str(xlsx))
    back = pd.read_excel(xlsx, engine="openpyxl")
    assert len(back) == 2
    assert sorted(back["productId"]) == ["P1", "P2"]
    assert int(back.loc[back["productId"] == "P1", "price"].iloc[0]) == 12990


def test_write_xlsx_gated_without_openpyxl(spark, tmp_path):
    try:
        import openpyxl  # noqa: F401

        pytest.skip("openpyxl present; gating branch not reachable")
    except ImportError:
        pass
    from kaspi_etl_spark.ops import export as export_ops

    df = spark.createDataFrame([("a",)], "x string")
    with pytest.raises(NotImplementedError, match="openpyxl"):
        export_ops.write_xlsx(df, str(tmp_path / "x.xlsx"))


def test_excel_bridge_gated(spark, tmp_path):
    try:
        import openpyxl  # noqa: F401

        has_openpyxl = True
    except ImportError:
        has_openpyxl = False
    if has_openpyxl:
        pytest.skip("openpyxl present; gating branch not reachable")
    fake = tmp_path / "orders.xlsx"
    fake.write_bytes(b"not really xlsx")
    with pytest.raises((NotImplementedError, ValueError, Exception)):
        readers.read_excel_bridge(spark, str(fake))


def test_media_feature_extraction_stub(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    media = multimodal.media_from_documents(docs)
    assert [f.name for f in media.schema.fields] == [
        f.name for f in multimodal.MEDIA_SCHEMA.fields
    ]
    feats = multimodal.extract_features(media, dim=8)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(len(r.feature) == 8 for r in rows)
    # deterministic stub: same input -> same features
    again = {r.media_id: r.feature for r in multimodal.extract_features(media, dim=8).collect()}
    assert all(again[r.media_id] == r.feature for r in rows)


def test_media_metadata_query_prunes_binary(spark, sf_dir):
    """Metadata-only aggregation must not read the binary content column
    (parquet column pruning) — checked via the scan's ReadSchema."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = multimodal.media_from_documents(docs)
    summary = multimodal.metadata_summary(media)
    plan = summary._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert scan_lines and all("text" not in ln.split("ReadSchema")[-1] for ln in scan_lines)


def test_media_resize_only_images(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    media = multimodal.media_from_documents(docs)
    out = multimodal.resize_images(media, width=32, height=32).collect()
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(out) == n_images
    assert all(r.out_width == 32 and len(r.content) > 0 for r in out)
    # deterministic stub
    again = multimodal.resize_images(media, width=32, height=32).collect()
    assert {r.media_id: bytes(r.content) for r in out} == {
        r.media_id: bytes(r.content) for r in again
    }


def test_media_frame_sampling_expands_rows(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    media = multimodal.media_from_documents(docs)
    frames = multimodal.sample_frames(media, every_ms=5000)
    rows = frames.collect()
    vids = media.filter(F.col("kind") == "video").count()
    assert len(rows) >= vids  # one-to-many expansion
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r.frame_idx)
    for idxs in by_media.values():
        assert sorted(idxs) == list(range(len(idxs)))  # contiguous frame ids
