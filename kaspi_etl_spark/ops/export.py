"""Export — flatten the nested AnalyzeResult document to flat rows (S16).

Reference: CURSOR_TASK.md:184-227 (flattenRows + CSV/XLSX export) and
BUNDLE/app/api/pricebot/pricebot/export/route.ts. Out-of-stock variants
export a placeholder row {name:'Out of stock', price:0}
(CURSOR_TASK.md:194); the in-stock filter (P10) drops them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def flatten_analyze_result(nested: DataFrame) -> DataFrame:
    """S16: variants[] -> sellers[] exploded to one row per seller, with
    the out-of-stock placeholder for empty variants."""
    v = nested.select(
        "masterProductId",
        F.explode("variants").alias("variant"),
    ).select(
        "masterProductId",
        F.col("variant.productId").alias("productId"),
        F.col("variant.label").alias("label"),
        F.when(
            F.size(F.col("variant.sellers")) > 0, F.col("variant.sellers")
        ).otherwise(
            F.array(
                F.named_struct(
                    F.lit("name"), F.lit("Out of stock"),
                    F.lit("price"), F.lit(0).cast("long"),
                    F.lit("deliveryDate"), F.lit(""),
                    F.lit("isPriceBot"), F.lit(False),
                )
            )
        ).alias("sellers"),
    )
    return v.select(
        "masterProductId",
        "productId",
        "label",
        F.explode("sellers").alias("s"),
    ).select(
        "masterProductId",
        "productId",
        "label",
        F.col("s.name").alias("name"),
        F.col("s.price").alias("price"),
        F.col("s.deliveryDate").alias("deliveryDate"),
        F.col("s.isPriceBot").alias("isPriceBot"),
    )


def flatten_variants(variants: DataFrame) -> DataFrame:
    """S16 at variant grain: (masterProductId, productId, label,
    sellers[]) -> one row per seller with the out-of-stock placeholder.
    Preferred at scale — rows stay bounded by a variant's seller count,
    never a master's."""
    v = variants.select(
        "masterProductId",
        "productId",
        "label",
        F.when(F.size("sellers") > 0, F.col("sellers"))
        .otherwise(
            F.array(
                F.named_struct(
                    F.lit("name"), F.lit("Out of stock"),
                    F.lit("price"), F.lit(0).cast("long"),
                    F.lit("deliveryDate"), F.lit(""),
                    F.lit("isPriceBot"), F.lit(False),
                )
            )
        )
        .alias("sellers"),
    )
    return v.select(
        "masterProductId",
        "productId",
        "label",
        F.explode("sellers").alias("s"),
    ).select(
        "masterProductId",
        "productId",
        "label",
        F.col("s.name").alias("name"),
        F.col("s.price").alias("price"),
        F.col("s.deliveryDate").alias("deliveryDate"),
        F.col("s.isPriceBot").alias("isPriceBot"),
    )


def in_stock_only(flat: DataFrame) -> DataFrame:
    """P10: drop the out-of-stock placeholder rows (app/page.tsx:151-161)."""
    return flat.filter(~((F.col("name") == "Out of stock") & (F.col("price") == 0)))


def write_csv(df: DataFrame, path: str) -> None:
    """CSV export sink (header on, one directory of part files)."""
    df.write.mode("overwrite").option("header", True).csv(path)


def write_xlsx(df: DataFrame, path: str, sheet_name: str = "Export") -> None:
    """XLSX export sink (S16 second half; reference
    BUNDLE/app/api/pricebot/pricebot/export/route.ts:9-125 emits a
    workbook via exceljs).

    XLSX is a single-file driver-side format — like the reference's
    route handler it materializes the export result (dashboards export
    filtered views, not raw tables), so this is a toPandas bridge gated
    on openpyxl, mirroring ``readers.read_excel_bridge``. Guard rails:
    refuses exports above ``_XLSX_MAX_ROWS`` (the XLSX format's own
    1,048,576-row sheet limit) rather than OOM the driver — at that
    point the caller wants write_csv/parquet.
    """
    try:
        import openpyxl  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "write_xlsx needs openpyxl on the driver; use write_csv here"
        ) from exc
    # Materialize ONCE with the bound built in: a separate count-then-
    # toPandas pair runs the plan twice, and a source that changes between
    # the two runs could slip past the guard into an unbounded collect.
    pdf = df.limit(_XLSX_MAX_ROWS + 1).toPandas()
    if len(pdf) > _XLSX_MAX_ROWS:
        raise ValueError(
            f"write_xlsx: result exceeds the {_XLSX_MAX_ROWS}-row XLSX sheet "
            "limit; export with write_csv instead"
        )
    pdf.to_excel(path, sheet_name=sheet_name, index=False, engine="openpyxl")


_XLSX_MAX_ROWS = 1_048_575  # XLSX hard sheet limit minus the header row
