"""kaspi_etl_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
system (TheRisingSun777/kaspi_etl — a single-node pandas/SQLite + Node.js
marketplace-analytics toolkit) as idiomatic Spark: DataFrame/SQL
transformations over explicit StructType schemas, broadcast joins, window
functions, and Structured Streaming with keyed state. Catalyst/Tungsten/AQE
do all optimization; every operator is designed for 100 TB scale.

Module map (SURVEY.md section 7):
  session     SparkSession factory (AQE on, tuned shuffle partitions)
  schemas     StructType registry for canonical tables (FIXTURES.md)
  clean       column-expression cleaning library (SURVEY 2.9 F1-F24)
  sources     readers/writers incl. semicolon-CSV, upsert/merge emulation
  ops         batch operators: sales, purchases, stock, catalog, inventory,
              revenue, offers, analytics, reprice, sizing, export
  llm         large-scale training-data pipeline ops: dedup (exact/minhash/
              simhash/jaccard), similarity search, text analysis, multimodal
  streaming   price-watch: stateful sliding-window bot detection
"""

__version__ = "0.1.0"
