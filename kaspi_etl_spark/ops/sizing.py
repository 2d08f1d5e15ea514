"""Size recommendation engine — the one genuine theta/range join (J8).

Reference: scripts/size_recommendation_engine.py:34-117 (static charts),
:165-227 (adult scored matching), :229-277 (kids age/height matching).

Spark design: customers x broadcast(size_chart) range join. The chart is a
few dozen rows, so the crossJoin is a broadcast nested loop producing
|customers| x |chart| rows — scored entirely with native expressions, then
a window top-1 picks the best match (ties broken by chart row order, which
is the reference's dict-iteration order). At 100 TB of customers this
stays shuffle-free: broadcast + per-row scoring + one window partitioned
by customer_id over <=19 candidate rows each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Adult charts (size_recommendation_engine.py:37-84); chart_order pins the
# reference's dict-iteration tie-break.
ADULT_CHART_ROWS = [
    # (product_type, gender, h_min, h_max, w_min, w_max, size)
    ("CL", "Men", 165, 170, 60, 70, "S"),
    ("CL", "Men", 165, 170, 70, 80, "M"),
    ("CL", "Men", 165, 170, 80, 90, "L"),
    ("CL", "Men", 170, 175, 60, 70, "S"),
    ("CL", "Men", 170, 175, 70, 80, "M"),
    ("CL", "Men", 170, 175, 80, 90, "L"),
    ("CL", "Men", 170, 175, 90, 100, "XL"),
    ("CL", "Men", 175, 180, 65, 75, "M"),
    ("CL", "Men", 175, 180, 75, 85, "L"),
    ("CL", "Men", 175, 180, 85, 95, "XL"),
    ("CL", "Men", 175, 180, 95, 105, "2XL"),
    ("CL", "Men", 180, 185, 70, 80, "L"),
    ("CL", "Men", 180, 185, 80, 90, "XL"),
    ("CL", "Men", 180, 185, 90, 100, "2XL"),
    ("CL", "Men", 180, 185, 100, 110, "3XL"),
    ("CL", "Men", 185, 195, 75, 85, "XL"),
    ("CL", "Men", 185, 195, 85, 95, "2XL"),
    ("CL", "Men", 185, 195, 95, 110, "3XL"),
    ("CL", "Men", 185, 195, 110, 125, "4XL"),
    ("CL", "Women", 155, 165, 45, 55, "S"),
    ("CL", "Women", 155, 165, 55, 65, "M"),
    ("CL", "Women", 155, 165, 65, 75, "L"),
    ("CL", "Women", 165, 170, 50, 60, "S"),
    ("CL", "Women", 165, 170, 60, 70, "M"),
    ("CL", "Women", 165, 170, 70, 80, "L"),
    ("CL", "Women", 165, 170, 80, 90, "XL"),
    ("CL", "Women", 170, 175, 55, 65, "M"),
    ("CL", "Women", 170, 175, 65, 75, "L"),
    ("CL", "Women", 170, 175, 75, 85, "XL"),
    ("CL", "Women", 170, 175, 85, 95, "2XL"),
    ("CL", "Women", 175, 180, 60, 70, "L"),
    ("CL", "Women", 175, 180, 70, 80, "XL"),
    ("CL", "Women", 175, 180, 80, 90, "2XL"),
]

KIDS_CHART_ROWS = [
    # (age_min, age_max, h_min, h_max, size) — size_recommendation_engine.py:96-105
    (2, 3, 85, 95, "22"),
    (3, 4, 95, 105, "24"),
    (4, 5, 105, 115, "26"),
    (5, 6, 115, 125, "28"),
    (6, 7, 125, 135, "30"),
    (7, 8, 135, 145, "32"),
    (8, 9, 145, 155, "34"),
]


def adult_size_chart(spark: SparkSession) -> DataFrame:
    rows = [r + (i,) for i, r in enumerate(ADULT_CHART_ROWS)]
    return spark.createDataFrame(
        rows,
        schema="product_type string, gender string, h_min int, h_max int, "
        "w_min int, w_max int, size string, chart_order int",
    )


def kids_size_chart(spark: SparkSession) -> DataFrame:
    rows = [r + (i,) for i, r in enumerate(KIDS_CHART_ROWS)]
    return spark.createDataFrame(
        rows,
        schema="age_min int, age_max int, h_min int, h_max int, size string, chart_order int",
    )


def with_confirmation_message(recs: DataFrame) -> DataFrame:
    """F24: WhatsApp size-confirmation message with confidence tiers
    (size_recommendation_engine.py:279-301). Expects columns
    customer_name, product_name, recommended_size, confidence_score,
    reasoning, alternative_sizes (CSV string, may be empty)."""
    conf = F.col("confidence_score")
    tier = (
        F.when(conf > 0.8, F.lit("✅ Мы уверены в этом размере!\n"))
        .when(conf > 0.6, F.lit("👍 Хороший выбор размера\n"))
        .otherwise(F.lit("⚠️ Приблизительный размер, пожалуйста проверьте\n"))
    )
    alts = F.when(
        F.col("alternative_sizes") != "",
        F.concat(
            F.lit("\nАльтернативные размеры: "),
            F.regexp_replace(F.col("alternative_sizes"), ",", ", "),
            F.lit("\n"),
        ),
    ).otherwise(F.lit(""))
    message = F.concat(
        F.format_string("Привет %s! 👋\n\n", F.col("customer_name")),
        F.format_string(
            "Для товара '%s' мы рекомендуем размер: *%s*\n\n",
            F.col("product_name"),
            F.col("recommended_size"),
        ),
        F.format_string("Обоснование: %s\n", F.col("reasoning")),
        tier,
        alts,
        F.lit("\nПожалуйста, подтвердите размер или сообщите ваши предпочтения! 📏"),
    )
    return recs.withColumn("message", message)


def recommend_kids_sizes(customers: DataFrame, chart: DataFrame) -> DataFrame:
    """J8 kids path (size_recommendation_engine.py:229-277): age-height
    matrix first (confidence 0.9), then height-range match (0.8), then
    closest-by-distance fallback (max(0.3, 1 - dist/20)).

    Broadcast nested-loop against the 7-row chart; priority + distance +
    chart_order total order reproduces the reference's first-match /
    strictly-closer ('distance < best') semantics.
    """
    cand = customers.crossJoin(F.broadcast(chart))
    h, age = F.col("height_cm"), F.col("age")
    in_height = (h >= F.col("h_min")) & (h <= F.col("h_max"))
    matrix_match = (
        age.isNotNull() & (age >= F.col("age_min")) & (age <= F.col("age_max")) & in_height
    )
    dist = F.least(F.abs(h - F.col("h_min")), F.abs(h - F.col("h_max"))).cast("double")
    priority = F.when(matrix_match, 0).when(in_height, 1).otherwise(2)
    scored = cand.withColumn("_prio", priority).withColumn("_dist", dist)
    w = Window.partitionBy("customer_id").orderBy(
        F.col("_prio").asc(), F.col("_dist").asc(), F.col("chart_order").asc()
    )
    best = scored.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    conf = (
        F.when(F.col("_prio") == 0, F.lit(0.9))
        .when(F.col("_prio") == 1, F.lit(0.8))
        .otherwise(F.greatest(F.lit(0.3), F.lit(1.0) - F.col("_dist") / F.lit(20.0)))
    )
    reasoning = (
        F.when(
            F.col("_prio") == 0,
            F.format_string("Perfect match for age %d and height %dcm", age, h),
        )
        .when(F.col("_prio") == 1, F.format_string("Good fit for height %dcm", h))
        .otherwise(
            F.format_string("Approximate fit for height %dcm (closest available size)", h)
        )
    )
    return best.select(
        "customer_id",
        F.col("size").alias("recommended_size"),
        conf.alias("confidence_score"),
        reasoning.alias("reasoning"),
    )


def score_expr() -> F.Column:
    """Adult match score (size_recommendation_engine.py:171-186):
    height component 0.5 in-range else max(0, 0.5 - dist/20);
    weight component 0.5 in-range else max(0, 0.5 - dist/10)."""
    h, w = F.col("height_cm"), F.col("weight_kg")
    h_dist = F.least(F.abs(h - F.col("h_min")), F.abs(h - F.col("h_max"))).cast("double")
    w_dist = F.least(F.abs(w - F.col("w_min")), F.abs(w - F.col("w_max"))).cast("double")
    h_score = F.when(
        (h >= F.col("h_min")) & (h <= F.col("h_max")), F.lit(0.5)
    ).otherwise(F.greatest(F.lit(0.0), F.lit(0.5) - h_dist / 20.0))
    w_score = F.when(
        (w >= F.col("w_min")) & (w <= F.col("w_max")), F.lit(0.5)
    ).otherwise(F.greatest(F.lit(0.0), F.lit(0.5) - w_dist / 10.0))
    return h_score + w_score


def recommend_adult_sizes(customers: DataFrame, chart: DataFrame) -> DataFrame:
    """J8 + O5: best size per customer with confidence and top-3
    alternatives (size_recommendation_engine.py:165-227).

    Tie-break on equal score = chart_order asc (reference keeps the first
    encountered; `score > best_score` never replaces on tie).
    """
    cand = (
        customers.join(
            F.broadcast(chart),
            (customers["gender"] == chart["gender"])
            & (customers["product_type"] == chart["product_type"]),
            "inner",
        )
        .drop(chart["gender"])
        .drop(chart["product_type"])
        .withColumn("score", score_expr())
    )
    w = Window.partitionBy("customer_id").orderBy(F.desc("score"), F.asc("chart_order"))
    ranked = cand.withColumn("rn", F.row_number().over(w))
    best = ranked.filter(F.col("rn") == 1).select(
        "customer_id",
        F.col("size").alias("recommended_size"),
        F.col("score").alias("confidence_score"),
        F.when(F.col("score") > 0.8, F.lit("excellent fit"))
        .when(F.col("score") > 0.6, F.lit("good fit"))
        .otherwise(F.lit("approximate fit"))
        .alias("fit_quality"),
    )
    # Alternatives: next-best scoring sizes with score > 0.3, top 3,
    # distinct by size (reference collects prior bests + >0.3 scorers).
    alts = (
        ranked.filter((F.col("rn") > 1) & (F.col("score") > 0.3))
        .withColumn(
            "alt_rn",
            F.row_number().over(
                Window.partitionBy("customer_id", "size").orderBy(F.desc("score"), F.asc("chart_order"))
            ),
        )
        .filter(F.col("alt_rn") == 1)
        .withColumn(
            "alt_rank",
            F.row_number().over(
                Window.partitionBy("customer_id").orderBy(F.desc("score"), F.asc("chart_order"))
            ),
        )
        .filter(F.col("alt_rank") <= 3)
        .groupBy("customer_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("alt_rank", "size"))),
                    lambda s: s["size"],
                ),
                ",",
            ).alias("alternative_sizes")
        )
    )
    return best.join(alts, "customer_id", "left").na.fill({"alternative_sizes": ""})
