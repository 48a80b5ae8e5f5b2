"""Per-sink aggregates: conv_id buckets, role, status-class, time windows
(north_rule), with explicit deterministic salting for conv_id skew.

Skew strategy: the synthetic corpus (like real transcript stores) has a
few conversations holding a large share of turns. A plain
``groupBy(conv_id)`` puts each hot key on one reducer. We pre-aggregate on
``(conv_id, salt)`` where ``salt = pmod(xxhash64(conv_id, turn_idx), K)``
— deterministic (no rand(), so counts are bit-identical at any
parallelism) — then combine. Spark's partial aggregation already does
map-side combining, so salting only pays off when per-key cardinality
within map partitions is low and one reduce key dominates; both stages are
hash aggs, no sort. AQE skew handling stays on as the backstop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 16


def with_conv_bucket(df: DataFrame, n_buckets: int = 64) -> DataFrame:
    """Stable hash bucket of conv_id (drives resume partitioning + bucketed aggs)."""
    return df.withColumn(
        "conv_bucket", F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_buckets)).cast("int")
    )


def salted_count(
    df: DataFrame, keys: list[str], salt_cols: list[str] | None = None, buckets: int = DEFAULT_SALT_BUCKETS
) -> DataFrame:
    """Two-phase count: groupBy(keys + salt).count → groupBy(keys).sum.

    salt_cols: high-cardinality columns to fold into the salt (default
    turn_idx) so the salt is deterministic per row.
    """
    salt_src = [F.col(c) for c in (salt_cols or ["turn_idx"])]
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(*salt_src), F.lit(buckets)).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(F.count(F.lit(1)).alias("_partial"))
    return partial.groupBy(*keys).agg(F.sum("_partial").alias("cnt"))


def turns_per_conversation(df: DataFrame, n_buckets: int = 64) -> DataFrame:
    """Counts by conv_id bucket (salted two-phase)."""
    return salted_count(with_conv_bucket(df, n_buckets), ["conv_bucket"]).orderBy("conv_bucket")


def counts_by_role_status(df: DataFrame) -> DataFrame:
    return (
        df.groupBy("role", "status_class")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("role", "status_class")
    )


def windowed_counts(df: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window counts over ts by status_class."""
    return (
        df.groupBy(F.window("ts", window).alias("w"), F.col("status_class"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            "status_class",
            "cnt",
        )
        .orderBy("window_start", "status_class")
    )


def with_turn_order(df: DataFrame) -> DataFrame:
    """Stable intra-conversation ordering (north_star: Window over
    (conv_id ORDER BY turn_idx)); turn_idx is unique per conv so the
    ordering is total and deterministic."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return df.withColumn("turn_order", F.row_number().over(w))


def first_turns(df: DataFrame, k: int = 1) -> DataFrame:
    """First k turns of each conversation (per-turn text equality anchor)."""
    return with_turn_order(df).filter(F.col("turn_order") <= k).drop("turn_order")


def error_spike_hours(
    df: DataFrame,
    ts_col: str = "ts",
    is_error: "F.Column | None" = None,
    scale: int = 1_000_000,
    sigmas: int = 2,
) -> DataFrame:
    """Hourly error-rate anomaly table: flag hours whose error rate
    exceeds mean + `sigmas`·stddev over all hours — the parse-rate /
     5xx-spike monitoring view of a log pipeline.

    All statistics are FIXED-POINT BIGINT so the flag is engine-exact:
    rate_fp = n_err·scale DIV n; mean_fp = Σrate_fp DIV n_hours; the
    σ-test avoids sqrt and division entirely —
    flag ⇔ dev > 0 AND dev²·n_hours > sigmas²·Σdev².

    Scale shape: one shuffle (hourly agg, map-side partials over the
    raw scan), then two unpartitioned windows over the HOURLY table —
    bounded by hours-of-retention (a decade ≈ 90k rows), not corpus
    size, so the single-task window is safe by construction."""
    err = (F.col("event_type") == "error") if is_error is None else is_error
    hourly = (
        df.groupBy(F.date_trunc("hour", F.col(ts_col)).alias("_h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(err.cast("long")).alias("n_err"),
        )
        .withColumn("rate_fp", F.expr(f"n_err * {scale} DIV n"))
    )
    w = Window.partitionBy()
    staged = hourly.withColumn(
        "_mean_fp", F.expr("sum(rate_fp) OVER () DIV count(1) OVER ()")
    ).withColumn("_dev", F.col("rate_fp") - F.col("_mean_fp"))
    staged = staged.withColumn("_ssd", F.sum(F.col("_dev") * F.col("_dev")).over(w)).withColumn(
        "_nh", F.count(F.lit(1)).over(w)
    )
    return staged.select(
        F.date_format("_h", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        "n",
        "n_err",
        "rate_fp",
        F.col("_mean_fp").alias("mean_fp"),
        (
            (F.col("_dev") > 0)
            & (F.col("_dev") * F.col("_dev") * F.col("_nh") > sigmas * sigmas * F.col("_ssd"))
        ).alias("spike"),
    ).orderBy("hour_start")
