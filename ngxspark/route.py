"""Routing predicates + fan-out sinks (north_rule: "routed by match/unmatch
and status-class predicates into fan-out sinks").

Routing is a single projected column, and fan-out is ONE write with
``partitionBy(sink)`` — one pass over the data, one job, no per-sink
re-scan. At 10^12 rows the alternative (one filter+write per sink) scans
the corpus S times; this scans once and lets dynamic partition insertion
split the files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SINK_COL = "sink"

SINKS = ("ok", "redirect", "client_error", "server_error", "reject")


def route(df: DataFrame) -> DataFrame:
    """Adds the sink column from _matched + status_class."""
    return df.withColumn(
        SINK_COL,
        F.when(~F.col("_matched"), F.lit("reject"))
        .when(F.col("status_class") == "5xx", F.lit("server_error"))
        .when(F.col("status_class") == "4xx", F.lit("client_error"))
        .when(F.col("status_class") == "3xx", F.lit("redirect"))
        .otherwise(F.lit("ok")),
    )


def write_fanout(df: DataFrame, base_path: str, mode: str = "overwrite") -> dict[str, int]:
    """Single-pass fan-out write; returns per-sink row counts observed
    during the SAME job (no second scan) via ``df.observe``."""
    from pyspark.sql import Observation

    obs = Observation("sink_counts")
    observed = df.observe(
        obs,
        *[
            F.sum(F.when(F.col(SINK_COL) == s, 1).otherwise(0)).alias(f"rows_{s}")
            for s in SINKS
        ],
        F.count(F.lit(1)).alias("rows_total"),
    )
    observed.write.mode(mode).partitionBy(SINK_COL).parquet(base_path)
    got = obs.get
    return {s: int(got[f"rows_{s}"] or 0) for s in SINKS} | {"total": int(got["rows_total"])}
