"""Broadcast-joined enrichment lookups (FIXTURES.md §2, SURVEY.md §2.5).

All three dimensions are tiny → explicit ``F.broadcast`` so the planner
always picks BroadcastHashJoin (no shuffle of the fact side) regardless of
statistics — the property that matters at 10^12 rows. Join keys are
plain equi-keys (status-class joins on ``floor(status/100)``) to stay on
the hash-join path rather than a nested-loop range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STATUS_CLASSES = [(1, "1xx"), (2, "2xx"), (3, "3xx"), (4, "4xx"), (5, "5xx")]

TOOL_TAXONOMY = [
    ("bash", "shell", True),
    ("read", "fs_read", False),
    ("grep", "fs_read", False),
    ("write", "fs_write", True),
    ("edit", "fs_write", True),
    ("none", "none", False),
]

ROLE_DICT = [
    ("user", "human", 1.0),
    ("assistant", "model", 1.0),
    ("system", "control", 0.5),
    ("tool", "machine", 0.8),
]


def status_class_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(STATUS_CLASSES, "status_digit int, status_class string")


def tool_taxonomy_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        TOOL_TAXONOMY, "tool string, tool_family string, is_side_effecting boolean"
    )


def role_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ROLE_DICT, "role string, role_kind string, weight double")


def enrich_status_class(df: DataFrame, status_col: str = "status") -> DataFrame:
    """Left broadcast join on the status century digit; unparsed/odd rows
    → 'unknown' (FIXTURES.md: else→unknown)."""
    spark = df.sparkSession
    dim = status_class_dim(spark)
    out = df.join(
        F.broadcast(dim),
        F.floor(F.col(status_col) / 100).cast("int") == dim.status_digit,
        "left",
    ).drop("status_digit")
    return out.withColumn("status_class", F.coalesce(F.col("status_class"), F.lit("unknown")))


def enrich_tool(df: DataFrame, tool_col: str = "tool") -> DataFrame:
    spark = df.sparkSession
    dim = tool_taxonomy_dim(spark).withColumnRenamed("tool", "_tool_key")
    out = df.join(F.broadcast(dim), F.col(tool_col) == F.col("_tool_key"), "left").drop("_tool_key")
    return out.withColumn("tool_family", F.coalesce(F.col("tool_family"), F.lit("unknown")))


def enrich_role(df: DataFrame, role_col: str = "role") -> DataFrame:
    spark = df.sparkSession
    dim = role_dim(spark).withColumnRenamed("role", "_role_key")
    out = df.join(F.broadcast(dim), F.col(role_col) == F.col("_role_key"), "left").drop("_role_key")
    return out.withColumn("role_kind", F.coalesce(F.col("role_kind"), F.lit("unknown")))


def enrich_all(df: DataFrame) -> DataFrame:
    return enrich_role(enrich_tool(enrich_status_class(df)))
