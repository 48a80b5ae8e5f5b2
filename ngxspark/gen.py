"""Deterministic synthetic transcript generator (FIXTURES.md §1).

Spark-native: every column is a pure function of the row id via xxhash64 —
no RNG state, so the corpus is bit-identical across runs, partitionings,
and parallelism levels (the determinism the two-cluster-size bench check
requires). Layout matches BASELINE.json input_hint:
(conv_id string, turn_idx int, role string, text string, tool string,
 ts timestamp).

Text classes (per mille, via hash bucket):
  ~935 clean combined-format lines (vectorized fast path)
  ~ 30 lines with escaped quotes/backslashes in UA (oracle slow path)
  ~ 20 junk lines (parse reject → reject sink)
  ~ 15 lines with a non-numeric status (typed-cast reject)

conv_id is Zipf-ish skewed (u^3 mapping): the hottest conversation holds
~(1/n_convs)^(1/3) of all turns, exercising salting/AQE on conv_id aggs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["bash", "read", "write", "grep", "edit", "none"]
UAS = [
    "Mozilla/5.0 (X11; Linux x86_64)",
    "curl/8.5.0",
    "python-requests/2.31",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 14_2)",
    "Googlebot/2.1 (+http://www.google.com/bot.html)",
]
PATHS = ["/", "/index.html", "/api/v1/items", "/static/app.js", "/login", "/search"]
STATUSES = [200, 200, 200, 200, 301, 302, 404, 403, 500, 503]


def _h(col, salt: str):
    return F.abs(F.xxhash64(col, F.lit(salt)))


def gen_transcripts(spark: SparkSession, n_rows: int, n_convs: int | None = None) -> DataFrame:
    if n_convs is None:
        n_convs = max(n_rows // 40, 1)
    df = spark.range(n_rows).withColumnRenamed("id", "rid")
    rid = F.col("rid")

    # Zipf-ish conversation assignment: uniform u in [0,1) → u^3 density
    u = (_h(rid, "conv") % 1000000) / 1000000.0
    conv_ix = F.floor(F.lit(n_convs) * F.pow(u, F.lit(3.0))).cast("long")
    conv_id = F.format_string("conv-%06d", conv_ix)

    role = F.element_at(F.array(*[F.lit(r) for r in ROLES]), (_h(rid, "role") % 4 + 1).cast("int"))
    tool = F.element_at(F.array(*[F.lit(t) for t in TOOLS]), (_h(rid, "tool") % 6 + 1).cast("int"))
    ts = F.timestamp_seconds(F.lit(EPOCH_2024) + rid * 3 + (_h(rid, "jit") % 3))

    # combined-format fields, all hash-derived
    ip = F.format_string(
        "10.%d.%d.%d", _h(rid, "ip1") % 256, _h(rid, "ip2") % 256, _h(rid, "ip3") % 254 + 1
    )
    user = F.when(_h(rid, "anon") % 4 == 0, F.lit("-")).otherwise(
        F.format_string("u%04d", _h(rid, "user") % 2000)
    )
    time_local = F.concat(F.date_format(ts, "dd/MMM/yyyy:HH:mm:ss"), F.lit(" +0000"))
    request = F.format_string(
        "GET %s?q=%d HTTP/1.1",
        F.element_at(F.array(*[F.lit(p) for p in PATHS]), (_h(rid, "path") % 6 + 1).cast("int")),
        _h(rid, "q") % 1000,
    )
    status = F.element_at(
        F.array(*[F.lit(s) for s in STATUSES]), (_h(rid, "status") % 10 + 1).cast("int")
    )
    body_bytes = (_h(rid, "bytes") % 100000).cast("long")
    referer = F.when(_h(rid, "ref") % 3 == 0, F.lit("-")).otherwise(
        F.format_string("https://ref.example/%d", _h(rid, "refn") % 50)
    )
    ua_clean = F.element_at(F.array(*[F.lit(x) for x in UAS]), (_h(rid, "ua") % 5 + 1).cast("int"))
    # escaped-delimiter class: UA containing \" and \\ (already-escaped form,
    # exactly what nginx escape=default would emit for a quote in the UA)
    ua_tricky = F.format_string('Agent \\"v%d\\" \\\\build', _h(rid, "uav") % 9)

    klass = _h(rid, "class") % 1000
    ua = F.when(klass.between(935, 964), ua_tricky).otherwise(ua_clean)
    status_str = F.when(klass.between(985, 999), F.lit("abc")).otherwise(status.cast("string"))

    clean_line = F.format_string(
        '%s - %s [%s] "%s" %s %d "%s" "%s"',
        ip, user, time_local, request, status_str, body_bytes, referer, ua,
    )
    junk_line = F.format_string("!corrupt!%d << truncated", _h(rid, "junk") % 100000)
    text = F.when(klass.between(965, 984), junk_line).otherwise(clean_line)

    from pyspark.sql import Window

    w = Window.partitionBy(conv_id).orderBy(rid)
    return (
        df.select(
            conv_id.alias("conv_id"),
            rid,
            role.alias("role"),
            text.alias("text"),
            tool.alias("tool"),
            ts.alias("ts"),
        )
        .withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )


def write_transcripts(
    spark: SparkSession, path: str, n_rows: int, n_convs: int | None = None, n_files: int = 256
) -> None:
    """Materialize once; both bench runs read the same files (BASELINE.md).

    Written as ``n_files`` parquet files regardless of the writing
    session's parallelism so the read side's split count (and therefore
    the parse stage's parallelism) is identical at every cluster size —
    at real scale the input table supplies thousands of splits anyway.
    """
    gen_transcripts(spark, n_rows, n_convs).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(path)
