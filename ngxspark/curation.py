"""End-to-end corpus curation: quality filter → exact dedup → near-dup
removal → summary, runnable as ONE Spark plan or as STAGED materialized
tables with manifest-tracked resume.

Both modes chain the same stage builders, so the final summary is
bit-identical (pinned by test + the shared corpus_curation oracle).

Single-plan mode is right at gate scale and for ad-hoc runs: AQE reuses
the signature stages at runtime and nothing touches disk. At 100 TB the
staged form is what a production curation run executes — each stage
lands as a parquet table under ``staged_dir`` so (a) a crashed run
resumes from the last completed stage instead of recomputing hours of
upstream work (the same idempotent-overwrite + manifest contract as
runner.run_resumable), and (b) downstream consumers (training-data
loaders, audits) read the survivors table directly instead of
re-deriving it. The crossover is wherever recompute cost exceeds one
extra write+read of each intermediate — see BENCH/BASELINE.md round-5
notes for the measured gate-scale comparison.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ngxspark.dedup import lsh_verified_pairs
from ngxspark.runner import Manifest
from ngxspark.textops import quality_score, token_count


def _stage_quality(docs: DataFrame) -> DataFrame:
    """Quality gate: stats projected alongside text in the SAME scan pass
    (joining doc_stats back on doc_id would add a shuffle join for columns
    that are pure expressions of the text)."""
    # materialize_once: the quality>=0.9 filter otherwise pushes through
    # this projection, re-computing the full score expression per row in
    # a scan-level filter (2 evaluations/row, serialized onto the 1-2
    # input splits at gate scale — r7 plan finding; see plankit)
    from ngxspark.plankit import materialize_once

    return docs.select(
        "doc_id",
        "text",
        token_count(F.col("text")).alias("n_tokens"),
        materialize_once(quality_score(F.col("text"))).alias("quality"),
    ).filter(F.col("quality") >= 0.9)


def _stage_exact_dedup(good: DataFrame) -> DataFrame:
    """Keep the min doc_id per content hash — one window over the digest."""
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        good.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def _stage_near_dedup(kept: DataFrame) -> DataFrame:
    """Drop the higher id of each LSH-verified near-dup pair."""
    near = lsh_verified_pairs(kept, threshold=0.5).select("id_b").distinct()
    return kept.join(near, kept.doc_id == near.id_b, "left_anti").select(
        "doc_id", "text", "n_tokens", "quality"
    )


_STAGES = (
    ("quality", _stage_quality),
    ("deduped", _stage_exact_dedup),
    ("curated", _stage_near_dedup),
)


def curation_summary(survivors: DataFrame) -> DataFrame:
    """(n_docs, total_tokens, avg_quality) — exact decimal summation:
    double sums are partition-order-dependent in the last ulp, which can
    flip a rounded 4dp average across engines."""
    return survivors.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(
            F.sum(F.col("quality").cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("avg_quality"),
    )


def curate_corpus(
    docs: DataFrame, staged_dir: str | None = None, resume: bool = True
) -> DataFrame:
    """Run the curation pipeline; return the summary DataFrame.

    ``staged_dir=None``: one lazy plan (no writes). Otherwise each stage
    is materialized to ``<staged_dir>/<stage>`` parquet and recorded in
    the runner Manifest; with ``resume=True`` completed stages are read
    back instead of recomputed (idempotent overwrite semantics on
    re-run, exactly like run_resumable's staging step). The summary is
    computed from the final curated table in both modes.

    Resume is keyed on an INPUT FINGERPRINT (doc count + input schema +
    stage-pipeline version), not just the stage name (r5 advice): a
    staged_dir left over from a different corpus or code version would
    otherwise silently serve stale tables and a wrong summary. A
    fingerprint mismatch invalidates every completed stage (one extra
    column-pruned count() job per staged run — noise next to the stage
    writes it protects).
    """
    cur = docs
    if staged_dir is None:
        for _name, build in _STAGES:
            cur = build(cur)
        return curation_summary(cur)
    spark = docs.sparkSession
    man = Manifest.load(staged_dir)
    # fingerprint version derives from the STAGE PIPELINE itself (r6
    # advice: a bare constant was never bumped by stage-code changes);
    # stage names key the pipeline shape — semantic changes INSIDE a
    # stage still require deleting the staged_dir, documented here.
    version = "v1-" + "-".join(name for name, _ in _STAGES)
    fp = "%s:%d:%s" % (version, docs.count(), docs.schema.simpleString())
    recorded = man.buckets.get("_stage__fingerprint", {}).get("fp")
    if recorded != fp:
        # invalidate on ANY completed stage entries, including legacy
        # manifests written before fingerprints existed (recorded is
        # None) — those are exactly the stale-table case the guard is
        # for (r6 advice)
        if any(
            k.startswith("_stage_") and k != "_stage__fingerprint"
            for k in man.buckets
        ):
            man.buckets = {}  # stale staging from another corpus/version
        man.mark_stage("_fingerprint", {"fp": fp})
    for name, build in _STAGES:
        path = os.path.join(staged_dir, name)
        if not (resume and man.stage_done(name)):
            import time as _time

            t0 = _time.time()
            build(cur).write.mode("overwrite").parquet(path)
            man.mark_stage(name, {"secs": round(_time.time() - t0, 3)})
        cur = spark.read.parquet(path)
    return curation_summary(cur)
