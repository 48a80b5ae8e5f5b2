"""BM25 lexical retrieval over `documents` — the lexical counterpart to
the embedding-ANN family (simsearch.py): per-query top-k documents by
Okapi BM25 (Robertson & Spärck Jones; k1 = 1.2, b = 0.75).

Fixed-point scoring for cross-engine hash parity: idf is floor-scaled to
a BIGINT (ln evaluated once per query term — the only float op), and the
tf normalization is carried as an EXACT integer expression. With
k1 = 6/5 and b = 3/4:

    idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))      [avgdl = T/N]
  = idf * 22*tf*T / (10*tf*T + 3*T + 9*dl*N)

so each term's contribution is (idf_scaled * 22*tf*T) div (10*tf*T +
3*T + 9*dl*N) — all-BIGINT, overflow-safe at gate scale (documented
bound: idf_scaled*22*tf*T < 2^63 up to ~1e9 total tokens; a 100 TB
deployment would run the plain double-scoring variant, the same
exact-gate / approximate-production duality as corpus_profile and
ccnet_buckets). Per-doc scores are BIGINT sums — order-independent,
bit-identical in any engine at any partitioning.

100 TB shape: one tiny aggregate computes N, T, and per-query-term df in
a single pass (a handful of columns — query vocabularies are small), and
is broadcast back; per-doc tf for each query term is a pure JVM
filter-count over the materialized token array (single corpus scan, no
explode, no token shuffle). The only shuffle is the final per-query
top-k window, fed only by docs with score > 0 — the classic
posting-list pruning, done declaratively. Spark 4 plans that window as
a two-phase WindowGroupLimit (per-partition PARTIAL top-k before the
query_id exchange, verified in the executed plan), so the
few-distinct-queries partitioning never shuffles more than k rows per
input partition — no skew at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ngxspark.textops import tokens

BM25_SCALE = 1_000_000

# Gate query set: term df at sf0.01 spans 25..402 of 500 docs, so idf
# contrast (rare 'dup' vs commons) is actually exercised.
BM25_QUERIES: dict[int, list[str]] = {
    1: ["spark", "join"],
    2: ["dup", "line"],
    3: ["hash", "table", "scan"],
    4: ["window", "order", "batch", "stream"],
}


def _eq(term: str):
    lit = F.lit(term)
    return lambda x: x == lit


def _term_expr(i: int, j: int) -> str:
    """Integer BM25 contribution of term slot i (0-based tf index j;
    get() is the null-safe 0-based accessor — the repo's Spark 4 ANSI
    rule — so a terms/_tf drift can only null a score, never throw)."""
    tf = f"get(_tf, {j})"
    return (
        f"(CASE WHEN {tf} > 0 THEN (_idf_{i} * 22 * {tf} * _T) "
        f"div (10 * {tf} * _T + 3 * _T + 9 * _dl * _N) ELSE 0 END)"
    )


def bm25_topk(
    df: DataFrame,
    queries: dict[int, list[str]] | None = None,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k docs per query by BM25. Emits (query_id, rank, doc_id,
    score_scaled, score); rank ties break on doc_id; docs matching no
    query term never enter the shuffle."""
    from pyspark.sql import Window

    queries = BM25_QUERIES if queries is None else queries
    terms = sorted({t for ts in queries.values() for t in ts})
    idx = {t: i for i, t in enumerate(terms)}

    staged = (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .withColumn("_dl", F.size("_toks").cast("long"))
        .withColumn(
            "_tf",
            # NB: a 2-arg lambda here would be called as (element, index) by
            # F.filter — bind the term via a closure, never a default arg.
            F.array(
                *[
                    F.size(F.filter(F.col("_toks"), _eq(t))).cast("long")
                    for t in terms
                ]
            ),
        )
    )
    # One-row corpus stats (N, T, df per term) — second, column-pruned scan;
    # idf computed here so ln runs once per term, not per doc row. The token
    # array is materialized ONCE before the agg (Catalyst does not CSE the
    # split across the ~10 aggregate expressions referencing it).
    stats = df.select(tokens(F.col(text_col)).alias("_stoks")).agg(
        F.count(F.lit(1)).cast("long").alias("_N"),
        F.sum(F.size("_stoks")).cast("long").alias("_T"),
        *[
            F.sum(F.array_contains(F.col("_stoks"), t).cast("long")).alias(
                f"_dfreq_{i}"
            )
            for i, t in enumerate(terms)
        ],
    )
    idf = stats.select(
        "_N",
        "_T",
        *[
            F.floor(
                F.log(
                    (F.col("_N") - F.col(f"_dfreq_{i}") + 0.5)
                    / (F.col(f"_dfreq_{i}") + 0.5)
                    + 1.0
                )
                * F.lit(BM25_SCALE)
            )
            .cast("long")
            .alias(f"_idf_{i}")
            for i in range(len(terms))
        ],
    )

    per_query = F.array(
        *[
            F.struct(
                F.lit(qid).cast("long").alias("query_id"),
                F.expr(
                    " + ".join(_term_expr(idx[t], idx[t]) for t in ts)
                ).alias("score_scaled"),
            )
            for qid, ts in sorted(queries.items())
        ]
    )
    scored = (
        staged.join(F.broadcast(idf))
        .select(F.col(id_col), F.explode(per_query).alias("_q"))
        .select(F.col(id_col), "_q.query_id", "_q.score_scaled")
        .filter(F.col("score_scaled") > 0)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_scaled"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            F.col(id_col),
            "score_scaled",
            F.round(F.col("score_scaled") / F.lit(float(BM25_SCALE)), 6).alias(
                "score"
            ),
        )
        .orderBy("query_id", "rank")
    )


def bm25_stats(
    df: DataFrame,
    terms: list[str] | None = None,
    text_col: str = "text",
) -> tuple[int, int, dict[str, int]]:
    """OFFLINE corpus-statistics step for the streaming/production scoring
    form: one tiny aggregate (N, T, df per term — query vocabularies are
    small) collected to the driver, idf floor-scaled exactly like the
    in-plan gate path. The analogue of textops.dsir_logratios /
    lm_vocab_logprobs: a bounded lambda table computed once, then applied
    to any stream as literals."""
    import math

    terms = (
        sorted({t for ts in BM25_QUERIES.values() for t in ts})
        if terms is None
        else sorted(terms)
    )
    row = (
        df.select(tokens(F.col(text_col)).alias("_stoks"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("_N"),
            F.sum(F.size("_stoks")).cast("long").alias("_T"),
            *[
                F.sum(F.array_contains(F.col("_stoks"), t).cast("long")).alias(
                    f"_dfreq_{i}"
                )
                for i, t in enumerate(terms)
            ],
        )
        .collect()[0]
    )
    n, t_total = row["_N"], row["_T"]
    idf = {
        term: math.floor(
            math.log((n - row[f"_dfreq_{i}"] + 0.5) / (row[f"_dfreq_{i}"] + 0.5) + 1.0)
            * BM25_SCALE
        )
        for i, term in enumerate(terms)
    }
    return n, t_total, idf


def bm25_score(
    df: DataFrame,
    stats: tuple[int, int, dict[str, int]],
    queries: dict[int, list[str]] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score docs against OFFLINE corpus stats — a pure shuffle-free
    projection (no agg, no join, no window): the streaming/production
    scoring form. Emits (id, query_id, score_scaled, score) for every
    doc × query with score > 0; top-k over an unbounded stream is a
    downstream batch concern (continuous pipelines threshold on score).
    Same fixed-point algebra as bm25_topk, with N/T/idf as literals."""
    queries = BM25_QUERIES if queries is None else queries
    n, t_total, idf = stats
    terms = sorted({t for ts in queries.values() for t in ts})
    idx = {t: i for i, t in enumerate(terms)}

    staged = (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .withColumn("_dl", F.size("_toks").cast("long"))
        .withColumn(
            "_tf",
            F.array(
                *[
                    F.size(F.filter(F.col("_toks"), _eq(t))).cast("long")
                    for t in terms
                ]
            ),
        )
    )

    def term_sql(term: str) -> str:
        tf = f"get(_tf, {idx[term]})"
        return (
            f"(CASE WHEN {tf} > 0 THEN ({idf[term]}L * 22 * {tf} * {t_total}L) "
            f"div (10 * {tf} * {t_total}L + {3 * t_total}L + 9 * _dl * {n}L) "
            f"ELSE 0L END)"
        )

    per_query = F.array(
        *[
            F.struct(
                F.lit(qid).cast("long").alias("query_id"),
                F.expr(" + ".join(term_sql(t) for t in ts)).alias("score_scaled"),
            )
            for qid, ts in sorted(queries.items())
        ]
    )
    return (
        staged.select(F.col(id_col), F.explode(per_query).alias("_q"))
        .select(F.col(id_col), "_q.query_id", "_q.score_scaled")
        .filter(F.col("score_scaled") > 0)
        .withColumn(
            "score",
            F.round(F.col("score_scaled") / F.lit(float(BM25_SCALE)), 6),
        )
    )


def bm25_oracle_sql(
    queries: dict[int, list[str]] | None = None, k: int = 10
) -> str:
    """GENERATED DuckDB oracle — same query set, same fixed-point algebra
    (// is BIGINT division, exactly Spark's div on positives)."""
    queries = BM25_QUERIES if queries is None else queries
    terms = sorted({t for ts in queries.values() for t in ts})
    idx = {t: i for i, t in enumerate(terms)}
    dfs = ",\n        ".join(
        f"sum(CASE WHEN list_contains(toks, '{t}') THEN 1 ELSE 0 END)::BIGINT AS df_{i}"
        for i, t in enumerate(terms)
    )
    idfs = ",\n        ".join(
        f"floor(ln((N - df_{i} + 0.5) / (df_{i} + 0.5) + 1.0) * {BM25_SCALE})::BIGINT AS idf_{i}"
        for i in range(len(terms))
    )
    tfs = ",\n        ".join(
        f"len(list_filter(toks, x -> x = '{t}'))::BIGINT AS tf_{i}"
        for i, t in enumerate(terms)
    )

    def term_sql(i: int) -> str:
        return (
            f"(CASE WHEN tf_{i} > 0 THEN (idf_{i} * 22 * tf_{i} * T) "
            f"// (10 * tf_{i} * T + 3 * T + 9 * dl * N) ELSE 0 END)"
        )

    arms = "\n      UNION ALL\n      ".join(
        f"SELECT {qid}::BIGINT AS query_id, doc_id, "
        + " + ".join(term_sql(idx[t]) for t in ts)
        + " AS score_scaled FROM tf CROSS JOIN idf"
        for qid, ts in sorted(queries.items())
    )
    return f"""
    WITH s AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), st AS (
      SELECT count(*)::BIGINT AS N, sum(len(toks))::BIGINT AS T,
        {dfs}
      FROM s
    ), idf AS (
      SELECT N, T,
        {idfs}
      FROM st
    ), tf AS (
      SELECT doc_id, len(toks)::BIGINT AS dl,
        {tfs}
      FROM s
    ), sc AS (
      {arms}
    ), r AS (
      SELECT query_id, doc_id, score_scaled,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score_scaled DESC, doc_id) AS rank
      FROM sc WHERE score_scaled > 0
    )
    SELECT query_id, rank::BIGINT AS rank, doc_id, score_scaled,
           round(score_scaled / {BM25_SCALE}.0, 6) AS score
    FROM r WHERE rank <= {k} ORDER BY query_id, rank
    """


def tfidf_topk_terms(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-k keyword extraction by tf-idf (Spärck Jones 1972;
    the classic WIMBD/Elasticsearch "significant terms" audit over a
    training corpus — which terms characterize each document).

    score = tf(term, doc) × floor(ln(N / df(term)) · BM25_SCALE)  — BIGINT,
    so per-term scores are exact integers (one ln per DISTINCT term, the
    BM25 idf precedent) and the top-k cut, tie-broken on the term string,
    is a total order → hash-oracle-able.

    100 TB shape: within-doc tf is computed MAP-SIDE via the ngram_topk
    sort + run-length pattern (one (term, tf) struct per DISTINCT term per
    doc crosses the wire, not every occurrence). The distinct-term pairs
    are repartitioned by term ONCE; the df aggregate and the pairs⋈df
    join both consume that same exchange (the repo's
    repartition-before-alias reuse pattern), so the whole df computation
    costs ONE term-keyed shuffle. N comes from a 1-row broadcast agg. The
    final per-doc top-k window plans as Spark 4's two-phase
    WindowGroupLimit (partial top-k before the doc_id exchange) — at any
    corpus size at most k rows per input partition reach the window
    exchange.
    """
    from pyspark.sql import Window

    staged = (
        df.select(id_col, tokens(F.col(text_col)).alias("_toks"))
        .withColumn("_st", F.array_sort(F.col("_toks")))
        .withColumn(
            "_starts",
            F.filter(
                F.transform(F.col("_st"), lambda x, i: i),
                lambda i: (i == F.lit(0))
                | (F.get(F.col("_st"), i) != F.get(F.col("_st"), i - 1)),
            ),
        )
    )
    pairs = staged.select(
        id_col,
        F.explode(
            F.transform(
                F.col("_starts"),
                lambda s, j: F.struct(
                    F.get(F.col("_st"), s).alias("term"),
                    (
                        F.coalesce(F.get(F.col("_starts"), j + 1), F.size(F.col("_st")))
                        - s
                    )
                    .cast("long")
                    .alias("tf"),
                ),
            )
        ).alias("p"),
    ).select(id_col, "p.term", "p.tf")
    # one term-keyed exchange feeds BOTH the df agg and the join
    pairs = pairs.repartition("term")
    n_row = df.select(F.count(F.lit(1)).cast("long").alias("_N"))
    dfreq = (
        pairs.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .crossJoin(F.broadcast(n_row))
        .withColumn(
            "idf",
            F.floor(F.log(F.col("_N").cast("double") / F.col("df")) * F.lit(BM25_SCALE))
            .cast("long"),
        )
        .select("term", "df", "idf")
    )
    scored = pairs.join(dfreq, "term").select(
        id_col, "term", "tf", (F.col("tf") * F.col("idf")).alias("score")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "score")
        .orderBy(id_col, "rank")
    )


def tfidf_oracle(k: int = 5) -> str:
    """DuckDB twin of tfidf_topk_terms over `documents`."""
    return f"""
    WITH s AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), pairs AS (
      SELECT doc_id, unnest(toks) AS term FROM s
    ), tf AS (
      SELECT doc_id, term, count(*)::BIGINT AS tf FROM pairs GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
    ), n AS (SELECT count(*)::BIGINT AS N FROM documents
    ), idf AS (
      SELECT term, floor(ln(N::DOUBLE / df) * {BM25_SCALE})::BIGINT AS idf
      FROM dfreq CROSS JOIN n
    ), sc AS (
      SELECT tf.doc_id, tf.term, tf.tf, tf.tf * idf.idf AS score
      FROM tf JOIN idf USING (term)
    ), r AS (
      SELECT doc_id, term, tf, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term) AS rank
      FROM sc
    )
    SELECT doc_id, rank::BIGINT AS rank, term, tf, score
    FROM r WHERE rank <= {k} ORDER BY doc_id, rank
    """
