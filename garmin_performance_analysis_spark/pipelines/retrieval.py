"""Lexical retrieval operators for corpus curation: TF-IDF keyword
extraction and BM25 query scoring.

Training-data pipelines use these for topic labeling, quality-aware
mixing, and eval-set retrieval (e.g. picking the documents most
relevant to a benchmark question before a contamination audit).  Both
operators are pure DataFrame compositions — the classic word-count
shuffle shapes that scale linearly:

- ``tfidf_topk``: explode → groupBy(doc,term) [map-side partial agg
  absorbs per-doc repeats] → groupBy(term) for document frequency →
  term-keyed join → per-doc window for top-k.  Vocabulary rows are
  orders of magnitude smaller than token rows, so the df join is cheap;
  hot terms are handled by partial aggregation, not salting.  The one
  skew surface left is the tf⋈df join's PROBE side (every document's
  row for "the" lands in one partition): the build side is one row per
  term, so the hash join itself is fine, and AQE skew-join splits an
  oversized probe partition at runtime — the documented reason this
  engine keeps ``spark.sql.adaptive.skewJoin.enabled`` on
  (``session.py``) rather than pre-salting a natural-key join.
- ``bm25_scores``: the query-term IN-list filter runs BEFORE the first
  shuffle, so the whole plan is sized by matches, not the corpus; per
  -document length comes from the row itself (no corpus-wide shuffle),
  and the two scalars (N, avg doclen) broadcast.

Determinism: scores are md5-free pure arithmetic; the only float
hazard is summing per-term partials in shuffle order, so BM25 sums
through DECIMAL (registry convention) and both operators rank by the
ROUNDED score with a unique-key tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..harness.registry import dec_sum
from ..operators.windows import bounded_partition_key
from ..plans.layout import spread_for_compute


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, term) token stream — one row per token occurrence,
    the same lowercased single-space tokenization the text/dedup
    families use."""
    return spread_for_compute(df, id_col).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
    )


def term_frequencies(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-(document, term) occurrence counts."""
    return (
        _tokens(df, id_col, text_col)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_topk(
    df: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF.

    ``tfidf = tf · ln((N+1)/(df+1))`` with N = corpus size and df =
    number of documents containing the term.  Ranking uses the ROUNDED
    score (6 dp) with the term string as tiebreak, so the result is
    reproducible across engines and shuffle orders.

    Output: (doc_id, term, tf, df, tfidf, rk), rk in 1..k.
    """
    tf = term_frequencies(df, id_col, text_col)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "term", "tf", "df", "tfidf", "rk")
    )


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
) -> DataFrame:
    """Top-k documents for a bag-of-words query under BM25
    (Robertson–Spärck Jones idf; the public Okapi formulation).

    ``idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))``
    ``score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))``

    Plan shape for 100 TB: the term IN-list filter lands on the token
    stream BEFORE any shuffle (only matching tokens move); document
    length is computed per-row (no corpus shuffle); N and avgdl are a
    broadcast 1-row aggregate; df per query term is at most
    ``len(query_terms)`` rows.  The final ordering is a top-k
    (TakeOrderedAndProject), not a global sort.

    Output: (doc_id, score, n_query_terms, rk), rk in 1..k.
    """
    corpus = df.select(
        F.count(F.lit(1)).alias("n_docs"),
        # integer token counts sum exactly in any order; the division
        # is one double op — deterministic without a DECIMAL detour
        (
            F.sum(F.size(F.split(F.lower(F.col(text_col)), " ")).cast("long"))
            / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    words = F.split(F.lower(F.col(text_col)), " ")
    matches = F.filter(words, lambda x: x.isin(*query_terms))
    # the query-term filter runs INSIDE the row before the explode, so
    # only matching tokens ever become rows; dl rides along, avoiding a
    # corpus-wide doc-length join
    tf = (
        spread_for_compute(df, id_col)
        .select(
            F.col(id_col).alias("doc_id"),
            F.size(words).alias("dl"),
            F.explode(matches).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(corpus))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.round(dec_sum(F.col("term_score"), scale=12, precision=30), 6).alias(
            "score"
        ),
        F.count(F.lit(1)).alias("n_query_terms"),
    )
    # top-k FIRST (TakeOrderedAndProject: per-partition heap + driver
    # merge — no global sort, no all-docs single-partition window), then
    # rank only the k surviving rows.  The constant partition key keeps
    # the bounded k-row window out of the global-window warning path.
    topk = agg.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.partitionBy(bounded_partition_key("doc_id")).orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        topk.withColumn("rk", F.row_number().over(w))
        .select("doc_id", "score", "n_query_terms", "rk")
    )
