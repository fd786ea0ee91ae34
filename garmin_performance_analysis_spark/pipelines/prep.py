"""End-to-end training-data preparation: the composition a pre-training
corpus pipeline actually runs, as one declarative plan.

quality gate → language gate → exact dedup → shuffle-invariant
fingerprint dedup → greedy token budget.

Every stage reuses an operator that has its own oracle-checked catalog
entry (x1/x2/x4 features, d1-style hash dedup, x3 fingerprints), so the
composite validates the COMPOSITION — filters staying pushed through
the feature projection, dedup windows shuffling on their own keys, and
the budget selection running as a distributed prefix sum rather than a
single-task global window.

Scale shape at 100 TB: one corpus scan computes every feature
(``text.corpus_features``), the two dedup stages are ordinary hash
shuffles on ``content_hash`` / ``fingerprint``, and the token budget
uses ``global_prefix_sum`` (range repartition + tiny offset join) —
no stage holds the corpus in one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.windows import global_prefix_sum
from .text import corpus_features, quality_features


def training_prep(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_words: int = 20,
    max_non_alpha: float = 0.35,
    min_distinct_ratio: float = 0.3,
    lang: str = "en",
    token_budget: int = 10_000,
) -> DataFrame:
    """Select a token-budgeted, deduplicated, quality- and
    language-gated training shard.

    Selection is deterministic end-to-end: gates are pure predicates,
    both dedup stages keep the MINIMUM ``doc_id`` per group, and the
    budget keeps the doc_id-ordered prefix whose running token count
    stays within ``token_budget`` (greedy prefix — the usual shard-
    packing rule, and expressible in ANSI SQL for the oracle)."""
    feats = corpus_features(docs, id_col, text_col)
    gated = feats.filter(
        (F.col("n_words") >= min_words)
        & (F.col("non_alpha_ratio") <= max_non_alpha)
        & (F.col("distinct_word_ratio") >= min_distinct_ratio)
        & (F.col("predicted_lang") == lang)
    )
    w_exact = Window.partitionBy("content_hash").orderBy("doc_id")
    d_exact = (
        gated.withColumn("_rn", F.row_number().over(w_exact))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    w_fp = Window.partitionBy("fingerprint").orderBy("doc_id")
    d_near = (
        d_exact.withColumn("_rn", F.row_number().over(w_fp))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    slim = d_near.select("doc_id", "predicted_lang", "n_words", "regex_tokens")
    cum = global_prefix_sum(slim, "doc_id", "regex_tokens", "cum_tokens")
    return cum.filter(F.col("cum_tokens") <= token_budget).select(
        "doc_id",
        "predicted_lang",
        F.col("n_words").cast("bigint").alias("n_words"),
        F.col("regex_tokens").cast("bigint").alias("regex_tokens"),
        F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
    )


def sample_bucket_expr(id_col: str, salt: str):
    """The deterministic sampling bucket: md5(salt|id) mod 1e6 as
    BIGINT (15 hex digits = 60 bits, exact).  Shared by
    ``stratified_sample`` and ``curation_record`` so the two can never
    drift apart on the sampling rule."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    return h % F.lit(1_000_000)


def sample_rate_expr(strata_col: str, rates: dict[str, float], default_rate: float):
    """Per-stratum keep rate as a CASE chain (shared, see above)."""
    rate = F.lit(default_rate)
    for stratum, r in rates.items():
        rate = F.when(F.col(strata_col) == stratum, F.lit(r)).otherwise(rate)
    return rate


def _threshold(rate):
    """Keep-bucket threshold: round BEFORE casting.  A bare cast
    truncates in Spark while DuckDB's CAST rounds to nearest, so a rate
    whose double product lands just under the integer (0.3 →
    299999.99999999994) desyncs the two engines by one bucket; both
    sides now use round-half-away (``round(rate*1e6)`` here,
    ``CAST(round(rate*1000000) AS BIGINT)`` in the oracles)."""
    return F.round(rate * 1_000_000).cast("bigint")


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "c2",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sampling — the training-mix
    step that weights data sources/languages differently (e.g. keep
    50% of English, 20% of code, drop the rest).

    Spark's ``sampleBy`` is seed-based but partition-order-dependent;
    at 100 TB a re-run after a repartition must keep the SAME rows, so
    the keep decision hashes the ROW KEY, not the partition RNG:
    ``keep ⇔ md5(salt|id) mod 1e6 < rate·1e6``.  That makes the sample
    stable under repartitioning, resumable, and reproducible in any
    engine with md5 (the DuckDB oracle replays it exactly).  Pure
    expressions, no shuffle at all — the sample is a scan-time filter
    that stacks predicate-pushdown-style before expensive downstream
    stages.

    Output: the sampled (doc_id, stratum, keep_bucket) rows.
    """
    bucket = sample_bucket_expr(id_col, salt)
    rate = sample_rate_expr(strata_col, rates, default_rate)
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(strata_col).alias("stratum"),
            bucket.alias("keep_bucket"),
            (bucket < _threshold(rate)).alias("_keep"),
        )
        .filter(F.col("_keep"))
        .drop("_keep")
    )


def curation_record(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    probe_col,
    *,
    min_words: int = 20,
    max_non_alpha: float = 0.35,
    min_distinct_ratio: float = 0.3,
    rates: dict[str, float] | None = None,
    default_rate: float = 0.1,
    salt: str = "c2",
    contamination_n: int = 5,
    contamination_threshold: float = 0.1,
) -> DataFrame:
    """The per-document CURATION RECORD — every gating signal a
    training-data pipeline computes, materialized as one row per
    document in one job: quality gates, language, dedup canonical ids,
    contamination vs the probe set, and the deterministic sample
    decision, plus the final ``keep`` verdict.

    This is the table a real pipeline writes before sharding: decisions
    stay auditable per document (why was doc X dropped?) instead of
    documents silently vanishing through a filter chain.

    ``probe_col`` is a boolean Column marking benchmark/eval documents
    (evaluated against the feature frame, so it may reference
    ``doc_id`` and ``text``); they are audited against, never kept,
    and their ``contaminated`` field is null.

    Plan shape: ONE feature scan (``corpus_features``); the two dedup
    windows shuffle on their own keys (content_hash, fingerprint); the
    contamination sub-plan reduces both sides to distinct shingles and
    broadcasts the probe set; the sample decision is a pure expression.
    Everything is deterministic, so the whole record has an exact
    ANSI oracle.
    """
    from .dedup import contamination_stats

    rates = {"en": 0.5, "de": 0.25, "fr": 0.25} if rates is None else rates
    # the probe flag is an expression over the feature frame, not a
    # join back to the source — keeps the record a single corpus scan
    feats = corpus_features(docs, id_col, text_col).withColumn("_probe", probe_col)
    # corpus_features preserves the SOURCE text column name — select it
    # by parameter, not by the literal "text" (review-caught crash for
    # any caller whose text column is named differently)
    flagged = feats.select("doc_id", F.col(text_col), "_probe")
    w_hash = Window.partitionBy("content_hash")
    w_fp = Window.partitionBy("fingerprint")
    base = (
        feats.withColumn("exact_keep_id", F.min("doc_id").over(w_hash))
        .withColumn("near_keep_id", F.min("doc_id").over(w_fp))
        .withColumn(
            "quality_pass",
            (F.col("n_words") >= min_words)
            & (F.col("non_alpha_ratio") <= max_non_alpha)
            & (F.col("distinct_word_ratio") >= min_distinct_ratio),
        )
    )
    cstats = contamination_stats(
        flagged.filter(~F.col("_probe")),
        flagged.filter(F.col("_probe")),
        "doc_id",  # feats already normalized the id column name
        text_col,
        n=contamination_n,
        flag_threshold=contamination_threshold,
    ).select("doc_id", F.col("contaminated").alias("_cont"))
    bucket = sample_bucket_expr("doc_id", salt)
    rate = sample_rate_expr("predicted_lang", rates, default_rate)
    out = (
        base.join(cstats, "doc_id", "left")
        .withColumn(
            "contaminated",
            F.when(F.col("_probe"), F.lit(None).cast("boolean")).otherwise(
                F.coalesce(F.col("_cont"), F.lit(False))
            ),
        )
        .withColumn("keep_bucket", bucket)
        .withColumn("sampled", bucket < _threshold(rate))
        .withColumn("is_exact_dup", F.col("doc_id") != F.col("exact_keep_id"))
        .withColumn("is_near_dup", F.col("doc_id") != F.col("near_keep_id"))
        .withColumn(
            "keep",
            ~F.col("_probe")
            & F.col("quality_pass")
            & ~F.col("is_exact_dup")
            & ~F.col("is_near_dup")
            & ~F.coalesce(F.col("contaminated"), F.lit(False))
            & F.col("sampled"),
        )
    )
    return out.select(
        "doc_id",
        "predicted_lang",
        F.col("n_words").cast("bigint").alias("n_words"),
        F.col("regex_tokens").cast("bigint").alias("regex_tokens"),
        F.col("_probe").alias("is_probe"),
        "quality_pass",
        "exact_keep_id",
        "near_keep_id",
        "is_exact_dup",
        "is_near_dup",
        "contaminated",
        "keep_bucket",
        "sampled",
        "keep",
    )


def sequence_packing(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    context_len: int = 512,
) -> DataFrame:
    """Concat-and-chunk sequence packing: the corpus is concatenated
    into ONE token stream in ``id_col`` order and cut into fixed
    ``context_len`` windows — the standard pre-training packing policy
    (every token trains exactly once; document boundaries fall where
    they fall).  Per document this reports where its tokens land:

      - ``n_tokens``        proxy token count (``x4``'s regex tokens)
      - ``start_offset``    global stream offset of the first token
      - ``chunk_first`` / ``chunk_last``  training-chunk ids spanned
      - ``n_chunks``        chunks this doc touches (0 for empty docs)
      - ``crosses_boundary``  true when the doc is split across chunks

    The chunk math is pure integer arithmetic on a global running token
    count, computed with ``global_prefix_sum`` (range repartition +
    tiny per-partition offset join) — NEVER a single-task unpartitioned
    window, which is what a naive ``SUM() OVER (ORDER BY id)`` plans
    as.  At 100 TB this is one scan + one range shuffle; the packing
    decision for any document depends only on the prefix sum, so the
    operator is deterministic and fully SQL-expressible for the oracle.
    """
    from .text import token_counts

    counts = token_counts(docs, id_col, text_col).select(
        "doc_id", F.col("regex_tokens").cast("long").alias("n_tokens")
    )
    cum = global_prefix_sum(counts, "doc_id", "n_tokens", "cum_tokens")
    start = (F.col("cum_tokens") - F.col("n_tokens")).cast("long")
    first = F.floor(start / context_len).cast("long")
    last = F.when(
        F.col("n_tokens") > 0,
        F.floor((F.col("cum_tokens") - 1) / context_len),
    ).otherwise(first).cast("long")
    n_chunks = F.when(F.col("n_tokens") > 0, last - first + 1).otherwise(
        F.lit(0)
    ).cast("long")
    return cum.select(
        "doc_id",
        "n_tokens",
        start.alias("start_offset"),
        first.alias("chunk_first"),
        last.alias("chunk_last"),
        n_chunks.alias("n_chunks"),
        (n_chunks > 1).alias("crosses_boundary"),
    )


def doc_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Per-document overlapping chunking — the retrieval/embedding prep
    twin of ``sequence_packing`` (which packs the CONCATENATED stream):
    each document's whitespace-token sequence is cut into windows of
    ``window`` tokens every ``stride`` tokens (overlap = window−stride),
    the standard chunking policy for embedding-index and RAG corpora.
    The final window is the remainder (shorter, never empty); a doc of
    ≤ ``window`` tokens yields exactly one chunk.

    Output: one row per (doc, chunk) —
    ``(doc_id, chunk_idx, start_token, chunk_tokens, chunk_text)``.

    Scale shape: pure in-row arithmetic + a 1→N ``explode`` — no
    shuffle, no UDF; the explode's fan-out is ~n_tokens/stride per doc,
    so output size is corpus-token-linear (the same bound as the
    embedding pass it feeds).  Fully SQL-expressible, so the catalog
    entry carries a complete value oracle.
    """
    if stride <= 0 or window <= 0 or stride > window:
        raise ValueError(
            f"need 0 < stride <= window, got window={window} stride={stride}"
        )
    toks = F.split(F.lower(F.col(text_col)), " ")
    n = F.size(toks)
    n_chunks = F.when(
        n <= window, F.lit(1)
    ).otherwise(F.ceil((n - window) / float(stride)) + 1)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("_w"),
        n.alias("_n"),
        F.explode(F.sequence(F.lit(0), n_chunks.cast("int") - 1)).alias(
            "chunk_idx"
        ),
    )
    start = (F.col("chunk_idx") * stride).cast("long")
    return base.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        start.alias("start_token"),
        F.least(F.lit(window), F.col("_n") - start).cast("long").alias(
            "chunk_tokens"
        ),
        F.array_join(
            F.slice(F.col("_w"), (start + 1).cast("int"), window), " "
        ).alias("chunk_text"),
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    salt: str = "split",
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Deterministic train/val/test assignment keyed on the
    order-insensitive content FINGERPRINT, not the doc id: every exact
    or word-shuffled duplicate of a document hashes to the same bucket,
    so a duplicate straddling train and test — the classic eval-leak —
    is impossible by construction (the failure mode motivating
    cluster-keyed splits in dedup literature; the fingerprint is the
    cheap single-pass stand-in for a full near-dup cluster id).

    Bucket = md5(salt|fingerprint) high 60 bits (first 15 hex chars)
    mod 100 (same 15-hex
    Horner-portable arithmetic as ``sample_bucket_expr``).  Pure
    in-row expressions over one scan — no shuffle, no RNG,
    partition-count invariant."""
    from .text import fingerprint_expr

    fp = fingerprint_expr(text_col)
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt + "|"), fp)), 1, 15), 16, 10
        ).cast("bigint")
        % 100
    )
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        fp.alias("fingerprint"),
        bucket.alias("split_bucket"),
        split.alias("split"),
    )


def quality_budget_select(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    token_budget: int = 20_000,
) -> DataFrame:
    """Quality-ranked token-budget selection — "spend the training
    budget on the best documents first": rank the corpus by a quality
    score (descending, doc_id tiebreak), run a global prefix sum of
    token counts down the ranking, and keep the prefix whose running
    total stays within ``token_budget``.

    This is the data-selection stage of a curated pre-training mix
    (quality-ranked subset selection); it differs from
    :func:`training_prep` (gate + dedup + doc_id-ordered budget) in
    that the ORDER is a computed score, so the budget boundary cuts by
    merit, not by ingest order.

    The score is the stopword fraction of the whitespace tokens — the
    cheap prose-ness proxy (C4 uses the same family of signals); it is
    an exact rational of two integer counts, so Spark and an ANSI
    oracle order identically with no float-comparison hazard.

    Plan shape for 100 TB: score is an in-row projection (no shuffle);
    the ranking order is realized by ``global_prefix_sum`` over the
    composite key ``(score DESC, doc_id)`` — range repartition + tiny
    offset join, never a single-task global window; the budget cut is
    then a pure filter.  One linear scan + one range shuffle total.

    Output: (doc_id, quality_score, n_tokens, cum_tokens), kept rows
    only, quality_score rounded 6dp for display (ordering uses the
    unrounded value).
    """
    feats = quality_features(docs, id_col, text_col)
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.expr(
            f"size(regexp_extract_all(lower({text_col}), '[a-z]+|[0-9]+', 0))"
        )
        .cast("bigint")
        .alias("n_tokens"),
    )
    slim = feats.select(
        "doc_id", F.col("stopword_ratio").alias("_score")
    ).join(toks, "doc_id")
    cum = global_prefix_sum(
        slim,
        [F.desc("_score"), "doc_id"],
        "n_tokens",
        "cum_tokens",
    )
    return (
        cum.filter(F.col("cum_tokens") <= token_budget)
        .select(
            "doc_id",
            F.round(F.col("_score"), 6).alias("quality_score"),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
        )
    )


def per_group_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    k: int = 25,
    salt: str = "pgs1|",
) -> DataFrame:
    """Deterministic uniform k-per-group sample: within each group keep
    the ``k`` rows ranking first by ``md5(salt || id)`` — the
    shuffle-free analogue of per-stratum reservoir sampling (the md5
    order IS a uniform random permutation, but a reproducible one, so
    reruns, retries, and the ANSI oracle all agree row-for-row).

    Complements :func:`stratified_sample` (per-stratum RATE) with a
    per-stratum COUNT — the shape needed for eval-set carving and
    per-source inspection samples ("give me 25 random docs from every
    source").

    Plan shape for 100 TB: one keyed window (partitionBy group, orderBy
    md5 — grouped shuffle, no global window); skew-safe because every
    group's output is capped at k and row_number short-circuits beyond
    it.  ``id_col`` must be unique, making the md5 rank total.

    Output: (id, group, sample_rank) for the kept rows.
    """
    key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(key)
    return (
        df.select(
            F.col(id_col),
            F.col(group_col),
            F.row_number().over(w).alias("sample_rank"),
        )
        .filter(F.col("sample_rank") <= k)
        .select(
            id_col,
            group_col,
            F.col("sample_rank").cast("bigint").alias("sample_rank"),
        )
    )


def top_p_select(
    df: DataFrame,
    group_cols: Sequence[str],
    score_col: str,
    id_col: str,
    p_ppm: int,
) -> DataFrame:
    """Nucleus (top-p) selection per group: order each group's rows by
    ``score_col`` descending (``id_col`` as the unique tiebreak) and
    keep the smallest prefix whose scores cover at least ``p_ppm``
    parts-per-million of the group's total score — the mass-based
    sibling of top-k, used to mix corpora by quality MASS instead of
    document count (a group of many mediocre documents contributes
    more rows than one with a few stellar ones).

    The threshold is exact integer arithmetic — a row is kept iff the
    cumulative score STRICTLY BEFORE it is below p·total, i.e.
    ``(cum - score) * 1_000_000 < p_ppm * total`` — so engines cannot
    disagree on the boundary row through float rounding.  Requires an
    integer ``score_col`` (token counts, byte sizes, integer quality
    grades); scale floats to integers upstream.

    Plan shape for 100 TB: a keyed cumulative-sum window and a keyed
    total window over the SAME partition key — one hash exchange, no
    global window, no driver-side totals.

    Output: group cols + (id, score, cum_score, keep rows only).
    """
    if not (0 < int(p_ppm) <= 1_000_000):
        raise ValueError("p_ppm must be in (0, 1e6]")
    order = [F.col(score_col).desc(), F.col(id_col).asc()]
    wcum = (
        Window.partitionBy(*group_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy(*group_cols)
    scored = df.select(
        *group_cols,
        id_col,
        F.col(score_col).cast("bigint").alias(score_col),
    ).withColumn(
        "cum_score", F.sum(score_col).over(wcum)
    ).withColumn("_total", F.sum(score_col).over(wtot))
    before = F.col("cum_score") - F.col(score_col)
    return scored.filter(
        before * F.lit(1_000_000) < F.lit(int(p_ppm)) * F.col("_total")
    ).drop("_total")
