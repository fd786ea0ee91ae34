"""Unit tests for retrieval / curation operators (TF-IDF, BM25,
decontamination, stratified sampling) against hand-computed mirrors."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from garmin_performance_analysis_spark.pipelines import dedup, prep, retrieval
from garmin_performance_analysis_spark.sources.tables import load_table


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_matches_hand_computation(spark):
    df = _docs(
        spark,
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry date"),
        ],
    )
    out = {
        (r["doc_id"], r["term"]): r
        for r in retrieval.tfidf_topk(df, "doc_id", "text", k=5).collect()
    }
    n = 3
    # doc 1: apple tf=2 df=1, banana tf=1 df=2
    assert out[(1, "apple")]["tf"] == 2 and out[(1, "apple")]["df"] == 1
    expected = round(2 * math.log((n + 1) / (1 + 1)), 6)
    assert abs(out[(1, "apple")]["tfidf"] - expected) < 1e-9
    assert out[(1, "apple")]["rk"] == 1  # highest score in doc 1
    # doc 3: date (1·ln(4/2)=0.693) beats cherry (2·ln(4/3)=0.575)
    assert out[(3, "date")]["rk"] == 1 and out[(3, "cherry")]["rk"] == 2
    assert abs(out[(3, "date")]["tfidf"] - round(math.log(2.0), 6)) < 1e-9


def test_tfidf_topk_caps_terms_per_doc(spark):
    df = _docs(spark, [(1, "a b c d e f g h")])
    out = retrieval.tfidf_topk(df, "doc_id", "text", k=3).collect()
    assert len(out) == 3
    assert sorted(r["rk"] for r in out) == [1, 2, 3]


def _bm25_mirror(docs, terms, k1=1.2, b=0.75):
    toks = {d: t.split(" ") for d, t in docs}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {
        q: sum(1 for t in toks.values() if q in t) for q in terms
    }
    scores = {}
    for d, t in toks.items():
        s = 0.0
        for q in terms:
            tf = t.count(q)
            if tf == 0 or df[q] == 0:
                continue
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
        if s > 0:
            scores[d] = round(s, 6)
    return scores


def test_bm25_matches_python_mirror(spark):
    rows = [
        (1, "spark shuffle join spark"),
        (2, "hash join window"),
        (3, "sort merge scan"),
        (4, "spark window window hash"),
    ]
    terms = ["spark", "hash", "window"]
    out = {
        r["doc_id"]: r["score"]
        for r in retrieval.bm25_scores(
            spark.createDataFrame(rows, "doc_id long, text string"),
            "doc_id",
            "text",
            terms,
        ).collect()
    }
    mirror = _bm25_mirror(rows, terms)
    assert set(out) == set(mirror)
    for d in mirror:
        assert abs(out[d] - mirror[d]) < 2e-6
    # doc 3 has no query terms — must be absent, not zero-scored
    assert 3 not in out


def test_bm25_rank_is_deterministic_on_ties(spark):
    rows = [(1, "spark alpha"), (2, "spark beta")]  # identical tf/dl
    out = retrieval.bm25_scores(
        spark.createDataFrame(rows, "doc_id long, text string"),
        "doc_id",
        "text",
        ["spark"],
    ).collect()
    by_rank = sorted(out, key=lambda r: r["rk"])
    assert [r["doc_id"] for r in by_rank] == [1, 2]  # doc_id tiebreak


def test_contamination_counts_planted_overlap(spark):
    probe = _docs(spark, [(100, "one two three four five six")])
    corpus = _docs(
        spark,
        [
            # contains the probe 5-gram "two three four five six"
            (1, "zero two three four five six seven"),
            (2, "totally different words here padded out"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in dedup.contamination_stats(
            corpus, probe, "doc_id", "text", n=5
        ).collect()
    }
    assert out[1]["n_hits"] == 1 and out[1]["contaminated"]
    assert out[2]["n_hits"] == 0 and not out[2]["contaminated"]
    assert out[2]["n_shingles"] == 2  # 6-word doc → 2 distinct 5-grams


def test_bloom_contamination_no_false_negatives_and_low_fp(spark):
    """The relational Bloom filter must (a) flag EVERY truly
    contaminated shingle (no false negatives — the all-k-positions
    membership is implied by construction for true members), (b) keep
    the false-positive rate near the (1 - e^(-kn/m))^k prediction on a
    disjoint corpus, and (c) be partition-invariant (md5 positions, no
    RNG)."""
    probe = _docs(spark, [(100, "one two three four five six")])
    corpus = _docs(
        spark,
        [
            (1, "zero two three four five six seven"),
            (2, "totally different words here padded out"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in dedup.bloom_contamination_stats(
            corpus, probe, "doc_id", "text", n=5
        ).collect()
    }
    assert out[1]["n_exact_hits"] == 1 and out[1]["contaminated"]
    assert out[1]["n_bloom_hits"] >= 1  # the true hit must survive
    assert all(r["no_false_negatives"] for r in out.values())
    # disjoint 60-doc corpus vs a 40-doc probe: at m=2^20, k=3 the FP
    # chance per shingle is ~1e-8 — zero spurious hits expected
    big_probe = _docs(
        spark,
        [(200 + i, " ".join(f"p{i}w{j}" for j in range(30))) for i in range(40)],
    )
    big_corpus = _docs(
        spark,
        [(i, " ".join(f"c{i}w{j}" for j in range(30))) for i in range(60)],
    )
    rows = dedup.bloom_contamination_stats(
        big_corpus, big_probe, "doc_id", "text", n=5
    ).collect()
    assert sum(r["n_bloom_hits"] for r in rows) == 0
    assert sum(r["n_exact_hits"] for r in rows) == 0
    # partition-invariance
    again = dedup.bloom_contamination_stats(
        big_corpus.repartition(7), big_probe.repartition(3), "doc_id", "text", n=5
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # FALSE-POSITIVE path: a deliberately tiny filter (64 bits for ~26
    # probe shingles × 3 hashes) saturates the position set, so the
    # disjoint corpus now bloom-hits even though exact hits stay zero —
    # and the md5 positions make that FP set itself deterministic
    tiny = {
        r["doc_id"]: r
        for r in dedup.bloom_contamination_stats(
            big_corpus, big_probe, "doc_id", "text", n=5, m_bits=64
        ).collect()
    }
    assert sum(r["n_exact_hits"] for r in tiny.values()) == 0
    assert sum(r["n_bloom_hits"] for r in tiny.values()) > 0
    assert all(r["no_false_negatives"] for r in tiny.values())
    assert not any(r["contaminated"] for r in tiny.values())  # exact rules
    tiny2 = {
        r["doc_id"]: r
        for r in dedup.bloom_contamination_stats(
            big_corpus.repartition(5), big_probe, "doc_id", "text", n=5, m_bits=64
        ).collect()
    }
    assert {k: tuple(v) for k, v in tiny.items()} == {
        k: tuple(v) for k, v in tiny2.items()
    }


def test_stratified_sample_deterministic_and_rate_bounded(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rates = {"en": 0.5, "de": 0.25}
    a = prep.stratified_sample(docs, "doc_id", "lang", rates, default_rate=0.1)
    b = prep.stratified_sample(
        docs.repartition(7), "doc_id", "lang", rates, default_rate=0.1
    )
    rows_a = sorted((r["doc_id"], r["stratum"]) for r in a.collect())
    rows_b = sorted((r["doc_id"], r["stratum"]) for r in b.collect())
    assert rows_a == rows_b  # partition-invariant: same rows every run
    # every kept bucket respects its stratum threshold
    for r in a.collect():
        limit = rates.get(r["stratum"], 0.1) * 1_000_000
        assert r["keep_bucket"] < limit


def test_stratified_sample_rate_is_roughly_respected(spark):
    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    kept = prep.stratified_sample(df, "doc_id", "lang", {"en": 0.5}).count()
    assert 0.45 * 4000 < kept < 0.55 * 4000  # md5 uniformity


def test_repetition_signals_hand_computed(spark):
    from garmin_performance_analysis_spark.pipelines import text as text_mod

    df = _docs(
        spark,
        [
            (1, "a b a b a"),  # 2-grams: ab ba ab ba → 2 dup of 4
            (2, "x"),  # too short for any gram
        ],
    )
    out = {
        r["doc_id"]: r
        for r in text_mod.repetition_signals(df, "doc_id", "text").collect()
    }
    assert abs(out[1]["dup_2gram_frac"] - 0.5) < 1e-9
    # 3-grams: aba bab aba → 1 dup of 3
    assert abs(out[1]["dup_3gram_frac"] - round(1 / 3, 6)) < 1e-9
    assert out[1]["top_term"] == "a" and out[1]["top_tf"] == 3
    assert abs(out[1]["top_term_frac"] - 0.6) < 1e-9
    # single-word doc: gram fractions null, top term still defined
    assert out[2]["dup_2gram_frac"] is None
    assert out[2]["dup_3gram_frac"] is None
    assert out[2]["top_term"] == "x" and out[2]["top_tf"] == 1


def test_sq_topk_recall_vs_exact(spark, sf_dir):
    """int8 quantization + 50-deep shortlist must recover the exact
    top-10 (quantization noise ~1/127 is far below the neighbor gaps
    in the synthetic embeddings)."""
    from garmin_performance_analysis_spark.pipelines import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    exact = {
        r["vec_id"]
        for r in similarity.brute_force_topk(
            emb.filter(F.col("vec_id") != 0), "vec_id", "embedding", query, k=10
        ).collect()
    }
    sq = similarity.sq_topk(emb, "vec_id", "embedding", query_id=0, k=10).collect()
    got = {r["vec_id"] for r in sq}
    assert len(got & exact) >= 9
    # quantized score must approximate the exact score
    for r in sq:
        assert abs(r["q_cosine"] - r["cosine"]) < 0.02


def test_curation_record_flags_are_consistent(spark):
    """Planted scenarios: an exact dup, a reordered near-dup, a probe
    doc, and a contaminated doc must each carry the right flags, and
    `keep` must be the conjunction of the individual gates."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    rows = [
        (0, base.strip()),                      # probe (0 % 23 == 0)
        (1, base.strip()),                      # exact dup of probe text
        (2, " ".join(reversed(base.split()))),  # near-dup (same word set)
        (3, "totally different words " * 8),    # clean long doc
    ]
    out = {
        r["doc_id"]: r
        for r in prep.curation_record(
            _docs(spark, rows),
            "doc_id",
            "text",
            probe_col=F.col("doc_id") % 23 == 0,
            rates={"en": 1.0},
            default_rate=1.0,  # sampling always keeps → isolates gates
        ).collect()
    }
    assert out[0]["is_probe"] and out[0]["contaminated"] is None
    assert not out[0]["keep"]  # probe docs are never kept
    assert out[1]["is_exact_dup"] and out[1]["exact_keep_id"] == 0
    assert not out[1]["keep"]
    assert out[2]["is_near_dup"] and not out[2]["is_exact_dup"]
    assert out[2]["near_keep_id"] == 0
    # doc 1 shares every 5-gram with the probe text → contaminated
    assert out[1]["contaminated"]
    # doc 3 shares nothing and passes everything
    r3 = out[3]
    assert (
        not r3["is_exact_dup"]
        and not r3["is_near_dup"]
        and not r3["contaminated"]
        and r3["sampled"]
    )
    assert r3["keep"] == r3["quality_pass"]


def test_embedding_outliers_finds_planted_junk(spark):
    from garmin_performance_analysis_spark.pipelines import similarity

    import numpy as np

    rng = np.random.RandomState(7)
    rows = [(int(i), (rng.randn(8) * 0.1 + 1.0).tolist()) for i in range(50)]
    rows.append((99, [50.0] * 8))  # planted far-away junk vector
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.embedding_outliers(df, "vec_id", "embedding", dim=8, k=3)
    top = out.orderBy("rk").first()
    assert top["vec_id"] == 99 and top["rk"] == 1
    assert top["z"] > 3  # unambiguous outlier


# --- property tests: random corpora vs the Python mirrors -----------

from hypothesis import given, settings, strategies as st  # noqa: E402

_WORDS = ["alpha", "beta", "gamma", "delta", "spark", "hash", "window"]
_doc_strategy = st.lists(
    st.sampled_from(_WORDS), min_size=1, max_size=12
).map(" ".join)


@settings(max_examples=15, deadline=None)
@given(texts=st.lists(_doc_strategy, min_size=1, max_size=8))
def test_bm25_property_matches_mirror(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    terms = ["spark", "hash", "window"]
    out = {
        r["doc_id"]: r["score"]
        for r in retrieval.bm25_scores(
            spark.createDataFrame(rows, "doc_id long, text string"),
            "doc_id",
            "text",
            terms,
            k=100,
        ).collect()
    }
    mirror = _bm25_mirror(rows, terms)
    assert set(out) == set(mirror)
    for d, s in mirror.items():
        assert abs(out[d] - s) < 2e-6


def _tfidf_mirror(rows, k):
    import math
    from collections import Counter

    n = len(rows)
    tfs = {d: Counter(t.split(" ")) for d, t in rows}
    df = Counter()
    for c in tfs.values():
        for term in c:
            df[term] += 1
    out = {}
    for d, c in tfs.items():
        scored = sorted(
            (
                (round(tf * math.log((n + 1) / (df[t] + 1)), 6), t, tf)
                for t, tf in c.items()
            ),
            key=lambda x: (-x[0], x[1]),
        )[:k]
        out[d] = [(t, s) for s, t, _ in scored]
    return out


@settings(max_examples=15, deadline=None)
@given(texts=st.lists(_doc_strategy, min_size=1, max_size=8))
def test_tfidf_property_matches_mirror(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    got = {}
    for r in retrieval.tfidf_topk(
        spark.createDataFrame(rows, "doc_id long, text string"),
        "doc_id",
        "text",
        k=3,
    ).collect():
        got.setdefault(r["doc_id"], []).append((r["rk"], r["term"], r["tfidf"]))
    mirror = _tfidf_mirror(rows, k=3)
    for d, expect in mirror.items():
        mine = [(t, s) for _, t, s in sorted(got[d])]
        assert [t for t, _ in mine] == [t for t, _ in expect]
        for (_, a), (_, b) in zip(mine, expect):
            assert abs(a - b) < 2e-6


def test_unigram_logprob_hand_computed(spark):
    """3-doc corpus with a hand-computable unigram distribution."""
    import math

    from garmin_performance_analysis_spark.pipelines import text as text_mod

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a b"), (3, "c")], "doc_id long, text string"
    )
    # corpus counts: a=3, b=2, c=1, total=6
    rows = {r["doc_id"]: r for r in
            text_mod.unigram_logprob_scores(df, "doc_id", "text").collect()}
    lp = lambda n: math.log(n / 6.0)
    assert rows[1]["n_tokens"] == 3
    assert rows[1]["avg_logprob"] == round((2 * lp(3) + lp(2)) / 3, 6)
    assert rows[2]["avg_logprob"] == round((lp(3) + lp(2)) / 2, 6)
    assert rows[3]["avg_logprob"] == round(lp(1), 6)
    # rare-token doc scores strictly below the common-token doc
    assert rows[3]["avg_logprob"] < rows[1]["avg_logprob"]


def test_boilerplate_segments_flags_cross_doc_dups(spark):
    from garmin_performance_analysis_spark.pipelines import text as text_mod

    df = spark.createDataFrame(
        [
            (1, "all rights reserved. unique one"),
            (2, "all rights reserved. unique two"),
            (3, "totally original. nothing shared"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            text_mod.boilerplate_segments(df, "doc_id", "text").collect()}
    assert rows[1]["n_segments"] == 2 and rows[1]["n_dup_segments"] == 1
    assert rows[1]["dup_fraction"] == 0.5
    assert rows[2]["dup_fraction"] == 0.5
    assert rows[3]["n_dup_segments"] == 0 and rows[3]["dup_fraction"] == 0.0


def test_sample_threshold_rounds_before_casting(spark):
    # 0.3 * 1e6 = 299999.99999999994 as a double; a bare cast truncates
    # in Spark while DuckDB rounds — the ADVICE desync case.  Both
    # sides now round first, so the bucket threshold is exact.
    from garmin_performance_analysis_spark.pipelines.prep import _threshold

    row = spark.range(1).select(
        _threshold(F.lit(0.3)).alias("t3"),
        _threshold(F.lit(0.5)).alias("t5"),
        _threshold(F.lit(0.07)).alias("t07"),
    ).first()
    assert (row["t3"], row["t5"], row["t07"]) == (300000, 500000, 70000)


def test_bigram_logprob_hand_computed(spark):
    """3-doc corpus with hand-computable bigram transition counts."""
    import math

    from garmin_performance_analysis_spark.pipelines import text as text_mod

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "c")], "doc_id long, text string"
    )
    # bigrams: doc1 = (a,b),(b,a),(a,b); doc2 = (a,b)
    # corpus: c(a,b)=3, c(b,a)=1; histories: c1(a)=3, c1(b)=1
    # vocab (all tokens, incl. doc3's lone c): {a, b, c} -> V=3
    rows = {r["doc_id"]: r for r in
            text_mod.bigram_logprob_scores(df, "doc_id", "text").collect()}
    k, v = 0.5, 3
    p_ab = math.log((3 + k) / (3 + k * v))
    p_ba = math.log((1 + k) / (1 + k * v))
    assert rows[1]["n_bigrams"] == 3
    assert rows[1]["avg_logprob"] == round((2 * p_ab + p_ba) / 3, 6)
    assert rows[2]["n_bigrams"] == 1
    assert rows[2]["avg_logprob"] == round(p_ab, 6)
    # single-token doc: no transitions to judge -> tombstone row
    assert rows[3]["n_bigrams"] == 0 and rows[3]["avg_logprob"] is None
    # the common transition scores above the rare one
    assert rows[2]["avg_logprob"] > round(p_ba, 6)


def test_segment_dedup_rewrite_keeps_first_occurrence(spark):
    from garmin_performance_analysis_spark.pipelines import dedup as dedup_mod

    df = spark.createDataFrame(
        [
            (1, "all rights reserved. unique one"),
            (2, "all rights reserved. unique two"),
            (3, "unique one. fresh tail"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            dedup_mod.segment_dedup_rewrite(df, "doc_id", "text").collect()}
    # doc1 is the global first for both its segments -> untouched
    assert rows[1]["clean_text"] == "all rights reserved. unique one"
    assert rows[1]["n_segments"] == 2 and rows[1]["n_kept"] == 2
    # doc2 loses the boilerplate header (doc1 owns it), keeps its tail
    assert rows[2]["clean_text"] == "unique two"
    assert rows[2]["n_kept"] == 1
    # doc3's "unique one" was first seen in doc1 (smaller doc_id) -> dropped
    assert rows[3]["clean_text"] == "fresh tail"


def test_segment_dedup_rewrite_empty_doc_tombstone(spark):
    from garmin_performance_analysis_spark.pipelines import dedup as dedup_mod

    df = spark.createDataFrame(
        [(1, "same thing"), (2, "same thing")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in
            dedup_mod.segment_dedup_rewrite(df, "doc_id", "text").collect()}
    # doc2's only segment deduped away: row survives with empty text
    assert rows[2]["n_kept"] == 0 and rows[2]["clean_text"] == ""
    assert rows[1]["clean_text"] == "same thing"


def test_quality_budget_select_orders_by_merit(spark):
    from garmin_performance_analysis_spark.pipelines import prep as prep_mod

    # doc2 is prose-iest (all stopwords), doc1 mixed, doc3 no stopwords
    df = spark.createDataFrame(
        [
            (1, "the big table of data"),      # 2/5 stopwords, 5 tokens
            (2, "the of and to in"),           # 5/5 stopwords, 5 tokens
            (3, "spark rows columns"),         # 0/3 stopwords, 3 tokens
        ],
        "doc_id long, text string",
    )
    out = prep_mod.quality_budget_select(
        df, "doc_id", "text", token_budget=10
    ).collect()
    kept = {r["doc_id"]: r for r in out}
    # merit order: doc2 (1.0), doc1 (0.4), doc3 (0.0); budget 10 fits
    # doc2 (5) + doc1 (5) = 10, doc3 would overflow
    assert set(kept) == {1, 2}
    assert kept[2]["cum_tokens"] == 5 and kept[1]["cum_tokens"] == 10
    assert kept[2]["quality_score"] == 1.0 and kept[1]["quality_score"] == 0.4


def test_quality_budget_select_tiebreak_is_doc_id(spark):
    from garmin_performance_analysis_spark.pipelines import prep as prep_mod

    # identical scores and token counts -> doc_id breaks the tie
    df = spark.createDataFrame(
        [(i, "the data table") for i in range(1, 7)], "doc_id long, text string"
    )
    out = prep_mod.quality_budget_select(
        df, "doc_id", "text", token_budget=9
    ).collect()
    assert sorted(r["doc_id"] for r in out) == [1, 2, 3]


def test_heavy_hitters_exact_vs_full_groupby(spark):
    from garmin_performance_analysis_spark.operators import sketches

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    terms = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
    )
    got = sketches.heavy_hitters_topk(terms, "term", k=15, width=4096).collect()
    want = (
        terms.groupBy("term").count()
        .orderBy(F.desc("count"), F.asc("term"))
        .limit(15)
        .collect()
    )
    assert [(r["term"], r["cnt"]) for r in got] == [
        (r["term"], r["count"]) for r in want
    ]


def test_heavy_hitters_survives_compaction(spark):
    """width small enough that the Misra-Gries batch decrement fires:
    the heavy key must still surface with its EXACT count."""
    from garmin_performance_analysis_spark.operators import sketches

    # 1 heavy key (600 occurrences) + 3000 singletons, width 8 ->
    # every partition compacts repeatedly; the recount restores 600
    rows = [("hot",)] * 600 + [(f"u{i}",) for i in range(3000)]
    df = spark.createDataFrame(rows, "term string").repartition(4)
    got = sketches.heavy_hitters_topk(df, "term", k=1, width=8).collect()
    assert got[0]["term"] == "hot" and got[0]["cnt"] == 600


def test_per_group_sample_counts_and_determinism(spark):
    from garmin_performance_analysis_spark.pipelines import prep as prep_mod

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = prep_mod.per_group_sample(docs, "doc_id", "source", k=5).collect()
    b = prep_mod.per_group_sample(docs, "doc_id", "source", k=5).collect()
    assert sorted((r["doc_id"], r["sample_rank"]) for r in a) == sorted(
        (r["doc_id"], r["sample_rank"]) for r in b
    )
    from collections import Counter

    per_src = Counter(r["source"] for r in a)
    n_src = docs.select("source").distinct().count()
    assert len(per_src) == n_src and all(v <= 5 for v in per_src.values())
    # a different salt draws a different sample (it IS the RNG)
    c = prep_mod.per_group_sample(docs, "doc_id", "source", k=5, salt="other|")
    assert {r["doc_id"] for r in c.collect()} != {r["doc_id"] for r in a}


def test_rrf_fusion_partial_overlap_semantics(spark):
    """RRF contract on constructed rankings: an item in BOTH lists sums
    both reciprocal terms; an item in one list contributes only that
    term; ordering follows the fused score with id tiebreak."""
    from garmin_performance_analysis_spark.harness.catalog import CATALOG  # noqa: F401
    from pyspark.sql import Window
    from garmin_performance_analysis_spark.operators.windows import (
        bounded_partition_key,
    )

    lex = spark.createDataFrame([(10, 1), (20, 2)], "id long, lex_rank int")
    sem = spark.createDataFrame([(20, 1), (30, 2)], "id long, sem_rank int")
    fused = lex.join(sem, "id", "full_outer").withColumn(
        "rrf",
        F.coalesce(F.lit(1.0) / (60 + F.col("lex_rank")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (60 + F.col("sem_rank")), F.lit(0.0)),
    )
    rows = {r["id"]: r["rrf"] for r in fused.collect()}
    assert rows[20] == 1.0 / 62 + 1.0 / 61   # both lists
    assert rows[10] == 1.0 / 61              # lexical only
    assert rows[30] == 1.0 / 62              # semantic only
    order = [
        r["id"]
        for r in fused.orderBy(F.desc("rrf"), F.asc("id")).collect()
    ]
    assert order == [20, 10, 30]  # 1/61 > 1/62, id breaks nothing here


def test_o13_mrr_hit_consistency(spark, sf_dir):
    """Per-query rows must be self-consistent with brute-force gold:
    the gold id is the exact full-dim NN, rank_in_system is its rank
    in the prefix->re-rank top-10 (0 when the shortlist dropped it),
    and the macro MRR/hit-rate equal the row-level means."""
    import numpy as np

    from garmin_performance_analysis_spark.harness.catalog import CATALOG
    from garmin_performance_analysis_spark.sources.tables import load_table

    rows = CATALOG["o13_mrr_hit_eval"].fn(spark, sf_dir).collect()
    assert rows
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=float)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def cos(a, b, d=None):
        a2, b2 = (a[:d], b[:d]) if d else (a, b)
        return float(a2 @ b2 / (np.linalg.norm(a2) * np.linalg.norm(b2)))

    for r in rows:
        q = emb[r["query_id"]]
        others = [(v, e) for v, e in emb.items() if v != r["query_id"]]
        want_gold = min(others, key=lambda t: (-cos(q, t[1]), t[0]))[0]
        assert r["gold_id"] == want_gold
        short = sorted(others, key=lambda t: (-cos(q, t[1], 16), t[0]))[:50]
        top10 = sorted(short, key=lambda t: (-cos(q, t[1]), t[0]))[:10]
        ids = [v for v, _ in top10]
        want_rank = ids.index(want_gold) + 1 if want_gold in ids else 0
        assert r["rank_in_system"] == want_rank
        assert abs(r["rr"] - round(1 / want_rank if want_rank else 0.0, 6)) < 1e-9
    mrr = round(sum(r["rr"] for r in rows) / len(rows), 6)
    hit = round(
        sum(1 for r in rows if 1 <= r["rank_in_system"] <= 10) / len(rows), 6
    )
    assert all(abs(r["mrr"] - mrr) < 1e-6 and abs(r["hit_rate"] - hit) < 1e-6
               for r in rows)


def test_x28_good_turing_consistency(spark, sf_dir):
    """Good-Turing identities recomputed from the raw vocabulary:
    N_r counts, r* = (r+1) N_{r+1} / N_r, P0 = N_1 / total tokens, and
    the 10-smallest-frequency window."""
    from collections import Counter

    from garmin_performance_analysis_spark.harness.catalog import CATALOG
    from garmin_performance_analysis_spark.sources.tables import load_table

    rows = sorted(
        CATALOG["x28_good_turing"].fn(spark, sf_dir).collect(),
        key=lambda r: r["r"],
    )
    assert rows
    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    vocab = Counter()
    for d in docs:
        vocab.update(d["text"].lower().split(" "))
    fof = Counter(vocab.values())
    total_tokens = sum(vocab.values())
    want_rs = sorted(fof)[:10]
    assert [r["r"] for r in rows] == want_rs
    for r in rows:
        assert r["n_types"] == fof[r["r"]]
        nxt = fof.get(r["r"] + 1)
        if nxt is None:
            assert r["r_star"] is None
        else:
            assert abs(
                r["r_star"] - round((r["r"] + 1) * nxt / fof[r["r"]], 6)
            ) < 1e-9
        assert r["total_tokens"] == total_tokens
        assert r["total_types"] == len(vocab)
        assert abs(
            r["p0_unseen"] - round(fof.get(1, 0) / total_tokens, 6)
        ) < 1e-9


def test_v12_mips_exact_and_certified(spark, sf_dir):
    """The pruned result must equal the brute-force exact top-10 by
    dot product, and the contender-set arithmetic must be complete:
    every vector outside the scored pool has bound < theta."""
    import numpy as np

    from garmin_performance_analysis_spark.harness.catalog import CATALOG
    from garmin_performance_analysis_spark.sources.tables import load_table

    rows = sorted(
        CATALOG["v12_mips_norm_pruned"].fn(spark, sf_dir).collect(),
        key=lambda r: r["rk"],
    )
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=float)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    q = emb[0]
    dots = {v: float(e @ q) for v, e in emb.items() if v != 0}
    want = sorted(dots.items(), key=lambda t: (-t[1], t[0]))[:10]
    assert [r["vec_id"] for r in rows] == [v for v, _ in want]
    for r, (_, d) in zip(rows, want):
        assert abs(r["dot"] - round(d, 6)) < 1e-5
    # certificate: theta = 10th dot of the norm-shortlist; any vector
    # with bound < theta cannot beat the pool
    qn = float(np.linalg.norm(q))
    bounds = {v: float(np.linalg.norm(e)) * qn for v, e in emb.items() if v != 0}
    shortlist = sorted(bounds.items(), key=lambda t: (-t[1], t[0]))[:50]
    theta = sorted(
        (dots[v] for v, _ in shortlist), reverse=True
    )[9]
    assert all(
        dots[v] <= bounds[v] for v in dots
    )  # Cauchy-Schwarz sanity
    outside = [v for v in dots if bounds[v] < theta]
    assert all(dots[v] < want[-1][1] or v in (x for x, _ in want)
               for v in outside)


def test_v12_prune_bites_on_spread_norms(spark, tmp_path):
    """On planted power-law norms (the real recommender-embedding
    shape) the Cauchy-Schwarz prune must be REAL: far fewer full dots
    than vectors, and the answer still exactly matches brute force.
    This pins the round-12 restructure in which the first pass is
    bound-only and the dot expression exists only downstream of the
    shortlist/θ-survivor id joins."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from garmin_performance_analysis_spark.harness.catalog import CATALOG

    rng = np.random.default_rng(12345)
    n, d = 800, 64
    dirs = rng.standard_normal((n + 1, d))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    norms = 100.0 / np.arange(1, n + 1) ** 0.8
    vecs = dirs.copy()
    vecs[1:] *= norms[:, None]
    vecs = vecs.astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n + 1), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(np.zeros(n + 1, dtype=np.int32), pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    rows = sorted(
        CATALOG["v12_mips_norm_pruned"].fn(spark, str(tmp_path)).collect(),
        key=lambda r: r["rk"],
    )
    dots = vecs[1:].astype(float) @ vecs[0].astype(float)
    order = sorted(range(1, n + 1), key=lambda v: (-dots[v - 1], v))
    assert [r["vec_id"] for r in rows] == order[:10]
    pool = rows[0]["n_full_dots"]
    assert pool < n // 2, f"prune did not bite: {pool} full dots of {n}"
    assert rows[0]["prune_rate"] > 0.5


def test_x29_diversity_known_values(spark, tmp_path):
    """Hand-checkable corpus: src 'a' holds two IDENTICAL docs (every
    gram cross-doc → self-BLEU proxy 1.0, distinct ratios halved),
    src 'b' holds two fully disjoint docs (proxy 0.0, ratios 1.0)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from garmin_performance_analysis_spark.harness.catalog import CATALOG

    rows = [
        (0, "x y z", "en", "a", 5),
        (1, "x y z", "en", "a", 5),
        (2, "p q r", "en", "b", 5),
        (3, "s t u", "en", "b", 5),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array([r[2] for r in rows]),
            "source": pa.array([r[3] for r in rows]),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = {
        r["source"]: r
        for r in CATALOG["x29_distinct_ngram_diversity"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    a, b = out["a"], out["b"]
    assert a["n_docs"] == 2 and b["n_docs"] == 2
    # src a: 6 unigram instances, 3 distinct; 4 bigrams, 2 distinct;
    # 2 trigrams, 1 distinct; every gram appears in both docs
    assert a["distinct_unigrams"] == 3
    assert a["distinct1_ratio"] == 0.5
    assert a["distinct2_ratio"] == 0.5
    assert a["distinct3_ratio"] == 0.5
    assert a["self_bleu2_proxy"] == 1.0
    assert a["self_bleu3_proxy"] == 1.0
    # src b: all grams unique to their doc
    assert b["distinct_unigrams"] == 6
    assert b["distinct1_ratio"] == 1.0
    assert b["distinct2_ratio"] == 1.0
    assert b["distinct3_ratio"] == 1.0
    assert b["self_bleu2_proxy"] == 0.0
    assert b["self_bleu3_proxy"] == 0.0


def test_x29_single_word_docs_have_no_higher_grams(spark, tmp_path):
    """A 1-word corpus must not fabricate bigrams/trigrams (the
    descending-`sequence` hazard the size guards exist for)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from garmin_performance_analysis_spark.harness.catalog import CATALOG

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["solo", "solo"]),
            "lang": pa.array(["en", "en"]),
            "source": pa.array(["s", "s"]),
            "n_chars": pa.array([4, 4], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    r = CATALOG["x29_distinct_ngram_diversity"].fn(
        spark, str(tmp_path)
    ).collect()[0]
    assert r["distinct_unigrams"] == 1
    assert r["distinct1_ratio"] == 0.5
    assert r["distinct2_ratio"] is None
    assert r["distinct3_ratio"] is None
    assert r["self_bleu2_proxy"] is None
    assert r["self_bleu3_proxy"] is None


def test_x30_js_drift_known_values(spark, tmp_path):
    """Hand-checkable: source 'a' writes only 'x', source 'b' only
    'y' — disjoint unigram supports, so for each source p and q are
    point masses on different terms: JSD = ln 2 nats, TV = 1.  A
    third source 'c' matching the pooled rest exactly gets small
    (but nonzero: leave-one-out shifts the rest) divergence."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from garmin_performance_analysis_spark.harness.catalog import CATALOG

    rows = [
        (0, "x x x x", "en", "a", 7),
        (1, "y y y y", "en", "b", 7),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array([r[2] for r in rows]),
            "source": pa.array([r[3] for r in rows]),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = {
        r["source"]: r
        for r in CATALOG["x30_unigram_js_source_drift"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    for s in ("a", "b"):
        assert out[s]["n_tokens"] == 4
        assert out[s]["vocab_terms"] == 1
        assert abs(out[s]["jsd_nats"] - math.log(2)) < 1e-6
        assert out[s]["tv_distance"] == 1.0


def test_x30_identical_sources_have_zero_drift(spark, tmp_path):
    """Three sources with IDENTICAL unigram distributions: each
    source's distribution equals the pooled rest exactly, so JSD and
    TV are 0 for every source."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from garmin_performance_analysis_spark.harness.catalog import CATALOG

    rows = [
        (0, "x y", "en", "a", 3),
        (1, "x y", "en", "b", 3),
        (2, "x y", "en", "c", 3),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array([r[2] for r in rows]),
            "source": pa.array([r[3] for r in rows]),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    for r in CATALOG["x30_unigram_js_source_drift"].fn(
        spark, str(tmp_path)
    ).collect():
        assert r["jsd_nats"] == 0.0
        assert r["tv_distance"] == 0.0
        assert r["vocab_terms"] == 2


def test_x31_fertility_known_values(spark, tmp_path):
    """Hand-checkable: with EN_MERGES frozen, a word that matches a
    merge chain compresses below its character count while an
    unmergeable word stays 1 token per char; the per-lang rates are
    exact integer ratios."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from garmin_performance_analysis_spark.harness.catalog import CATALOG
    from garmin_performance_analysis_spark.pipelines import bpe

    rows = [
        (0, "zq zq", "aa", "s", 5),   # 'zq' has no EN merge: 2 tokens/word
        (1, "zq", "bb", "s", 2),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array([r[2] for r in rows]),
            "source": pa.array([r[3] for r in rows]),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    # 'zq' must really be merge-free under the frozen table, or the
    # hand numbers below drift with the constant
    assert all(lhs + rhs != "zq" for lhs, rhs in bpe.EN_MERGES)
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = {
        r["lang"]: r
        for r in CATALOG["x31_tokenizer_fertility"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    aa, bb = out["aa"], out["bb"]
    assert aa["total_words"] == 2 and aa["total_bpe_tokens"] == 4
    assert aa["total_bytes"] == 5
    assert aa["fertility"] == 2.0
    assert aa["bytes_per_token"] == 1.25
    assert bb["total_words"] == 1 and bb["total_bpe_tokens"] == 2
    assert bb["fertility"] == 2.0
    assert bb["bytes_per_token"] == 1.0


def test_c23_contamination_known_values(spark, tmp_path):
    """Hand-checkable: source 'a' has 2 distinct 5-grams, one of which
    occurs in 'b' → containment(a→b) = 0.5; 'b' has 1 distinct 5-gram
    contained in 'a' → containment(b→a) = 1.0; 'c' shares nothing and
    must not appear."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from garmin_performance_analysis_spark.harness.catalog import CATALOG

    rows = [
        (0, "v w x y z q", "en", "a", 11),   # grams: 'v w x y z', 'w x y z q'
        (1, "v w x y z", "en", "b", 9),      # gram:  'v w x y z'
        (2, "p p p p p", "en", "c", 9),
        (3, "shorty", "en", "c", 6),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array([r[2] for r in rows]),
            "source": pa.array([r[3] for r in rows]),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = {
        (r["src_a"], r["src_b"]): r
        for r in CATALOG["c23_source_contamination_matrix"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert set(out) == {("a", "b"), ("b", "a")}
    assert out[("a", "b")]["n_grams_a"] == 2
    assert out[("a", "b")]["n_shared"] == 1
    assert out[("a", "b")]["containment"] == 0.5
    assert out[("b", "a")]["n_grams_a"] == 1
    assert out[("b", "a")]["containment"] == 1.0


def test_x32_pmi_collocations_gates_and_values(spark, tmp_path):
    """Hand-checkable corpus: (u,v) is as frequent as the collocations
    but its unigrams over-predict it (negative PMI -> excluded by the
    integer cross-multiplication gate); (q,r) has sky-high PMI but only
    4 occurrences (excluded by the c12>=5 floor); (u,w) and (z,v) pass
    both gates with PMI = ln(5*19/50) = ln(1.9)."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from garmin_performance_analysis_spark.harness.catalog import CATALOG

    texts = ["u v"] * 5 + ["u w"] * 5 + ["z v"] * 5 + ["q r"] * 4
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([3] * len(texts), pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    rows = CATALOG["x32_pmi_collocations"].fn(spark, str(tmp_path)).collect()
    got = [(r["w1"], r["w2"], r["c12"], r["c1"], r["c2"], r["pmi"]) for r in rows]
    want_pmi = round(math.log(5 * 19 / (10 * 5)), 6)
    assert got == [
        ("u", "w", 5, 10, 5, want_pmi),
        ("z", "v", 5, 5, 10, want_pmi),
    ]


def test_x32_exact_independence_is_not_a_collocation(spark, tmp_path):
    """A corpus whose every bigram sits at EXACT independence
    (c12*T == c1*c2) yields zero collocations — the gate is strict,
    and being frequent (or even perfectly predictable: one repeated
    bigram has PMI exactly 0) does not qualify."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from garmin_performance_analysis_spark.harness.catalog import CATALOG

    texts = ["a b"] * 5 + ["a c"] * 5 + ["d b"] * 5 + ["d c"] * 5
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([3] * len(texts), pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    assert CATALOG["x32_pmi_collocations"].fn(spark, str(tmp_path)).count() == 0


def test_o14_map_matches_bruteforce(spark, sf_dir):
    """Against the real sf table: recompute the full o14 semantics in
    numpy (prefix-cosine shortlist of 50, exact re-rank page of 10,
    exact top-5 gold, AP from 6dp-rounded hit_idx/rk terms) and
    demand equality per query and for the macro MAP."""
    import numpy as np

    from garmin_performance_analysis_spark.harness.catalog import CATALOG
    from garmin_performance_analysis_spark.sources.tables import load_table

    rows = {
        r["query_id"]: r
        for r in CATALOG["o14_map_precision_recall"].fn(spark, sf_dir).collect()
    }
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=float)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def cos(a, b):
        return float(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))

    aps = []
    for qid in range(10):
        q = emb[qid]
        cand = [v for v in emb if v != qid]
        full = {v: cos(emb[v], q) for v in cand}
        pref = {v: cos(emb[v][:16], q[:16]) for v in cand}
        short = sorted(cand, key=lambda v: (-pref[v], v))[:50]
        page = sorted(short, key=lambda v: (-full[v], v))[:10]
        gold = set(sorted(cand, key=lambda v: (-full[v], v))[:5])
        hit_terms, n_hits = [], 0
        for rk, v in enumerate(page, start=1):
            if v in gold:
                n_hits += 1
                hit_terms.append(round(n_hits / rk, 6))
        ap = round(sum(hit_terms) / 5.0, 6)
        aps.append(ap)
        r = rows[qid]
        assert r["n_hits_at_10"] == n_hits
        assert r["precision_at_10"] == round(n_hits / 10.0, 6)
        assert r["recall_at_10"] == round(n_hits / 5.0, 6)
        assert abs(r["ap_at_10"] - ap) < 2e-6
    want_map = round(sum(aps) / 10.0, 6)
    assert abs(rows[0]["map_at_10"] - want_map) < 2e-6


def test_x33_kappa_matches_sklearn_formula(spark, sf_dir):
    """kappa equals the textbook (po - pe)/(1 - pe) recomputed in
    Python from the same confusion counts, and a degenerate all-one-
    class corpus yields NULL kappa (pe = 1)."""
    from garmin_performance_analysis_spark.harness.catalog import CATALOG
    from garmin_performance_analysis_spark.pipelines import text
    from garmin_performance_analysis_spark.sources.tables import load_table

    r = CATALOG["x33_judge_agreement_kappa"].fn(spark, sf_dir).collect()[0]
    docs = load_table(spark, sf_dir, "documents")
    pairs = (
        text.language_id(docs, "doc_id", "text")
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select("lang", "predicted_lang")
        .collect()
    )
    n = len(pairs)
    agree = sum(1 for p in pairs if p["lang"] == p["predicted_lang"])
    classes = {p["lang"] for p in pairs} | {p["predicted_lang"] for p in pairs}
    s_marg = sum(
        sum(1 for p in pairs if p["lang"] == c)
        * sum(1 for p in pairs if p["predicted_lang"] == c)
        for c in classes
    )
    assert r["n_docs"] == n
    assert r["agree"] == agree
    assert r["n_classes"] == len(classes)
    po, pe = agree / n, s_marg / (n * n)
    assert abs(r["observed_agreement"] - round(po, 6)) < 1e-9
    assert abs(r["expected_agreement"] - round(pe, 6)) < 1e-9
    assert abs(r["kappa"] - (agree * n - s_marg) / (n * n - s_marg)) < 2e-6


def test_x33_degenerate_single_class_kappa_null(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from garmin_performance_analysis_spark.harness.catalog import CATALOG

    # every doc is the same english marker text and labeled 'en':
    # judge and gold both put all mass on one class -> pe = 1 -> NULL
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["the and is", "the and is"]),
            "lang": pa.array(["en", "en"]),
            "source": pa.array(["s", "s"]),
            "n_chars": pa.array([10, 10], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    r = CATALOG["x33_judge_agreement_kappa"].fn(spark, str(tmp_path)).collect()[0]
    assert r["observed_agreement"] == 1.0
    assert r["expected_agreement"] == 1.0
    assert r["kappa"] is None


def test_v13_centroid_cosines_match_numpy(spark, sf_dir):
    """Centroid cosines equal the dense numpy recomputation (per-label
    mean vector, pairwise cosine), all 45 ordered pairs present."""
    import numpy as np

    from garmin_performance_analysis_spark.harness.catalog import CATALOG
    from garmin_performance_analysis_spark.sources.tables import load_table

    rows = CATALOG["v13_centroid_drift_matrix"].fn(spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings").collect()
    by_label = {}
    for r in emb:
        by_label.setdefault(r["label"], []).append(
            np.array(r["embedding"], dtype=float)
        )
    cents = {l: np.mean(v, axis=0) for l, v in by_label.items()}
    labels = sorted(cents)
    assert len(rows) == len(labels) * (len(labels) - 1) // 2
    for r in rows:
        a, b = cents[r["label_a"]], cents[r["label_b"]]
        want = float(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
        assert r["label_a"] < r["label_b"]
        assert r["n_a"] == len(by_label[r["label_a"]])
        assert r["n_b"] == len(by_label[r["label_b"]])
        assert abs(r["centroid_cosine"] - want) < 1e-5


def test_c25_budget_curve_known_values(spark, tmp_path):
    """Hand-checkable corpus: docs of 3, 300 and 600 tokens at
    C=256 -> over-docs 2, trunc = 44 + 344, pads = 253 + 212 + 168;
    invariants: pad decreases utilization monotonically with C and
    trunc losses shrink as C grows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from garmin_performance_analysis_spark.harness.catalog import CATALOG

    texts = ["w " * 3, "w " * 300, "w " * 600]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(3), pa.int64()),
            "text": pa.array([t.strip() for t in texts]),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s"] * 3),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    rows = {
        r["context_len"]: r
        for r in CATALOG["c25_context_budget_curve"].fn(spark, str(tmp_path)).collect()
    }
    assert set(rows) == {256, 512, 1024, 2048}
    r = rows[256]
    assert r["n_docs"] == 3 and r["total_tokens"] == 903
    assert r["n_docs_over"] == 2
    assert r["trunc_lost_tokens"] == (300 - 256) + (600 - 256)
    assert r["pad_tokens"] == (256 - 3) + (512 - 300) + (768 - 600)
    r2 = rows[2048]
    assert r2["n_docs_over"] == 0 and r2["trunc_lost_tokens"] == 0
    assert r2["pad_tokens"] == (2048 - 3) + (2048 - 300) + (2048 - 600)
    assert rows[512]["trunc_lost_tokens"] <= r["trunc_lost_tokens"]


def test_x34_gopher_rules_known_verdicts(spark, tmp_path):
    """Hand-built docs exercise each rule edge: a 50-word prose doc
    passes all five; 49 words fails only word-count; a symbol-heavy
    doc fails the symbol rule; a digits-only doc fails alpha +
    stopwords; one-char words fail mean-word-length."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from garmin_performance_analysis_spark.harness.catalog import CATALOG

    prose = ("the cat and the dog sat with a friend " * 6).split()
    texts = [
        " ".join(prose[:50]),                      # 0: all pass
        " ".join(prose[:49]),                      # 1: word count fails
        " ".join(["the", "and"] + ["ok#"] * 48),   # 2: symbol ratio fails (50 syms/50 words)
        " ".join(["123"] * 50),                    # 3: alpha + stopwords fail
        " ".join(["a"] * 48 + ["the", "and"]),     # 4: mean word len < 3 fails
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in CATALOG["x34_gopher_quality_rules"].fn(spark, str(tmp_path)).collect()
    }
    assert rows[0]["keep"] == 1 and rows[0]["n_rules_failed"] == 0
    assert rows[1]["ok_word_count"] == 0 and rows[1]["n_rules_failed"] == 1
    assert rows[2]["ok_symbol_ratio"] == 0
    assert rows[3]["ok_alpha_words"] == 0 and rows[3]["ok_stopwords"] == 0
    assert rows[3]["keep"] == 0
    assert rows[4]["ok_mean_word_len"] == 0
