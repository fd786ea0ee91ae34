"""BPE trainer + application contracts.

The trainer (x12) is iterative with a data-dependent argmax, so no
single SQL statement expresses it — its correctness contract is an
EXACT match against the transparent Python mirror below, plus
partitioning invariance.  The application paths (pandas-UDF
``bpe_apply`` and JVM-expression ``bpe_tokens_expr``, the x13 oracle
subject) must agree with each other and with the mirror on random
corpora, including the overlap cases the encoding trick exists for
('aaaa' + merge(a,a)) and the boundary cases ('|a||ab|' must NOT
match merge(a,a))."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from garmin_performance_analysis_spark.pipelines import bpe

_WORD_RE = "[a-z]+|[0-9]+"


def _mirror_train(texts, n_merges, top_v=10_000):
    from collections import Counter

    wf = Counter(w for t in texts for w in re.findall(_WORD_RE, t.lower()))
    keep = sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))[:top_v]
    wf = dict(keep)
    vocab = {w: list(w) for w in wf}
    merges = []
    for rank in range(1, n_merges + 1):
        pc = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wf[w]
        if not pc:
            break
        (lhs, rhs), wt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, lhs, rhs, lhs + rhs, wt))
        for w, syms in vocab.items():
            vocab[w] = _mirror_merge(syms, lhs, rhs)
    return merges


def _mirror_merge(syms, lhs, rhs):
    out = []
    for x in syms:
        if out and out[-1] == lhs and x == rhs:
            out[-1] = lhs + rhs
        else:
            out.append(x)
    return out


def _mirror_tokens(text, merges):
    n = 0
    for w in re.findall(_WORD_RE, text.lower()):
        syms = list(w)
        for lhs, rhs in merges:
            syms = _mirror_merge(syms, lhs, rhs)
        n += len(syms)
    return n


def _synth_corpus():
    """Deterministic corpus with repeated stems, digit runs, and the
    even-run overlap case."""
    texts = []
    for k in range(40):
        words = [
            f"the{'me' * (k % 3)}",
            "running" if k % 2 else "runner",
            "a" * (k % 5 + 1),          # a, aa, ..., aaaaa
            str(k * 37),
            "training" if k % 4 else "train",
        ]
        texts.append(" ".join(words))
    return texts


def test_bpe_train_matches_mirror_and_partitioning(spark):
    texts = _synth_corpus()
    want = _mirror_train(texts, n_merges=12)
    rows = list(enumerate(texts))
    for parts in (1, 7):
        df = spark.createDataFrame(
            rows, "doc_id long, text string"
        ).repartition(parts)
        got = [
            (r["rank"], r["lhs"], r["rhs"], r["merged"], r["pair_weight"])
            for r in bpe.bpe_train(df, "text", n_merges=12, top_v=10_000)
            .orderBy("rank")
            .collect()
        ]
        assert got == want, f"trainer diverged from mirror at {parts} partitions"


def test_bpe_apply_paths_agree_with_mirror(spark):
    texts = _synth_corpus() + ["", "!!! ???", "aaaa aab ab"]
    merges = [(m[1], m[2]) for m in _mirror_train(texts, n_merges=12)]
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = {i: _mirror_tokens(t, merges) for i, t in rows}

    via_expr = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", bpe.bpe_tokens_expr("text", merges).alias("n")
        ).collect()
    }
    assert via_expr == want

    via_udf = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe.bpe_apply(df, merges).collect()
    }
    assert via_udf == want


def test_bpe_train_truncation_is_deterministic(spark):
    """top_v truncation must tie-break on the word, not hash order."""
    texts = ["b a", "a b", "c c"]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    freqs = [
        (r["word"], r["freq"])
        for r in bpe.word_freqs(df, "text", top_v=2).collect()
    ]
    assert freqs == [("a", 2), ("b", 2)]


def test_x13_entry_matches_udf_path(spark, sf_dir):
    """The oracle-checked x13 projection and the pandas-UDF tokenizer
    must report identical budgets on the real corpus."""
    from garmin_performance_analysis_spark.harness.catalog import CATALOG
    from garmin_performance_analysis_spark.sources.tables import load_table

    entry = CATALOG["x13_bpe_token_counts"].fn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    udf = bpe.bpe_apply(docs, bpe.EN_MERGES)
    diff = (
        entry.alias("e")
        .join(udf.alias("u"), "doc_id")
        .filter(F.col("e.bpe_tokens") != F.col("u.bpe_tokens"))
        .count()
    )
    assert diff == 0


def test_merge_symbols_outside_alphabet_are_rejected():
    """Merge symbols are embedded in generated SQL: anything outside
    [a-z0-9]+ must raise instead of silently producing a broken (or
    injectable) expression."""
    import pytest

    # bpe_tokens_expr is the only remaining path that embeds merge
    # symbols in generated SQL (the trainer's merge loop runs
    # driver-side on the bounded vocab and never builds expressions).
    for bad in [("a'", "b"), ("a", "b\\"), ("", "b"), ("A", "b"), ("a b", "c")]:
        with pytest.raises(ValueError):
            bpe.bpe_tokens_expr("text", [bad])
