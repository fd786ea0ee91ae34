"""Distributed byte-pair-encoding (BPE) vocabulary training and
application — the tokenizer-construction step of a pre-training data
pipeline (Sennrich et al. 2016, arXiv:1508.07909).

Scale shape (the part that matters at 100 TB):

- ONE corpus scan builds the word-frequency table (``groupBy(word)``
  with map-side combine), truncated to the top-V heavy hitters
  (TakeOrderedAndProject) — exactly how production BPE trainers bound
  the problem, since merge statistics are dominated by frequent words.
- The merge loop then runs DRIVER-SIDE over the collected vocab table
  (≤ V rows by construction, independent of corpus size): adjacent
  symbol pairs weighted by word frequency → argmax → greedy
  left-to-right merge application, all exact integer/string
  operations.  The corpus is never rescanned, and no per-iteration
  Spark jobs are launched.
- Applying a trained merge list to documents is an Arrow-batched
  pandas UDF (the merge loop is genuinely imperative per word; a
  chain of n_merges fold expressions would explode the plan), with
  the merge list shipped in the closure — broadcast-sized by
  construction (n_merges entries).

Determinism: word symbols come from the ``[a-z]+|[0-9]+`` tokenizer
(x4's regex), so the symbol alphabet is closed under [a-z0-9] and
merges embed safely in SQL expressions; argmax ties break on
(pair_count DESC, lhs ASC, rhs ASC); the greedy left-to-right fold is
the standard BPE merge-application order.  The trainer is therefore
reproducible bit-for-bit across runs and engines — pinned by a
property test against a transparent Python mirror
(``tests/test_bpe.py``); since round 9 the catalog entry ALSO
carries a full hash oracle — the fixed 20 argmax rounds unroll as
materialized CTEs (``harness/q_retrieval._x12_oracle``), the same
convention as the g1 power iterations and g5 peels.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WORD_RE = "[a-z]+|[0-9]+"


def word_freqs(
    docs: DataFrame, text_col: str, top_v: int = 2000
) -> DataFrame:
    """``(word, freq)`` for the ``top_v`` most frequent regex tokens —
    the bounded training set for merge learning.  Ties break on the
    word itself so truncation is deterministic."""
    words = docs.select(
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{_WORD_RE}', 0)")
        ).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(top_v)
    )


_SYMBOL_RE = re.compile(r"^[a-z0-9]+$")


def _validate_symbol(sym: str) -> str:
    """Merge symbols are interpolated into generated SQL expressions;
    anything outside [a-z0-9]+ (the trainer's whole alphabet) would be
    an expression-injection hazard, so reject it loudly."""
    if not _SYMBOL_RE.match(sym):
        raise ValueError(
            f"BPE merge symbol {sym!r} is not [a-z0-9]+; refusing to embed"
            " it in a SQL expression"
        )
    return sym


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    *,
    n_merges: int = 20,
    top_v: int = 2000,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus.  Returns a
    DataFrame ``(rank, lhs, rhs, merged, pair_weight)`` ordered by
    learning rank (1-based); ``pair_weight`` is the frequency-weighted
    adjacent-pair count that won the iteration.

    ONE data-sized job (the ``word_freqs`` corpus scan) feeds a single
    bounded collect — the training set is capped at ``top_v`` rows BY
    CONSTRUCTION, independent of corpus size — and the merge loop runs
    driver-side over that in-memory table, exactly how production BPE
    trainers iterate after the distributed count.  Numerics are
    trivially identical to the previous per-iteration Spark jobs:
    pair weights are integer sums, the argmax tie-break is
    (pair_weight DESC, lhs ASC, rhs ASC) over [a-z0-9]+ symbols (byte
    order == codepoint order), and the greedy left-to-right fold is
    byte-for-byte the ``_merge_fold`` semantics.  The previous shape —
    20 × (pair-explode groupBy + argmax collect + localCheckpoint) as
    ~40 tiny Spark jobs over the 2000-row vocab — paid per-job
    choreography the result never depended on (guide §1.2: remove
    passes; the o15 playbook).  Stops early when no adjacent pair
    remains (fully merged vocab)."""
    spark = docs.sparkSession
    rows = (
        word_freqs(docs, text_col, top_v)
        .select("word", "freq")
        .collect()  # bounded: ≤ top_v rows by construction
    )
    wf = {r["word"]: int(r["freq"]) for r in rows}
    vocab = {w: list(w) for w in wf}
    merges = []
    for rank in range(1, n_merges + 1):
        pair_weight: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            f = wf[w]
            for a, b in zip(syms, syms[1:]):
                pair_weight[(a, b)] = pair_weight.get((a, b), 0) + f
        if not pair_weight:
            break
        (lhs, rhs), wt = min(
            pair_weight.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, lhs, rhs, lhs + rhs, int(wt)))
        for w, syms in vocab.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == lhs and x == rhs:
                    out[-1] = lhs + rhs
                else:
                    out.append(x)
            vocab[w] = out
    return spark.createDataFrame(
        merges, "rank int, lhs string, rhs string, merged string, pair_weight long"
    )


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize documents with a trained merge list: per doc the real
    BPE token count next to the char and regex-token counts — the
    budget numbers a packing/curation stage actually wants.  The merge
    loop runs as an Arrow-batched pandas UDF (imperative per word; see
    module docstring), with a per-batch word memo so each distinct
    word is segmented once per batch."""
    merge_list = list(merges)

    @F.pandas_udf("long")
    def bpe_tokens(texts: pd.Series) -> pd.Series:
        import re

        memo: dict[str, int] = {}

        def seg_len(word: str) -> int:
            got = memo.get(word)
            if got is None:
                syms = list(word)
                for lhs, rhs in merge_list:
                    out, i = [], 0
                    while i < len(syms):
                        if out and out[-1] == lhs and syms[i] == rhs:
                            out[-1] = lhs + rhs
                        else:
                            out.append(syms[i])
                        i += 1
                    syms = out
                got = memo[word] = len(syms)
            return got

        return texts.map(
            lambda t: sum(seg_len(w) for w in re.findall(_WORD_RE, t.lower()))
        )

    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"size(regexp_extract_all(lower({text_col}), '{_WORD_RE}', 0))")
        .cast("long")
        .alias("regex_tokens"),
        bpe_tokens(F.col(text_col)).alias("bpe_tokens"),
    )


def bpe_tokens_expr(text_col: str, merges: list[tuple[str, str]]):
    """Per-document BPE token count for a FIXED merge list as a pure
    JVM-side column expression — zero UDF, zero shuffle, one in-row
    pass; the form that belongs in a 100 TB curation projection when
    the tokenizer is already trained.

    Encoding trick: each word's symbols are wrapped as ``|sym|`` and
    concatenated (symbol boundaries are ``||``; the alphabet is
    [a-z0-9], so ``|`` never occurs inside a symbol).  Applying one
    merge is then ONE ``replace('|lhs||rhs|' -> '|merged|')``: the
    double delimiter makes both symbol boundaries explicit, so a
    left-to-right non-rescanning ``replace`` is exactly the greedy
    fold — including even runs ('aaaa' + merge(a,a) -> two merges,
    because the trailing ``|`` of one match is not the leading ``|``
    of the next) — and a merged symbol never re-merges in the same
    pass (``merged == lhs`` would need an empty rhs).  Token count =
    boundary count + 1, via the length delta of collapsing ``||``.

    Equivalence to the imperative ``bpe_apply`` is pinned by
    ``tests/test_bpe.py`` on random corpora.
    """
    enc = f"transform(regexp_extract_all(lower({text_col}), '{_WORD_RE}', 0)," \
          " w -> concat('|', array_join(split(w, ''), '||'), '|'))"
    word = "w"
    for lhs, rhs in merges:
        _validate_symbol(lhs), _validate_symbol(rhs)
        word = f"replace({word}, '|{lhs}||{rhs}|', '|{lhs}{rhs}|')"
    per_word = (
        f"transform({enc}, w -> CAST(length({word})"
        f" - length(replace({word}, '||', '|')) + 1 AS BIGINT))"
    )
    return F.expr(f"aggregate({per_word}, 0L, (a, x) -> a + x)")


# A fixed starter merge list (common English digraphs in learning-rank
# order) for the oracle-checked application path: x13 budgets tokens
# with a CONSTANT tokenizer, the same way a pipeline ships a frozen
# tokenizer artifact while the trainer (x12) learns the next one.
EN_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
    ("r", "e"), ("o", "n"), ("a", "t"), ("e", "n"), ("o", "r"),
]
