"""Distributed byte-pair-encoding (BPE) vocabulary training and
application — the tokenizer-construction step of a pre-training data
pipeline (Sennrich et al. 2016, arXiv:1508.07909).

Scale shape (the part that matters at 100 TB):

- ONE corpus scan builds the word-frequency table (``groupBy(word)``
  with map-side combine), truncated to the top-V heavy hitters
  (TakeOrderedAndProject) — exactly how production BPE trainers bound
  the problem, since merge statistics are dominated by frequent words.
- Every merge iteration then runs on the COMPACT vocab table only
  (V rows, independent of corpus size): explode adjacent symbol
  pairs weighted by word frequency → one small groupBy → argmax
  (orderBy+limit(1), a bounded single-row collect) → apply the merge
  with a JVM-side ``aggregate`` fold over each word's symbol array.
  The corpus is never rescanned.
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


def _merge_fold(lhs: str, rhs: str) -> str:
    """SQL fold applying ONE merge greedily left-to-right over a symbol
    array: when the accumulator's last symbol is ``lhs`` and the next
    symbol is ``rhs``, replace the last with the merged symbol —
    otherwise append.  Mirrors the reference BPE semantics, including
    the 'aaa' case (leftmost pair merges; the merged symbol does not
    re-pair with the remaining 'a' in the same pass).  Symbols are
    validated against [a-z0-9]+ before embedding."""
    m = _validate_symbol(lhs) + _validate_symbol(rhs)
    return f"""
    aggregate(
      symbols,
      cast(array() as array<string>),
      (acc, x) -> CASE
        WHEN size(acc) > 0 AND element_at(acc, -1) = '{lhs}' AND x = '{rhs}'
          THEN concat(slice(acc, 1, size(acc) - 1), array('{m}'))
        ELSE concat(acc, array(x))
      END
    )
    """


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

    Driver-side loop: one bounded single-row collect per iteration
    (the argmax), the vocab state carried as a cached V-row DataFrame —
    the same structure as the deterministic Lloyd iterations in
    ``similarity.kmeans_assign``.  Stops early when no adjacent pair
    remains (fully merged vocab)."""
    spark = docs.sparkSession
    vocab = (
        word_freqs(docs, text_col, top_v)
        .withColumn("symbols", F.split(F.col("word"), ""))
        .select("word", "freq", "symbols")
        .localCheckpoint(eager=True)
    )
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = (
            vocab.select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(slice(symbols, 1, size(symbols) - 1),"
                        " (s, i) -> struct(s AS lhs, element_at(symbols, i + 2) AS rhs))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
            .agg(F.sum("freq").alias("pair_weight"))
        )
        top = pairs.orderBy(
            F.col("pair_weight").desc(), F.col("lhs").asc(), F.col("rhs").asc()
        ).limit(1).collect()
        if not top:
            break
        lhs, rhs, w = top[0]["lhs"], top[0]["rhs"], top[0]["pair_weight"]
        merges.append((rank, lhs, rhs, lhs + rhs, int(w)))
        vocab = vocab.withColumn(
            "symbols", F.expr(_merge_fold(lhs, rhs))
        ).localCheckpoint(eager=True)
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
