"""Byte-pair-encoding: distributed merge learning + tokenization.

The mandate's "token counting (whitespace + a BPE-ish regex)" extension,
taken to its real form: LEARN the merge table from the corpus (Sennrich
et al. 2016, ACL — the algorithm behind GPT/Llama tokenizers) and apply
it, both as Spark plans.

Learning is inherently iterative (each merge changes the pair
statistics the next merge ranks), so like connected components
(dedup.py) it runs a bounded driver loop; per iteration the heavy work
is distributed:

- pair counting: one hash aggregate over the word-frequency table's
  adjacent symbol pairs, weighted by word frequency — corpus size only
  matters once (the initial word-frequency aggregate); every iteration
  scans the DISTINCT-word table (Heaps-law bounded, the vocab_build
  argument in text.py);
- argmax: a 1-row driver action with a total tie-break
  (count DESC, left ASC, right ASC) so the learned table is
  deterministic across partitionings and engines;
- merge application: a pure codegen array fold (F.aggregate) — greedy
  left-to-right single-pass replacement, the standard BPE semantics;
- per-round localCheckpoint truncates the k-fold lineage (the CC rule).

Tokenization (`apply_bpe`) is a single lazy plan: per document, per
word, the char sequence folds through the learned merges in order —
no shuffle at all, no UDF; everything is JVM-side higher-order
expressions.

Verification: rows-only probe (no SQL engine can replay the loop) +
exact-equality pytest against a from-scratch Python reference
implementation on the same corpus (tests/test_llmdata.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: End-of-word marker (Sennrich et al.): keeps word-final merges
#: distinct from word-internal ones and makes detokenization possible.
EOW = "</w>"


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """Distinct-word frequency table — the ONLY corpus-sized aggregate
    in BPE learning; every later iteration works on this table."""
    from .text import tokens_of
    return (df.select(F.explode(tokens_of(F.col(text_col)))
                      .alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("freq")))


def _initial_symbols(word: Column) -> Column:
    return F.concat(F.split(word, ""), F.array(F.lit(EOW)))


def _adjacent_pairs(sym: Column) -> Column:
    """Adjacent (left, right) symbol pairs of one symbol array.

    Guarded: Spark's sequence(1, 0) counts DOWN ([1, 0]), so a
    single-symbol word must short-circuit to an empty pair list.
    """
    idx = F.sequence(F.lit(1), F.size(sym) - 1)
    pairs = F.transform(
        idx, lambda i: F.struct(F.element_at(sym, i).alias("a"),
                                F.element_at(sym, i + 1).alias("b")))
    return F.when(F.size(sym) >= 2, pairs) \
            .otherwise(F.array().cast("array<struct<a:string,b:string>>"))


def _merge_once(sym: Column, left: str, right: str) -> Column:
    """Greedy left-to-right single-pass merge of (left, right) ->
    left||right — a pure codegen left fold, no UDF.

    The freshly merged symbol is not re-examined as a `left` for the
    next element (standard non-overlapping replacement: 'aaa' under
    (a,a) becomes ['aa','a'])."""
    a, b = F.lit(left), F.lit(right)
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == a) & (x == b),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.concat(a, b)))
        ).otherwise(F.concat(acc, F.array(x))))


def learn_bpe_merges(df: DataFrame, text_col: str, num_merges: int,
                     min_pair_count: int = 2) -> list[tuple[str, str, int]]:
    """Learn up to ``num_merges`` BPE merges from the corpus.

    Returns [(left, right, pair_count), ...] in learned order —
    deterministic: pair counts are exact longs and the argmax
    tie-break (count DESC, left ASC, right ASC) is total. Stops early
    when the best remaining pair occurs fewer than ``min_pair_count``
    times (merging noise would overfit the tail).
    """
    words = (word_frequencies(df, text_col)
             .select(_initial_symbols(F.col("word")).alias("sym"),
                     "freq")
             .localCheckpoint(eager=True))
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        best = (words
                .select(F.explode(_adjacent_pairs(F.col("sym")))
                        .alias("p"), "freq")
                .groupBy("p.a", "p.b")
                .agg(F.sum("freq").alias("n"))
                .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
                .limit(1).collect())
        if not best or best[0]["n"] < min_pair_count:
            break
        a, b, n = best[0]["a"], best[0]["b"], int(best[0]["n"])
        merges.append((a, b, n))
        # localCheckpoint per round: keeps the plan one fold deep
        # instead of k folds deep (the connected-components rule)
        words = (words.select(_merge_once(F.col("sym"), a, b)
                              .alias("sym"), "freq")
                 .localCheckpoint(eager=True))
    return merges


def apply_bpe(df: DataFrame, text_col: str,
              merges: list[tuple[str, str, int]] | list[tuple[str, str]],
              out_col: str = "bpe_tokens") -> DataFrame:
    """Tokenize ``text_col`` with a learned merge table — ONE lazy,
    shuffle-free, UDF-free plan.

    Per document: whitespace words -> per-word char+EOW symbols ->
    the merges fold in learned order (nested codegen folds; merge
    table size is a constant, so plan depth is bounded) -> flattened
    token stream."""
    from .text import tokens_of

    def encode_word(w: Column) -> Column:
        sym = _initial_symbols(w)
        for m in merges:
            sym = _merge_once(sym, m[0], m[1])
        return sym

    words = F.filter(tokens_of(F.col(text_col)), lambda w: w != "")
    toks = F.flatten(F.transform(words, encode_word))
    return df.withColumn(out_col, toks)
