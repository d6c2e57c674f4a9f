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
    the merges fold in learned order (nested codegen folds) ->
    flattened token stream.

    CEILING: plan depth is O(len(merges)) — one nested fold per
    learned merge. Practical limit is a few hundred merges (beyond
    ~200 the expression tree exceeds codegen/analysis budgets; a
    production 30k-merge vocabulary will NOT plan). This form is the
    oracle-shaped baseline; use :func:`apply_bpe_fast` (identical
    semantics, exact-equality-pinned in tests/test_llmdata.py) for
    real merge tables."""
    from .text import tokens_of

    def encode_word(w: Column) -> Column:
        sym = _initial_symbols(w)
        for m in merges:
            sym = _merge_once(sym, m[0], m[1])
        return sym

    words = F.filter(tokens_of(F.col(text_col)), lambda w: w != "")
    toks = F.flatten(F.transform(words, encode_word))
    return df.withColumn(out_col, toks)


def apply_bpe_fast(df: DataFrame, text_col: str,
                   merges: list[tuple[str, str, int]] | list[tuple[str, str]],
                   out_col: str = "bpe_tokens") -> DataFrame:
    """Scale-path BPE tokenizer: Arrow-batched ``mapInPandas`` greedy
    encoder with IDENTICAL semantics to :func:`apply_bpe`'s fold form
    (exact-equality-pinned in tests/test_llmdata.py).

    Why a Python path at all (the repo's UDFs-are-the-slow-path rule):
    the fold form nests one codegen fold per merge, so a production
    30k-merge vocabulary cannot plan (see apply_bpe's CEILING note).
    Here the merge table is a plain dict in the closure — plan depth
    is O(1) regardless of vocabulary size, and the per-row work is
    the same O(len(merges) x word_len) greedy scan the fold does,
    minus planning cost.

    Scale design:
    - no shuffle: mapInPandas is a narrow transform; partitioning and
      ordering pass through untouched;
    - the merge table ships once per task via the serialized closure
      (a 30k-entry list is ~1 MB — broadcast-sized by construction,
      Heaps-law-bounded like the vocab it came from);
    - per-partition WORD memoization: encoding is computed once per
      distinct word seen by the task (Heaps' law makes the distinct-
      word set sublinear in corpus size — the vocab_build argument),
      then reused across rows and batches, so the effective cost per
      additional occurrence is a dict hit;
    - per-merge skip: a merge (a, b) whose left symbol is absent from
      the word's current symbol set skips without scanning — on
      natural text the overwhelming majority of the 30k merges skip
      for any given word.

    Tokenization mirrors tokens_of (split lowercased text on ASCII
    whitespace runs); the equality pytest pins the two paths on the
    real corpus, so any divergence in the split/lower semantics
    fails loudly rather than drifting.
    """
    import re

    from pyspark.sql.types import (ArrayType, StringType, StructField,
                                   StructType)

    mtab = [(m[0], m[1]) for m in merges]
    in_cols = list(df.columns)
    # fresh StructType: StructType.add MUTATES the DataFrame's cached
    # schema object in place
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(out_col, ArrayType(StringType()))])
    ws = re.compile(r"\s+", re.ASCII)  # Java \s is ASCII-only

    def encode(iterator):
        cache: dict[str, list[str]] = {}

        def encode_word(w: str) -> list[str]:
            hit = cache.get(w)
            if hit is not None:
                return hit
            syms = list(w)
            syms.append(EOW)
            present = set(syms)
            for a, b in mtab:
                if a not in present or b not in present:
                    continue
                # greedy left-to-right single pass, non-overlapping:
                # the merged symbol is not re-examined as `a` (the
                # _merge_once fold contract: 'aaa' under (a,a) ->
                # ['aa','a'])
                out: list[str] = []
                for x in syms:
                    if out and out[-1] == a and x == b:
                        out[-1] = a + b
                    else:
                        out.append(x)
                if len(out) != len(syms):
                    syms = out
                    present = set(syms)
            cache[w] = syms
            return syms

        for pdf in iterator:
            toks = []
            for text in pdf[text_col]:
                if text is None:
                    # mirror the fold form: NULL text -> NULL tokens
                    toks.append(None)
                    continue
                row_toks: list[str] = []
                for w in ws.split(str(text).lower()):
                    if w:
                        row_toks.extend(encode_word(w))
                toks.append(row_toks)
            pdf = pdf.copy()
            pdf[out_col] = toks
            yield pdf

    return df.select(*in_cols).mapInPandas(encode, schema=out_schema)
