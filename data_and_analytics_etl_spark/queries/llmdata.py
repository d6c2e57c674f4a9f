"""LLM-data-pipeline probes: dedup, similarity, text analysis, multimodal.

The mandated extension tier (SURVEY §2.2 "LLM-data-pipeline operators")
over the `documents` and `embeddings` corpus tables. Deterministic
operators carry an exact DuckDB oracle; sketch/LSH operators (MinHash,
SimHash, sign-LSH, BucketedRandomProjectionLSH) are rows-only here and
recall/property-tested in tests/test_llmdata.py against their exact
counterparts.

Scale notes are on the operators themselves (operators/dedup.py,
operators/similarity.py, operators/text.py, operators/multimodal.py):
candidate generation is always a bucket/block equi-join, exact all-pairs
forms exist only as small-scale verification baselines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators.dedup import (exact_dedup, jaccard_pairs, keyed_dedup,
                               minhash_lsh_pairs, simhash64,
                               with_word_shingles)
from ..operators.multimodal import assets_from_documents, extract_features
from ..operators.similarity import (ann_brp_lsh, cosine_neardup_lsh,
                                    cosine_topk)
from ..operators.text import (LANG_MARKERS, fingerprint, lang_id,
                              quality_score, text_stats, token_count,
                              tokens_of)
from .registry import query

def _sql_list(words: tuple[str, ...]) -> str:
    """Render a marker vocabulary as a DuckDB list literal."""
    return "['" + "', '".join(words) + "']"


_STOP = _sql_list(LANG_MARKERS["en"])


@query(
    "dedup_exact",
    oracle="""
SELECT DISTINCT doc_id, text, lang, source, n_chars
FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents)
ORDER BY doc_id
""",
    tags=("llm", "dedup"),
    priority=100,
    doc="Exact full-row dedup: at-least-once re-ingest (the reference's "
        "crash-overlap window, CommCareAPIHandler.py:251-262) collapses "
        "back to one copy per row. Hash-agg, one shuffle.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return exact_dedup(d.unionByName(d)).orderBy("doc_id")


@query(
    "dedup_keyed_keep_first",
    oracle="""
WITH ranked AS (
  SELECT user_id, event_type, event_id, ts, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id, event_type, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS first_ts,
       round(value, 4) AS value
FROM ranked WHERE rn = 1
ORDER BY user_id, event_type
""",
    tags=("llm", "dedup"),
    priority=100,
    doc="Keyed keep-first dedup: deterministic winner per (user_id, "
        "event_type) via one row_number window — single shuffle on the "
        "key, the 100 TB-safe form of dropDuplicates(subset).",
)
def dedup_keyed_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = keyed_dedup(ev, ["user_id", "event_type"],
                      [F.col("ts"), F.col("event_id")])
    return (out.select(
        "user_id", "event_type", "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("first_ts"),
        F.round("value", 4).alias("value"))
        .orderBy("user_id", "event_type"))


@query(
    "neardup_ngram_jaccard",
    oracle=r"""
WITH s AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(string_split_regex(text, '\s+')) - 1, 1)),
           i -> concat_ws(' ',
                string_split_regex(text, '\s+')[i],
                string_split_regex(text, '\s+')[i+1],
                string_split_regex(text, '\s+')[i+2]))) AS sh
  FROM documents WHERE doc_id < 250
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
FROM s a, s b
WHERE a.doc_id < b.doc_id
  AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
ORDER BY id_a, id_b
""",
    tags=("llm", "dedup"),
    priority=100,
    doc="Exact 3-gram Jaccard near-dup pairs — the verification baseline "
        "for MinHash-LSH (operators/dedup.py:jaccard_pairs). All-pairs "
        "within a bounded subset by design; the scale path is "
        "dedup_minhash_lsh below, whose candidates come from bucket joins.",
)
def neardup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 250)
    sh = with_word_shingles(d, "text", n=3)
    return (jaccard_pairs(sh, "doc_id", "shingles", threshold=0.5)
            .orderBy("id_a", "id_b"))


@query(
    "neardup_setsim_prefix",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents
), s AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(w) - 1, 1)),
           i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS sh
  FROM toks
), t AS (
  SELECT doc_id, unnest(sh) AS tok FROM s
), p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), sz AS (
  SELECT doc_id, len(sh) AS n FROM s
)
SELECT p.id_a, p.id_b,
       round(CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter), 6) AS jaccard
FROM p JOIN sz sa ON p.id_a = sa.doc_id JOIN sz sb ON p.id_b = sb.doc_id
WHERE CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) >= 0.5
ORDER BY id_a, id_b
""",
    tags=("llm", "dedup"),
    priority=100,
    doc="EXACT Jaccard>=0.5 near-dup pairs over the FULL corpus via "
        "prefix filtering (operators/dedup.py:setsim_prefix_pairs — "
        "AllPairs/PPJoin family): candidates from an equi-join on "
        "rarest-first prefix tokens, zero recall loss, never n^2. The "
        "exact scale path between the bounded all-pairs baseline "
        "(neardup_ngram_jaccard) and the approximate MinHash-LSH path. "
        "Oracle recomputes all intersecting pairs by exploded-token "
        "equi-join — brute-force-exact, proving the prefix filter "
        "drops nothing.",
)
def neardup_setsim_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import setsim_prefix_pairs
    d = load_table(spark, sf_dir, "documents")
    sh = with_word_shingles(d, "text", n=3)
    return (setsim_prefix_pairs(sh, "doc_id", "shingles", threshold=0.5)
            .orderBy("id_a", "id_b"))


@query(
    "dedup_minhash_lsh",
    oracle=None,  # hash-family dependent; recall-tested vs exact jaccard
    tags=("llm", "dedup"),
    priority=150,
    doc="MinHash(16) + 8-band LSH near-dup pairs with exact-Jaccard "
        "verification; candidates from a (band, band_hash) self-equi-join "
        "— never n^2. Recall vs neardup_ngram_jaccard is property-tested "
        "in tests/test_llmdata.py.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sh = with_word_shingles(d, "text", n=3)
    return (minhash_lsh_pairs(sh, "doc_id", "shingles", threshold=0.5)
            .orderBy("id_a", "id_b"))


#: DuckDB re-computation of the md5 MinHash-LSH pipeline, templated so
#: the 16 signature expressions stay in lockstep with num_hashes=16.
#: Shingle expression matches neardup_ngram_jaccard's (same tokenizer).
_MD5_SIG_ENTRIES = ", ".join(
    f"list_min(list_transform(sh, x -> md5('{j}|' || x)))"
    for j in range(16))
_MINHASH_MD5_ORACLE = rf"""
WITH s AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(string_split_regex(text, '\s+')) - 1, 1)),
           i -> concat_ws(' ',
                string_split_regex(text, '\s+')[i],
                string_split_regex(text, '\s+')[i+1],
                string_split_regex(text, '\s+')[i+2]))) AS sh
  FROM documents WHERE doc_id < 250
), sig AS (
  SELECT doc_id, [{_MD5_SIG_ENTRIES}] AS sg FROM s
), bands AS (
  SELECT doc_id, i.b AS band,
         md5(sg[2*i.b + 1] || '|' || sg[2*i.b + 2]) AS bh
  FROM sig, (SELECT unnest(range(8)) AS b) i
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
  WHERE a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b,
       round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jaccard
FROM cand c
JOIN s sa ON sa.doc_id = c.id_a
JOIN s sb ON sb.doc_id = c.id_b
WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
      / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.5
ORDER BY id_a, id_b
"""


@query(
    "dedup_minhash_lsh_md5",
    oracle=_MINHASH_MD5_ORACLE,
    tags=("llm", "dedup"),
    doc="MinHash-LSH with the PORTABLE md5 hash family "
        "(operators/dedup.py:with_minhash_signature hash_family='md5'): "
        "the oracle recomputes the ENTIRE pipeline — 16 md5 min-hashes, "
        "8 banded bucket hashes, candidate self-join, exact-Jaccard "
        "verify — so a hash match proves signature, banding, candidate "
        "generation and verification all agree bit-for-bit across "
        "engines. The xxhash64 family (dedup_minhash_lsh) stays the "
        "throughput path; this one is the correctness anchor.",
)
def dedup_minhash_lsh_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 250)
    sh = with_word_shingles(d, "text", n=3)
    return (minhash_lsh_pairs(sh, "doc_id", "shingles", threshold=0.5,
                              hash_family="md5")
            .orderBy("id_a", "id_b"))


@query(
    "dedup_simhash",
    oracle=None,  # xxhash64 family not available in DuckDB
    tags=("llm", "dedup"),
    priority=150,
    doc="64-bit SimHash fingerprints (token-vote, Charikar '02) — "
        "near-dup docs land within small Hamming distance; JVM-side "
        "bit-fold, no Python. Property-tested in tests/test_llmdata.py.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return (d.select("doc_id",
                     simhash64(tokens_of(F.col("text"))).alias("simhash"))
            .orderBy("doc_id"))


def _simhash_vote_sql(i: int) -> str:
    return (f"list_sum(list_transform(ds, d -> CASE WHEN "
            f"ascii(substr(d, {i + 1}, 1)) % 2 = 1 THEN 1 ELSE -1 END))")


_SIMHASH_MD5_ORACLE = r"""
WITH t AS (
  SELECT doc_id,
         list_transform(string_split_regex(text, '\s+'), x -> md5(x)) AS ds
  FROM documents WHERE doc_id < 250
)
SELECT doc_id,
       CAST(""" + "\n            + ".join(
    f"CASE WHEN {_simhash_vote_sql(i)} > 0 THEN {1 << i} ELSE 0 END"
    for i in range(16)) + r""" AS BIGINT) AS fingerprint
FROM t
ORDER BY doc_id
"""


@query(
    "dedup_simhash_md5",
    oracle=_SIMHASH_MD5_ORACLE,
    tags=("llm", "dedup"),
    doc="Portable 16-bit SimHash (operators/dedup.py:simhash_portable): "
        "bit i votes on the parity of hex digit i of md5(token), so the "
        "oracle recomputes the identical fingerprint — vote fold, "
        "threshold, and bit packing all proven bit-for-bit across "
        "engines. simhash64 (xxhash64) remains the precision/throughput "
        "path; this is its correctness anchor.",
)
def dedup_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import simhash_portable
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 250)
    return (d.select(
        "doc_id",
        simhash_portable(F.split(F.col("text"), r"\s+"))
        .alias("fingerprint"))
        .orderBy("doc_id"))


@query(
    "text_stats",
    oracle=r"""
WITH t AS (
  SELECT doc_id, text, string_split_regex(lower(text), '\s+') AS toks
  FROM documents WHERE doc_id < 200
)
SELECT doc_id,
  CAST(length(text) AS BIGINT)                   AS n_chars,
  CAST(len(toks) AS BIGINT)                      AS n_words,
  CAST(len(list_distinct(toks)) AS BIGINT)       AS n_distinct_words,
  round(CAST(length(text) - len(toks) + 1 AS DOUBLE) / len(toks), 4)
                                                 AS avg_word_len,
  round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4)
                                                 AS type_token_ratio,
  round(CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
             AS DOUBLE) / length(text), 4)       AS digit_ratio,
  round(CAST(length(regexp_replace(text, '[\w\s]', '', 'g')) AS DOUBLE)
        / length(text), 4)                       AS punct_ratio,
  round(CAST(len(list_filter(toks, x -> list_contains(__STOP__, x)))
             AS DOUBLE) / len(toks), 4)          AS stopword_ratio
FROM t ORDER BY doc_id
""".replace("__STOP__", _STOP),
    tags=("llm", "text"),
    priority=100,
    doc="Text statistics tier: length/diversity/noise ratios as one "
        "codegen projection (operators/text.py:text_stats).",
)
def text_stats_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    stats = text_stats(F.col("text"))
    return (d.select("doc_id",
                     *[c.alias(name) for name, c in stats.items()])
            .orderBy("doc_id"))


@query(
    "text_lang_id",
    oracle=r"""
WITH t AS (
  SELECT doc_id, text, string_split_regex(lower(text), '\s+') AS toks,
         CAST(length(text) - length(regexp_replace(text, '[一-鿿]', '', 'g'))
              AS DOUBLE) / greatest(length(text), 1) AS cjk_ratio
  FROM documents
), scored AS (
  SELECT doc_id, cjk_ratio,
    len(list_filter(toks, x -> list_contains(__EN__, x))) AS s_en,
    len(list_filter(toks, x -> list_contains(__ES__, x))) AS s_es,
    len(list_filter(toks, x -> list_contains(__DE__, x))) AS s_de,
    len(list_filter(toks, x -> list_contains(__FR__, x))) AS s_fr
  FROM t
)
SELECT doc_id,
  CASE WHEN cjk_ratio > 0.3 THEN 'zh'
       WHEN s_en + s_es + s_de + s_fr = 0 THEN 'und'
       WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
       WHEN s_de >= s_fr THEN 'de'
       ELSE 'fr' END AS lang_pred
FROM scored ORDER BY doc_id
""".replace("__EN__", _sql_list(LANG_MARKERS["en"]))
   .replace("__ES__", _sql_list(LANG_MARKERS["es"]))
   .replace("__DE__", _sql_list(LANG_MARKERS["de"]))
   .replace("__FR__", _sql_list(LANG_MARKERS["fr"])),
    tags=("llm", "text"),
    priority=100,
    doc="Heuristic language ID: marker-word hit counts + CJK char ratio, "
        "fixed deterministic precedence (operators/text.py:lang_id).",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (d.select("doc_id", lang_id(F.col("text")).alias("lang_pred"))
            .orderBy("doc_id"))


@query(
    "text_token_count",
    oracle=r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '\w+|[^\w\s]')) AS BIGINT)
         AS n_tokens
FROM documents ORDER BY doc_id
""",
    tags=("llm", "text"),
    priority=100,
    doc="BPE-ish token counting: word pieces + punctuation via one "
        "regexp_extract_all (operators/text.py:token_count).",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (d.select("doc_id", token_count(F.col("text")).alias("n_tokens"))
            .orderBy("doc_id"))


@query(
    "text_fingerprint",
    oracle=r"""
WITH fp AS (
  SELECT doc_id,
         md5(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS fingerprint
  FROM documents
)
SELECT doc_id, fingerprint,
       count(*) OVER (PARTITION BY fingerprint) AS n_same
FROM fp ORDER BY doc_id
""",
    tags=("llm", "text"),
    priority=100,
    doc="Document fingerprinting: md5 over normalized text "
        "(operators/text.py:fingerprint) + per-fingerprint multiplicity.",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("fingerprint")
    return (d.select("doc_id", fingerprint(F.col("text")).alias("fingerprint"))
            .withColumn("n_same", F.count(F.lit(1)).over(w))
            .orderBy("doc_id"))


@query(
    "text_quality_filter",
    oracle=r"""
WITH t AS (
  SELECT doc_id, text, string_split_regex(lower(text), '\s+') AS toks
  FROM documents
), s AS (
  SELECT doc_id,
    CAST(len(toks) AS BIGINT) AS n_words,
    round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4) AS ttr,
    round(CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
               AS DOUBLE) / length(text), 4) AS digit_ratio,
    round(CAST(length(regexp_replace(text, '[\w\s]', '', 'g')) AS DOUBLE)
          / length(text), 4) AS punct_ratio
  FROM t
)
SELECT doc_id, n_words,
  round(0.4 * least(CAST(n_words AS DOUBLE) / 50.0, 1.0)
      + 0.3 * least(ttr * 2, 1.0)
      + 0.3 * greatest(0.0, 1.0 - (digit_ratio + punct_ratio) * 5), 4)
    AS quality,
  (round(0.4 * least(CAST(n_words AS DOUBLE) / 50.0, 1.0)
       + 0.3 * least(ttr * 2, 1.0)
       + 0.3 * greatest(0.0, 1.0 - (digit_ratio + punct_ratio) * 5), 4)
   >= 0.5) AS keep
FROM s ORDER BY doc_id
""",
    tags=("llm", "text"),
    priority=100,
    doc="Quality filtering: Gopher/C4-style composite score from "
        "length/diversity/noise, pure filter pushdown-friendly "
        "(operators/text.py:quality_score).",
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    q = quality_score(F.col("text"))
    stats = text_stats(F.col("text"))
    return (d.select("doc_id", stats["n_words"].alias("n_words"),
                     q.alias("quality"), (q >= 0.5).alias("keep"))
            .orderBy("doc_id"))


@query(
    "cosine_topk",
    oracle="""
WITH p AS (
  SELECT vec_id AS probe_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS pv
  FROM embeddings WHERE vec_id < 10
), c AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings
), scored AS (
  SELECT probe_id, vec_id,
         round(list_dot_product(pv, cv)
               / (sqrt(list_dot_product(pv, pv))
                  * sqrt(list_dot_product(cv, cv))), 6) AS cosine
  FROM p, c WHERE probe_id <> vec_id
), ranked AS (
  SELECT probe_id, vec_id, cosine,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
)
SELECT probe_id, vec_id, cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 5
ORDER BY probe_id, rank
""",
    tags=("llm", "similarity", "bench"),
    priority=100,
    doc="Brute-force cosine top-k: broadcast probes, one corpus pass, "
        "JVM-side zip_with/aggregate fold, bounded top-k window "
        "(operators/similarity.py:cosine_topk). The exact ANN baseline.",
)
def cosine_topk_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 10)
    return (cosine_topk(e, probes, k=5)
            .withColumn("rank", F.col("rank").cast("int"))
            .orderBy("probe_id", "rank"))


@query(
    "ann_lsh",
    oracle=None,  # approximate; recall vs cosine_topk property-tested
    tags=("llm", "similarity"),
    priority=150,
    doc="Approximate NN via BucketedRandomProjectionLSH over normalized "
        "vectors (Euclidean order == cosine order on the unit sphere); "
        "approxSimilarityJoin = bucket equi-join, the 100 TB path. "
        "Recall vs brute force tested in tests/test_llmdata.py.",
)
def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 5)
    return (ann_brp_lsh(e, probes, k=10)
            .withColumn("rank", F.col("rank").cast("int"))
            .orderBy("probe_id", "rank"))


@query(
    "neardup_embedding_lsh",
    oracle=None,  # hyperplane-family dependent; property-tested
    tags=("llm", "similarity"),
    priority=150,
    doc="Embedding near-dup pairs via multi-table sign-LSH buckets + "
        "exact cosine verify (operators/similarity.py:cosine_neardup_lsh);"
        " candidates from bucket equi-joins, never all-pairs.",
)
def neardup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return (cosine_neardup_lsh(e, threshold=0.35, dim=64)
            .orderBy("id_a", "id_b"))


@query(
    "multimodal_features",
    oracle=None,  # mapInPandas featurizer; schema/value-pinned in pytest
    tags=("llm", "multimodal"),
    priority=150,
    doc="Multimodal plumbing: binary payload + typed meta struct "
        "(operators/multimodal.py:ASSET_SCHEMA), Arrow-batched "
        "mapInPandas featurizer with a deterministic byte-level fallback "
        "for the codec-less container.",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return extract_features(assets_from_documents(d)).orderBy("asset_id")


@query(
    "multimodal_decode",
    oracle="""
SELECT doc_id                                   AS asset_id,
       'wav'                                    AS codec,
       8000 + (doc_id % 5) * 1000               AS sample_rate,
       (n_chars % 100) + 1                      AS n_frames,
       round(((n_chars % 100) + 1) * 1.0
             / (8000 + (doc_id % 5) * 1000), 6) AS duration_s,
       CAST(0.0 AS DOUBLE)                      AS signal_mean,
       CAST(0.0 AS DOUBLE)                      AS signal_rms
FROM documents
WHERE doc_id < 100
ORDER BY asset_id
""",
    tags=("llm", "multimodal"),
    doc="REAL media decode end-to-end: silent 16-bit PCM WAV payloads "
        "synthesized per document (sample_rate/frame count derived from "
        "document columns), decoded by the stdlib wave/struct branch of "
        "operators/multimodal.py:_decode_payload via Arrow-batched "
        "mapInPandas — the oracle recomputes the expected header "
        "metadata arithmetically, so a hash match proves the decode "
        "path parses real bytes correctly.",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import decode_assets
    d = (load_table(spark, sf_dir, "documents")
         .filter(F.col("doc_id") < 100)
         .select(F.col("doc_id").alias("asset_id"),
                 (F.lit(8000) + (F.col("doc_id") % 5) * 1000)
                 .cast("long").alias("rate"),
                 ((F.col("n_chars") % 100) + 1).cast("long")
                 .alias("frames")))

    def _encode(batches):
        import io
        import wave

        import pandas as pd
        for pdf in batches:
            payloads = []
            for rate, frames in zip(pdf["rate"], pdf["frames"]):
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(int(rate))
                    w.writeframes(b"\x00\x00" * int(frames))
                payloads.append(buf.getvalue())
            yield pd.DataFrame({"asset_id": pdf["asset_id"],
                                "modality": "audio",
                                "payload": payloads})

    assets = d.mapInPandas(
        _encode, schema="asset_id long, modality string, payload binary")
    return (decode_assets(assets)
            .select("asset_id", "codec", "sample_rate", "n_frames",
                    F.round("duration_s", 6).alias("duration_s"),
                    "signal_mean", "signal_rms")
            .orderBy("asset_id"))


@query(
    "text_tfidf",
    oracle=r"""
WITH terms AS (
  SELECT doc_id AS doc,
         unnest(string_split_regex(lower(text), '\s+')) AS term
  FROM documents WHERE doc_id < 100
), tf AS (
  SELECT doc, term, count(*) AS tf FROM terms GROUP BY doc, term
), n AS (
  SELECT count(DISTINCT doc_id) AS n_docs FROM documents WHERE doc_id < 100
)
SELECT doc AS doc_id, term, tf,
       count(*) OVER (PARTITION BY term) AS doc_freq,
       round(tf * (ln((1.0 + (SELECT n_docs FROM n))
                      / (1.0 + count(*) OVER (PARTITION BY term))) + 1.0), 6)
         AS tfidf
FROM tf
ORDER BY doc_id, term
""",
    tags=("llm", "text"),
    priority=100,
    doc="Relational TF-IDF (operators/text.py:tf_idf): tokenize -> "
        "explode -> tf hash-agg -> per-term doc_freq window -> smooth "
        "idf. Two shuffles, no ml.feature, exactly oracle-checkable "
        "(HashingTF would bucket-collide).",
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import tf_idf
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return tf_idf(d).orderBy("doc_id", "term")


@query(
    "ann_ivf",
    oracle=None,  # kmeans-cell dependent; recall vs brute force in pytest
    tags=("llm", "similarity"),
    priority=150,
    doc="IVF approximate NN (operators/similarity.py:ivf_ann): seeded "
        "k-means cells index the corpus; probes score only their n_probe "
        "nearest cells via a cell_id equi-join — the inverted-file "
        "alternative to LSH bucketing. Recall vs cosine_topk tested in "
        "tests/test_llmdata.py.",
)
def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_ann
    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 5)
    return (ivf_ann(e, probes, k=10, n_probe=8)
            .withColumn("rank", F.col("rank").cast("int"))
            .orderBy("probe_id", "rank"))


@query(
    "dedup_clusters",
    oracle=r"""
WITH RECURSIVE s AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(string_split_regex(text, '\s+')) - 1, 1)),
           i -> concat_ws(' ',
                string_split_regex(text, '\s+')[i],
                string_split_regex(text, '\s+')[i+1],
                string_split_regex(text, '\s+')[i+2]))) AS sh
  FROM documents WHERE doc_id < 250
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM s a, s b
  WHERE a.doc_id < b.doc_id
    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
), reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT d.doc_id,
       least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS cluster_rep
FROM s d LEFT JOIN reach r ON r.src = d.doc_id
GROUP BY d.doc_id
ORDER BY doc_id
""",
    tags=("llm", "dedup"),
    doc="Duplicate GROUPS, not just pairs: connected components over "
        "exact-Jaccard near-dup edges via min-label propagation plus "
        "pointer doubling (operators/dedup.py:dedup_clusters — "
        "O(log diameter) join rounds, per-round localCheckpoint bounds "
        "lineage). Each doc maps to "
        "its component's minimum id as representative; singletons map "
        "to themselves. Oracle recomputes components with a recursive "
        "transitive-closure CTE.",
)
def dedup_clusters_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import dedup_clusters
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 250)
    sh = with_word_shingles(d, "text", n=3)
    pairs = jaccard_pairs(sh, "doc_id", "shingles", threshold=0.5)
    return (dedup_clusters(pairs, d.select("doc_id"), id_col="doc_id")
            .orderBy("doc_id"))


@query(
    "retrieval_topk_metadata",
    oracle="""
WITH p AS (
  SELECT vec_id AS probe_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS pv
  FROM embeddings WHERE vec_id < 10
), c AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings
), scored AS (
  SELECT probe_id, vec_id,
         round(list_dot_product(pv, cv)
               / (sqrt(list_dot_product(pv, pv))
                  * sqrt(list_dot_product(cv, cv))), 6) AS cosine
  FROM p, c WHERE probe_id <> vec_id
), ranked AS (
  SELECT probe_id, vec_id, cosine,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
)
SELECT r.probe_id, r.vec_id, r.cosine, CAST(r.rank AS INTEGER) AS rank,
       d.lang, d.n_chars
FROM ranked r JOIN documents d ON d.doc_id = r.vec_id
WHERE r.rank <= 5
ORDER BY r.probe_id, r.rank
""",
    tags=("llm", "similarity"),
    doc="Retrieval composite (the RAG read path): exact cosine top-5 "
        "per probe (operators/similarity.py:cosine_topk), hits joined "
        "back to the documents table for payload metadata — the "
        "broadcast-dimension join pattern applied to retrieval results; "
        "the corpus is scanned once, the hit set (probes x k rows) is "
        "what joins.",
)
def retrieval_topk_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars")
    probes = e.filter(F.col("vec_id") < 10)
    hits = cosine_topk(e, probes, k=5)
    return (hits.join(d, hits.vec_id == d.doc_id)
            .select("probe_id", "vec_id", "cosine",
                    F.col("rank").cast("int").alias("rank"),
                    "lang", "n_chars")
            .orderBy("probe_id", "rank"))


@query(
    "ann_signcell",
    oracle="""
WITH cells AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
         + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
         + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
         + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS cell
  FROM embeddings
), probes AS (
  SELECT vec_id AS probe_id, v AS pv, cell AS home FROM cells
  WHERE vec_id < 10
), probe_cells AS (
  SELECT probe_id, pv, unnest([home,
                               xor(home, 1), xor(home, 2),
                               xor(home, 4), xor(home, 8)]) AS cell
  FROM probes
), scored AS (
  SELECT pc.probe_id, c.vec_id,
         round(list_dot_product(pc.pv, c.v)
               / (sqrt(list_dot_product(pc.pv, pc.pv))
                  * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
  FROM probe_cells pc JOIN cells c ON pc.cell = c.cell
  WHERE pc.probe_id <> c.vec_id
), ranked AS (
  SELECT probe_id, vec_id, cosine,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
)
SELECT probe_id, vec_id, cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 5
ORDER BY probe_id, rank
""",
    tags=("llm", "similarity"),
    doc="IVF-style pruned ANN with a DETERMINISTIC quantizer "
        "(operators/similarity.py:ann_signcell): sign-bit cells over "
        "the first 4 dims, multi-probe expansion to Hamming-1 cells "
        "(5/16 of the corpus searched), exact cosine + top-5 within "
        "candidates. Every step is engine-neutral, so the oracle "
        "recomputes the identical pruned search — the correctness "
        "anchor for the k-means ann_ivf (whose centroids can't cross "
        "engines). Recall vs the exact baseline is pytest-bounded.",
)
def ann_signcell_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ann_signcell
    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 10)
    return (ann_signcell(e, probes, k=5)
            .withColumn("rank", F.col("rank").cast("int"))
            .orderBy("probe_id", "rank"))


@query(
    "embedding_quantize_int8",
    oracle="""
WITH s AS (
  SELECT vec_id,
         list_max(list_transform(embedding,
                                 x -> abs(CAST(x AS DOUBLE)))) AS sc,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
)
SELECT vec_id, round(sc, 6) AS scale,
       array_to_string(
         CASE WHEN sc = 0 THEN list_transform(v, x -> 0)
              ELSE list_transform(v, x -> CAST(greatest(-127, least(127,
                     floor(x * 127.0 / sc + 0.5))) AS BIGINT))
         END, ',') AS qvec
FROM s ORDER BY vec_id
""",
    tags=("llm", "embedding"),
    priority=100,
    doc="Symmetric per-vector int8 quantization (operators/similarity"
        ".py:quantize_int8) — the 4x memory lever for embedding search "
        "at scale. floor(x·127/s + 0.5) with s = max|v| is ONE IEEE "
        "expression per element (round()'s half-even vs half-away tie "
        "rule differs across engines; floor(+0.5) doesn't), clamped to "
        "[-127,127]; zero vectors quantize to zeros. Pure map-side "
        "column work, zero shuffles; quantized cosine recall vs the "
        "float path is pytest-verified.",
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import quantize_int8
    e = load_table(spark, sf_dir, "embeddings")
    q = quantize_int8(e)
    return (q.select(
        "vec_id", F.round("scale", 6).alias("scale"),
        F.array_join(F.transform("qvec", lambda x: x.cast("string")), ",")
        .alias("qvec"))
        .orderBy("vec_id"))


@query(
    "text_winnow_fingerprints",
    oracle=r"""
WITH t AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text),
              '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS s
  FROM documents WHERE doc_id < 100
), h AS (
  SELECT doc_id,
         CASE WHEN len(s) - 4 > 0 THEN
           list_transform(range(1, len(s) - 3),
                          i -> md5(substring(s, i, 5)))
         ELSE [] END AS hs
  FROM t
), sel AS (
  SELECT doc_id,
         CASE WHEN len(hs) - 3 > 0 THEN list_distinct(
           list_transform(range(1, len(hs) - 2), j ->
             concat(CAST(j + 4 - list_position(
                      list_reverse(list_slice(hs, j, j + 3)),
                      list_min(list_slice(hs, j, j + 3))) AS VARCHAR),
                    ':', list_min(list_slice(hs, j, j + 3)))))
         ELSE [] END AS fps
  FROM h
)
SELECT doc_id, unnest(fps) AS winnow_fp FROM sel
ORDER BY doc_id, winnow_fp
""",
    tags=("llm", "text"),
    priority=100,
    doc="Winnowing fingerprints (operators/text.py:winnow_fingerprints "
        "— Schleimer et al. SIGMOD'03/MOSS): char-5-gram md5 hashes, "
        "each 4-window selects its rightmost minimum, distinct "
        "selections are the document fingerprint set (guarantee: any "
        "shared substring >= w+k-1 chars shares a fingerprint). The "
        "gram-hash array is let-bound so it computes once per row; the "
        "oracle recomputes the full selection with DuckDB list ops.",
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import normalize_text, winnow_fingerprints
    d = (load_table(spark, sf_dir, "documents")
         .filter(F.col("doc_id") < 100)
         .select("doc_id", normalize_text(F.col("text")).alias("norm")))
    return (winnow_fingerprints(d, "norm", k=5, w=4)
            .orderBy("doc_id", "winnow_fp"))


@query(
    "text_gopher_rules",
    oracle=r"""
WITH t AS (
  SELECT doc_id, text, string_split_regex(lower(text), '\s+') AS toks
  FROM documents
), b AS (
  SELECT doc_id, toks,
         CAST(len(toks) AS BIGINT) AS n_words,
         round((length(text) - len(toks) + 1.0) / len(toks), 4)
           AS mean_word_len,
         CAST(len(list_filter(['the', 'a', 'of', 'and', 'is', 'to', 'in'],
                              w -> list_contains(toks, w)))
              AS BIGINT) AS stop_types,
         CASE WHEN len(toks) >= 2 THEN
           list_transform(range(1, len(toks)),
                          i -> toks[i] || ' ' || toks[i+1])
         ELSE [] END AS bg
  FROM t
), c AS (
  SELECT doc_id, n_words, mean_word_len, stop_types,
         round(CASE WHEN len(toks) > 0 THEN
                 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
               ELSE 0.0 END, 6) AS dup_word_frac,
         round(CASE WHEN len(bg) > 0 THEN
                 CAST(list_max(list_transform(list_distinct(bg),
                        d -> len(list_filter(bg, x -> x = d))))
                      AS DOUBLE) / len(bg)
               ELSE 0.0 END, 6) AS top_bigram_frac
  FROM b
)
SELECT doc_id, n_words, mean_word_len, stop_types, dup_word_frac,
       top_bigram_frac,
       n_words BETWEEN 20 AND 100000            AS r_word_count,
       mean_word_len BETWEEN 3.0 AND 10.0       AS r_mean_word_len,
       stop_types >= 2                          AS r_stopwords,
       dup_word_frac <= 0.6                     AS r_dup_word,
       top_bigram_frac <= 0.2                   AS r_top_bigram,
       (n_words BETWEEN 20 AND 100000)
         AND (mean_word_len BETWEEN 3.0 AND 10.0)
         AND stop_types >= 2 AND dup_word_frac <= 0.6
         AND top_bigram_frac <= 0.2             AS keep
FROM c
ORDER BY doc_id
""",
    tags=("llm", "text"),
    doc="Gopher-style hard quality gates (operators/text.py:gopher_rules): "
        "word-count bounds, mean-word-length bounds, required-stopword "
        "presence, duplicate-word and top-bigram caps — each reported as "
        "its own boolean flag plus the conjunctive keep, so drop "
        "accounting per rule is a trivial rollup. Pure per-row column "
        "arithmetic over the full documents table: no shuffle, no UDF, "
        "trivially data-parallel at 100 TB.",
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import ensure_fanout_parallelism, gopher_rules
    # the dimension-sized documents file arrives as ONE scan partition;
    # round-robin the narrow rows so the per-row rule arithmetic runs
    # cluster-wide (no-op on any multi-partition scan, i.e. at scale)
    d = ensure_fanout_parallelism(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    g = gopher_rules(F.col("text"))
    return (d.select("doc_id",
                     *[g[k].alias(k) for k in
                       ("n_words", "mean_word_len", "stop_types",
                        "dup_word_frac", "top_bigram_frac",
                        "r_word_count", "r_mean_word_len", "r_stopwords",
                        "r_dup_word", "r_top_bigram", "keep")])
            .orderBy("doc_id"))


@query(
    "text_repetition_signals",
    oracle=r"""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
  FROM documents WHERE doc_id < 200
), b AS (
  SELECT doc_id, toks,
         CASE WHEN len(toks) >= 2 THEN
           list_transform(range(1, len(toks)),
                          i -> toks[i] || ' ' || toks[i+1])
         ELSE [] END AS bg
  FROM t
), c AS (
  SELECT doc_id, toks, bg,
         list_transform(list_distinct(bg),
                        d -> len(list_filter(bg, x -> x = d))) AS cnts
  FROM b
)
SELECT doc_id,
       round(CASE WHEN len(toks) > 0 THEN
               1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
             ELSE 0.0 END, 6) AS dup_word_frac,
       round(CASE WHEN len(bg) > 0 THEN
               CAST(list_max(cnts) AS DOUBLE) / len(bg)
             ELSE 0.0 END, 6) AS top_bigram_frac,
       round(CASE WHEN len(bg) > 0 THEN
               CAST(list_sum(list_transform(
                 cnts, c -> CASE WHEN c > 1 THEN c ELSE 0 END))
                 AS DOUBLE) / len(bg)
             ELSE 0.0 END, 6) AS dup_bigram_frac
FROM c
ORDER BY doc_id
""",
    tags=("llm", "text"),
    doc="Gopher-style repetition/boilerplate signals (operators/text.py:"
        "repetition_signals): duplicate-word fraction, top-bigram "
        "fraction, duplicate-bigram fraction — the quality gates that "
        "drop keyword-stuffed / looping-generation text. All pure "
        "column arithmetic, one projection, no shuffle.",
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import ensure_fanout_parallelism, repetition_signals
    # same one-partition-scan guard as text_gopher_rules
    d = ensure_fanout_parallelism(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200).select("doc_id", "text"))
    sig = repetition_signals(F.col("text"))
    return (d.select("doc_id",
                     sig["dup_word_frac"].alias("dup_word_frac"),
                     sig["top_bigram_frac"].alias("top_bigram_frac"),
                     sig["dup_bigram_frac"].alias("dup_bigram_frac"))
            .orderBy("doc_id"))


@query(
    "corpus_pack_budget",
    oracle=r"""
WITH t AS (
  SELECT doc_id,
         len(string_split_regex(text, '\s+')) AS n_tokens,
         doc_id % 16 AS b
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY b, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens
FROM c WHERE cum <= 6000
ORDER BY doc_id
""",
    tags=("llm", "corpus"),
    doc="Token-budget corpus packing (operators/corpus.py:"
        "pack_to_token_budget): deterministic (bucket, id)-ordered "
        "prefix whose cumulative token count fits the budget. Bucket-"
        "level prefix sums keep the corpus parallel — the only single-"
        "task window runs over n_buckets rows, never the corpus.",
)
def corpus_pack_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import pack_to_token_budget
    d = (load_table(spark, sf_dir, "documents")
         .select("doc_id",
                 F.size(F.split(F.col("text"), r"\s+"))
                 .cast("bigint").alias("n_tokens")))
    out = pack_to_token_budget(d, budget=6000, id_col="doc_id",
                               ntok_col="n_tokens", n_buckets=16)
    return out.select("doc_id", "n_tokens").orderBy("doc_id")


@query(
    "corpus_decontaminate",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents
), dg AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(t) - 1, 1)),
    i -> concat_ws(' ', t[i], t[i+1], t[i+2])))) AS gram
  FROM toks WHERE doc_id < 300
), bg AS (
  SELECT DISTINCT unnest(list_distinct(list_transform(
    range(1, greatest(len(t) - 1, 1)),
    i -> concat_ws(' ', t[i], t[i+1], t[i+2])))) AS gram
  FROM toks WHERE doc_id % 17 = 0
)
SELECT d.doc_id,
       count(DISTINCT CASE WHEN b.gram IS NOT NULL THEN d.gram END)
         AS n_overlap,
       count(DISTINCT CASE WHEN b.gram IS NOT NULL THEN d.gram END) >= 3
         AS contaminated
FROM dg d LEFT JOIN bg b USING (gram)
GROUP BY d.doc_id
ORDER BY doc_id
""",
    tags=("llm", "corpus"),
    doc="Benchmark decontamination (operators/corpus.py:decontaminate): "
        "flag training docs sharing >=3 distinct word 3-grams with any "
        "benchmark doc (stand-in benchmark: every 17th document). "
        "Candidates from a broadcast n-gram equi-join — never a "
        "document cross product; left join keeps zero-overlap docs.",
)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import decontaminate
    d = load_table(spark, sf_dir, "documents")
    docs = d.filter(F.col("doc_id") < 300)
    benchmark = d.filter(F.col("doc_id") % 17 == 0)
    return (decontaminate(docs, benchmark, n=3, min_overlap=3)
            .orderBy("doc_id"))


@query(
    "text_redact_pii",
    oracle=r"""
WITH synth AS (
  SELECT c_custkey,
         'contact ' || c_name || ' at user' || CAST(c_custkey AS VARCHAR)
         || '@example.com or 555-'
         || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-'
         || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
         || ' from 10.0.' || CAST(c_custkey % 256 AS VARCHAR) || '.'
         || CAST((c_custkey * 7) % 256 AS VARCHAR) AS text
  FROM customer WHERE c_custkey < 200
)
SELECT c_custkey,
       regexp_replace(
         regexp_replace(
           regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
             '<EMAIL>', 'g'),
           '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
         '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')
         AS redacted
FROM synth
ORDER BY c_custkey
""",
    tags=("llm", "text"),
    doc="PII redaction (operators/text.py:redact_pii): email/phone/IPv4 "
        "replaced by typed tags via chained regexp_replace, patterns "
        "restricted to the Java-regex/RE2 common subset so the oracle "
        "re-runs the identical scrub. Input synthesized identically on "
        "both sides from the customer table (the corpus has no PII).",
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import redact_pii
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    k = F.col("c_custkey")
    synth = F.concat(
        F.lit("contact "), F.col("c_name"), F.lit(" at user"),
        k.cast("string"), F.lit("@example.com or 555-"),
        F.lpad((k % 1000).cast("string"), 3, "0"), F.lit("-"),
        F.lpad((k % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."), (k % 256).cast("string"), F.lit("."),
        ((k * 7) % 256).cast("string"))
    return (c.select("c_custkey", redact_pii(synth).alias("redacted"))
            .orderBy("c_custkey"))


@query(
    "corpus_chunk_text",
    oracle=r"""
WITH t AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS toks
  FROM documents WHERE doc_id < 150
), c AS (
  SELECT doc_id, toks, len(toks) AS n,
         CASE WHEN len(toks) <= 20 THEN 1
              ELSE (len(toks) - 20 + 14) // 15 + 1 END AS n_chunks
  FROM t
), e AS (
  SELECT doc_id, toks, unnest(range(n_chunks)) AS chunk_idx FROM c
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       array_to_string(toks[(chunk_idx*15 + 1):(chunk_idx*15 + 20)], ' ')
         AS chunk_text,
       CAST(len(toks[(chunk_idx*15 + 1):(chunk_idx*15 + 20)]) AS BIGINT)
         AS n_chunk_tokens
FROM e
ORDER BY doc_id, chunk_idx
""",
    tags=("llm", "corpus"),
    doc="Context-window chunking (operators/corpus.py:chunk_text): "
        "20-token windows advancing by 15 (overlap 5) with traceable "
        "(doc_id, chunk_idx) provenance; map-side explode, no shuffle. "
        "Oracle recomputes the identical slicing with list ranges.",
)
def corpus_chunk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import chunk_text
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    return (chunk_text(d, chunk_tokens=20, overlap=5)
            .orderBy("doc_id", "chunk_idx"))


@query(
    "vocab_build",
    oracle=r"""
WITH tok AS (
  SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
  FROM documents
), counts AS (
  SELECT token, count(*) AS n_token FROM tok
  WHERE token <> '' GROUP BY token HAVING count(*) >= 5
)
SELECT token, n_token,
       CAST(row_number() OVER (ORDER BY n_token DESC, token)
            AS INTEGER) AS token_id
FROM counts ORDER BY token_id
""",
    tags=("llm", "text"),
    doc="Corpus vocabulary with dense ids (operators/text.py:build_vocab): "
        "token counting is one shuffle over the corpus; the dense-id "
        "ranking window runs over the post-cutoff vocabulary only, which "
        "Heaps' law keeps bounded (~1M rows at 100 TB) — same bounded-"
        "window argument as corpus_pack_budget. Ids are (count desc, "
        "token asc) so the assignment is total-order deterministic.",
)
def vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import build_vocab
    d = load_table(spark, sf_dir, "documents")
    return build_vocab(d, min_count=5).orderBy("token_id")


@query(
    "bigram_pmi",
    oracle=r"""
WITH toks AS (
  SELECT string_split_regex(lower(text), '\s+') AS t FROM documents
  WHERE len(string_split_regex(lower(text), '\s+')) >= 2
), uni AS (
  SELECT w, count(*) AS c_w
  FROM (SELECT unnest(t) AS w FROM toks) WHERE w <> '' GROUP BY w
), big_all AS (
  SELECT split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2,
         count(*) AS c_xy
  FROM (SELECT unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i+1])) AS bg
        FROM toks)
  WHERE split_part(bg, ' ', 1) <> '' AND split_part(bg, ' ', 2) <> ''
  GROUP BY 1, 2
), n AS (
  SELECT (SELECT CAST(sum(c_w) AS BIGINT) FROM uni) AS n_uni,
         (SELECT CAST(sum(c_xy) AS BIGINT) FROM big_all) AS n_big
)
SELECT b.w1, b.w2, b.c_xy,
       round(ln((b.c_xy / n.n_big)
                / ((x.c_w / n.n_uni) * (y.c_w / n.n_uni))), 4) + 0.0 AS pmi
FROM big_all b
JOIN uni x ON b.w1 = x.w
JOIN uni y ON b.w2 = y.w
CROSS JOIN n
WHERE b.c_xy >= 5
ORDER BY w1, w2
""",
    tags=("llm", "text"),
    doc="Adjacent-bigram PMI collocations (operators/text.py:bigram_pmi, "
        "Church & Hanks '90): two count shuffles (bigram, unigram), "
        "marginal totals broadcast back, one ln over integer-count "
        "ratios. Tokens join by space-concat in the oracle (tokens are "
        "split on whitespace, so the separator cannot collide).",
)
def bigram_pmi_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import bigram_pmi
    d = load_table(spark, sf_dir, "documents")
    return bigram_pmi(d, min_count=5).orderBy("w1", "w2")


@query(
    "corpus_span_duplication",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents
), pairs AS (
  SELECT DISTINCT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(t) - 1, 1)),
    i -> concat_ws(' ', t[i], t[i+1], t[i+2])))) AS gram
  FROM toks
), c AS (
  SELECT doc_id, gram, count(*) OVER (PARTITION BY gram) AS ndocs
  FROM pairs
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared_spans,
       round(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) / count(*), 4)
         + 0.0 AS dup_ratio
FROM c GROUP BY doc_id ORDER BY doc_id
""",
    tags=("llm", "corpus"),
    doc="Per-document duplicated-span profile (operators/corpus.py:"
        "span_duplication, Lee et al. '22 substring-dedup signal): the "
        "fraction of each doc's distinct word 3-grams that recur in "
        "ANOTHER document. Distinct (doc,span) pairs -> span-keyed "
        "window count -> per-doc rollup; explode-then-aggregate, never "
        "doc x doc.",
)
def corpus_span_duplication(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import span_duplication
    d = load_table(spark, sf_dir, "documents")
    return span_duplication(d, n=3).orderBy("doc_id")


@query(
    "neardup_cosine_exact",
    oracle="""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
  FROM embeddings WHERE vec_id < 300
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.dv, b.dv)
             / (sqrt(list_dot_product(a.dv, a.dv))
                * sqrt(list_dot_product(b.dv, b.dv))), 6) AS cosine
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.dv, b.dv)
            / (sqrt(list_dot_product(a.dv, a.dv))
               * sqrt(list_dot_product(b.dv, b.dv))), 6) >= 0.4
ORDER BY id_a, id_b
""",
    tags=("llm", "similarity"),
    doc="Exact embedding-cosine near-dup pairs at threshold 0.4 "
        "(operators/similarity.py:cosine_neardup_pairs_exact) on a "
        "bounded slice — the oracle-checked verification baseline for "
        "the sign-LSH scale path (cosine_neardup_lsh), whose recall "
        "pytest measures against exactly this computation. Norms "
        "precomputed per row; smaller alias broadcast.",
)
def neardup_cosine_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine_neardup_pairs_exact
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    return (cosine_neardup_pairs_exact(e, threshold=0.4)
            .orderBy("id_a", "id_b"))


@query(
    "multimodal_cdc_chunks",
    oracle=None,  # Gear rolling hash has no SQL form; the CDC property
                  # suite (shift resilience, exact tiling, determinism,
                  # cross-asset dedup) carries the evidence
    tags=("llm", "multimodal", "dedup"),
    priority=150,
    doc="Content-defined chunking + cross-asset chunk dedup profile "
        "(operators/multimodal.py:content_defined_chunks, "
        "chunk_dedup_ratio): Gear-hash CDC boundaries over binary "
        "payloads, md5 chunk ids, then the span_duplication-shaped "
        "chunk-hash rollup. Property-tested in tests/test_llmdata.py::"
        "TestContentDefinedChunking (insertion shifts only local "
        "chunks; fixed blocking would lose all alignment).",
)
def multimodal_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import (chunk_dedup_ratio,
                                        content_defined_chunks)
    assets = assets_from_documents(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200))
    chunks = content_defined_chunks(assets, min_size=32, avg_size=64,
                                    max_size=256)
    return chunk_dedup_ratio(chunks).orderBy("asset_id")


@query(
    "text_vocab_logrank",
    oracle=r"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS token
  FROM documents
), vcounts AS (
  SELECT token, count(*) AS n_token FROM tok
  WHERE token <> '' GROUP BY token HAVING count(*) >= 2
), vocab AS (
  SELECT token,
         CAST(row_number() OVER (ORDER BY n_token DESC, token)
              AS INTEGER) AS token_id
  FROM vcounts
), oov AS (SELECT max(token_id) + 1 AS o FROM vocab),
ranked AS (
  SELECT t.doc_id, v.token_id,
         coalesce(v.token_id, oov.o) AS r
  FROM tok t LEFT JOIN vocab v USING (token) CROSS JOIN oov
  WHERE t.token <> ''
)
SELECT doc_id, count(*) AS n_tokens,
       CAST(sum(CASE WHEN token_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       round(sum(CAST(floor(log2(r) * 1000000) AS BIGINT))
             / (1000000.0 * count(*)), 4) AS mean_log2_rank
FROM ranked GROUP BY doc_id ORDER BY doc_id
""",
    tags=("llm", "text"),
    doc="Rank-based perplexity proxy (operators/text.py:"
        "vocab_logrank_score): mean log2 of each token's corpus-"
        "frequency rank, OOV ranked past the vocabulary end — the "
        "model-free stand-in for LM-perplexity quality filtering. Each "
        "token contributes floor(log2(rank)*1e6) as an INTEGER so the "
        "per-doc sum is fold-order exact (centroid integer-grid rule); "
        "vocab broadcast into the token join, one doc-id shuffle.",
)
def text_vocab_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import vocab_logrank_score
    d = load_table(spark, sf_dir, "documents")
    return vocab_logrank_score(d, min_count=2).orderBy("doc_id")


@query(
    "text_bigram_logprob",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
  FROM documents
  WHERE len(string_split_regex(lower(text), '\s+')) >= 2
), pairs AS (
  SELECT doc_id, split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2
  FROM (SELECT doc_id,
               unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i+1])) AS bg
        FROM toks)
  WHERE split_part(bg, ' ', 1) <> '' AND split_part(bg, ' ', 2) <> ''
), big AS (
  SELECT w1, w2, count(*) AS c_xy FROM pairs GROUP BY 1, 2
), hist AS (
  SELECT w1, sum(c_xy) AS c_x FROM big GROUP BY 1
), v AS (SELECT count(DISTINCT w2) AS vs FROM big)
SELECT p.doc_id, count(*) AS n_pairs,
       round(sum(CAST(floor(ln((b.c_xy + 1) * 1.0 / (h.c_x + v.vs))
                            * 1000000) AS BIGINT))
             / (1000000.0 * count(*)), 4) AS mean_logprob
FROM pairs p
JOIN big b USING (w1, w2)
JOIN hist h USING (w1)
CROSS JOIN v
GROUP BY p.doc_id ORDER BY p.doc_id
""",
    tags=("llm", "text"),
    doc="Add-one-smoothed bigram LM score per document (operators/"
        "text.py:bigram_logprob_score) — mean ln P(w2|w1) with history "
        "counts and continuation-vocabulary smoothing from the corpus "
        "itself; the context-aware perplexity proxy above "
        "text_vocab_logrank. Integer-quantized per-pair contributions "
        "keep the doc mean fold-order exact.",
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import bigram_logprob_score
    d = load_table(spark, sf_dir, "documents")
    return bigram_logprob_score(d).orderBy("doc_id")


@query(
    "corpus_curation_pipeline",
    oracle=r"""
WITH t AS (
  SELECT doc_id, text, string_split_regex(lower(text), '\s+') AS toks
  FROM documents
), q AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
      round(0.4 * least(CAST(len(toks) AS DOUBLE) / 50.0, 1.0)
          + 0.3 * least(round(CAST(len(list_distinct(toks)) AS DOUBLE)
                              / len(toks), 4) * 2, 1.0)
          + 0.3 * greatest(0.0, 1.0 -
              (round(CAST(length(text) - length(regexp_replace(text,
                     '[0-9]', '', 'g')) AS DOUBLE) / length(text), 4)
             + round(CAST(length(regexp_replace(text, '[\w\s]', '', 'g'))
                     AS DOUBLE) / length(text), 4)) * 5), 4) AS quality
    FROM t)
  WHERE quality >= 0.5
), dd AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           row_number() OVER (
             PARTITION BY md5(trim(regexp_replace(regexp_replace(
               lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')))
             ORDER BY doc_id) AS rn
    FROM q)
  WHERE rn = 1
), dg AS (
  SELECT d.doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(string_split_regex(d.text, '\s+')) - 1, 1)),
    i -> concat_ws(' ', string_split_regex(d.text, '\s+')[i],
                   string_split_regex(d.text, '\s+')[i+1],
                   string_split_regex(d.text, '\s+')[i+2])))) AS gram
  FROM dd d
), bg AS (
  SELECT DISTINCT unnest(list_distinct(list_transform(
    range(1, greatest(len(string_split_regex(text, '\s+')) - 1, 1)),
    i -> concat_ws(' ', string_split_regex(text, '\s+')[i],
                   string_split_regex(text, '\s+')[i+1],
                   string_split_regex(text, '\s+')[i+2])))) AS gram
  FROM documents WHERE doc_id % 17 = 0
), contaminated AS (
  SELECT doc_id FROM dg JOIN bg USING (gram)
  GROUP BY doc_id HAVING count(DISTINCT gram) >= 3
), train AS (
  SELECT doc_id, text FROM dd
  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    AND substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= '33'
), packed AS (
  SELECT doc_id,
         len(string_split_regex(text, '\s+')) AS n_tokens,
         sum(len(string_split_regex(text, '\s+')))
           OVER (ORDER BY doc_id % 16, doc_id
                 ROWS UNBOUNDED PRECEDING) AS cum
  FROM train
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens
FROM packed WHERE cum <= 5000
ORDER BY doc_id
""",
    tags=("llm", "corpus"),
    doc="END-TO-END corpus curation capstone, every stage an already-"
        "oracle-proven operator composed into ONE lazy plan: quality "
        "gate (Gopher-style composite >= 0.5) -> exact dedup by "
        "normalized-text fingerprint (min doc_id wins) -> benchmark "
        "decontamination (>=3 shared 3-grams, benchmark = every 17th "
        "doc) -> leakage-safe holdout removal (20% by doc hash) -> "
        "token-budget packing (5000 tokens, bucket prefix sums). The "
        "oracle recomputes the whole five-stage pipeline in one SQL "
        "chain, so the hash match proves stage COMPOSITION, not just "
        "the stages.",
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.corpus import decontaminate, pack_to_token_budget
    from ..operators.sampling import holdout_split
    from ..operators.text import fingerprint, quality_score

    d = load_table(spark, sf_dir, "documents")
    q = (d.withColumn("__q", quality_score(F.col("text")))
         .filter(F.col("__q") >= 0.5))
    w = Window.partitionBy(fingerprint(F.col("text"))).orderBy("doc_id")
    # dd feeds BOTH the decontamination explode and the final keep-join;
    # no persist needed — the branches canonicalize to the same exchange
    # and ReuseExchange materializes it once (measured: persist changes
    # b15 by <2%, it only adds cache residue).
    dd = (q.withColumn("__rn", F.row_number().over(w))
          .filter(F.col("__rn") == 1).select("doc_id", "text"))
    benchmark = d.filter(F.col("doc_id") % 17 == 0).select("text")
    flags = decontaminate(dd, benchmark, n=3, min_overlap=3)
    clean = (dd.join(flags.filter(~F.col("contaminated"))
                     .select("doc_id"), "doc_id"))
    train = (holdout_split(clean, "doc_id", 51 / 256)
             .filter(F.col("split") == "train"))
    sized = train.select(
        "doc_id", F.size(F.split("text", r"\s+")).alias("n_tokens"))
    packed = pack_to_token_budget(sized, budget=5000, n_buckets=16)
    return (packed.select("doc_id", F.col("n_tokens").cast("long"))
            .orderBy("doc_id"))


@query(
    "corpus_domain_cap",
    oracle="""
WITH capped AS (
  SELECT doc_id, source FROM documents
  QUALIFY row_number() OVER (
    PARTITION BY source
    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 20
)
SELECT source, count(*) AS n_kept,
       CAST(min(doc_id) AS BIGINT) AS min_doc,
       CAST(max(doc_id) AS BIGINT) AS max_doc
FROM capped GROUP BY source ORDER BY source
""",
    tags=("llm", "sample"),
    doc="Per-source document cap (operators/sampling.py:cap_per_group) "
        "— the C4/RefinedWeb anti-domination gate: at most k docs "
        "survive per source, chosen by md5-hash order of the key so "
        "the kept subset is stable across runs, engines and "
        "partitionings (seeded sample() is engine-defined and can't "
        "oracle-check). One shuffle on the group for the ranking "
        "window; the probe aggregates the kept set per source and pins "
        "min/max kept ids so the oracle checks WHICH docs survived, "
        "not just how many.",
)
def corpus_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import cap_per_group
    d = load_table(spark, sf_dir, "documents")
    kept = cap_per_group(d, group_col="source", key_col="doc_id", k=20)
    return (kept.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_kept"),
                 F.min("doc_id").alias("min_doc"),
                 F.max("doc_id").alias("max_doc"))
            .orderBy("source"))


@query(
    "eval_classification_report",
    oracle=r"""
WITH t AS (
  SELECT doc_id, text, string_split_regex(lower(text), '\s+') AS toks,
         CAST(length(text) - length(regexp_replace(text, '[一-鿿]', '', 'g'))
              AS DOUBLE) / greatest(length(text), 1) AS cjk_ratio
  FROM documents
), scored AS (
  SELECT doc_id, cjk_ratio,
    len(list_filter(toks, x -> list_contains(__EN__, x))) AS s_en,
    len(list_filter(toks, x -> list_contains(__ES__, x))) AS s_es,
    len(list_filter(toks, x -> list_contains(__DE__, x))) AS s_de,
    len(list_filter(toks, x -> list_contains(__FR__, x))) AS s_fr
  FROM t
), pred AS (
  SELECT doc_id,
    CASE WHEN cjk_ratio > 0.3 THEN 'zh'
         WHEN s_en + s_es + s_de + s_fr = 0 THEN 'und'
         WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
         WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
         WHEN s_de >= s_fr THEN 'de'
         ELSE 'fr' END AS pred
  FROM scored
), pairs AS (
  SELECT d.lang AS truth, p.pred, count(*) AS n
  FROM documents d JOIN pred p USING (doc_id) GROUP BY 1, 2
), sup AS (
  SELECT truth AS cls, CAST(sum(n) AS BIGINT) AS support
  FROM pairs GROUP BY 1
), prd AS (
  SELECT pred AS cls, CAST(sum(n) AS BIGINT) AS predicted
  FROM pairs GROUP BY 1
), diag AS (
  SELECT truth AS cls, CAST(n AS BIGINT) AS tp
  FROM pairs WHERE truth = pred
), rep AS (
  SELECT sup.cls, sup.support,
         CAST(coalesce(diag.tp, 0) AS BIGINT) AS tp,
         CASE WHEN prd.predicted > 0
              THEN CAST(coalesce(diag.tp, 0) AS DOUBLE) / prd.predicted
         END AS precision,
         CAST(coalesce(diag.tp, 0) AS DOUBLE) / sup.support AS recall
  FROM sup LEFT JOIN prd ON sup.cls = prd.cls
           LEFT JOIN diag ON sup.cls = diag.cls
)
SELECT cls, support, tp, precision, recall,
       CASE WHEN precision + recall > 0
            THEN 2 * precision * recall / (precision + recall)
       END AS f1
FROM rep ORDER BY cls
""".replace("__EN__", _sql_list(LANG_MARKERS["en"]))
   .replace("__ES__", _sql_list(LANG_MARKERS["es"]))
   .replace("__DE__", _sql_list(LANG_MARKERS["de"]))
   .replace("__FR__", _sql_list(LANG_MARKERS["fr"])),
    tags=("llm", "eval"),
    doc="Classifier evaluation harness (operators/evaluation.py:"
        "classification_report): per-class support/tp/precision/recall/"
        "F1 of the heuristic lang-id against the corpus's ground-truth "
        "lang column. The data-sized work is ONE confusion-matrix hash "
        "agg (persisted); marginals re-aggregate the classes²-row "
        "frame. NULL-honest: a never-predicted class has NULL "
        "precision (0/0), one predicted only incorrectly has 0.0. "
        "Every ratio is one double division of exact longs.",
)
def eval_classification_report(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    from ..operators.evaluation import classification_report
    d = load_table(spark, sf_dir, "documents")
    return (classification_report(d, F.col("lang"),
                                  lang_id(F.col("text")))
            .orderBy("cls"))


@query(
    "eval_binary_auc",
    oracle="""
WITH d AS (
  SELECT CAST(label % 2 AS INTEGER) AS y,
         CAST(embedding[1] AS DOUBLE) AS s
  FROM embeddings
  WHERE label IS NOT NULL AND embedding[1] IS NOT NULL
), per_s AS (
  SELECT s, count(*) AS c, CAST(sum(y) AS BIGINT) AS p
  FROM d GROUP BY 1
), w AS (
  SELECT s, c, p,
         coalesce(sum(c) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED
                               PRECEDING AND 1 PRECEDING), 0) AS below
  FROM per_s
), agg AS (
  SELECT CAST(sum(p * (2 * below + c + 1)) AS BIGINT) AS rsum2,
         CAST(sum(p) AS BIGINT) AS np,
         CAST(sum(c) - sum(p) AS BIGINT) AS nn
  FROM w
)
SELECT np AS n_pos, nn AS n_neg,
       CASE WHEN np > 0 AND nn > 0
            THEN CAST(rsum2 - np * (np + 1) AS DOUBLE) / 2
                 / CAST(np * nn AS DOUBLE)
       END AS auc
FROM agg
""",
    tags=("llm", "eval"),
    doc="Exact ROC-AUC (operators/evaluation.py:binary_auc) of the "
        "first embedding component as a scorer for the odd-label "
        "class — Mann-Whitney rank-sum with tie-averaged ranks in "
        "DOUBLED-integer arithmetic, one final double division. The "
        "running window scans the per-DISTINCT-score table (the "
        "drift_ks bucketed-prefix-sum rule), never raw rows, so the "
        "single ordered pass is score-cardinality-bounded at 100 TB.",
)
def eval_binary_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.evaluation import binary_auc
    e = load_table(spark, sf_dir, "embeddings")
    return binary_auc(
        e, (F.col("label") % 2),
        F.element_at("embedding", 1).cast("double"))


@query(
    "eval_calibration_lift",
    oracle="""
WITH d AS (
  SELECT CAST(label % 2 AS BIGINT) AS y,
         (CAST(embedding[1] AS DOUBLE) + 1) / 2 AS s
  FROM embeddings
  WHERE label IS NOT NULL AND embedding[1] IS NOT NULL
), b AS (
  SELECT least(greatest(CAST(floor((s - 0.0) / 0.1) AS INTEGER), 0), 9)
           AS bucket,
         count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos
  FROM d GROUP BY 1
), t AS (
  SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(n_pos) AS BIGINT) AS tp
  FROM b
), c AS (
  SELECT b.*, t.tn, t.tp,
         CAST(sum(n_pos) OVER (ORDER BY bucket DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_pos
  FROM b, t
)
SELECT bucket, n, n_pos,
       CAST(n_pos AS DOUBLE) / n AS pos_rate,
       cum_pos,
       CASE WHEN tp > 0 THEN CAST(cum_pos AS DOUBLE) / tp END AS capture,
       CASE WHEN tp > 0
            THEN (CAST(n_pos AS DOUBLE) / n)
                 / (CAST(tp AS DOUBLE) / tn) END AS lift
FROM c ORDER BY bucket DESC
""",
    tags=("llm", "eval"),
    doc="Reliability + gains table (operators/evaluation.py:"
        "calibration_lift): the odd-label scorer's positive rate, "
        "cumulative capture and lift per fixed-width score decile "
        "(scores mapped to [0,1] from the first embedding component). "
        "Bucket ids are pure codegen arithmetic (no global sort, the "
        "drift_psi histogram rule); the cumulative pass windows over "
        "the 10-row bucket table; every rate is one double division "
        "of exact longs — fully oracle-checked.",
)
def eval_calibration_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.evaluation import calibration_lift
    e = load_table(spark, sf_dir, "embeddings")
    return calibration_lift(
        e, (F.col("label") % 2),
        (F.element_at("embedding", 1).cast("double") + 1) / 2,
        n_buckets=10)


@query(
    "eval_accuracy_overall",
    oracle=r"""
WITH t AS (
  SELECT doc_id, lang, string_split_regex(lower(text), '\s+') AS toks,
         CAST(length(text) - length(regexp_replace(text, '[一-鿿]', '', 'g'))
              AS DOUBLE) / greatest(length(text), 1) AS cjk_ratio
  FROM documents
), scored AS (
  SELECT doc_id, lang, cjk_ratio,
    len(list_filter(toks, x -> list_contains(__EN__, x))) AS s_en,
    len(list_filter(toks, x -> list_contains(__ES__, x))) AS s_es,
    len(list_filter(toks, x -> list_contains(__DE__, x))) AS s_de,
    len(list_filter(toks, x -> list_contains(__FR__, x))) AS s_fr
  FROM t
), pred AS (
  SELECT lang,
    CASE WHEN cjk_ratio > 0.3 THEN 'zh'
         WHEN s_en + s_es + s_de + s_fr = 0 THEN 'und'
         WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
         WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
         WHEN s_de >= s_fr THEN 'de'
         ELSE 'fr' END AS p
  FROM scored
)
SELECT count(*) AS n_total,
       CAST(sum(CASE WHEN lang = p THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       CAST(sum(CASE WHEN lang = p THEN 1 ELSE 0 END) AS DOUBLE)
         / count(*) AS accuracy
FROM pred
""".replace("__EN__", _sql_list(LANG_MARKERS["en"]))
   .replace("__ES__", _sql_list(LANG_MARKERS["es"]))
   .replace("__DE__", _sql_list(LANG_MARKERS["de"]))
   .replace("__FR__", _sql_list(LANG_MARKERS["fr"])),
    tags=("llm", "eval"),
    doc="Overall accuracy of the lang-id heuristic against ground "
        "truth — the headline number over eval_classification_report's "
        "per-class detail: exact correct/total counts in one hash agg, "
        "a single double division.",
)
def eval_accuracy_overall(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    hit = (F.col("lang") == lang_id(F.col("text"))).cast("long")
    return (d.agg(F.count(F.lit(1)).alias("n_total"),
                  F.sum(hit).alias("n_correct"),
                  (F.sum(hit).cast("double") / F.count(F.lit(1)))
                  .alias("accuracy")))


# --- agreement + ranking evaluation (round 6, fourth wave) -----------------

from ..operators.evaluation import dcg_weights, ideal_dcg_prefix

_RANK_K = 10
_DCG_W = dcg_weights(_RANK_K)
_IDCG_P = ideal_dcg_prefix(_RANK_K)
#: the literal weights are rendered ONCE (repr = shortest round-trip) and
#: shared verbatim by the Spark plan and the oracle SQL, so both engines
#: run the identical IEEE chain (evaluation.dcg_weights docstring).
_POS_SQL = ",\n         ".join(
    f"max(CASE WHEN rn = {i + 1} THEN rel END) AS r{i}"
    for i in range(_RANK_K))
_DCG_SQL = " + ".join(
    f"CAST(coalesce(r{i}, 0) AS DOUBLE) * CAST('{_DCG_W[i]!r}' AS DOUBLE)"
    for i in range(_RANK_K))
_PRE_SQL = ("[" + ", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in _IDCG_P)
            + "]")


@query(
    "eval_cohen_kappa",
    oracle="""
WITH pairs AS (
  SELECT lang AS truth,
         CASE WHEN doc_id % 7 = 0 THEN 'en' ELSE lang END AS pred,
         count(*) AS n
  FROM documents GROUP BY 1, 2
), sup AS (
  SELECT truth AS cls, CAST(sum(n) AS BIGINT) AS s FROM pairs GROUP BY 1
), prd AS (
  SELECT pred AS cls, CAST(sum(n) AS BIGINT) AS p FROM pairs GROUP BY 1
), marg AS (
  SELECT CAST(sum(coalesce(s, 0) * coalesce(p, 0)) AS BIGINT) AS pe_num
  FROM sup FULL JOIN prd USING (cls)
), base AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_total,
         CAST(sum(CASE WHEN truth = pred THEN n ELSE 0 END) AS BIGINT)
           AS n_agree
  FROM pairs
)
SELECT n_total, n_agree, pe_num,
       CASE WHEN n_total * n_total <> pe_num
            THEN CAST(n_total * n_agree - pe_num AS DOUBLE)
                 / CAST(n_total * n_total - pe_num AS DOUBLE)
       END AS kappa
FROM base, marg
""",
    tags=("llm", "eval"),
    doc="Cohen's kappa inter-annotator agreement (operators/evaluation"
        ".py:cohen_kappa) between the corpus lang labels and a "
        "deterministic noisy re-annotation (doc_id % 7 flips to 'en') "
        "— the label-audit gate of a curation pipeline. Denominators "
        "cleared so kappa = (n·diag − Σ s_c·p_c)/(n² − Σ s_c·p_c) is "
        "ONE double division of exact longs; the data-sized work is a "
        "single confusion-matrix hash agg.",
)
def eval_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.evaluation import cohen_kappa
    d = load_table(spark, sf_dir, "documents")
    noisy = F.when(F.col("doc_id") % 7 == 0,
                   F.lit("en")).otherwise(F.col("lang"))
    return cohen_kappa(d, F.col("lang"), noisy)


@query(
    "eval_ranking_ndcg",
    oracle=f"""
WITH d AS (
  SELECT label AS q, CAST(embedding[1] AS DOUBLE) AS s,
         CASE WHEN vec_id % 3 = 0 THEN 1 ELSE 0 END AS rel,
         vec_id AS t
  FROM embeddings
  WHERE label IS NOT NULL AND embedding[1] IS NOT NULL
), r AS (
  SELECT *, row_number() OVER (PARTITION BY q ORDER BY s DESC, t) AS rn
  FROM d
), g AS (
  SELECT q, count(*) AS n_items, CAST(sum(rel) AS BIGINT) AS n_rel,
         CAST(coalesce(sum(CASE WHEN rn <= {_RANK_K} THEN rel END), 0)
              AS BIGINT) AS hits_at_k,
         min(CASE WHEN rel = 1 THEN rn END) AS fr,
         {_POS_SQL}
  FROM r GROUP BY q
)
SELECT q, n_items, n_rel, hits_at_k,
       CAST(hits_at_k AS DOUBLE) / {_RANK_K} AS precision_at_k,
       CASE WHEN n_rel > 0 THEN CAST(hits_at_k AS DOUBLE) / n_rel
       END AS recall_at_k,
       CASE WHEN fr IS NOT NULL THEN CAST(1 AS DOUBLE) / fr END AS rr,
       {_DCG_SQL} AS dcg_at_k,
       CASE WHEN n_rel > 0
            THEN ({_DCG_SQL}) / ({_PRE_SQL}[least(n_rel, {_RANK_K})])
       END AS ndcg_at_k
FROM g ORDER BY q
""",
    tags=("llm", "eval"),
    doc="Per-query ranking metrics (operators/evaluation.py:"
        "ranking_metrics): hits/precision/recall@10, reciprocal rank, "
        "DCG@10 and NDCG@10 of the first-embedding-component scorer "
        "against vec_id%3 relevance, one row per label-query. One "
        "row_number window (single shuffle); DCG is a literal-weighted "
        "left-assoc sum of the k per-position relevance bits extracted "
        "by conditional MAXes — never a partition-order-dependent "
        "double SUM — so every float is a fixed IEEE chain over "
        "literals shared with the oracle, and a perfect ranking is "
        "exactly 1.0.",
)
def eval_ranking_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.evaluation import ranking_metrics
    e = load_table(spark, sf_dir, "embeddings")
    out = ranking_metrics(
        e.filter(F.col("label").isNotNull()),
        F.col("label"),
        F.element_at("embedding", 1).cast("double"),
        (F.col("vec_id") % 3 == 0),
        F.col("vec_id"),
        k=_RANK_K)
    return out.orderBy("q")


@query(
    "bpe_learn_merges",
    # rows-only by design: BPE learning is an iterative argmax loop no
    # SQL oracle can replay; tests/test_llmdata.py::TestBpe pins the
    # ENTIRE merge table (and the tokenization of every word) to exact
    # equality with a from-scratch Python reference implementation.
    tags=("llm", "text", "bpe"),
    doc="Distributed BPE merge learning (operators/bpe.py:"
        "learn_bpe_merges, Sennrich et al. 2016): 24 merges over the "
        "document corpus. Per iteration one hash agg over the "
        "DISTINCT-word table's adjacent symbol pairs (Heaps-law "
        "bounded — the corpus is scanned exactly once, for the initial "
        "word-frequency table) + a 1-row argmax with a total "
        "tie-break, then a pure-codegen array fold applies the merge; "
        "per-round localCheckpoint keeps lineage flat. Returns the "
        "learned (rank, left, right, pair_count) table.",
)
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import learn_bpe_merges
    d = load_table(spark, sf_dir, "documents")
    merges = learn_bpe_merges(d, "text", num_merges=24)
    rows = [(i + 1, a, b, n) for i, (a, b, n) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank: int, left: string, right: string, pair_count: long")


@query(
    "bpe_token_stats",
    # rows-only: tokenization depends on the learned merge table above.
    tags=("llm", "text", "bpe"),
    doc="BPE tokenization (operators/bpe.py:apply_bpe) with the corpus-"
        "learned merge table: per-language token totals and "
        "chars-per-token compression ratio. The encode is ONE lazy "
        "shuffle-free plan — per word a char+EOW fold through the "
        "merges in learned order, all JVM-side higher-order "
        "expressions, no UDF.",
)
def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import apply_bpe, learn_bpe_merges
    from ..operators.text import ensure_fanout_parallelism
    d = load_table(spark, sf_dir, "documents")
    merges = learn_bpe_merges(d, "text", num_merges=24)
    # Fan-out guard before the fold encode: 24 nested interpreted
    # merge folds per word are the heaviest per-row expression work in
    # the registry, and the one-partition documents scan serialized
    # all of it on a single task (measured 39 s -> ~3 s at sf0.1).
    # apply_bpe itself keeps its shuffle-free contract for callers
    # whose input is already parallel.
    enc = apply_bpe(ensure_fanout_parallelism(d), "text", merges)
    return (enc.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.size("bpe_tokens")).cast("long")
                 .alias("n_tokens"),
                 (F.sum(F.length("text")).cast("double")
                  / F.sum(F.size("bpe_tokens")))
                 .alias("chars_per_token"))
            .orderBy("lang"))


@query(
    "multimodal_phash_neardup",
    # rows-only by design: the DCT coefficients behind the fingerprint
    # are float math no SQL oracle reproduces; tests/test_llmdata.py::
    # TestPerceptualHash pins determinism, identical->0-distance,
    # near-copy small distance, unrelated large distance, and that the
    # corpus pipeline's pair set equals the planted exact-duplicate set.
    tags=("llm", "multimodal", "dedup"),
    doc="Image near-duplicate detection (operators/multimodal.py:"
        "perceptual_hash_images + phash_neardup_pairs): documents "
        "render to REAL 24bpp BMPs (md5-keyed pixels, so planted text "
        "dups become image dups), decode through the quarantining "
        "mapInPandas path, fingerprint with the standard DCT pHash, "
        "and pair up via 4×16-bit band equi-join + exact hamming64 "
        "recheck — the TEXT near-dup scale shape (ids-only banding, "
        "never all-pairs) applied unchanged to an image corpus.",
)
def multimodal_phash_neardup(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    from ..operators.multimodal import (perceptual_hash_images,
                                        phash_neardup_pairs,
                                        synthesize_bmp_assets)
    d = load_table(spark, sf_dir, "documents")
    # plant image duplicates: every 25th document re-enters under a
    # shifted id, so the expected pair set is (doc_id, doc_id+100000)
    # for doc_id % 25 == 0 — the crash-overlap re-ingest scenario on an
    # image corpus
    planted = (d.filter(F.col("doc_id") % 25 == 0)
               .withColumn("doc_id", F.col("doc_id") + 100000))
    assets = synthesize_bmp_assets(d.unionByName(planted))
    hashes = perceptual_hash_images(assets)
    return (phash_neardup_pairs(hashes, max_distance=3)
            .orderBy("id_a", "id_b"))


@query(
    "corpus_nutrition_label",
    oracle=r"""
WITH t AS (
  SELECT source, lang, n_chars, text,
         len(list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '')) AS n_tokens,
         count(*) OVER (PARTITION BY text) AS n_copies
  FROM documents
), flagged AS (
  SELECT source, lang, n_chars, n_tokens,
         CASE WHEN n_copies > 1 THEN 1 ELSE 0 END AS is_dup,
         CASE WHEN n_chars >= 50 AND n_tokens >= 5
              THEN 1 ELSE 0 END AS passes
  FROM t
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(is_dup) AS BIGINT) AS n_dup_docs,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
       CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avg_tokens,
       CAST(sum(passes) AS DOUBLE) / count(*) AS pass_rate
FROM flagged GROUP BY source ORDER BY source
""",
    tags=("llm", "capstone", "quality"),
    doc="Corpus nutrition label — the fourth whole-chain capstone: "
        "per-source dataset documentation (Gebru et al. datasheets) "
        "computed as ONE lazy plan — exact-dup exposure (count window "
        "over text), language diversity, token/char volumes and a "
        "quality pass rate — with the oracle recomputing the ENTIRE "
        "chain. Two shuffles total (text-key window + source agg); "
        "every ratio is one double division of exact longs. This is "
        "the report a 100 TB ingest publishes per increment so "
        "training-mix decisions cite measured composition, not "
        "folklore.",
)
def corpus_nutrition_label(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.filter(F.split(F.lower(F.col("text")), r"\s+"),
                           lambda x: x != ""))
    n_copies = F.count(F.lit(1)).over(Window.partitionBy("text"))
    flagged = (d.withColumn("n_tokens", toks)
               .withColumn("is_dup", (n_copies > 1).cast("int"))
               .withColumn("passes",
                           ((F.col("n_chars") >= 50)
                            & (F.col("n_tokens") >= 5)).cast("int")))
    return (flagged.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("is_dup").cast("long").alias("n_dup_docs"),
                 F.countDistinct("lang").cast("long").alias("n_langs"),
                 F.sum("n_chars").cast("long").alias("total_chars"),
                 F.sum("n_tokens").cast("long").alias("total_tokens"),
                 (F.sum("n_chars").cast("double")
                  / F.count(F.lit(1))).alias("avg_chars"),
                 (F.sum("n_tokens").cast("double")
                  / F.count(F.lit(1))).alias("avg_tokens"),
                 (F.sum("passes").cast("double")
                  / F.count(F.lit(1))).alias("pass_rate"))
            .orderBy("source"))


@query(
    "ann_pq",
    # rows-only: k-means codebooks are float-iterative (the IVF/BRP
    # evidence contract); recall vs brute force + exact-rerank-score
    # equality are pytest-pinned (TestPqAnn).
    tags=("llm", "similarity", "ann"),
    doc="Product-quantization ANN (operators/similarity.py:pq_index/"
        "pq_ann, Jégou et al. 2011): 64-dim vectors compress to 8 "
        "4-bit codes (32× memory), the asymmetric-distance scan "
        "approximates inner products from a broadcast (sub, code) "
        "lookup joined against the CODES table — corpus floats are "
        "touched only to re-rank refine·k candidates per probe with "
        "exact cosine. The compressed-exhaustive-scan member of the "
        "ANN family (compose with ivf_ann's cells for FAISS IVFPQ).",
)
def ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import pq_ann
    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 10)
    return (pq_ann(e, probes, k=10, refine=4)
            .orderBy("probe_id", "rank"))


@query(
    "ann_ivfpq",
    # rows-only: doubly float-iterative (coarse + fine k-means); recall
    # and routing-boundedness pytest-pinned (TestIvfPqAnn).
    tags=("llm", "similarity", "ann"),
    doc="IVF+PQ composed ANN (operators/similarity.py:ivfpq_ann) — the "
        "FAISS IVFPQ shape: coarse cells bound WHICH vectors are "
        "scanned (n_probe/n_cells of the corpus), PQ codes bound the "
        "BYTES per scanned vector (32×), exact cosine re-ranks "
        "refine·k finalists. Cell routing joins BEFORE the code join, "
        "so the ADC aggregate only sees routed candidates — the "
        "configuration that scans 100 TB of embeddings.",
)
def ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivfpq_ann
    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 10)
    return (ivfpq_ann(e, probes, k=10, n_cells=8, n_probe=4, refine=4)
            .orderBy("probe_id", "rank"))


@query(
    "sample_diverse_selection",
    # rows-only: the coarse quantizer is float-iterative k-means (the
    # IVF evidence contract); coverage/quality properties pytest-pinned.
    tags=("llm", "sample", "similarity"),
    doc="Diversity-aware training-data selection (operators/sampling"
        ".py:select_diverse_topk): the 2 highest-quality vectors "
        "(label-derived quality score, vec_id tie-break) per k-means "
        "cell of embedding space — the one-plan cluster-coverage "
        "relaxation of greedy submodular selection (MMR/facility "
        "location are driver-sequential; this is a quantizer + ONE "
        "ranking window). Near-identical embeddings share a cell and "
        "compete for its slots, so redundancy is capped while the "
        "budget goes to the best example of each mode.",
)
def sample_diverse_selection(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    from ..operators.sampling import select_diverse_topk
    e = (load_table(spark, sf_dir, "embeddings")
         .withColumn("quality",
                     ((F.col("vec_id") * 37 + 11) % 100)
                     .cast("double")))
    out = select_diverse_topk(e, "embedding", "quality", "vec_id",
                              per_cell=2, n_cells=16)
    return (out.select("cell", "vec_id", "quality")
            .orderBy("cell", F.desc("quality"), "vec_id"))


@query(
    "multimodal_audio_neardup",
    # rows-only: the fingerprint rides Python-side PCM decode; metric/
    # invariance/quarantine properties pytest-pinned
    # (TestAudioFingerprint), and the planted duplicates are all found
    # at hamming 0 (TestAudioFingerprint pipeline test) — additional
    # pairs are near-frequency tones, i.e. real near-dups.
    tags=("llm", "multimodal", "dedup"),
    doc="Audio near-duplicate detection (operators/multimodal.py:"
        "audio_fingerprints + the banded hamming join from "
        "phash_neardup_pairs): documents render to REAL 16-bit WAV "
        "tones (md5-derived frequencies — identical texts, identical "
        "audio), decode through the quarantining mapInPandas path, "
        "fingerprint by exact-integer frame-energy delta signs "
        "(amplitude-invariant, Shazam-family), and pair via the SAME "
        "4×16-bit band machinery as images — one dedup stack across "
        "text, image and audio modalities.",
)
def multimodal_audio_neardup(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    from ..operators.multimodal import (audio_fingerprints,
                                        phash_neardup_pairs,
                                        synthesize_wav_assets)
    d = load_table(spark, sf_dir, "documents")
    planted = (d.filter(F.col("doc_id") % 25 == 0)
               .withColumn("doc_id", F.col("doc_id") + 100000))
    assets = synthesize_wav_assets(d.unionByName(planted))
    fp = (audio_fingerprints(assets)
          .withColumnRenamed("afp", "phash"))
    return (phash_neardup_pairs(fp, max_distance=3)
            .orderBy("id_a", "id_b"))


@query(
    "neardup_containment",
    oracle=r"""
WITH sh AS (
  SELECT doc_id, list_distinct(list_transform(
           range(1, greatest(len(toks) - 2, 0) + 1),
           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS s
  FROM (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'),
                           x -> x <> '') AS toks
        FROM documents
        UNION ALL
        SELECT doc_id + 200000,
               list_filter(string_split_regex(lower(
                 concat(text, ' appended commentary about the source',
                        ' document and its provenance notes')), '\s+'),
                           x -> x <> '') AS toks
        FROM documents WHERE doc_id % 40 = 0)
)
SELECT a.doc_id AS id_small, b.doc_id AS id_big,
       CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s)
         AS containment
FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
WHERE len(a.s) <= len(b.s)
  AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s) >= 0.9
ORDER BY id_small, id_big
""",
    tags=("llm", "dedup"),
    doc="Jaccard-containment near-dup pairs (operators/dedup.py:"
        "containment_pairs): every 40th document re-enters wrapped "
        "with appended commentary — symmetric Jaccard dilutes below "
        "threshold as the wrapper grows, containment |A∩B|/|A| stays "
        "1.0 for the swallowed original. Candidates via single-shingle "
        "equi-join (ids-only through the shuffle), exact intersection "
        "recheck; the oracle recomputes the full pipeline from "
        "3-gram shingles. Output keeps the smaller set first "
        "(asymmetric by design).",
)
def neardup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import containment_pairs
    d = load_table(spark, sf_dir, "documents")
    wrapped = (d.filter(F.col("doc_id") % 40 == 0)
               .withColumn("doc_id", F.col("doc_id") + 200000)
               .withColumn("text", F.concat(
                   F.col("text"),
                   F.lit(" appended commentary about the source"
                         " document and its provenance notes"))))
    sh = with_word_shingles(d.unionByName(wrapped), "text", n=3)
    return (containment_pairs(sh, "doc_id", "shingles", threshold=0.9)
            .orderBy("id_small", "id_big"))


@query(
    "corpus_chunk_sentences",
    # r10 oracle upgrade (verdict task 5): the greedy packing fold
    # replays on sentence TOKEN COUNTS (the emitted stats never need
    # the chunk text, and counts make the fold pure integers) as a
    # RECURSIVE CTE — the holt_linear oracle pattern. NOT list_reduce:
    # DuckDB 1.0.0's list_reduce corrupts cross-field struct reads
    # from the second step on (probed: {'x': a.x+10, 'y': a.x} yields
    # y == x after 2+ steps), so struct-state folds must recurse.
    # The sentence split emulates Spark's lookbehind `(?<=[.!?])\s+`
    # (RE2 has no lookbehind) by rewriting '([.!?])\s+' to a chr(31)
    # sentinel — the corpus is printable-ASCII.
    oracle=r"""
WITH RECURSIVE d AS (
  SELECT doc_id, source,
         list_transform(
           list_filter(
             string_split(regexp_replace(text, '([.!?])\s+',
                                         '\1' || chr(31), 'g'), chr(31)),
             s -> s != ''),
           s -> len(list_filter(string_split_regex(s, '\s+'),
                                x -> x != ''))) AS cnts
  FROM documents
), r AS (
  SELECT doc_id, source, cnts, 0 AS i, 0 AS chunks, 0 AS cur, 0 AS mx,
         0 AS tot
  FROM d WHERE len(cnts) > 0
  UNION ALL
  SELECT doc_id, source, cnts, i + 1,
         CASE WHEN cur + cnts[i+1] <= 64 OR cur = 0
              THEN chunks ELSE chunks + 1 END,
         CASE WHEN cur + cnts[i+1] <= 64 OR cur = 0
              THEN cur + cnts[i+1] ELSE cnts[i+1] END,
         CASE WHEN cur + cnts[i+1] <= 64 OR cur = 0
              THEN mx ELSE greatest(mx, cur) END,
         tot + cnts[i+1]
  FROM r WHERE i < len(cnts)
), fin AS (
  SELECT source,
         chunks + CASE WHEN cur > 0 THEN 1 ELSE 0 END AS n_chunks,
         tot, greatest(mx, cur) AS mx
  FROM r WHERE i = len(cnts)
)
SELECT source, CAST(sum(n_chunks) AS BIGINT) AS n_chunks,
       CAST(sum(tot) AS BIGINT) AS total_tokens,
       CAST(max(mx) AS INTEGER) AS max_chunk_tokens
FROM fin GROUP BY 1 ORDER BY source
""",
    tags=("llm", "corpus"),
    doc="Boundary-respecting chunking (operators/corpus.py:"
        "chunk_sentences): sentences pack greedily into ≤64-token "
        "chunks, never split mid-sentence — the retrieval-friendly "
        "complement to corpus_chunk_text's fixed windows. One "
        "pure-codegen struct fold per document (no UDF), posexplode "
        "fan-out; per-source chunk statistics returned.",
)
def corpus_chunk_sentences(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    from ..operators.corpus import chunk_sentences
    d = load_table(spark, sf_dir, "documents")
    ch = chunk_sentences(d, max_tokens=64)
    return (ch.join(d.select("doc_id", "source"), "doc_id")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_chunks"),
                 F.sum("n_tokens").cast("long").alias("total_tokens"),
                 F.max("n_tokens").alias("max_chunk_tokens"))
            .orderBy("source"))


def _matryoshka_dim_sql(d: int) -> str:
    return f"""
  SELECT {d} AS dim, t.probe_id, t.vec_id
  FROM (
    SELECT probe_id, vec_id,
           row_number() OVER (PARTITION BY probe_id
                              ORDER BY cosine DESC, vec_id) AS rank
    FROM (
      SELECT p.vec_id AS probe_id, c.vec_id,
             round(list_dot_product(p.pv[1:{d}], c.cv[1:{d}])
                   / (sqrt(list_dot_product(p.pv[1:{d}], p.pv[1:{d}]))
                      * sqrt(list_dot_product(c.cv[1:{d}],
                                              c.cv[1:{d}]))), 6)
               AS cosine
      FROM p, c WHERE p.vec_id <> c.vec_id
    )
  ) t WHERE t.rank <= 10
"""


@query(
    "eval_matryoshka_truncation",
    oracle="""
WITH p AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS pv
  FROM embeddings WHERE vec_id < 10
), c AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings
), topk AS (
""" + "  UNION ALL".join(_matryoshka_dim_sql(d)
                         for d in (8, 16, 32, 64)) + """
), full_k AS (
  SELECT probe_id, vec_id FROM topk WHERE dim = 64
), ov AS (
  SELECT t.dim, t.probe_id, count(*) AS n_common
  FROM topk t JOIN full_k f
    ON t.probe_id = f.probe_id AND t.vec_id = f.vec_id
  WHERE t.dim < 64
  GROUP BY 1, 2
)
SELECT dim, count(*) AS n_probes,
       CAST(sum(n_common) AS DOUBLE) / (10 * count(*))
         AS mean_overlap_at_10,
       CAST(min(n_common) AS BIGINT) AS min_overlap,
       CAST(max(n_common) AS BIGINT) AS max_overlap
FROM ov GROUP BY dim ORDER BY dim
""",
    tags=("llm", "eval", "similarity"),
    doc="Matryoshka truncation evaluation (composition of "
        "operators/similarity.py:cosine_topk over embedding prefixes): "
        "top-10 retrieval overlap of 8/16/32-dim prefixes against the "
        "full 64-dim ranking — the measurement behind "
        "truncatable-embedding serving decisions (how much recall does "
        "a 4× cheaper index cost?). Deterministic: rounded cosines "
        "with vec_id tie-breaks make every top-k set exact, overlaps "
        "are integer counts, the mean is one double division. A dim "
        "whose EVERY probe has zero overlap emits no row (the "
        "oracle's inner join drops it; the n_probes > 0 filter "
        "mirrors that exactly — first exercised at sf0.1, where the "
        "8-dim prefix shares no top-10 with the full ranking for any "
        "probe).",
)
def eval_matryoshka_truncation(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 10)

    def topk_at(d: int):
        trunc = F.slice("embedding", 1, d)
        return cosine_topk(e.withColumn("embedding", trunc),
                           probes.withColumn("embedding", trunc),
                           k=10).select("probe_id", "vec_id")

    full = topk_at(64)
    out = None
    for d in (8, 16, 32):
        ov = (topk_at(d).join(full, ["probe_id", "vec_id"])
              .groupBy("probe_id")
              .agg(F.count(F.lit(1)).alias("n_common"))
              .agg(F.lit(d).alias("dim"),
                   F.count(F.lit(1)).alias("n_probes"),
                   (F.sum("n_common").cast("double")
                    / (10 * F.count(F.lit(1))))
                   .alias("mean_overlap_at_10"),
                   F.min("n_common").cast("long").alias("min_overlap"),
                   F.max("n_common").cast("long").alias("max_overlap")))
        out = ov if out is None else out.unionByName(ov)
    # The oracle's ov CTE inner-joins then groups, so a dim where NO
    # probe overlaps contributes no row at all; the global agg above
    # instead emits one (n_probes=0, NULL stats) row on empty input.
    # Dropping it here makes the two shapes identical at every scale.
    return out.filter(F.col("n_probes") > 0).orderBy("dim")


@query(
    "neardup_semantic_dedup",
    oracle="""
WITH c AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
         + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
         + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
         + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END)
         + (CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END)
         + (CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END) AS cell
  FROM embeddings
), drops AS (
  SELECT DISTINCT a.vec_id
  FROM c a JOIN c b ON a.cell = b.cell AND b.vec_id < a.vec_id
  WHERE round(list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.4
)
SELECT e.vec_id, e.label
FROM embeddings e
WHERE e.vec_id NOT IN (SELECT vec_id FROM drops)
ORDER BY e.vec_id
""",
    tags=("llm", "similarity", "dedup"),
    doc="SemDeDup semantic near-dup removal (operators/similarity.py:"
        "semantic_dedup, arXiv:2303.09540): sign-cell coarse clusters "
        "(deterministic, engine-neutral — the oracle recomputes the "
        "identical partition, unlike k-means centroids), within-cell "
        "cosine pairs from ONE cell equi-join (corpus/2^bits expected "
        "per cell, never all-pairs), greedy keep-first-by-id as an "
        "anti-join — no connected components needed since keep-first "
        "is order-free. Threshold 0.4 exercises both branches on the "
        "synthetic corpus (max within-cell cosine ≈ 0.51); production "
        "thresholds (0.9+) are a parameter, not a code path.",
)
def neardup_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import semantic_dedup
    e = load_table(spark, sf_dir, "embeddings")
    kept = semantic_dedup(e, threshold=0.4, bits=6)
    return kept.select("vec_id", "label").orderBy("vec_id")


@query(
    "feature_hash_trick",
    oracle=r"""
WITH f AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
  FROM documents WHERE doc_id < 100
), h AS (
  SELECT doc_id, md5(tok) AS hx FROM f WHERE tok <> ''
), d AS (
  SELECT doc_id,
         CASE WHEN ascii(substr(hx, 1, 1)) >= 97
              THEN ascii(substr(hx, 1, 1)) - 87
              ELSE ascii(substr(hx, 1, 1)) - 48 END AS d1,
         CASE WHEN ascii(substr(hx, 2, 1)) >= 97
              THEN ascii(substr(hx, 2, 1)) - 87
              ELSE ascii(substr(hx, 2, 1)) - 48 END AS d2,
         CASE WHEN ascii(substr(hx, 3, 1)) >= 97
              THEN ascii(substr(hx, 3, 1)) - 87
              ELSE ascii(substr(hx, 3, 1)) - 48 END AS d3
  FROM h
), w AS (
  SELECT doc_id, (d1 * 16 + d2) % 64 AS bucket,
         CAST(sum(CASE WHEN d3 % 2 = 1 THEN 1 ELSE -1 END) AS BIGINT)
           AS weight
  FROM d GROUP BY 1, 2
)
SELECT doc_id, bucket, weight FROM w WHERE weight <> 0
ORDER BY doc_id, bucket
""",
    tags=("llm", "features"),
    doc="Hashing-trick featurization (operators/features.py:"
        "hash_features, Weinberger et al. 2009): whitespace tokens "
        "hash into a fixed 64-bucket signed bag-of-words — no "
        "vocabulary pass, no OOV, collisions cancel in expectation "
        "via the ± sign hash. The portable ascii-arithmetic md5 "
        "family (the bloom-index rule) makes the ENTIRE feature "
        "matrix an exact cross-engine expression: the oracle "
        "recomputes identical buckets, signs, and weights. One "
        "explode + one map-side-combined hash agg; only (id, bucket, "
        "partial) triples shuffle.",
)
def feature_hash_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.features import hash_features
    d = (load_table(spark, sf_dir, "documents")
         .filter(F.col("doc_id") < 100))
    return (hash_features(d, "doc_id", "text", n_buckets=64)
            .orderBy("doc_id", "bucket"))


@query(
    "text_naive_bayes_confusion",
    oracle=r"""
WITH docs AS (
  SELECT doc_id, lang, lower(text) AS t,
         substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '80' AS is_test
  FROM documents
), trtok AS (
  SELECT lang, unnest(string_split_regex(t, '\s+')) AS tok
  FROM docs WHERE NOT is_test
), trtok2 AS (
  SELECT * FROM trtok WHERE tok <> ''
), ctc AS (
  SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
  FROM trtok2 GROUP BY 1, 2
), cc AS (
  SELECT lang, CAST(sum(c) AS BIGINT) AS tot FROM ctc GROUP BY 1
), v AS (
  SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vs FROM trtok2
), pri AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS nd
  FROM docs WHERE NOT is_test GROUP BY 1
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM docs WHERE NOT is_test
), cls AS (
  SELECT cc.lang AS cand,
         CAST(floor(ln(1.0 / CAST(cc.tot + v.vs AS DOUBLE)) * 1000000)
              AS BIGINT) AS oov,
         CAST(floor(ln(CAST(pri.nd AS DOUBLE) / CAST(nn.n AS DOUBLE))
                    * 1000000) AS BIGINT) AS prior
  FROM cc, v, pri, nn WHERE cc.lang = pri.lang
), probs AS (
  SELECT ctc.lang AS cand, ctc.tok,
         CAST(floor(ln(CAST(ctc.c + 1 AS DOUBLE)
                       / CAST(cc.tot + v.vs AS DOUBLE)) * 1000000)
              AS BIGINT) AS term
  FROM ctc, cc, v WHERE ctc.lang = cc.lang
), tetok AS (
  SELECT doc_id, lang AS true_lang,
         unnest(string_split_regex(t, '\s+')) AS tok
  FROM docs WHERE is_test
), tetok2 AS (
  SELECT * FROM tetok WHERE tok <> ''
), scored AS (
  SELECT te.doc_id, te.true_lang, c.cand,
         max(c.prior) + sum(coalesce(p.term, c.oov)) AS score
  FROM tetok2 te CROSS JOIN cls c
  LEFT JOIN probs p ON p.cand = c.cand AND p.tok = te.tok
  GROUP BY 1, 2, 3
), pred AS (
  SELECT doc_id, true_lang, cand AS pred_lang,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, cand) AS rn
  FROM scored
)
SELECT true_lang AS lang, pred_lang, CAST(count(*) AS BIGINT) AS n
FROM pred WHERE rn = 1
GROUP BY 1, 2 ORDER BY lang, pred_lang
""",
    tags=("llm", "text", "evaluation"),
    doc="Multinomial Naive Bayes language classifier "
        "(operators/text.py:naive_bayes_classify): trained on the "
        "md5-split train half, applied to the held-out half, reported "
        "as a confusion matrix — train + predict + eval in ONE lazy "
        "plan, whole chain recomputed by the oracle. Add-one smoothed "
        "log P(token|class), per-class OOV mass, and log priors all "
        "quantize to the floor(ln·10^6) integer grid (the "
        "bigram_logprob rule), so document scores are exact long sums "
        "and the argmax can never sit on a float boundary. The "
        "probability table is vocab×classes (broadcast); test tokens "
        "cross-join only the |classes|-row constant table. (The "
        "synthetic corpus's lang labels are uncorrelated with its "
        "text, so the matrix is diffuse by design — separability is "
        "pytest-pinned on a constructed corpus.)",
)
def text_naive_bayes_confusion(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    from ..operators.sampling import hash_bucket
    from ..operators.text import naive_bayes_classify
    d = load_table(spark, sf_dir, "documents")
    is_test = hash_bucket(F.col("doc_id")) < F.lit("80")
    train = d.filter(~is_test)
    test = d.filter(is_test)
    out = naive_bayes_classify(train, test, "doc_id", "text", "lang")
    return (out.groupBy(F.col("lang"),
                        F.col("pred_label").alias("pred_lang"))
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("lang", "pred_lang"))


@query(
    "corpus_split_leakage",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents
), g AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(t) - 1, 1)),
    i -> concat_ws(' ', t[i], t[i+1], t[i+2])))) AS gram
  FROM toks
), pairs AS (
  SELECT h.doc_id AS hid, tr.doc_id AS tid,
         CAST(count(*) AS BIGINT) AS ov
  FROM (SELECT * FROM g WHERE doc_id % 5 = 0) h
  JOIN (SELECT * FROM g WHERE doc_id % 5 <> 0) tr USING (gram)
  GROUP BY 1, 2
), lk AS (
  SELECT hid, CAST(count(*) AS BIGINT) AS n_leaky_train_docs,
         max(ov) AS max_overlap
  FROM pairs WHERE ov >= 3 GROUP BY 1
)
SELECT d.doc_id,
       coalesce(lk.n_leaky_train_docs, 0) AS n_leaky_train_docs,
       coalesce(lk.max_overlap, 0) AS max_overlap,
       lk.n_leaky_train_docs IS NOT NULL AS leaked
FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
LEFT JOIN lk ON d.doc_id = lk.hid
ORDER BY doc_id
""",
    tags=("llm", "corpus"),
    doc="Cross-split contamination audit (operators/corpus.py:"
        "split_leakage): every 5th document is the holdout split; for "
        "each holdout doc, count training docs sharing >=3 distinct "
        "word 3-grams. Ids-only gram equi-join, one (holdout, train) "
        "hash agg, left join keeps zero-leak docs; the max_gram_df "
        "hot-gram cap (exercised in pytest) bounds the join fan-out "
        "at corpus scale.",
)
def corpus_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import split_leakage
    d = load_table(spark, sf_dir, "documents")
    holdout = d.filter(F.col("doc_id") % 5 == 0)
    train = d.filter(F.col("doc_id") % 5 != 0)
    return (split_leakage(train, holdout, n=3, min_overlap=3)
            .orderBy("doc_id"))


@query(
    "corpus_mixture_plan",
    oracle="""
WITH per AS (
  SELECT source,
         CAST(sum(CAST(n_chars AS DECIMAL(38,0))) AS DOUBLE) AS available,
         CASE source WHEN 'src0' THEN CAST(0.5 AS DOUBLE)
                     WHEN 'src1' THEN CAST(0.25 AS DOUBLE)
                     WHEN 'src2' THEN CAST(0.125 AS DOUBLE)
                     WHEN 'src3' THEN CAST(0.125 AS DOUBLE)
                     ELSE CAST(0.0 AS DOUBLE) END AS weight
  FROM documents GROUP BY 1
), cap AS (
  SELECT min(available / weight) AS c FROM per WHERE weight > 0
)
SELECT source, CAST(available AS BIGINT) AS available,
       round(weight, 6) AS weight,
       CAST(floor(weight * c) AS BIGINT) AS take_tokens,
       round(CAST(floor(weight * c) AS DOUBLE) / available, 6)
         AS sample_rate,
       weight > 0 AND available / weight = c AS binding
FROM per, cap ORDER BY source
""",
    tags=("llm", "corpus"),
    doc="Training-mixture planning (operators/corpus.py:mixture_plan): "
        "target weights 1/2:1/4:1/8:1/8 over four sources (binary-exact "
        "literals), zero for the rest; the plan reports the largest "
        "no-upsampling budget (min available_i/w_i), per-source take "
        "(floor(w·budget)), sample rate and the binding source. One "
        "hash agg to a per-source row, 1-row min-capacity rollup "
        "broadcast back. The oracle recomputes the identical plan.",
)
def corpus_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import mixture_plan
    d = load_table(spark, sf_dir, "documents")
    return (mixture_plan(d, "source", "n_chars",
                         {"src0": 0.5, "src1": 0.25,
                          "src2": 0.125, "src3": 0.125})
            .orderBy("source"))


@query(
    "corpus_segment_dedup",
    oracle=r"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
  FROM documents
), segs AS (
  SELECT doc_id, CAST(t.i AS INTEGER) AS seg_idx,
         array_to_string(list_slice(ws, t.i * 20 + 1, t.i * 20 + 20), ' ')
           AS seg
  FROM w, UNNEST(generate_series(
           0, CAST(ceil(len(ws) / 20.0) AS BIGINT) - 1)) AS t(i)
), flagged AS (
  SELECT doc_id, seg_idx, seg,
         (row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) = 1)
           AS keep
  FROM segs
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_segments,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       coalesce(string_agg(CASE WHEN keep THEN seg END, ' '
                           ORDER BY seg_idx), '') AS text_kept
FROM flagged GROUP BY doc_id ORDER BY doc_id
""",
    tags=("llm", "dedup"),
    doc="Global segment-level exact dedup with document reassembly "
        "(operators/corpus.py:segment_dedup — the CCNet/C4 line-dedup "
        "shape, Wenzek et al. '19): fixed 20-word blocks, corpus-wide "
        "keep-first by (doc_id, seg_idx), survivors stitched back in "
        "order. One segment-keyed window shuffle + one doc-keyed "
        "reassembly aggregate; per-doc arrays bounded by doc length, "
        "never doc x doc.",
)
def corpus_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import segment_dedup
    d = load_table(spark, sf_dir, "documents")
    return segment_dedup(d, n_words=20).orderBy("doc_id")


@query(
    "corpus_curriculum_order",
    oracle="""
WITH ext AS (
  SELECT CAST(min(n_chars) AS DOUBLE) AS lo,
         CAST(max(n_chars) AS DOUBLE) AS hi
  FROM documents
), staged AS (
  SELECT doc_id,
         CASE WHEN hi = lo THEN 1
              ELSE least(CAST(floor((CAST(n_chars AS DOUBLE) - lo)
                                    / ((hi - lo) / 10.0)) AS INTEGER),
                         9) + 1
         END AS stage
  FROM documents CROSS JOIN ext
), pos AS (
  SELECT doc_id, stage,
         CAST(row_number() OVER (PARTITION BY stage ORDER BY doc_id)
              AS INTEGER) AS stage_pos
  FROM staged
)
SELECT doc_id, stage, stage_pos,
       CAST(stage_pos - 1 AS BIGINT) * 10 + stage AS curriculum_pos
FROM pos ORDER BY curriculum_pos
""",
    tags=("llm", "sampling"),
    doc="Deterministic curriculum ordering (operators/corpus.py:"
        "curriculum_order, Bengio et al. '09 interleaved schedule): "
        "difficulty stage from a fixed-width n_chars bin (1-row "
        "min/max rollup broadcast back — no corpus-sized ntile "
        "window), per-stage rank windows parallel across stages, and "
        "a pure-arithmetic interleave position so every training "
        "prefix spans the full difficulty range. No global window "
        "anywhere.",
)
def corpus_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import curriculum_order
    d = load_table(spark, sf_dir, "documents")
    return (curriculum_order(d, "n_chars", n_stages=10)
            .select("doc_id", "stage", "stage_pos", "curriculum_pos")
            .orderBy("curriculum_pos"))


@query(
    "corpus_shard_assign",
    oracle="""
WITH cum AS (
  SELECT doc_id, n_chars,
         coalesce(sum(n_chars) OVER (
           ORDER BY doc_id % 1024, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM documents
)
SELECT CAST(cum_before // 50000 AS INTEGER) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM cum GROUP BY 1 ORDER BY shard
""",
    tags=("llm", "layout"),
    doc="Weight-balanced shard assignment (operators/corpus.py:"
        "shard_by_weight): contiguous training shards of ~50k chars "
        "each in deterministic (bucket, id) order; per-shard imbalance "
        "bounded by the largest single document. Bucket-level prefix "
        "sums — the only single-task window runs over the n_buckets-row "
        "totals table (the pack_to_token_budget shape); integer DIV, "
        "exact at any corpus size. Oracle replays the global "
        "cumulative-sum definition the bucketed form is provably "
        "equal to.",
)
def corpus_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import shard_by_weight
    d = load_table(spark, sf_dir, "documents")
    return (shard_by_weight(d, "n_chars", target_weight=50_000)
            .groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("total_chars"))
            .orderBy("shard"))


def _bm25_oracle() -> str:
    # identical literals feed both engines (the NDCG rule); quoted so
    # DuckDB uses the correctly-rounded string->double parse
    k1, b = 1.2, 0.75
    k1p1, one_minus_b = k1 + 1.0, 1.0 - b
    terms = "('table','spark','value')"
    return f"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> '')) AS token
  FROM documents
), dl AS (
  SELECT doc_id, count(*) AS doclen FROM tok GROUP BY 1
), g AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         CAST(sum(doclen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM dl
), dfq AS (
  SELECT token, CAST(count(DISTINCT doc_id) AS DOUBLE) AS dfv
  FROM tok WHERE token IN {terms} GROUP BY 1
), tf AS (
  SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tfv
  FROM tok WHERE token IN {terms} GROUP BY 1, 2
), per AS (
  SELECT tf.doc_id,
         CAST(floor((ln((g.n_docs - dfq.dfv + CAST('0.5' AS DOUBLE))
                        / (dfq.dfv + CAST('0.5' AS DOUBLE))
                        + CAST('1.0' AS DOUBLE))
                     * (tf.tfv * CAST('{k1p1!r}' AS DOUBLE))
                     / (tf.tfv + CAST('{k1!r}' AS DOUBLE)
                        * (CAST('{one_minus_b!r}' AS DOUBLE)
                           + CAST('{b!r}' AS DOUBLE)
                             * (CAST(dl.doclen AS DOUBLE) / g.avgdl))))
                    * CAST('1000000.0' AS DOUBLE)) AS BIGINT) AS c
  FROM tf JOIN dl USING (doc_id) JOIN dfq USING (token) CROSS JOIN g
)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS score_micro,
       CAST(count(*) AS BIGINT) AS n_terms_matched,
       CAST(sum(c) AS DOUBLE) / 1000000.0 AS bm25
FROM per GROUP BY doc_id ORDER BY doc_id
"""


@query(
    "text_bm25_scores",
    oracle=_bm25_oracle(),
    tags=("llm", "text", "retrieval"),
    doc="Okapi BM25 over the corpus for a fixed 3-term query "
        "(operators/text.py:bm25_scores, Robertson & Zaragoza '09) — "
        "the lexical-retrieval baseline beside the ANN stack. Each "
        "term's contribution lands on an integer 10^-6 grid before the "
        "per-doc sum (ln() is not correctly-rounded libm-to-libm, so "
        "raw-double sums could drift); N/avgdl is a 1-row broadcast, "
        "df a |query|-row broadcast, and the isin() filter prunes the "
        "token stream to query terms before any shuffle.",
)
def text_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import bm25_scores
    d = load_table(spark, sf_dir, "documents")
    return (bm25_scores(d, ["table", "spark", "value"])
            .select("doc_id", "score_micro", "n_terms_matched", "bm25")
            .orderBy("doc_id"))


@query(
    "text_inverted_index",
    oracle=r"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x <> '') AS ws
  FROM documents
), tok AS (
  SELECT doc_id, unnest(ws) AS token,
         CAST(unnest(generate_series(0, len(ws) - 1)) AS INTEGER) AS pos
  FROM w
), blocked AS (
  SELECT token, doc_id, pos,
         CAST((row_number() OVER (PARTITION BY token
                                  ORDER BY doc_id, pos) - 1) // 128
              AS INTEGER) AS block
  FROM tok
)
SELECT token, block,
       CAST(count(*) AS BIGINT) AS n_postings,
       string_agg(doc_id || ':' || pos, ' ' ORDER BY doc_id, pos)
         AS postings
FROM blocked GROUP BY token, block ORDER BY token, block
""",
    tags=("llm", "text", "retrieval"),
    doc="Block-partitioned positional inverted index (operators/"
        "text.py:inverted_index, the Lucene postings-block layout): "
        "token -> 128-posting blocks of doc:pos pairs. Per-token rank "
        "windows parallel across tokens; every aggregate group is "
        "bounded at block_size postings by construction — the reason "
        "real indexes block their postings instead of one "
        "corpus-sized list per stopword.",
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import inverted_index
    d = load_table(spark, sf_dir, "documents")
    return (inverted_index(d, block_size=128)
            .orderBy("token", "block"))


def _ap_chain_sql(k: int) -> str:
    # the SAME left-assoc term chain the Spark expression builds —
    # never an aggregate SUM of doubles (fold order)
    chain = "CAST('0.0' AS DOUBLE)"
    for i in range(k):
        cum = "(" + " + ".join(f"b{j}" for j in range(i + 1)) + ")"
        chain = (f"({chain} + CAST(b{i} AS DOUBLE) * "
                 f"(CAST({cum} AS DOUBLE) / {float(i + 1)!r}))")
    return chain


def _map_at_k_oracle(k: int = 10) -> str:
    bits = ",\n         ".join(
        f"coalesce(max(CASE WHEN rn = {i + 1} AND s IS NOT NULL "
        f"THEN rel END), 0) AS b{i}"
        for i in range(k))
    return f"""
WITH ranked AS (
  SELECT label AS q,
         CAST(embedding[1] AS DOUBLE) AS s,
         CAST(vec_id % 3 = 0 AS INTEGER) AS rel,
         row_number() OVER (
           PARTITION BY label
           ORDER BY CAST(embedding[1] AS DOUBLE) DESC, vec_id) AS rn
  FROM embeddings WHERE label IS NOT NULL
), g AS (
  SELECT q, CAST(count(*) AS BIGINT) AS n_items,
         CAST(sum(rel) AS BIGINT) AS n_rel,
         {bits}
  FROM ranked GROUP BY q
)
SELECT q, n_items, n_rel,
       CASE WHEN n_rel > 0
            THEN {_ap_chain_sql(k)}
                 / CAST(least(n_rel, {k}) AS DOUBLE)
       END AS ap_at_k
FROM g ORDER BY q
"""


@query(
    "eval_map_at_k",
    oracle=_map_at_k_oracle(10),
    tags=("llm", "eval"),
    doc="Per-query average precision at 10 (operators/evaluation.py:"
        "average_precision_at_k) over the same deterministic embedding "
        "ranking the NDCG probe uses — AP credits every relevant hit "
        "with the precision at its own position. Position bits via k "
        "conditional MAXes, integer running counts, LEFT-ASSOC term "
        "chain mirrored textually in the oracle (never an aggregate "
        "double SUM); one ranking window shuffle, group size "
        "unbounded.",
)
def eval_map_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.evaluation import average_precision_at_k
    e = load_table(spark, sf_dir, "embeddings")
    out = average_precision_at_k(
        e.filter(F.col("label").isNotNull()),
        F.col("label"),
        F.element_at("embedding", 1).cast("double"),
        (F.col("vec_id") % 3 == 0),
        F.col("vec_id"),
        k=10)
    return out.orderBy("q")


@query(
    "dedup_survivorship",
    oracle=r"""
WITH RECURSIVE s AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(string_split_regex(text, '\s+')) - 1, 1)),
           i -> concat_ws(' ',
                string_split_regex(text, '\s+')[i],
                string_split_regex(text, '\s+')[i+1],
                string_split_regex(text, '\s+')[i+2]))) AS sh
  FROM documents WHERE doc_id < 250
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM s a, s b
  WHERE a.doc_id < b.doc_id
    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
), reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
), cl AS (
  SELECT d.doc_id,
         least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS cluster_rep
  FROM s d LEFT JOIN reach r ON r.src = d.doc_id
  GROUP BY d.doc_id
)
SELECT c.doc_id, c.cluster_rep,
       (row_number() OVER (PARTITION BY c.cluster_rep
                           ORDER BY d.n_chars DESC, c.doc_id) = 1)
         AS is_survivor
FROM cl c JOIN documents d USING (doc_id)
ORDER BY c.doc_id
""",
    tags=("llm", "dedup"),
    doc="Cluster survivorship policy (operators/dedup.py:survivorship "
        "— MDM survivorship / RefinedWeb keep-longest): after pairs -> "
        "connected components, each duplicate cluster keeps its "
        "highest-n_chars member (id tie-break), exactly one survivor "
        "per cluster by a total-order rank window. One id join + one "
        "per-cluster window; the oracle recomputes the WHOLE chain "
        "(shingles, Jaccard pairs, recursive-CTE components, ranked "
        "survivor).",
)
def dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import dedup_clusters, survivorship
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 250)
    sh = with_word_shingles(d, "text", n=3)
    pairs = jaccard_pairs(sh, "doc_id", "shingles", threshold=0.5)
    clusters = dedup_clusters(pairs, d.select("doc_id"), id_col="doc_id")
    return (survivorship(clusters, d, "n_chars")
            .select("doc_id", "cluster_rep", "is_survivor")
            .orderBy("doc_id"))


@query(
    "text_bigram_lm_score",
    oracle=r"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'),
                     w -> w <> '') AS ws
  FROM documents
), bi AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(ws), 1)),
                               i -> ws[i])) AS w1,
         unnest(list_transform(range(1, greatest(len(ws), 1)),
                               i -> ws[i + 1])) AS w2
  FROM tok
), ref_bi AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
  FROM bi WHERE doc_id < 250 GROUP BY 1, 2
), ref_uni AS (
  SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM (
    SELECT doc_id, unnest(ws) AS w1 FROM tok WHERE doc_id < 250)
  GROUP BY 1
), v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM ref_uni),
q AS (
  SELECT b.doc_id,
         CAST(floor(1e6 * ln(
           (CAST(coalesce(rb.c12, 0) AS DOUBLE) + 1.0)
           / (CAST(coalesce(ru.c1, 0) AS DOUBLE) + CAST(v AS DOUBLE))))
           AS BIGINT) AS q
  FROM bi b
  LEFT JOIN ref_bi rb ON b.w1 = rb.w1 AND b.w2 = rb.w2
  LEFT JOIN ref_uni ru ON b.w1 = ru.w1
  CROSS JOIN v
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(q) AS BIGINT) AS logprob_q6,
       round(CAST(sum(q) AS DOUBLE) / 1e6
             / CAST(count(*) AS DOUBLE), 6) AS avg_logprob
FROM q GROUP BY doc_id ORDER BY doc_id
""",
    tags=("llm", "text", "quality"),
    doc="KenLM-style bigram language-model fluency score (operators/"
        "text.py:bigram_lm_score): an add-one-smoothed bigram LM "
        "trained on the historical slice (doc_id < 250) scores every "
        "document's mean token log-probability — the CCNet/RefinedWeb "
        "perplexity filter whose tails are gibberish and boilerplate. "
        "Count tables are vocabulary-bounded (Heaps) so both "
        "enrichment joins broadcast at any corpus size; every ln "
        "contribution quantizes to the integer 1e-6 grid before the "
        "exact long document sum (the bm25 rule); the mean is one "
        "double division.",
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import bigram_lm_score
    d = load_table(spark, sf_dir, "documents")
    return bigram_lm_score(d, d.filter(F.col("doc_id") < 250))


@query(
    "ann_hard_negatives",
    oracle="""
WITH a AS (
  SELECT vec_id AS anchor_id, label AS anchor_label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS av
  FROM embeddings WHERE label IS NOT NULL AND vec_id < 20
), c AS (
  SELECT vec_id, label AS neg_label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings WHERE label IS NOT NULL
), scored AS (
  SELECT anchor_id, anchor_label, vec_id, neg_label,
         round(list_dot_product(av, cv)
               / (sqrt(list_dot_product(av, av))
                  * sqrt(list_dot_product(cv, cv))), 6) AS cosine
  FROM c, a WHERE neg_label <> anchor_label
), ranked AS (
  SELECT anchor_id, anchor_label, vec_id, neg_label, cosine,
         row_number() OVER (PARTITION BY anchor_id
                            ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
)
SELECT anchor_id, anchor_label, vec_id, neg_label, cosine,
       CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 5
ORDER BY anchor_id, rank
""",
    tags=("llm", "similarity"),
    doc="Hard-negative mining for contrastive training (operators/"
        "similarity.py:hard_negatives): per labeled anchor, the top-5 "
        "most-similar embeddings with a DIFFERENT label — near-miss "
        "negatives, the triplet/InfoNCE miner. cosine_topk's scale "
        "shape (broadcast anchors, one corpus pass, per-row prenormed "
        "norms, bounded top-k window) with the cross-label predicate "
        "riding the broadcast join so mismatches drop before scoring.",
)
def ann_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import hard_negatives
    e = (load_table(spark, sf_dir, "embeddings")
         .filter(F.col("label").isNotNull()))
    anchors = e.filter(F.col("vec_id") < 20)
    return (hard_negatives(e, anchors, k=5)
            .orderBy("anchor_id", "rank"))


@query(
    "text_keywords_topk",
    oracle=r"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            w -> w <> '')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tok GROUP BY 1, 2
), dfx AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
), nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n
          FROM documents),
scored AS (
  SELECT t.doc_id, t.term, t.tf, d.df,
         CAST(CAST(t.tf AS DECIMAL(38,0))
              * CAST(CAST(floor(1e6 * ln(CAST(n AS DOUBLE)
                                         / CAST(d.df AS DOUBLE)))
                          AS BIGINT) AS DECIMAL(38,0)) AS BIGINT)
           AS score_q6
  FROM tf t JOIN dfx d USING (term) CROSS JOIN nd
), ranked AS (
  SELECT doc_id, term, tf, df, score_q6,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score_q6 DESC, term) AS rank
  FROM scored
)
SELECT doc_id, term, tf, df, score_q6, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 5 AND doc_id < 100
ORDER BY doc_id, rank
""",
    tags=("llm", "text"),
    doc="Top-5 TF-IDF keywords per document (operators/text.py:"
        "keywords_topk) — deterministic keyword extraction: exact-long "
        "tf, IDF on the integer 1e-6 log grid BEFORE the product (the "
        "bm25 rule), DECIMAL(38,0) score, per-doc ranking window "
        "bounded by the document's own vocabulary with a term "
        "tie-break. df table is Heaps-bounded and broadcast.",
)
def text_keywords_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import keywords_topk
    d = load_table(spark, sf_dir, "documents")
    return (keywords_topk(d, k=5)
            .filter(F.col("doc_id") < 100)
            .orderBy("doc_id", "rank"))
