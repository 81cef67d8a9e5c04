"""Round-15 operators: the TEXT tier's serving read path — top-K
most-similar documents by MinHash band candidates + exact Jaccard
rerank (r14 VERDICT ask #8), completing serving parity across all
five dedup families: the media tiers serve via *_hamming_topk, the
vector tiers via ann/ivf/pq_topk, and this query is the text
near-dup family's equivalent, reusing the `_hamming_topk` posture
(bounded banded candidates, window top-K, pinned ties).

Reference anchor: the reference (HyeM207/Programmers-DATA) has no
text-dedup pipeline; this tier is north-star training-data-pipeline
scope (SURVEY.md §2 "LLM-data-pipeline operators"), the read-path
face of the MinHash dedup family dedup_ops.py implements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from .dedup_ops import (
    _AUG_SQL,
    _N_BANDS,
    _SHINGLES_DUCK,
    _TOKS_DUCK,
    _band_cols_duck,
    _minhash_sig_duck,
)

# Serving depth: the K most-similar documents per query doc — same
# depth as the media tiers' IMG_TOPK so the serving contracts stay
# comparable across families.
TEXT_TOPK = 3


def _text_topk_oracle() -> str:
    """The read-path top-K derivation over the dedup tier's shared
    SQL fragments (aug corpus, shingles, MinHash signatures, band
    hashes — verbatim the dedup_minhash fragments, so the serving
    contract cannot drift from the maintenance contract): band the
    signatures, candidate self-join per band, exact-Jaccard rerank
    on the rounded value, per-query row_number with deterministic
    ties (jaccard DESC, neighbor id ASC)."""
    pair_union = " UNION ".join(
        f"""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM banded a JOIN banded b
              ON a.band{i} = b.band{i} AND a.doc_id < b.doc_id"""
        for i in range(_N_BANDS)
    )
    return f"""
    WITH aug AS ({_AUG_SQL}),
    shingled AS (
      SELECT doc_id, {_SHINGLES_DUCK} AS shingles
      FROM (SELECT doc_id, {_TOKS_DUCK} AS toks FROM aug)
    ),
    sigs AS (
      SELECT doc_id, {_minhash_sig_duck()}
      FROM shingled
    ),
    banded AS (
      SELECT doc_id, {_band_cols_duck()}
      FROM sigs
    ),
    pairs AS ({pair_union}),
    cand AS (
      SELECT doc_a AS query_id, doc_b AS neighbor_id FROM pairs
      UNION ALL
      SELECT doc_b AS query_id, doc_a AS neighbor_id FROM pairs
    ),
    scored AS (
      SELECT c.query_id, c.neighbor_id,
             floor(CAST(len(list_intersect(sa.shingles, sb.shingles))
                        AS DOUBLE)
                   / len(list_distinct(sa.shingles || sb.shingles))
                   * 10000 + 0.5) / 10000 AS jaccard
      FROM cand c
      JOIN shingled sa ON sa.doc_id = c.query_id
      JOIN shingled sb ON sb.doc_id = c.neighbor_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, jaccard,
             row_number() OVER (
               PARTITION BY query_id ORDER BY jaccard DESC, neighbor_id
             ) AS rnk
      FROM scored
    )
    SELECT query_id, CAST(rnk AS INTEGER) AS rnk, neighbor_id, jaccard
    FROM ranked WHERE rnk <= {TEXT_TOPK}
    ORDER BY query_id, rnk
    """


@query("text_jaccard_topk", oracle=_text_topk_oracle())
def text_jaccard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-similar-documents serving — the READ path of the text
    MinHash index (dedup_minhash is its write path): for every doc
    in the augmented dedup corpus, the top-K (K = TEXT_TOPK) most
    similar others by EXACT shingle Jaccard among its MinHash band
    candidates, deterministic ties by neighbor id. Unlike the
    maintenance path there is no threshold: serving ranks EVERY
    banded candidate, so sub-threshold near-misses are visible —
    exactly what a "find documents like this one" endpoint returns.

    Scale shape: candidates come from the memoized banded signature
    table through the skew-salted bucket join (the ONE code path
    dedup_minhash certifies — never all-pairs; at 100 TB the
    signature table is the published index this query probes), the
    rerank joins candidate ids back to the signature table's shingle
    column, and the per-query top-K is a window over the
    band-bounded candidate set. Ranking uses the ROUNDED Jaccard
    (the dedup tier's floor(x*10000+0.5)/10000 — exact in both
    engines) so tie groups are engine-portable.

    Oracle: the same derivation over the dedup tier's registered SQL
    fragments (one fragment set for maintenance and serving, the
    _hamming_topk_oracle discipline)."""
    from .dedup_ops import minhash_band_pairs, minhash_signatures

    sigs = minhash_signatures(spark, sf_dir)
    pairs = minhash_band_pairs(spark, sf_dir)
    cand = pairs.select(
        F.col("doc_a").alias("query_id"),
        F.col("doc_b").alias("neighbor_id"),
    ).unionByName(
        pairs.select(
            F.col("doc_b").alias("query_id"),
            F.col("doc_a").alias("neighbor_id"),
        )
    )
    sa = sigs.select(
        F.col("doc_id").alias("query_id"), F.col("shingles").alias("sh_a")
    )
    sb = sigs.select(
        F.col("doc_id").alias("neighbor_id"), F.col("shingles").alias("sh_b")
    )
    # array_union of two shingle sets is never empty (empty docs pin
    # to the [''] whole-text shingle), so the division is ANSI-safe
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("jaccard"), "neighbor_id"
    )
    return (
        cand.join(sa, "query_id")
        .join(sb, "neighbor_id")
        .withColumn("jaccard", F.floor(jac * 10000 + 0.5) / 10000)
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= TEXT_TOPK)
        .select("query_id", "rnk", "neighbor_id", "jaccard")
        .orderBy("query_id", "rnk")
    )
