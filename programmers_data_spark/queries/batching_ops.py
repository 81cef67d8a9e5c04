"""Training-batch planning operators (round 9).

Two public data-loader planning steps that sit between curation and
the training loop:

- ``length_bucket_batches`` — sorted-by-length PADDED batching
  (the fairseq/seq2seq ``--max-tokens`` bucketing family, public
  since Sutskever et al. 2014's sorted minibatches): docs of similar
  length batch together so per-batch padding to the batch max is
  minimal. The padded-batch counterpart to ``sequence_packing``
  (round3_ops), which concatenates instead of padding — a user picks
  one per objective, so the engine ships both, with the padding
  waste accounted exactly.
- ``oov_rate_by_vocab`` — tokenizer vocabulary sizing: for each
  candidate top-k vocabulary cut, the fraction of each source's
  token OCCURRENCES that fall out-of-vocabulary. The standard
  coverage analysis behind choosing a vocab size (Sennrich et al.
  2016 BPE sizing; the same coverage table SentencePiece prints).

Reference-semantics lineage: the reference has no training loop —
these extend the engine's LLM-pipeline tier the way the brief
directs; the nearest reference shapes are the CASE-band + ratio
aggregates of airflow/dags/config/nps_summary.py:4-11 (run by
airflow/dags/Build_Summary.py:71-77).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import textfn
from ..operators import bounded_global_window, distributed_rank
from ..registry import query
from ._oracle_shared import _DUCK_TOKS

# Docs per padded batch. Small against the fixture's 500 docs so the
# batch table exercises many groups; a production run sets it from
# device memory. Interpolated into BOTH engines.
BATCH_SIZE = 16

# Length-band width for the two-level rank (distributed_rank's band
# must be monotone in the leading order column; cardinality is
# bounded by max-doc-tokens / width — a data property, not a row
# count).
LEN_BAND_WIDTH = 16

# Candidate vocabulary sizes for the OOV sweep. The fixture corpus
# has a 31-token vocabulary, so these cuts exercise high-, mid- and
# low-OOV regimes; production swaps in 32k/64k/128k with no shape
# change.
VOCAB_CUTS = (8, 16, 24)


@query(
    "length_bucket_batches",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, CAST(len({_DUCK_TOKS}) AS BIGINT) AS n_tokens
      FROM documents
    ),
    r AS (
      SELECT doc_id, n_tokens,
             row_number() OVER (ORDER BY n_tokens, doc_id) - 1 AS rk
      FROM t
    )
    SELECT rk // {BATCH_SIZE} AS batch_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT)
             AS padding_tokens
    FROM r GROUP BY batch_id ORDER BY batch_id
    """,
)
def length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-by-length padded-batch plan: rank every document by
    token length (ties by doc_id so the plan is deterministic), cut
    consecutive ranks into BATCH_SIZE-doc batches, and emit per
    batch its size, the pad-to length (batch max), the real token
    count, and the exact padding waste — the table a padded data
    loader consumes, with the padding bill auditable before any GPU
    time is spent.

    Scale shape: the global length ranking is distributed_rank (per-
    length-band row_number + a bounded band-offset fold), NOT a
    global sort — band count is max_doc_tokens/LEN_BAND_WIDTH, a
    data property independent of corpus size. The per-batch rollup
    is one partially-aggregated shuffle on batch_id. Linear in docs
    at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    lens = docs.select(
        "doc_id", textfn.token_count("text").cast("long").alias("n_tokens")
    )
    ranked = distributed_rank(
        lens,
        ["n_tokens", "doc_id"],
        F.expr(f"n_tokens div {LEN_BAND_WIDTH}"),
        rank_name="rk",
    )
    return (
        ranked.withColumn("batch_id", F.expr(f"rk div {BATCH_SIZE}"))
        .groupBy("batch_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
        )
        .withColumn(
            "padding_tokens",
            (F.col("n_docs") * F.col("max_tokens") - F.col("sum_tokens"))
            .cast("long"),
        )
        .orderBy("batch_id")
    )


@query(
    "oov_rate_by_vocab",
    oracle=f"""
    WITH occ AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS occ
      FROM (
        SELECT source, unnest({_DUCK_TOKS}) AS tok FROM documents
      )
      GROUP BY source, tok
    ),
    v AS (
      SELECT tok, CAST(sum(occ) AS BIGINT) AS c FROM occ GROUP BY tok
    ),
    rk AS (
      SELECT tok, row_number() OVER (ORDER BY c DESC, tok) - 1 AS rank
      FROM v
    ),
    cuts AS (
      SELECT unnest([{", ".join(str(k) for k in VOCAB_CUTS)}]) AS k
    )
    SELECT o.source, CAST(c.k AS BIGINT) AS k,
           CAST(sum(CASE WHEN r.rank >= c.k THEN o.occ ELSE 0 END)
                AS BIGINT) AS oov_n,
           CAST(sum(o.occ) AS BIGINT) AS total_n,
           CAST(sum(CASE WHEN r.rank >= c.k THEN o.occ ELSE 0 END)
                AS DOUBLE) / sum(o.occ) AS oov_rate
    FROM occ o JOIN rk r USING (tok) CROSS JOIN cuts c
    GROUP BY o.source, c.k
    ORDER BY o.source, c.k
    """,
)
def oov_rate_by_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source out-of-vocabulary rate under each candidate top-k
    vocabulary cut: rank tokens by global frequency (ties
    alphabetical, so every cut boundary is deterministic), then for
    each (source, k) the share of token occurrences whose token
    ranks outside the top k. oov_rate is ONE IEEE division of two
    exact integers — and total_n > 0 by construction (a source with
    no tokens contributes no occ rows, hence no group), so no
    zero-divide branch exists on either engine.

    Scale shape: one explode + partially-aggregated shuffle to the
    (source, tok) occurrence table; the global vocab count derives
    from THAT table (no second corpus pass). The rank window runs
    over O(|vocab|) rows — bounded by the language, not the corpus —
    so bounded_global_window is the honest plan, and the rank table
    broadcasts back onto the occurrence table; the cut sweep
    multiplies only the small joined frame (|vocab cuts| ×
    per-source vocab), never the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    occ = (
        docs.select(
            "source", F.explode(textfn.tokenize("text")).alias("tok")
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("occ"))
    )
    vocab = occ.groupBy("tok").agg(F.sum("occ").cast("long").alias("c"))
    # bounded: one row per distinct token — vocabulary-sized, a
    # property of the language, not the corpus
    ranks = vocab.select(
        "tok",
        (
            F.row_number().over(
                bounded_global_window(F.desc("c"), F.col("tok"))
            )
            - 1
        ).alias("rank"),
    )
    cuts = F.explode(
        F.array(*[F.lit(k) for k in VOCAB_CUTS])
    ).alias("k")
    joined = occ.join(F.broadcast(ranks), "tok").select(
        "source", "occ", "rank", cuts
    )
    return (
        joined.groupBy("source", "k")
        .agg(
            F.sum(
                F.when(F.col("rank") >= F.col("k"), F.col("occ")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("oov_n"),
            F.sum("occ").cast("long").alias("total_n"),
        )
        .withColumn(
            "k", F.col("k").cast("long")
        )
        .withColumn(
            "oov_rate",
            F.col("oov_n").cast("double") / F.col("total_n"),
        )
        .select("source", "k", "oov_n", "total_n", "oov_rate")
        .orderBy("source", "k")
    )
