"""Round-14 operators: the multimodal curation REPORT layer — the
roll-up a 100 TB multimodal crawl operator actually reads (r13
VERDICT ask #8), composed entirely from the PUBLISHED dedup
artifacts (text verified_pair_store + the three media pair stores),
never re-deriving a pair set.

Reference anchor: the reference (HyeM207/Programmers-DATA) has no
media pipeline; this tier is north-star training-data-pipeline scope
(SURVEY.md §2 "LLM-data-pipeline operators"), the reporting face of
the dedup family dedup_ops.py / media_index.py implement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import ORACLE, query
from .round12_ops import _audio_hash_cte, _img_hash_cte, _pair_cte
from .round13_ops import _video_hash_cte

# The four dedup modalities the report rolls up, in output order.
REPORT_MODALITIES = ("audio", "image", "text", "video")


def _media_report_oracle() -> str:
    """Recompose every modality's REGISTERED pair semantics (the
    dedup_minhash SQL verbatim; the shared prefix-parameterized
    image/audio/video hash + pair fragments over the BASE documents
    — exactly what the published pair stores hold), then roll dup
    membership up to (modality, source) cells over the full grid."""
    return f"""
    WITH {_img_hash_cte(prefix="i_")},
    {_pair_cte("i_")},
    {_audio_hash_cte(prefix="a_")},
    {_pair_cte("a_")},
    {_video_hash_cte(prefix="v_")},
    {_pair_cte("v_")},
    tpairs AS ({ORACLE["dedup_minhash"]}),
    members AS (
      SELECT DISTINCT modality, doc_id FROM (
        SELECT 'text' AS modality, doc_a % 1000000 AS doc_id FROM tpairs
        UNION ALL SELECT 'text', doc_b % 1000000 FROM tpairs
        UNION ALL SELECT 'image', media_a FROM i_pairs
        UNION ALL SELECT 'image', media_b FROM i_pairs
        UNION ALL SELECT 'audio', media_a FROM a_pairs
        UNION ALL SELECT 'audio', media_b FROM a_pairs
        UNION ALL SELECT 'video', media_a FROM v_pairs
        UNION ALL SELECT 'video', media_b FROM v_pairs
      )
    ),
    counts AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ),
    grid AS (
      SELECT m.modality, c.source, c.n_docs
      FROM counts c,
           (SELECT unnest(['text','image','audio','video']) AS modality) m
    ),
    cells AS (
      SELECT m.modality, d.source,
             CAST(count(DISTINCT m.doc_id) AS BIGINT) AS n_dup_docs
      FROM members m JOIN documents d ON d.doc_id = m.doc_id
      GROUP BY m.modality, d.source
    )
    SELECT g.modality, g.source, g.n_docs,
           CAST(coalesce(c.n_dup_docs, 0) AS BIGINT) AS n_dup_docs,
           CAST(coalesce(c.n_dup_docs, 0) * 100 // g.n_docs AS BIGINT)
             AS dup_pct
    FROM grid g
    LEFT JOIN cells c ON c.modality = g.modality AND c.source = g.source
    ORDER BY g.modality, g.source
    """


@query("media_curation_report", oracle=_media_report_oracle())
def media_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(modality, source) duplication report — the
    cross_source_dup_matrix pattern generalized from source x source
    to modality x provenance: for every dedup modality (text MinHash,
    image/audio/video banded perceptual hashes), the count and exact
    integer percentage of each source's documents that participate in
    at least one verified near-dup pair. The full modality x source
    grid is emitted (zero cells included), so a crawl operator reads
    one table to see WHICH provenance floods WHICH modality with
    duplicates — the report that decides what to re-scrape, what to
    down-weight, and which dedup tier to tighten.

    Composes ONLY published artifacts: the text tier's
    verified_pair_store and the engine's three media pair stores
    (media_index.pair_store — the index's fourth published table).
    Nothing re-hashes, re-bands, or re-verifies; at 100 TB this is
    four bounded parquet reads + two joins against the doc->source
    dimension.

    Scale shape: dup members are a distinct over the pair stores
    (bounded by verified near-dups); the source join is an equi-join
    AQE can broadcast; the grid is |sources| x 4 rows built by
    exploding a 4-literal array over the per-source counts (no
    cartesian); integer `div` percentages keep both engines exact.

    Oracle: every modality's registered pair SQL recomposed verbatim
    (dedup_minhash + the shared prefix-parameterized media
    fragments), so drift in ANY tier's pair semantics, the
    membership scoping, or the grid/zero-fill rule breaks the hash.
    """
    from .. import media_index
    from .dedup_ops import verified_pair_store
    from .media_lifecycle_ops import AUDIO_SPEC, VIDEO_SPEC
    from .round12_ops import IMAGE_SPEC

    text_pairs = verified_pair_store(spark, sf_dir)
    parts = [
        text_pairs.select(
            F.lit("text").alias("modality"),
            (F.col("doc_a") % 1000000).alias("doc_id"),
        ),
        text_pairs.select(
            F.lit("text").alias("modality"),
            (F.col("doc_b") % 1000000).alias("doc_id"),
        ),
    ]
    for mod, spec in (
        ("image", IMAGE_SPEC), ("audio", AUDIO_SPEC), ("video", VIDEO_SPEC)
    ):
        store = media_index.pair_store(spark, sf_dir, spec)
        parts.append(
            store.select(
                F.lit(mod).alias("modality"),
                F.col("media_a").alias("doc_id"),
            )
        )
        parts.append(
            store.select(
                F.lit(mod).alias("modality"),
                F.col("media_b").alias("doc_id"),
            )
        )
    members = parts[0]
    for p in parts[1:]:
        members = members.unionByName(p)
    members = members.distinct()

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    grid = counts.withColumn(
        "modality",
        F.explode(F.array(*[F.lit(m) for m in
                            ("text", "image", "audio", "video")])),
    )
    cells = (
        members.join(docs, "doc_id")
        .groupBy("modality", "source")
        .agg(F.count_distinct("doc_id").cast("long").alias("n_dup_docs"))
    )
    return (
        grid.join(cells, ["modality", "source"], "left")
        .select(
            "modality",
            "source",
            "n_docs",
            F.coalesce("n_dup_docs", F.lit(0)).cast("long").alias("n_dup_docs"),
            F.expr("coalesce(n_dup_docs, 0) * 100 div n_docs")
            .cast("long")
            .alias("dup_pct"),
        )
        .orderBy("modality", "source")
    )
