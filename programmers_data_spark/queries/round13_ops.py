"""Round-13 operators: the multimodal dedup story completed (r12
VERDICT asks #3 and #8), the audio tier's cluster resolution and
recall twin, the VIDEO tier (the fourth modality), and the
cross-modal adjudication over all four.

- `audio_neardup_clusters` — connected components over the audio
  near-dup pair graph, the same cluster machinery the image tier
  certified (one banding/verify/cluster engine, every modality).
- `crossmodal_quadmodal_consistency` — text x image x audio x video
  duplicate adjudication over the shared augmented corpus (began
  life as the trimodal adjudication early in the round, absorbed the
  video flag when the video tier landed). Every media side keys
  clips by the SAME canonical id (an augmented mutation renders a
  near-duplicate clip of its original) but partitions the corpus
  with a different residue system (scenes / scenes+1 / scenes+2), so
  the media pair sets are not identical by construction and the
  adjudication is non-vacuous.
- `multimodal_funnel_contract` — pipelines.curate_corpus with the
  media-dedup stage enabled (media pair sets unioned into the text
  near-dup graph before the best-quality keeper), stage counts
  hash-certified cross-engine — the pipeline_funnel_contract pattern
  extended to the multimodal funnel.
- `video_framehash` / `video_neardup_pairs` / `video_neardup_clusters`
  / `video_lsh_recall` — the video tier (see the video section
  comment for the frame-sampled XOR-fold construction).

Reference anchor: the reference has no media pipeline; this tier is
north-star (training-data pipeline) scope, extending the dedup family
exactly the way dedup_ops.py did for text (SURVEY.md §2's
"LLM-data-pipeline operators" mandate).

Class population on the synthetic fixtures (quadmodal): an augmented
copy shares its original's canonical id, hence its image scene,
audio clip, AND video scene — a copy pair near-dups in all four
modalities when its text passes the Jaccard gate
('text_image_audio_video'). Unrelated documents congruent mod scenes
('image'), mod scenes+1 ('audio'), or mod scenes+2 ('video')
populate the single-modality classes; documents congruent mod BOTH
scenes and scenes+2 (i.e. mod lcm — possible because the two moduli
share parity) populate 'image_video'; text pairs between non-copy
documents (degenerate/boilerplate texts the MinHash path
legitimately pairs) populate 'text' and the text+media coincidence
classes; a perturbation flipping more than the usual bit budget can
push one modality past HAM_T ('image_audio_video'). Measured at
sf0.01: TEN classes non-empty (text_image_audio_video 24, image
4878, audio 4819, video 4521, image_video 149, text 23, text_audio
2, text_image 1, text_video 1, image_audio_video 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import ORACLE, query
from .round12_ops import (
    _audio_frame,
    _audio_hash_cte,
    _audio_hash_table,
    _doc_stats,
    _img_hash_cte,
    _pair_cte,
    _pairs_from,
    _scene_count,
    _xmodal_hash_table,
)

# ------------------------------------------------ audio clusters


@query(
    "audio_neardup_clusters",
    oracle=f"""
    WITH RECURSIVE {_audio_hash_cte()},
    {_pair_cte()},
    edges AS (
      SELECT media_a AS a, media_b AS b FROM pairs
      UNION ALL
      SELECT media_b AS a, media_a AS b FROM pairs
    ),
    reach(src, dst) AS (
      SELECT media_id, media_id FROM hashes
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    )
    SELECT src AS media_id, min(dst) AS cluster_id
    FROM reach GROUP BY src ORDER BY media_id
    """,
)
def audio_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster assignment over the AUDIO near-dup graph — completes
    the audio tier to full parity with the image tier (fingerprint ->
    pairs -> clusters): connected components over the banded pair
    set (operators.connected_components_auto — label propagation,
    edge-list-bounded, per-round localCheckpoint), cluster id = min
    media_id; singletons keep their own id. Oracle: recursive-CTE
    reachability over the identical pair set (the
    image_neardup_clusters derivation verbatim, audio hash CTE
    swapped in — the shared-fragment discipline)."""
    from ..operators import connected_components_auto

    h = _audio_hash_table(spark, sf_dir)
    pairs = _pairs_from(h)
    labels = connected_components_auto(pairs, "media_a", "media_b")
    return (
        h.select("media_id")
        .join(labels, h["media_id"] == labels["vertex"], "left")
        .select(
            "media_id",
            F.coalesce("component", "media_id").alias("cluster_id"),
        )
        .orderBy("media_id")
    )


# -------------------------------------------- cross-modal keying

# The audio partition over the augmented corpus uses scenes+1: same
# canonical keying as the image side (copies land on their original's
# clip) but a different residue system, so same-image-scene and
# same-audio-scene are independent events for unrelated documents.
XMODAL_AUDIO_SCENE_EXTRA = 1

_XMODAL_AUDIO_CACHE: dict[tuple[str, str], DataFrame] = {}


def _xmodal_audio_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio fingerprints over the AUGMENTED corpus with canonical
    clip keying (the _xmodal_hash_table discipline for audio):
    scene = (doc_id % 1e6) % (scenes+1), so a mutated copy renders a
    near-duplicate CLIP of its original while the partition differs
    from the image side's. Persisted + memoized (pair join
    branches)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _XMODAL_AUDIO_CACHE.get(key)
    if cached is not None:
        return cached
    from .dedup_ops import _augmented_docs

    n, n20, max_doc = _doc_stats(spark, sf_dir)
    # the same loud aliasing guard as the image cross-modal table
    assert max_doc < 1_000_000, (
        f"documents.doc_id reaches {max_doc}: the +1e6 augmentation "
        f"offset would alias originals with copies under % 1e6 clip "
        f"keying"
    )
    docs = _augmented_docs(spark, sf_dir)
    scenes = _scene_count(n + n20) + XMODAL_AUDIO_SCENE_EXTRA
    table = _audio_frame(spark, docs, scenes, canon_mod=1_000_000).persist()
    _XMODAL_AUDIO_CACHE[key] = table
    return table


# ------------------------------------------------ video tier

# The FOURTH modality: video clips as frame sequences. Synthetic
# clip: VIDEO_FRAMES 16x16 grayscale frames per document, frame
# pixels from an md5 counter chain keyed by (scene, frame, block)
# ('v' prefix decorrelates from the image/audio chains); the
# document perturbs ONE pixel of ONE frame (frame = first md5 byte
# % VIDEO_FRAMES, position = second byte, value = third). Every
# frame passes through the REAL PNG codec (encode -> decode), the
# decoded pixels pool to 8x8 and dHash per frame, and the CLIP
# fingerprint is the bitwise XOR fold of the per-frame dHashes — a
# one-frame perturbation flips <= 2 pooled cells -> <= 4 bits of
# that frame's dHash -> <= 4 bits of the fold, so a within-scene
# pair is <= 8 = HAM_T apart and the SAME banded pair machinery
# applies unchanged (measured: within-scene 0-4, cross-scene ~28-37).
VIDEO_FRAMES = 4

_VIDEO_HASH_CACHE: dict[tuple[str, str], DataFrame] = {}


def _video_frame_buffer(
    doc_id: int, text: str, scenes: int, f: int
) -> bytearray:
    import hashlib

    scene = doc_id % scenes
    buf = bytearray()
    for blk in range(16):
        buf += hashlib.md5(f"v{scene}:{f}:{blk}".encode()).digest()
    nh = hashlib.md5((text or "").encode("utf-8")).digest()
    if nh[0] % VIDEO_FRAMES == f:
        buf[nh[1]] = nh[2]
    return buf


def _video_hash_frame(
    spark: SparkSession,
    docs: DataFrame,
    scenes: int,
    canon_mod: int | None = None,
) -> DataFrame:
    """The Arrow video-fingerprint kernel over a (doc_id, text) frame
    — the _hash_frame discipline for the video modality: VIDEO_FRAMES
    frame buffers, each through the real PNG encode->decode roundtrip,
    2x2 pool + per-frame dHash, bitwise XOR fold into one 64-bit clip
    fingerprint. ``canon_mod`` optionally reduces doc_id before scene
    keying (the quadmodal query maps a mutated copy at doc_id + 1e6
    onto its original's scene). Factored out of _video_hash_table so
    the incremental-maintenance engine can hash an ARRIVAL batch with
    the index's frozen scene count (the image-tier _hash_frame
    economics)."""
    import numpy as np  # noqa: F401 (kernel dependency, checked early)

    from ..multimodal.png import decode as png_decode
    from ..multimodal.png import encode as png_encode
    from .round12_ops import IMG_H, IMG_W, _pool

    def video_batches(batches):
        import numpy as np
        import pandas as pd

        w32 = np.int64(1) << np.arange(32, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {"media_id": [], "scene": [], "dhash_lo": [], "dhash_hi": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                canon = int(doc_id) % canon_mod if canon_mod else int(doc_id)
                acc = np.zeros(64, dtype=np.int64)
                for f in range(VIDEO_FRAMES):
                    buf = _video_frame_buffer(canon, text, scenes, f)
                    raw = png_encode(IMG_W, IMG_H, bytes(buf), channels=1)
                    w, h, ch, px = png_decode(raw)
                    assert (w, h, ch) == (IMG_W, IMG_H, 1)
                    cells = np.asarray(
                        _pool(px, 16, 2), dtype=np.int64
                    ).reshape(8, 8)
                    dbits = (
                        cells > np.roll(cells, -1, axis=1)
                    ).astype(np.int64).ravel()
                    acc ^= dbits
                out["media_id"].append(int(doc_id))
                out["scene"].append(canon % scenes)
                out["dhash_lo"].append(int(acc[:32] @ w32))
                out["dhash_hi"].append(int(acc[32:] @ w32))
            yield pd.DataFrame(out)

    return docs.repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(
        video_batches,
        schema="media_id long, scene long, dhash_lo long, dhash_hi long",
    )


def _video_hash_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-clip XOR-fold fingerprints through the real PNG codec path
    (one encode->decode roundtrip PER FRAME — the production shape:
    frame-sample, decode, hash, fold). Persisted + memoized; generic
    (media_id, scene, dhash_lo, dhash_hi) columns so _pairs_from /
    _pair_cte serve this modality verbatim like image and audio."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _VIDEO_HASH_CACHE.get(key)
    if cached is not None:
        return cached
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    scenes = _scene_count(_doc_stats(spark, sf_dir)[0])
    table = _video_hash_frame(spark, docs, scenes).persist()
    _VIDEO_HASH_CACHE[key] = table
    return table


def _video_hash_cte(
    doc_rel: str = "documents",
    canon_mod: int | None = None,
    prefix: str = "",
    scene_extra: int = 0,
) -> str:
    """The video fingerprint derivation as DuckDB CTEs ending in
    `hashes` — per-frame pixel chain, 2x2 pooling, per-frame dHash,
    XOR fold as sum(bit) % 2 per bit position (XOR of 0/1 bits IS
    their parity). Parameterized exactly like the image/audio
    builders: source relation, optional canonical-id modulus (the
    quadmodal query keys an augmented copy onto its original's
    scene), CTE-name prefix for multi-fragment composition, and an
    optional ``scene_extra`` so the video partition of the corpus is
    a genuinely different residue system from the image (extra 0) and
    audio (extra 1) partitions."""
    from .round12_ops import SCENE_DOCS, SCENE_MIN

    def canon(expr: str) -> str:
        return f"({expr} % {canon_mod})" if canon_mod else expr

    scenes_sql = f"greatest({SCENE_MIN}, count(*) // {SCENE_DOCS})"
    if scene_extra:
        scenes_sql = f"{scenes_sql} + {scene_extra}"
    params, noise, px, cells, dbits, fold, hashes = (
        f"{prefix}{n}"
        for n in ("params", "noise", "px", "cells", "dbits", "fold", "hashes")
    )
    return f"""
{params} AS (
  SELECT {scenes_sql} AS scenes
  FROM {doc_rel}
),
{noise} AS (
  SELECT doc_id,
         ('0x' || substr(md5(coalesce(text,'')), 1, 2))::INT
           % {VIDEO_FRAMES} AS nf,
         ('0x' || substr(md5(coalesce(text,'')), 3, 2))::INT AS np,
         ('0x' || substr(md5(coalesce(text,'')), 5, 2))::INT AS nv
  FROM {doc_rel}
),
{px} AS (
  SELECT d.doc_id, fr.f, t.p,
         CASE WHEN fr.f = n.nf AND t.p = n.np THEN n.nv
              ELSE ('0x' || substr(
                       md5('v' || CAST({canon('d.doc_id')} % {params}.scenes
                                       AS VARCHAR)
                           || ':' || CAST(fr.f AS VARCHAR)
                           || ':' || CAST(t.p // 16 AS VARCHAR)),
                       (t.p % 16) * 2 + 1, 2))::INT
         END AS v
  FROM {doc_rel} d
  JOIN {noise} n USING (doc_id), {params},
       generate_series(0, {VIDEO_FRAMES - 1}) AS fr(f),
       generate_series(0, 255) AS t(p)
),
{cells} AS (
  SELECT doc_id, f, ((p // 16) // 2) * 8 + (p % 16) // 2 AS k,
         CAST(sum(v) // 4 AS BIGINT) AS cell
  FROM {px} GROUP BY doc_id, f, ((p // 16) // 2) * 8 + (p % 16) // 2
),
{dbits} AS (
  SELECT a.doc_id, a.f, a.k,
         CASE WHEN a.cell > b.cell THEN 1 ELSE 0 END AS bit
  FROM {cells} a JOIN {cells} b
    ON a.doc_id = b.doc_id AND a.f = b.f
   AND b.k = (a.k // 8) * 8 + ((a.k % 8) + 1) % 8
),
{fold} AS (
  SELECT doc_id, k, CAST(sum(bit) % 2 AS BIGINT) AS bit
  FROM {dbits} GROUP BY doc_id, k
),
{hashes} AS (
  SELECT doc_id AS media_id,
         CAST({canon('doc_id')} % (SELECT scenes FROM {params}) AS BIGINT)
           AS scene,
         CAST(sum(CASE WHEN bit = 1 AND k < 32
                       THEN (1::BIGINT) << k ELSE 0 END) AS BIGINT)
           AS dhash_lo,
         CAST(sum(CASE WHEN bit = 1 AND k >= 32
                       THEN (1::BIGINT) << (k - 32) ELSE 0 END) AS BIGINT)
           AS dhash_hi
  FROM {fold} GROUP BY doc_id
)"""


# The video partition over the augmented corpus uses scenes+2: a
# third residue system, independent of image (scenes) and audio
# (scenes+1) for unrelated documents, while copies still key onto
# their original canonically.
XMODAL_VIDEO_SCENE_EXTRA = 2

_XMODAL_VIDEO_CACHE: dict[tuple[str, str], DataFrame] = {}


def _xmodal_video_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video fingerprints over the AUGMENTED corpus with canonical
    clip keying (the _xmodal_hash_table discipline for video):
    scene = (doc_id % 1e6) % (scenes+2), so a mutated copy renders a
    near-duplicate CLIP of its original while the partition differs
    from both the image and audio sides'. Persisted + memoized (pair
    join branches)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _XMODAL_VIDEO_CACHE.get(key)
    if cached is not None:
        return cached
    from .dedup_ops import _augmented_docs

    n, n20, max_doc = _doc_stats(spark, sf_dir)
    # the same loud aliasing guard as the image/audio cross-modal
    # tables
    assert max_doc < 1_000_000, (
        f"documents.doc_id reaches {max_doc}: the +1e6 augmentation "
        f"offset would alias originals with copies under % 1e6 clip "
        f"keying"
    )
    docs = _augmented_docs(spark, sf_dir)
    scenes = _scene_count(n + n20) + XMODAL_VIDEO_SCENE_EXTRA
    table = _video_hash_frame(
        spark, docs, scenes, canon_mod=1_000_000
    ).persist()
    _XMODAL_VIDEO_CACHE[key] = table
    return table


# Every combination the four flags can spell, in one expression both
# engines share verbatim (string-identical on both sides): the class
# is the '_'-joined list of agreeing modalities (CASE without ELSE
# yields NULL; concat_ws skips NULLs in BOTH engines), e.g. 'image',
# 'text_image', 'text_image_audio_video'.
_QUAD_CLASS_SQL = """
concat_ws('_',
  CASE WHEN in_text THEN 'text' END,
  CASE WHEN in_image THEN 'image' END,
  CASE WHEN in_audio THEN 'audio' END,
  CASE WHEN in_video THEN 'video' END)
"""


def _quadmodal_oracle() -> str:
    # imported DIRECTLY so a test bypassing registry.load_all still
    # finds the composed fragment; dedup_ops registers EARLIER in
    # _QUERY_MODULES, so this never reorders registration.
    from . import dedup_ops  # noqa: F401
    from .dedup_ops import _AUG_SQL

    return f"""
    WITH aug AS ({_AUG_SQL}),
    {_img_hash_cte("aug", canon_mod=1_000_000, prefix="i_")},
    {_pair_cte("i_")},
    {_audio_hash_cte("aug", canon_mod=1_000_000, prefix="a_",
                     scene_extra=XMODAL_AUDIO_SCENE_EXTRA)},
    {_pair_cte("a_")},
    {_video_hash_cte("aug", canon_mod=1_000_000, prefix="v_",
                     scene_extra=XMODAL_VIDEO_SCENE_EXTRA)},
    {_pair_cte("v_")},
    tp AS (
      SELECT doc_a, doc_b FROM ({ORACLE["dedup_minhash"]})
    ),
    ip AS (SELECT media_a AS doc_a, media_b AS doc_b FROM i_pairs),
    ap AS (SELECT media_a AS doc_a, media_b AS doc_b FROM a_pairs),
    vp AS (SELECT media_a AS doc_a, media_b AS doc_b FROM v_pairs),
    ti AS (
      SELECT coalesce(t.doc_a, i.doc_a) AS doc_a,
             coalesce(t.doc_b, i.doc_b) AS doc_b,
             t.doc_a IS NOT NULL AS in_text,
             i.doc_a IS NOT NULL AS in_image
      FROM tp t FULL OUTER JOIN ip i
        ON t.doc_a = i.doc_a AND t.doc_b = i.doc_b
    ),
    tri AS (
      SELECT coalesce(x.doc_a, a.doc_a) AS doc_a,
             coalesce(x.doc_b, a.doc_b) AS doc_b,
             coalesce(x.in_text, FALSE) AS in_text,
             coalesce(x.in_image, FALSE) AS in_image,
             a.doc_a IS NOT NULL AS in_audio
      FROM ti x FULL OUTER JOIN ap a
        ON x.doc_a = a.doc_a AND x.doc_b = a.doc_b
    ),
    quad AS (
      SELECT coalesce(x.doc_a, v.doc_a) AS doc_a,
             coalesce(x.doc_b, v.doc_b) AS doc_b,
             coalesce(x.in_text, FALSE) AS in_text,
             coalesce(x.in_image, FALSE) AS in_image,
             coalesce(x.in_audio, FALSE) AS in_audio,
             v.doc_a IS NOT NULL AS in_video
      FROM tri x FULL OUTER JOIN vp v
        ON x.doc_a = v.doc_a AND x.doc_b = v.doc_b
    )
    SELECT doc_a, doc_b, {_QUAD_CLASS_SQL} AS dup_class
    FROM quad ORDER BY doc_a, doc_b
    """


@query("crossmodal_quadmodal_consistency", oracle=_quadmodal_oracle())
def crossmodal_quadmodal_consistency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FOUR-modality duplicate adjudication — the decision a
    multimodal curation pipeline makes per candidate pair, across
    text (MinHash-LSH + Jaccard >= 0.5), image (banded dHash, Hamming
    <= HAM_T), audio (banded energy-delta fingerprint), and video
    (banded XOR-fold frame fingerprint, same threshold): a pair
    near-duplicate in all four is a true multimodal duplicate;
    partial agreement localizes WHAT was re-used (same media
    re-captioned, same soundtrack over new footage, one modality's
    banding miss). This query began life as the r13 trimodal
    adjudication (r12 VERDICT ask #3) and absorbed the fourth
    modality when the video tier landed — one row per candidate pair,
    class = the '_'-joined agreeing modalities.

    All four sides run over the SAME augmented corpus; every media
    tier keys by the canonical id (doc_id % 1e6) so a mutated copy
    near-dups its original in ALL media, while the partitions use
    three different residue systems (scenes / scenes+1 / scenes+2) —
    unrelated documents near-dup in at most one media modality
    except where the scenes and scenes+2 residue systems coincide on
    an lcm cycle (the image_video class; see the module docstring's
    sf0.01 measurement), so the pair sets differ by construction and
    the adjudication is non-vacuous.

    Full hash parity by COMPOSITION: the oracle recomposes the
    registered dedup_minhash SQL and the shared image/audio/video
    hash fragments over the same augmented relation, chained through
    three full outer joins on the pair key — drift in ANY tier, the
    augmentation, or the join semantics breaks the hash.

    Scale shape: four banded equi-join pair generators (never
    all-pairs), then ONE shuffle: the four pair sets union with
    one-hot modality flags and a single groupBy(doc_a, doc_b)
    max-aggregate recovers exactly the full-outer-join semantics
    (each generator emits a pair at most once, so a flag's max is
    TRUE iff that modality produced the pair — the r17 optimization
    rewrite; the previous chain of three FullOuter sort-merge joins
    shuffled the same bounded pair sets four times and sorted each
    side; the oracle's full-outer composition is unchanged and the
    driver hash proves equivalence)."""
    from .dedup_ops import dedup_minhash

    t, f = F.lit(True), F.lit(False)

    def flagged(pairs: DataFrame, which: int) -> DataFrame:
        flags = [
            (t if i == which else f).alias(n)
            for i, n in enumerate(
                ("in_text", "in_image", "in_audio", "in_video")
            )
        ]
        return pairs.select("doc_a", "doc_b", *flags)

    tp = flagged(dedup_minhash(spark, sf_dir).select("doc_a", "doc_b"), 0)
    media = [
        _pairs_from(tbl(spark, sf_dir)).select(
            F.col("media_a").alias("doc_a"),
            F.col("media_b").alias("doc_b"),
        )
        for tbl in (
            _xmodal_hash_table,
            _xmodal_audio_table,
            _xmodal_video_table,
        )
    ]
    unioned = tp
    for i, mp in enumerate(media, start=1):
        unioned = unioned.unionByName(flagged(mp, i))
    quad = unioned.groupBy("doc_a", "doc_b").agg(
        *[
            F.max(c).alias(c)
            for c in ("in_text", "in_image", "in_audio", "in_video")
        ]
    )
    return quad.select(
        "doc_a", "doc_b", F.expr(_QUAD_CLASS_SQL).alias("dup_class")
    ).orderBy("doc_a", "doc_b")


# ------------------------------------------------ multimodal funnel


def _multimodal_funnel_oracle() -> str:
    """The pipeline_funnel_contract oracle with the media edge sets
    unioned into the near-dup graph — every stage recomposed from the
    already-registered fragments, the media pairs from the shared
    image/audio/video hash + pair CTEs over the BASE documents
    (exactly what curation_stage_frames(media=True) joins in)."""
    from . import dedup_ops, sampling_ops, text_quality_ops  # noqa: F401
    from ._oracle_shared import _DUCK_TOKS
    from .round10_ops import _QL_W_DUCK

    return f"""
    WITH RECURSIVE
    {_img_hash_cte(prefix="i_")},
    {_pair_cte("i_")},
    {_audio_hash_cte(prefix="a_")},
    {_pair_cte("a_")},
    {_video_hash_cte(prefix="v_")},
    {_pair_cte("v_")},
    gq AS ({ORACLE["gopher_quality_flags"]}),
    gated AS (
      SELECT d.doc_id, d.text FROM documents d
      JOIN gq ON gq.doc_id = d.doc_id AND gq.keep
    ),
    canon AS (
      SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(text)
    ),
    exact_s AS (
      SELECT g.doc_id, g.text FROM gated g
      JOIN canon c ON c.doc_id = g.doc_id
    ),
    pairs0 AS ({ORACLE["dedup_minhash"]}),
    allpairs AS (
      SELECT doc_a, doc_b FROM pairs0
      UNION
      SELECT media_a AS doc_a, media_b AS doc_b FROM i_pairs
      UNION
      SELECT media_a AS doc_a, media_b AS doc_b FROM a_pairs
      UNION
      SELECT media_a AS doc_a, media_b AS doc_b FROM v_pairs
    ),
    pe AS (
      SELECT doc_a, doc_b FROM allpairs
      WHERE doc_a IN (SELECT doc_id FROM exact_s)
        AND doc_b IN (SELECT doc_id FROM exact_s)
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pe
      UNION
      SELECT doc_b AS a, doc_a AS b FROM pe
    ),
    verts AS (SELECT DISTINCT a AS v FROM edges),
    reach(src, dst) AS (
      SELECT v, v FROM verts
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    ),
    comp AS (
      SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
    ),
    st AS (SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM exact_s),
    scores AS (
      SELECT doc_id, CAST(sum({_QL_W_DUCK}) AS BIGINT) AS logit
      FROM st GROUP BY doc_id
    ),
    m AS (
      SELECT c.doc_id, c.cluster_id, coalesce(s.logit, 0) AS logit
      FROM comp c LEFT JOIN scores s USING (doc_id)
    ),
    losers AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               row_number() OVER (
                 PARTITION BY cluster_id ORDER BY logit DESC, doc_id
               ) AS rn
        FROM m
      ) WHERE rn > 1
    ),
    surv AS (
      SELECT doc_id FROM exact_s
      WHERE doc_id NOT IN (SELECT doc_id FROM losers)
    ),
    split AS ({ORACLE["train_val_split"]}),
    curated AS (
      SELECT s.doc_id, sp.split FROM surv s JOIN split sp USING (doc_id)
    )
    SELECT ord, stage, n_docs FROM (
      SELECT 0 AS ord, 'raw' AS stage,
             CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs
      UNION ALL SELECT 1, 'quality_gated',
             CAST((SELECT count(*) FROM gated) AS BIGINT)
      UNION ALL SELECT 2, 'exact_deduped',
             CAST((SELECT count(*) FROM exact_s) AS BIGINT)
      UNION ALL SELECT 3, 'near_deduped',
             CAST((SELECT count(*) FROM surv) AS BIGINT)
      UNION ALL SELECT 4, 'split_train',
             CAST((SELECT count(*) FROM curated WHERE split = 'train')
               AS BIGINT)
      UNION ALL SELECT 5, 'split_val',
             CAST((SELECT count(*) FROM curated WHERE split = 'val')
               AS BIGINT)
    ) ORDER BY ord
    """


@query("multimodal_funnel_contract", oracle=_multimodal_funnel_oracle())
def multimodal_funnel_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`pipelines.curate_corpus` with MEDIA dedup enabled, as a
    driver-certified contract (r12 VERDICT ask #8): stage survival
    counts for the multimodal funnel — raw -> Gopher gate -> exact
    content dedup -> near-dup keeper over the UNION of the text,
    image, audio, and video pair graphs (best-quality keeper) ->
    train/val split — computed from the SAME
    `curation_stage_frames(media=True)` the production pipeline
    publishes from. The oracle recomposes every stage from the
    already-certified fragments with the media edge sets unioned into
    the graph, so drift in any modality's pair semantics, the union
    scoping, or the keeper rule breaks the hash.

    Scale shape: each pair generator is its own banded equi join; the
    union adds one distinct over bounded pair sets; component
    resolution stays edge-list-bounded; the funnel adds six 1-row
    aggregates (the pipeline_funnel_contract shape)."""
    from functools import reduce

    from ..pipelines import curation_stage_frames

    frames = curation_stage_frames(
        spark, sf_dir, near_dup="best_quality", media=True
    )
    stages = [
        (0, "raw", frames["raw"]),
        (1, "quality_gated", frames["quality_gated"]),
        (2, "exact_deduped", frames["exact_deduped"]),
        (3, "near_deduped", frames["near_deduped"]),
        (4, "split_train", frames["curated"].filter(F.col("split") == "train")),
        (5, "split_val", frames["curated"].filter(F.col("split") == "val")),
    ]
    parts = [
        df.agg(F.count(F.lit(1)).cast("long").alias("n_docs")).select(
            F.lit(o).alias("ord"), F.lit(s).alias("stage"), "n_docs"
        )
        for o, s, df in stages
    ]
    return reduce(lambda a, b: a.unionByName(b), parts).orderBy("ord")


# ------------------------------------------------ audio recall twin

_AUDIO_TRUTH_CACHE: dict[tuple[str, str], DataFrame] = {}


def _audio_recall_oracle() -> str:
    from .round12_ops import HAM_T

    return f"""
    WITH {_audio_hash_cte()},
    {_pair_cte()},
    truth AS (
      SELECT ha.scene, ha.media_id AS media_a, hb.media_id AS media_b
      FROM hashes ha JOIN hashes hb
        ON ha.scene = hb.scene AND ha.media_id < hb.media_id
      WHERE bit_count(xor(ha.dhash_lo, hb.dhash_lo))
          + bit_count(xor(ha.dhash_hi, hb.dhash_hi)) <= {HAM_T}
    ),
    found AS (
      SELECT t.scene, t.media_a, t.media_b
      FROM truth t JOIN pairs p
        ON p.media_a = t.media_a AND p.media_b = t.media_b
    )
    SELECT s.scene,
           CAST(s.n_true AS BIGINT) AS n_true,
           CAST(coalesce(f.n_found, 0) AS BIGINT) AS n_found,
           CAST(coalesce(f.n_found, 0) * 100 // s.n_true AS BIGINT)
             AS recall_pct
    FROM (SELECT scene, count(*) AS n_true FROM truth GROUP BY scene) s
    LEFT JOIN (
      SELECT scene, count(*) AS n_found FROM found GROUP BY scene
    ) f ON f.scene = s.scene
    ORDER BY s.scene
    """


@query("audio_lsh_recall", oracle=_audio_recall_oracle())
def audio_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall contract for the banded AUDIO LSH — the accuracy twin
    the image tier carries (image_lsh_recall) and every other
    LSH/ANN path in the repo pairs with its operator: ground truth is
    the within-scene pair set at Hamming <= HAM_T (an equi join on
    the closed-form scene key, never all-pairs), found is the banded
    candidate pipeline's verified output intersected with the truth,
    reported per scene as exact integer percentages. Banding can only
    MISS, so recall_pct <= 100 structurally; measured 100 at every
    SF (a one-sample perturbation flips <= 2 fingerprint bits, so
    within-scene pairs spread <= 4 bits over 4 bands — some band is
    always exact)."""
    from .round12_ops import HAM_T

    h = _audio_hash_table(spark, sf_dir)
    ha = h.select(
        "scene",
        F.col("media_id").alias("media_a"),
        F.col("dhash_lo").alias("lo_a"),
        F.col("dhash_hi").alias("hi_a"),
    )
    hb = h.select(
        F.col("scene").alias("scene_b"),
        F.col("media_id").alias("media_b"),
        F.col("dhash_lo").alias("lo_b"),
        F.col("dhash_hi").alias("hi_b"),
    )
    ham = (
        F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
        + F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
    )
    # persisted (count aggregate + found join) and memoized per
    # (app, sf_dir) — the image_lsh_recall discipline
    truth_key = (spark.sparkContext.applicationId, sf_dir)
    truth = _AUDIO_TRUTH_CACHE.get(truth_key)
    if truth is None:
        truth = (
            ha.join(hb, (F.col("scene") == F.col("scene_b"))
                    & (F.col("media_a") < F.col("media_b")))
            .filter(ham <= HAM_T)
            .select("scene", "media_a", "media_b")
            .persist()
        )
        _AUDIO_TRUTH_CACHE[truth_key] = truth
    found = (
        truth.join(_pairs_from(h), ["media_a", "media_b"])
        .groupBy("scene")
        .agg(F.count("*").alias("n_found"))
    )
    return (
        truth.groupBy("scene")
        .agg(F.count("*").alias("n_true"))
        .join(found, "scene", "left")
        .select(
            "scene",
            F.col("n_true").cast("long"),
            F.coalesce("n_found", F.lit(0)).cast("long").alias("n_found"),
            F.expr("coalesce(n_found, 0) * 100 div n_true")
            .cast("long")
            .alias("recall_pct"),
        )
        .orderBy("scene")
    )


# ------------------------------------------------ language audit


def _lang_confusion_oracle() -> str:
    from .text_ops import lang_pred_ctes

    return f"""
    WITH {lang_pred_ctes()},
    cm AS (
      SELECT lang AS declared_lang, predicted_lang,
             CAST(count(*) AS BIGINT) AS n_docs
      FROM p GROUP BY lang, predicted_lang
    ),
    tot AS (
      SELECT declared_lang, CAST(sum(n_docs) AS BIGINT) AS n_declared
      FROM cm GROUP BY declared_lang
    )
    SELECT cm.declared_lang, cm.predicted_lang, cm.n_docs,
           CAST(cm.n_docs * 1000000 // t.n_declared AS BIGINT) AS share_ppm
    FROM cm JOIN tot t ON t.declared_lang = cm.declared_lang
    ORDER BY cm.declared_lang, cm.predicted_lang
    """


@query("lang_confusion_matrix", oracle=_lang_confusion_oracle())
def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-vs-detected language confusion matrix — the audit a
    curation team runs before trusting either label: each (declared,
    predicted) cell with its count and its integer-ppm share of the
    declared language's documents (mislabeled-corpus detection, e.g.
    'declared en but detected und' concentrations). Composes the SAME
    stopword-profile predictor lang_id_heuristic certifies
    (functions.textfn.lang_id / the shared lang_pred_ctes fragment).

    Scale shape: one map-only predictor pass, one (declared,
    predicted) count aggregate (cells bounded by |langs|^2), one
    dimension-sized totals join. Integer ppm division on both engines
    (the standing div discipline)."""
    from ..functions import textfn

    docs = load_table(spark, sf_dir, "documents")
    cm = (
        docs.select(
            F.col("lang").alias("declared_lang"),
            textfn.lang_id("text").alias("predicted_lang"),
        )
        .groupBy("declared_lang", "predicted_lang")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    tot = cm.groupBy("declared_lang").agg(
        F.sum("n_docs").cast("long").alias("n_declared")
    )
    return (
        cm.join(tot, "declared_lang")
        .select(
            "declared_lang",
            "predicted_lang",
            "n_docs",
            F.expr("n_docs * 1000000 div n_declared")
            .cast("long")
            .alias("share_ppm"),
        )
        .orderBy("declared_lang", "predicted_lang")
    )


# ------------------------------------------------ snapshot diff

# Prior-snapshot fiction, closed-form in both engines (the
# incremental-maintenance residue discipline): docs with
# doc_id % 17 == 3 are ABSENT from the prior snapshot (they diff as
# 'added'), docs with % 17 == 5 carried a different prior text
# (prior hash keyed '~prev' — they diff as 'modified'), and for each
# doc with % 17 == 7 the prior additionally held a row at
# doc_id + 2e6 that no longer exists (diffs as 'deleted').
SNAP_ADDED_RESIDUE = 3
SNAP_MODIFIED_RESIDUE = 5
SNAP_DELETED_RESIDUE = 7
SNAP_DELETED_OFFSET = 2_000_000


@query(
    "corpus_snapshot_diff",
    oracle=f"""
    WITH cur AS (
      SELECT doc_id, md5(coalesce(text, '')) AS h FROM documents
    ),
    prior AS (
      SELECT doc_id,
             CASE WHEN doc_id % 17 = {SNAP_MODIFIED_RESIDUE}
                  THEN md5(coalesce(text, '') || '~prev')
                  ELSE md5(coalesce(text, '')) END AS h
      FROM documents WHERE doc_id % 17 != {SNAP_ADDED_RESIDUE}
      UNION ALL
      SELECT doc_id + {SNAP_DELETED_OFFSET} AS doc_id,
             md5('gone:' || CAST(doc_id AS VARCHAR)) AS h
      FROM documents WHERE doc_id % 17 = {SNAP_DELETED_RESIDUE}
    )
    SELECT coalesce(c.doc_id, p.doc_id) AS doc_id,
           CASE WHEN p.doc_id IS NULL THEN 'added'
                WHEN c.doc_id IS NULL THEN 'deleted'
                WHEN c.h != p.h THEN 'modified'
                ELSE 'unchanged' END AS change
    FROM cur c FULL OUTER JOIN prior p ON c.doc_id = p.doc_id
    ORDER BY doc_id
    """,
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot delta classification — the operation a corpus-
    versioning pipeline runs when a new crawl lands next to the
    previous one (added / deleted / modified / unchanged per
    document, by content hash): one full outer hash join keyed on the
    document id, content compared by md5. The 'previous snapshot'
    here is a deterministic fiction derived from the current table
    (the incremental-maintenance residue discipline — see the module
    constants), so both engines agree on the input pair of snapshots
    for free and every class is structurally populated.

    Scale shape: two map-only hash projections and ONE full outer
    equi join on the id — at 100 TB both sides are parquet snapshot
    reads and the join is the only shuffle; the change column is a
    pure row-local CASE."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    txt = F.coalesce(F.col("text"), F.lit(""))
    cur = docs.select(
        "doc_id", F.md5(txt.cast("binary")).alias("h_cur")
    )
    kept = docs.filter(F.col("doc_id") % 17 != SNAP_ADDED_RESIDUE).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 17 == SNAP_MODIFIED_RESIDUE,
            F.md5(F.concat(txt, F.lit("~prev")).cast("binary")),
        )
        .otherwise(F.md5(txt.cast("binary")))
        .alias("h_prev"),
    )
    gone = docs.filter(F.col("doc_id") % 17 == SNAP_DELETED_RESIDUE).select(
        (F.col("doc_id") + SNAP_DELETED_OFFSET).alias("doc_id"),
        F.md5(
            F.concat(F.lit("gone:"), F.col("doc_id").cast("string"))
            .cast("binary")
        ).alias("h_prev"),
    )
    prior = kept.unionByName(gone)
    return (
        cur.join(prior, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.when(F.col("h_prev").isNull(), F.lit("added"))
            .when(F.col("h_cur").isNull(), F.lit("deleted"))
            .when(F.col("h_cur") != F.col("h_prev"), F.lit("modified"))
            .otherwise(F.lit("unchanged"))
            .alias("change"),
        )
        .orderBy("doc_id")
    )


@query(
    "video_framehash",
    oracle=f"""
    WITH {_video_hash_cte()}
    SELECT media_id, scene,
           dhash_lo AS fp_lo, dhash_hi AS fp_hi
    FROM hashes ORDER BY media_id
    """,
)
def video_framehash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-clip VIDEO fingerprint — the fourth modality's dedup key:
    frame-sampled perceptual hashing (every frame through the real
    PNG encode->decode roundtrip, 2x2 pooling, per-frame dHash) with
    a bitwise XOR fold into one 64-bit clip fingerprint. Pure integer
    arithmetic end to end, so the full derivation hash-matches the
    pre-encode SQL oracle (the image-tier discipline, licensed by the
    r8-certified codec roundtrip identity).

    Scale shape: one map-only Arrow pass, {VIDEO_FRAMES} codec
    roundtrips per clip — at 100 TB the same kernel frame-samples
    real video payloads from a binary column; the fold keeps the
    index entry ONE 64-bit key per clip regardless of clip length."""
    h = _video_hash_table(spark, sf_dir)
    return h.select(
        "media_id", "scene",
        F.col("dhash_lo").alias("fp_lo"),
        F.col("dhash_hi").alias("fp_hi"),
    ).orderBy("media_id")


@query(
    "video_neardup_pairs",
    oracle=f"""
    WITH {_video_hash_cte()},
    {_pair_cte()}
    SELECT media_a, media_b, ham_d FROM pairs
    ORDER BY media_a, media_b
    """,
)
def video_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded near-duplicate video pairs — the SAME banded-LSH pair
    machinery (Spark: _pairs_from; oracle: the shared band/candidate/
    verify fragment) now serving its FOURTH modality: one banding/
    verify/cluster engine for text, image, audio, and video — the
    production media-dedup architecture (hash kernel per modality,
    one candidate engine)."""
    return _pairs_from(_video_hash_table(spark, sf_dir)).orderBy(
        "media_a", "media_b"
    )


@query(
    "video_neardup_clusters",
    oracle=f"""
    WITH RECURSIVE {_video_hash_cte()},
    {_pair_cte()},
    edges AS (
      SELECT media_a AS a, media_b AS b FROM pairs
      UNION ALL
      SELECT media_b AS a, media_a AS b FROM pairs
    ),
    reach(src, dst) AS (
      SELECT media_id, media_id FROM hashes
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    )
    SELECT src AS media_id, min(dst) AS cluster_id
    FROM reach GROUP BY src ORDER BY media_id
    """,
)
def video_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster assignment over the video near-dup graph — the keeper
    step, through the same component machinery as the image and
    audio tiers (edge-list-bounded label propagation, recursive-CTE
    oracle)."""
    from ..operators import connected_components_auto

    h = _video_hash_table(spark, sf_dir)
    pairs = _pairs_from(h)
    labels = connected_components_auto(pairs, "media_a", "media_b")
    return (
        h.select("media_id")
        .join(labels, h["media_id"] == labels["vertex"], "left")
        .select(
            "media_id",
            F.coalesce("component", "media_id").alias("cluster_id"),
        )
        .orderBy("media_id")
    )


_VIDEO_TRUTH_CACHE: dict[tuple[str, str], DataFrame] = {}


def _video_recall_oracle() -> str:
    from .round12_ops import HAM_T

    return f"""
    WITH {_video_hash_cte()},
    {_pair_cte()},
    truth AS (
      SELECT ha.scene, ha.media_id AS media_a, hb.media_id AS media_b
      FROM hashes ha JOIN hashes hb
        ON ha.scene = hb.scene AND ha.media_id < hb.media_id
      WHERE bit_count(xor(ha.dhash_lo, hb.dhash_lo))
          + bit_count(xor(ha.dhash_hi, hb.dhash_hi)) <= {HAM_T}
    ),
    found AS (
      SELECT t.scene, t.media_a, t.media_b
      FROM truth t JOIN pairs p
        ON p.media_a = t.media_a AND p.media_b = t.media_b
    )
    SELECT s.scene,
           CAST(s.n_true AS BIGINT) AS n_true,
           CAST(coalesce(f.n_found, 0) AS BIGINT) AS n_found,
           CAST(coalesce(f.n_found, 0) * 100 // s.n_true AS BIGINT)
             AS recall_pct
    FROM (SELECT scene, count(*) AS n_true FROM truth GROUP BY scene) s
    LEFT JOIN (
      SELECT scene, count(*) AS n_found FROM found GROUP BY scene
    ) f ON f.scene = s.scene
    ORDER BY s.scene
    """


@query("video_lsh_recall", oracle=_video_recall_oracle())
def video_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall contract for the banded VIDEO LSH — the accuracy twin
    every modality's banding carries (image_lsh_recall,
    audio_lsh_recall, lsh_neardup_recall): ground truth is the
    within-scene pair set at XOR-fold Hamming <= HAM_T (closed-form
    scene key, never all-pairs), found is the banded pipeline's
    verified output intersected with the truth, per-scene exact
    integer percentages. A one-frame perturbation spreads <= 4 fold
    bits over 4 bands, so some band is always exact — recall_pct is
    structurally <= 100 and measured 100 at every SF."""
    from .round12_ops import HAM_T

    h = _video_hash_table(spark, sf_dir)
    ha = h.select(
        "scene",
        F.col("media_id").alias("media_a"),
        F.col("dhash_lo").alias("lo_a"),
        F.col("dhash_hi").alias("hi_a"),
    )
    hb = h.select(
        F.col("scene").alias("scene_b"),
        F.col("media_id").alias("media_b"),
        F.col("dhash_lo").alias("lo_b"),
        F.col("dhash_hi").alias("hi_b"),
    )
    ham = (
        F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
        + F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
    )
    truth_key = (spark.sparkContext.applicationId, sf_dir)
    truth = _VIDEO_TRUTH_CACHE.get(truth_key)
    if truth is None:
        truth = (
            ha.join(hb, (F.col("scene") == F.col("scene_b"))
                    & (F.col("media_a") < F.col("media_b")))
            .filter(ham <= HAM_T)
            .select("scene", "media_a", "media_b")
            .persist()
        )
        _VIDEO_TRUTH_CACHE[truth_key] = truth
    found = (
        truth.join(_pairs_from(h), ["media_a", "media_b"])
        .groupBy("scene")
        .agg(F.count("*").alias("n_found"))
    )
    return (
        truth.groupBy("scene")
        .agg(F.count("*").alias("n_true"))
        .join(found, "scene", "left")
        .select(
            "scene",
            F.col("n_true").cast("long"),
            F.coalesce("n_found", F.lit(0)).cast("long").alias("n_found"),
            F.expr("coalesce(n_found, 0) * 100 div n_true")
            .cast("long")
            .alias("recall_pct"),
        )
        .orderBy("scene")
    )
