"""Audio + video index-maintenance lifecycle — the shared engine
(media_index.py) instantiated for the round-13 modalities, completing
every media tier to full lifecycle parity with the image tier:
fingerprint -> banded pairs -> clusters -> recall twin ->
**incremental maintenance** -> **streaming ingest**.

Round 12 proved the maintenance economics for image
(image_neardup_incremental / stream_image_neardup_ingest: the
existing index is a PUBLISHED artifact, only arrivals pay the Arrow
codec kernel, probes hit the PUBLISHED BUCKETED band table with no
Exchange on the index side). Round 13 factored that machinery into
media_index.py — the image tier's driver-certified rows now run the
engine — and this module is the engine applied to the audio and
video fingerprint tables, which expose the same (media_id, scene,
dhash_lo, dhash_hi) surface, so the whole lifecycle is ~a spec per
modality.

Correctness: each incremental query's oracle is the closed-form
delta (the FULL rebuild's pairs restricted to pairs touching an
arrival — incremental ≡ full, the r12 precedent), and each streaming
ingest's oracle is the full rebuild itself (slices partition the
corpus, so per-batch deltas union to exactly the full pair set).
Arrival residues differ per modality (image 1, audio 0, video 2) so
the three tiers exercise different batch/index splits of the corpus
rather than re-proving one split three times.

Reference anchor: the reference (HyeM207/Programmers-DATA) has no
media pipeline; this tier is north-star training-data-pipeline scope
(SURVEY.md §2 "LLM-data-pipeline operators"), extending the dedup
family the way dedup_ops.py did for text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import media_index
from ..registry import query
from .round12_ops import (
    AUDIO_FRAMES,
    AUDIO_SAMPLES,
    IMG_H,
    IMG_W,
    SCENE_DOCS,
    SCENE_MIN,
    _audio_frame,
    _audio_hash_cte,
    _audio_hash_table,
    _pair_cte,
)
from .round13_ops import (
    VIDEO_FRAMES,
    _video_hash_cte,
    _video_hash_frame,
    _video_hash_table,
)

# Arrival residues (doc_id % 3): distinct from the image tier's 1 so
# each modality's maintenance contract proves a different
# batch/existing split of the corpus.
AUDIO_ARRIVAL_RESIDUE = 0
VIDEO_ARRIVAL_RESIDUE = 2

AUDIO_SPEC = media_index.MediaIndexSpec(
    name="audio",
    store_env="SPARK_GRAFT_AUDIO_STORE",
    # content-address fingerprint: LIVE algorithm constants (the
    # pair-store r8 lesson)
    algo_fp=f"audiofp|{SCENE_MIN}|{SCENE_DOCS}|{AUDIO_SAMPLES}|{AUDIO_FRAMES}|v1",
    hash_table=_audio_hash_table,
    hash_frame=_audio_frame,
    arrival_residue=AUDIO_ARRIVAL_RESIDUE,
)

VIDEO_SPEC = media_index.MediaIndexSpec(
    name="video",
    store_env="SPARK_GRAFT_VIDEO_STORE",
    algo_fp=f"videofold|{SCENE_MIN}|{SCENE_DOCS}|{IMG_W}x{IMG_H}|{VIDEO_FRAMES}|v1",
    hash_table=_video_hash_table,
    hash_frame=_video_hash_frame,
    arrival_residue=VIDEO_ARRIVAL_RESIDUE,
)


@query(
    "audio_neardup_incremental",
    oracle=f"""
    WITH {_audio_hash_cte()},
    {_pair_cte()}
    SELECT media_a, media_b, ham_d FROM pairs
    WHERE media_a % 3 = {AUDIO_ARRIVAL_RESIDUE}
       OR media_b % 3 = {AUDIO_ARRIVAL_RESIDUE}
    ORDER BY media_a, media_b
    """,
)
def audio_neardup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental AUDIO near-dup maintenance: arrivals (doc_id % 3
    == 0) are fingerprinted (only the batch pays the WAV codec
    kernel), the existing index is read from the published artifact,
    and arrival bands probe the published BUCKETED band table — the
    engine's incremental_delta with AUDIO_SPEC, i.e. the EXACT code
    path the driver-certified image_neardup_incremental runs.
    Oracle: the full audio rebuild restricted to pairs touching an
    arrival (incremental ≡ full)."""
    return media_index.incremental_delta(spark, sf_dir, AUDIO_SPEC)


@query(
    "video_neardup_incremental",
    oracle=f"""
    WITH {_video_hash_cte()},
    {_pair_cte()}
    SELECT media_a, media_b, ham_d FROM pairs
    WHERE media_a % 3 = {VIDEO_ARRIVAL_RESIDUE}
       OR media_b % 3 = {VIDEO_ARRIVAL_RESIDUE}
    ORDER BY media_a, media_b
    """,
)
def video_neardup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental VIDEO near-dup maintenance: arrivals (doc_id % 3
    == 2) pay the per-frame PNG codec kernel (VIDEO_FRAMES roundtrips
    per clip — the expensive hash, which is exactly why a production
    video index NEVER re-hashes its existing corpus), the existing
    fingerprint index is read from the published artifact, and the
    probe hits the published bucketed band table. Engine:
    media_index.incremental_delta with VIDEO_SPEC. Oracle: the full
    video rebuild restricted to pairs touching an arrival."""
    return media_index.incremental_delta(spark, sf_dir, VIDEO_SPEC)


@query(
    "stream_audio_neardup_ingest",
    oracle=f"""
    WITH {_audio_hash_cte()},
    {_pair_cte()}
    SELECT media_a, media_b, ham_d FROM pairs
    ORDER BY media_a, media_b
    """,
)
def stream_audio_neardup_ingest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Structured Streaming AUDIO index maintenance — the engine's
    replay harness (media_index.streaming_ingest, the
    stream_image_neardup_ingest protocol) with AUDIO_SPEC: per
    micro-batch, fingerprint the arrivals, append their bands to the
    accumulated bucketed band table, probe it, append the verified
    pair delta. Slices partition the corpus so the accumulated store
    equals the full rebuild exactly — which is the oracle."""
    return media_index.streaming_ingest(spark, sf_dir, AUDIO_SPEC)


@query(
    "stream_video_neardup_ingest",
    oracle=f"""
    WITH {_video_hash_cte()},
    {_pair_cte()}
    SELECT media_a, media_b, ham_d FROM pairs
    ORDER BY media_a, media_b
    """,
)
def stream_video_neardup_ingest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Structured Streaming VIDEO index maintenance — the engine's
    replay harness with VIDEO_SPEC: the newest modality gets the
    full production lifecycle (publish once, probe bucketed, pay
    codec cost per arrival batch only) the image tier certified.
    Oracle: the full video rebuild (per-batch deltas union to it
    exactly)."""
    return media_index.streaming_ingest(spark, sf_dir, VIDEO_SPEC)
