"""The media-index maintenance engine — ONE implementation of the
published-artifact lifecycle every media modality shares.

Round 12 built the lifecycle for the image tier (hash index published
through the K8 validated-swap layer, band table published as a
bucketed layout, incremental per-batch maintenance, Structured
Streaming ingest); round 13 added audio and video modalities whose
fingerprint tables expose the same (media_id, scene, dhash_lo,
dhash_hi) surface. This module factors the lifecycle into a generic
engine parameterized by a :class:`MediaIndexSpec` — the image tier's
round-12 code now delegates here (so the driver-certified image
sentinels certify THIS code), and the audio/video tiers instantiate
the same engine with their own Arrow hash kernels.

Per-modality pieces a spec supplies:

- ``hash_table``   — the full-corpus fingerprint table (memoized,
  persisted; the producer pays the Arrow codec kernel once).
- ``hash_frame``   — the same kernel over an ARBITRARY (doc_id, text)
  frame with a frozen scene count: what a maintenance batch runs over
  its arrivals only.
- naming/env knobs — store env var, content-address algorithm
  fingerprint (LIVE constants, never hand-written literals — the
  pair-store r8 lesson), catalog prefixes. The image tier's knobs
  reproduce its round-12 identities exactly (artifact paths, catalog
  names, ingest scratch env), so published artifacts and tests carry
  over unchanged.

Shared machinery the engine composes (lazily, to keep the dependency
one-way: query modules import the engine, the engine imports the
banding fragments at call time): ``_band_frame`` / ``HAM_T`` from
``queries.round12_ops`` — the same banding/verify layer the pair and
cluster queries use, so maintenance probes and full rebuilds can
never disagree on candidate semantics.

Reference anchor: the reference (HyeM207/Programmers-DATA) has no
media pipeline; this engine is north-star training-data-pipeline
scope (SURVEY.md §2 "LLM-data-pipeline operators").
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class MediaIndexSpec:
    """Everything modality-specific about a published media index."""

    name: str
    # base-dir override env var for the published hash/band artifacts
    store_env: str
    # LIVE algorithm constants baked into the content address (a
    # constant bump re-keys the store instead of serving stale bits)
    algo_fp: str
    # full-corpus fingerprint table: (spark, sf_dir) -> DataFrame with
    # at least (media_id, scene, dhash_lo, dhash_hi); memoized+persisted
    hash_table: Callable[[SparkSession, str], DataFrame]
    # the Arrow kernel over a (doc_id, text) frame with an explicit
    # scene count: (spark, docs, scenes) -> same columns
    hash_frame: Callable[[SparkSession, DataFrame, int], DataFrame]
    # doc_id % 3 residue of the synthetic "arrival batch"
    arrival_residue: int
    # bucketed band-table knobs; catalog_prefix keeps the image tier's
    # round-12 catalog identity ("img") stable
    n_buckets: int = 8
    catalog_prefix: str | None = None
    # streaming-ingest scratch knobs (env var + mkdtemp prefix)
    ingest_env: str | None = None
    ingest_prefix: str | None = None
    # replay micro-batch count (the stream_upsert_publish protocol)
    n_slices: int = 3

    @property
    def cat(self) -> str:
        return self.catalog_prefix or self.name

    @property
    def ing_env(self) -> str:
        return self.ingest_env or f"SPARK_GRAFT_{self.name.upper()}_INGEST_STORE"

    @property
    def ing_prefix(self) -> str:
        return self.ingest_prefix or f"{self.name}ingest_"


# Memoized per _memo_key: (applicationId, sf_dir, spec.name,
# resolved store table dir) — the last element makes a mid-session
# SPARK_GRAFT_*_STORE change naturally miss the cache instead of
# serving the previously published artifact (r13 ADVICE #2). The
# image tier's round-12 module-level caches alias these dicts so
# existing tests' .clear() calls (and bench._reset's package-wide
# *_CACHE sweep) reach them unchanged.
_MemoKey = tuple[str, str, str, str]
_HASH_STORE_CACHE: dict[_MemoKey, DataFrame] = {}
_BAND_STORE_CACHE: dict[_MemoKey, DataFrame] = {}
_INCR_INDEX_CACHE: dict[_MemoKey, DataFrame] = {}
_INGEST_CACHE: dict[_MemoKey, DataFrame] = {}


def store_table_dir(spec: MediaIndexSpec, sf_dir: str) -> str:
    """Content-addressed location for sf_dir's published hash index:
    fixture bytes (path, size, mtime) + the live algorithm parameters
    + an algo version (all inside spec.algo_fp)."""
    from .storeutil import store_base

    base = store_base(spec.store_env, f"spark_graft_{spec.name[:3]}_store")
    doc = os.path.abspath(os.path.join(sf_dir, "documents.parquet"))
    try:
        st = os.stat(doc)
        ident = f"{doc}|{st.st_size}|{st.st_mtime_ns}"
    except OSError:
        ident = f"{doc}|missing"
    fp = hashlib.md5(f"{ident}|{spec.algo_fp}".encode()).hexdigest()[:16]
    return os.path.join(base, fp, f"{spec.name}_hashes")


def _memo_key(
    spark: SparkSession, sf_dir: str, spec: MediaIndexSpec
) -> tuple[str, str, str, str]:
    """Cache key for the published-artifact memos: binds the RESOLVED
    store table dir (env var + fixture fingerprint) so changing
    SPARK_GRAFT_*_STORE mid-session misses the cache naturally."""
    return (
        spark.sparkContext.applicationId,
        sf_dir,
        spec.name,
        store_table_dir(spec, sf_dir),
    )


def hash_store(
    spark: SparkSession, sf_dir: str, spec: MediaIndexSpec
) -> DataFrame:
    """The fingerprint index AS A PUBLISHED ARTIFACT — the
    verified_pair_store pattern for the media tier: computed once per
    corpus version (the producer pays the Arrow codec kernel wherever
    IT is measured), published through the K8 validated-swap layer,
    read by every maintenance batch / dedup report afterwards. The
    parquet roundtrip of long columns is exact, so correctness is
    unaffected. An EMPTY index (legal on an empty fixture) is
    returned directly without publishing (publish_versioned rejects
    empty tables by design)."""
    key = _memo_key(spark, sf_dir, spec)
    cached = _HASH_STORE_CACHE.get(key)
    if cached is not None:
        return cached
    from .publish import publish_versioned, read_versioned

    table_dir = store_table_dir(spec, sf_dir)
    try:
        stored = read_versioned(spark, table_dir)
    except FileNotFoundError:
        computed = spec.hash_table(spark, sf_dir)
        if computed.limit(1).count() == 0:  # bounded 1-value scalar
            return computed
        publish_versioned(computed, table_dir)
        stored = read_versioned(spark, table_dir)
    _HASH_STORE_CACHE[key] = stored
    return stored


def band_store(
    spark: SparkSession, sf_dir: str, spec: MediaIndexSpec
) -> DataFrame:
    """The index's BAND table as a published BUCKETED layout — the
    probe side of incremental media dedup: the (band, bval) exploded
    table is written ONCE, hash-bucketed by the join key via
    sinks.save_bucketed, and every maintenance batch equi-joins
    arrival bands against it with NO Exchange on the index side and
    no per-run O(index) band re-derivation. A fresh session that
    finds the files already on disk re-registers the external
    bucketed table via DDL (no rewrite)."""
    key = _memo_key(spark, sf_dir, spec)
    cached = _BAND_STORE_CACHE.get(key)
    if cached is not None:
        return cached
    from . import sinks
    from .queries.round12_ops import _band_frame

    path = os.path.join(
        os.path.dirname(store_table_dir(spec, sf_dir)), f"{spec.name}_bands"
    )
    # table identity binds to the FULL path (not just the fixture
    # fingerprint): two store base dirs in one session must not share
    # a catalog entry pointing at whichever was registered first
    name = (
        f"{spec.cat}_bands_" + hashlib.md5(path.encode()).hexdigest()[:12]
    )
    if not spark.catalog.tableExists(name):
        if os.path.isdir(path) and any(
            f.endswith(".parquet") for f in os.listdir(path)
        ):
            spark.sql(
                f"CREATE TABLE {name} "
                f"(media_id BIGINT, band INT, bval BIGINT) "
                f"USING PARQUET "
                f"CLUSTERED BY (band, bval) "
                f"INTO {spec.n_buckets} BUCKETS "
                f"LOCATION '{path}'"
            )
        else:
            bands = _band_frame(hash_store(spark, sf_dir, spec))
            if bands.limit(1).count() == 0:  # bounded 1-value scalar
                return bands
            sinks.save_bucketed(
                bands, name, path,
                bucket_by=["band", "bval"],
                n_buckets=spec.n_buckets,
                sort_by=["band", "bval"],
            )
    table = spark.table(name)
    _BAND_STORE_CACHE[key] = table
    return table


_CLUSTER_STORE_CACHE: dict[_MemoKey, DataFrame] = {}
_PAIR_STORE_CACHE: dict[_MemoKey, DataFrame] = {}


def pair_store(
    spark: SparkSession, sf_dir: str, spec: MediaIndexSpec
) -> DataFrame:
    """The verified near-dup PAIR set as a published artifact — the
    text tier's ``dedup_ops.verified_pair_store`` pattern for the
    media index (its fourth published table: hashes, bands, clusters,
    pairs). Computed ONCE per corpus version and read by every
    composer afterwards (the multimodal funnel, dup-rate reports):
    at 100 TB the full-corpus pair graph is an artifact a curation
    run reads, never something each report re-derives.

    The producer itself composes the other published artifacts: the
    candidate self-join reads the BUCKETED band table on both sides
    (bucket-aligned, zero Exchange — the image_hamming_topk plan
    shape), and the Hamming rerank reads the published hash store, so
    even the one-time build never re-runs the Arrow codec kernel.
    Content is exactly ``_pairs_from(hash_table)`` (parquet
    roundtrips of long columns are exact); columns
    (media_a, media_b, ham_d), normalized media_a < media_b. An
    empty pair set (legal: a corpus with no near-dups) is returned
    directly without publishing (publish_versioned rejects empty
    tables by design)."""
    key = _memo_key(spark, sf_dir, spec)
    cached = _PAIR_STORE_CACHE.get(key)
    if cached is not None:
        return cached
    from .publish import publish_versioned, read_versioned
    from .queries.round12_ops import HAM_T

    table_dir = os.path.join(
        os.path.dirname(store_table_dir(spec, sf_dir)), f"{spec.name}_pairs"
    )
    try:
        stored = read_versioned(spark, table_dir)
    except FileNotFoundError:
        h = hash_store(spark, sf_dir, spec)
        if h.limit(1).count() == 0:  # bounded 1-value scalar
            return spark.createDataFrame(
                [], "media_a long, media_b long, ham_d int"
            )
        b = band_store(spark, sf_dir, spec)
        cand = (
            b.alias("a")
            .join(b.alias("b"), ["band", "bval"])
            .filter(F.col("a.media_id") < F.col("b.media_id"))
            .select(
                F.col("a.media_id").alias("media_a"),
                F.col("b.media_id").alias("media_b"),
            )
            .distinct()
        )
        ha = h.select(
            F.col("media_id").alias("media_a"),
            F.col("dhash_lo").alias("lo_a"),
            F.col("dhash_hi").alias("hi_a"),
        )
        hb = h.select(
            F.col("media_id").alias("media_b"),
            F.col("dhash_lo").alias("lo_b"),
            F.col("dhash_hi").alias("hi_b"),
        )
        computed = (
            cand.join(ha, "media_a")
            .join(hb, "media_b")
            .withColumn("ham_d", _ham())
            .filter(F.col("ham_d") <= HAM_T)
            .select("media_a", "media_b", "ham_d")
        )
        if computed.limit(1).count() == 0:  # bounded 1-value scalar
            return computed
        publish_versioned(computed, table_dir)
        stored = read_versioned(spark, table_dir)
    _PAIR_STORE_CACHE[key] = stored
    return stored


def cluster_store(
    spark: SparkSession, sf_dir: str, spec: MediaIndexSpec
) -> DataFrame:
    """Cluster assignments over the EXISTING corpus (doc_id % 3 !=
    spec.arrival_residue) as a published artifact — the third
    published table of the media index (hashes, bands, clusters),
    and the state incremental cluster maintenance starts from: at
    100 TB the cluster table is computed once per corpus version and
    every ingest batch MERGES into it (incremental_clusters below)
    instead of re-clustering the corpus. Columns: (media_id,
    cluster_id), cluster_id = min member id; singletons map to
    themselves. An empty existing corpus returns the computed empty
    frame directly (publish_versioned rejects empty tables)."""
    key = _memo_key(spark, sf_dir, spec)
    cached = _CLUSTER_STORE_CACHE.get(key)
    if cached is not None:
        return cached
    from .operators import connected_components_auto
    from .publish import publish_versioned, read_versioned
    from .queries.round12_ops import _pairs_from

    table_dir = os.path.join(
        os.path.dirname(store_table_dir(spec, sf_dir)),
        f"{spec.name}_clusters_r{spec.arrival_residue}",
    )
    try:
        stored = read_versioned(spark, table_dir)
    except FileNotFoundError:
        h = hash_store(spark, sf_dir, spec).filter(
            F.col("media_id") % 3 != spec.arrival_residue
        )
        labels = connected_components_auto(
            _pairs_from(h), "media_a", "media_b"
        )
        computed = (
            h.select("media_id")
            .join(labels, h["media_id"] == labels["vertex"], "left")
            .select(
                "media_id",
                F.coalesce("component", "media_id").alias("cluster_id"),
            )
        )
        if computed.limit(1).count() == 0:  # bounded 1-value scalar
            return computed
        publish_versioned(computed, table_dir)
        stored = read_versioned(spark, table_dir)
    _CLUSTER_STORE_CACHE[key] = stored
    return stored


def incremental_clusters(
    spark: SparkSession, sf_dir: str, spec: MediaIndexSpec
) -> DataFrame:
    """Incremental cluster maintenance — the step AFTER the pair
    delta: merge an ingest batch into the PUBLISHED cluster table by
    star contraction, never re-clustering the existing corpus.

    The existing cluster table contracts the whole existing pair
    graph into star edges (member -> cluster root); the batch's pair
    delta (incremental_delta — arrival-proportional by construction)
    is the only new connectivity, so components over
    (stars ∪ delta) equal the FULL rebuild's components exactly:
    contracting a subgraph's components preserves connectivity of
    the union, delta edges reach non-root members through their star
    edge, and labels are vertex ids so min-propagation recovers the
    true minimum member per merged cluster. The registered oracle IS
    the full rebuild, so any gap in that argument breaks the hash.

    Scale shape: reads two published artifacts (clusters, hashes —
    nothing about the existing corpus is re-hashed, re-paired, or
    re-clustered), runs component resolution over |existing stars| +
    |delta| edges, and the delta side is proportional to the arrival
    batch. This is how a production media-dedup index absorbs a
    day's crawl.

    Round 17: the star-contraction merge itself lives in
    ``operators.merge_clusters`` (one engine for all five families);
    this wrapper supplies the media family's stored/delta/universe
    frames."""
    from .operators import merge_clusters

    return merge_clusters(
        stored=cluster_store(spark, sf_dir, spec),
        delta=incremental_delta(spark, sf_dir, spec),
        ids=hash_store(spark, sf_dir, spec).select("media_id"),
        id_col="media_id",
        pair_cols=("media_a", "media_b"),
    ).orderBy("media_id")


def _ham(prefix_a: str = "a", prefix_b: str = "b"):
    return (
        F.bit_count(F.col(f"lo_{prefix_a}").bitwiseXOR(F.col(f"lo_{prefix_b}")))
        + F.bit_count(F.col(f"hi_{prefix_a}").bitwiseXOR(F.col(f"hi_{prefix_b}")))
    ).cast("int")


def incremental_delta(
    spark: SparkSession, sf_dir: str, spec: MediaIndexSpec
) -> DataFrame:
    """Incremental near-dup maintenance — the operation a production
    media pipeline runs per ingest batch: NEW arrivals (doc_id % 3 ==
    spec.arrival_residue) are hashed and band-joined against the
    EXISTING index PLUS each other; nothing about the existing corpus
    is re-paired. The output is exactly the pair DELTA the batch
    contributes.

    Correctness: incremental ≡ full — banding and Hamming are
    per-pair local, so the delta has a closed form: the FULL
    rebuild's pairs restricted to those touching an arrival. Each
    modality's registered oracle IS that restriction, so any
    asymmetry in the incremental join breaks the hash.

    Scale shape: the EXISTING index is read from the PUBLISHED
    artifact (hash_store — nothing about the existing corpus is even
    re-hashed), only the arrival batch pays the Arrow codec kernel,
    and the band probe joins arrival bands against the PUBLISHED
    BUCKETED band table — no Exchange and no per-run band
    re-derivation on the index side; cost proportional to the ARRIVAL
    batch and its bucket mates, never the index size."""
    from .catalog import load_table
    from .queries.round12_ops import (
        HAM_T,
        _band_frame,
        _doc_count,
        _scene_count,
    )

    # persisted: the unioned index feeds THREE branches (the band
    # table and both Hamming-lookup sides). Memoized per (app,
    # sf_dir, modality) so repeated invocations don't stack cached
    # RDDs (the r12 ADVICE #1 discipline).
    key = _memo_key(spark, sf_dir, spec)
    h = _INCR_INDEX_CACHE.get(key)
    if h is None:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        scenes = _scene_count(_doc_count(spark, sf_dir))
        stored = hash_store(spark, sf_dir, spec)
        existing = stored.filter(
            F.col("media_id") % 3 != spec.arrival_residue
        )
        arrivals = spec.hash_frame(
            spark,
            docs.filter(F.col("doc_id") % 3 == spec.arrival_residue),
            scenes,
        )
        h = existing.unionByName(arrivals).persist()
        _INCR_INDEX_CACHE[key] = h
    arrivals = h.filter(F.col("media_id") % 3 == spec.arrival_residue)
    ab = _band_frame(arrivals)
    # index bands come from the PUBLISHED bucketed band table (the
    # full corpus's bands — identical content to _band_frame(h), but
    # pre-bucketed by the join key so the probe plans with no
    # Exchange and no per-run O(index) explode)
    allb = band_store(spark, sf_dir, spec)
    # candidate = arrival x (existing + arrivals), normalized a < b;
    # an arrival-arrival pair appears from both sides of the probe,
    # the DISTINCT collapses it to one row.
    cand = (
        ab.alias("a")
        .join(allb.alias("b"), ["band", "bval"])
        .filter(F.col("a.media_id") != F.col("b.media_id"))
        .select(
            F.least("a.media_id", "b.media_id").alias("media_a"),
            F.greatest("a.media_id", "b.media_id").alias("media_b"),
        )
        .distinct()
    )
    ha = h.select(
        F.col("media_id").alias("media_a"),
        F.col("dhash_lo").alias("lo_a"),
        F.col("dhash_hi").alias("hi_a"),
    )
    hb = h.select(
        F.col("media_id").alias("media_b"),
        F.col("dhash_lo").alias("lo_b"),
        F.col("dhash_hi").alias("hi_b"),
    )
    return (
        cand.join(ha, "media_a")
        .join(hb, "media_b")
        .withColumn("ham_d", _ham())
        .filter(F.col("ham_d") <= HAM_T)
        .select("media_a", "media_b", "ham_d")
        .orderBy("media_a", "media_b")
    )


def streaming_ingest(
    spark: SparkSession, sf_dir: str, spec: MediaIndexSpec
) -> DataFrame:
    """Structured Streaming composed with incremental index
    maintenance — the capstone media-dedup lifecycle: documents
    ARRIVE as a stream, each micro-batch is hashed (the modality's
    Arrow codec kernel), band-probed against the ACCUMULATED index
    (existing hashes plus the batch itself), and the verified pair
    delta is appended to the pair store; the batch's hashes then join
    the index. Replay protocol per stream_upsert_publish:
    spec.n_slices doc_id-contiguous slices dropped between
    processAllAvailable() drains, so batch order is exact.

    Correctness closed form (full hash parity for an end-to-end
    streaming ingest): slices partition the corpus, so every near-dup
    pair is discovered EXACTLY ONCE — in the batch of its later
    member (same-batch pairs via the batch x batch side of the probe,
    cross-batch pairs when the later member probes the stored index).
    The union of the per-batch deltas is therefore EXACTLY the full
    rebuild's pair set, which is each modality's oracle. A dropped
    batch, a double probe, or an index append raced ahead of its
    probe all break the hash.

    Scale shape: per batch one Arrow hash pass over the ARRIVALS, one
    arrival-proportional APPEND of the batch's bands to a bucketed
    band table, and one equi-join of arrival bands against that
    table's bucket layout — no per-batch O(index) band re-derivation.
    Scene count is frozen from the index's initial configuration
    (computed once up front), exactly how a production
    perceptual-hash index pins its parameters at creation. At 100 TB
    the parquet replay source binds to Kafka and the hash/pair stores
    are the published bucketed tables.

    Round 16: the replay loop itself lives in ``ingest.replay_ingest``
    (r15 VERDICT ask #7) — this wrapper supplies the media family's
    callbacks (Arrow dHash kernel, dHash band explode, Hamming
    verify) and the memo."""
    from .catalog import load_table
    from .ingest import replay_ingest
    from .queries.round12_ops import (
        HAM_T,
        _band_frame,
        _doc_count,
        _scene_count,
    )

    # Same _memo_key discipline as the four store memos (r14 ADVICE
    # #1): the checkpointed result is location-independent once built,
    # but the uniform key keeps the mid-session-env-change staleness
    # class closed for every memo in this module.
    key = _memo_key(spark, sf_dir, spec)
    cached = _INGEST_CACHE.get(key)
    if cached is not None:
        return cached

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    n_docs = _doc_count(spark, sf_dir)
    scenes = _scene_count(n_docs)
    if n_docs == 0:
        return spark.createDataFrame(
            [], "media_a long, media_b long, ham_d int"
        )

    def verify(cand: DataFrame, index: DataFrame) -> DataFrame:
        ha = index.select(
            F.col("media_id").alias("media_a"),
            F.col("dhash_lo").alias("lo_a"),
            F.col("dhash_hi").alias("hi_a"),
        )
        hb = index.select(
            F.col("media_id").alias("media_b"),
            F.col("dhash_lo").alias("lo_b"),
            F.col("dhash_hi").alias("hi_b"),
        )
        return (
            cand.join(ha, "media_a")
            .join(hb, "media_b")
            .withColumn("ham_d", _ham())
            .filter(F.col("ham_d") <= HAM_T)
            .select("media_a", "media_b", "ham_d")
        )

    result = replay_ingest(
        spark,
        docs,
        slice_col="doc_id",
        state_frame=lambda s, bdf: spec.hash_frame(
            s, bdf.select("doc_id", "text"), scenes
        ),
        index_select=lambda st: st,
        band_frame=_band_frame,
        verify=verify,
        id_col="media_id",
        pair_cols=("media_a", "media_b"),
        band_cols=("band", "bval"),
        pair_schema="media_a long, media_b long, ham_d int",
        store_env=spec.ing_env,
        scratch_prefix=spec.ing_prefix,
        table_prefix=f"{spec.cat}ingest_bands_",
        n_slices=spec.n_slices,
        n_buckets=spec.n_buckets,
    )
    _INGEST_CACHE[key] = result
    return result
