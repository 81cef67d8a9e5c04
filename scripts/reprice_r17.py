"""Round-17 green-controls re-price (r16 VERDICT ask #2): the
polluted r16 driver run read ``text_neardup_clusters_incremental`` at
14.06s vs its 2.23s prior (x6.3 — far beyond the x1.48 control
inflation), with ``lsh_neardup_recall`` x2.6 and the two bloom pairs
~x3 alongside. Every clean-controls reading is flat, so the standing
adjudication keeps them `done` — this script produces the decisive
green-controls record FIRST THING in r17, before any suite run heats
the box (r16 lesson: back-to-back full-suite + bench fires the gate).

It also tests the verdict's attribution hypothesis directly: the
text pair-store build cost landing on the incremental-clusters query
via a run-order change. Protocol: flat controls first (the run LABELS
itself polluted when they read above bench.CONTROL_POLLUTED_RATIO vs
the committed prior), then ``text_neardup_clusters_incremental`` is
timed COLD (very first execution in the session, fresh scratch store
— pays the verified-pair-store build AND codegen) and WARM
(min-of-3 after the store is published), so the store-build share of
any inflated reading is separable. Then min-of-3 for the other three
watch names. Prints one JSON blob for SCALE.md adjudication."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

from programmers_data_spark.embedding_index import EMB_STORE_ENV
from programmers_data_spark.queries.dedup_ops import PAIR_STORE_ENV
from programmers_data_spark.queries.interchange_ops import JSONL_STORE_ENV
from programmers_data_spark.queries.media_lifecycle_ops import (
    AUDIO_SPEC,
    VIDEO_SPEC,
)
from programmers_data_spark.queries.round12_ops import IMG_STORE_ENV

os.environ[PAIR_STORE_ENV] = tempfile.mkdtemp(prefix="pds_price17_pairs_")
os.environ[JSONL_STORE_ENV] = tempfile.mkdtemp(prefix="pds_price17_jsonl_")
os.environ[IMG_STORE_ENV] = tempfile.mkdtemp(prefix="pds_price17_img_")
os.environ[AUDIO_SPEC.store_env] = tempfile.mkdtemp(prefix="pds_price17_aud_")
os.environ[VIDEO_SPEC.store_env] = tempfile.mkdtemp(prefix="pds_price17_vid_")
os.environ[EMB_STORE_ENV] = tempfile.mkdtemp(prefix="pds_price17_emb_")

from bench import (  # noqa: E402
    CONTROL_POLLUTED_RATIO,
    CONTROLS,
    _force,
    _host_speed_index,
    _host_steal_under_load,
    _reset,
    control_median_ratio,
)
from programmers_data_spark import registry  # noqa: E402
from programmers_data_spark.session import get_spark  # noqa: E402

# The x6.3 outlier and the three alongside-it anomalies from the
# polluted r16 driver run (VERDICT watch item), plus first prices
# for the round-17 NEW registrations (published-store read paths)
# — the graft convention: min-of-3 in a gated standalone session.
PRICED = [
    "text_neardup_clusters_incremental",
    "lsh_neardup_recall",
    "bloom_decontam",
    "bloom_decontam_misses",
    "embedding_cos_topk",
    "embedding_cluster_profile",
]


def _min_of(spark, sf_dir: str, name: str, n: int) -> float:
    _reset(spark)
    _force(registry.QUERIES[name](spark, sf_dir))  # untimed warmup
    best = float("inf")
    for _ in range(n):
        _reset(spark)
        t0 = time.perf_counter()
        _force(registry.QUERIES[name](spark, sf_dir))
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="pds-reprice-r17")
    registry.load_all()
    prior_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_DETAIL.json",
    )
    prior = json.load(open(prior_path))["queries"]

    # bench-protocol warmups: codegen + Arrow worker + cold lineitem
    # page cache (none of these touch the text pair store, so the
    # cold reading below stays cold)
    _force(registry.QUERIES["mau"](spark, sf_dir))
    spark.range(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    _force(spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")))

    controls = {n: _min_of(spark, sf_dir, n, 2) for n in CONTROLS}
    control_ratio = control_median_ratio(controls, prior)
    out = {
        "host_speed_md5_64mb": _host_speed_index(),
        "host_steal_pct_under_load": _host_steal_under_load(),
        "controls": controls,
        "control_ratio": control_ratio,
        "polluted": (
            None
            if control_ratio is None
            else control_ratio > CONTROL_POLLUTED_RATIO
        ),
        "prior": {n: prior.get(n) for n in PRICED + CONTROLS},
    }

    # COLD: the session's very first execution of the incremental
    # clusters query against a fresh scratch store — pays the
    # verified-pair-store build + publish AND first-plan codegen.
    # This is the worst case a run-order change could charge to it.
    _reset(spark)
    t0 = time.perf_counter()
    _force(
        registry.QUERIES["text_neardup_clusters_incremental"](spark, sf_dir)
    )
    out["text_neardup_clusters_incremental_cold"] = round(
        time.perf_counter() - t0, 4
    )
    # WARM: store published, min-of-3 — the bench's steady-state
    # accounting (its untimed per-query warmup run pays the build).
    out["priced_min_of_3"] = {
        name: _min_of(spark, sf_dir, name, 3) for name in PRICED
    }
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
