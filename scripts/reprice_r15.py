"""Round-15 gated re-price of the r14 disputed tail (r14 VERDICT ask
#3): one standalone session, flat controls FIRST (the run LABELS
itself polluted when the controls read above bench.CONTROL_POLLUTED_RATIO — all timings still
print, and SCALE.md adjudication discards them by rule), then
min-of-3 isolated timings for the seven disputed queries. Prints one
JSON blob for SCALE.md adjudication."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# bench's main() sets up per-run store envs; we need the same
# isolation without its timed loop, so replicate the env pinning
# before any query module loads.
import tempfile

from programmers_data_spark.queries.dedup_ops import PAIR_STORE_ENV
from programmers_data_spark.queries.interchange_ops import JSONL_STORE_ENV
from programmers_data_spark.queries.media_lifecycle_ops import (
    AUDIO_SPEC,
    VIDEO_SPEC,
)
from programmers_data_spark.queries.round12_ops import IMG_STORE_ENV

os.environ[PAIR_STORE_ENV] = tempfile.mkdtemp(prefix="pds_reprice_pairs_")
os.environ[JSONL_STORE_ENV] = tempfile.mkdtemp(prefix="pds_reprice_jsonl_")
os.environ[IMG_STORE_ENV] = tempfile.mkdtemp(prefix="pds_reprice_img_")
os.environ[AUDIO_SPEC.store_env] = tempfile.mkdtemp(prefix="pds_reprice_aud_")
os.environ[VIDEO_SPEC.store_env] = tempfile.mkdtemp(prefix="pds_reprice_vid_")

from bench import (  # noqa: E402
    CONTROL_POLLUTED_RATIO,
    CONTROLS,
    _force,
    _host_speed_index,
    _reset,
    control_median_ratio,
)
from programmers_data_spark import registry  # noqa: E402
from programmers_data_spark.session import get_spark  # noqa: E402

DISPUTED = [
    "multimodal_funnel_contract",
    "crossmodal_quadmodal_consistency",
    "decontam_overlap",
    "dedup_clusters",
    "nation_pagerank",
    "jsonl_shard_roundtrip",
    "ivf_probe_sweep",
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
    spark = get_spark(app_name="pds-reprice-r15")
    registry.load_all()
    prior_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_DETAIL.json",
    )
    prior = json.load(open(prior_path))["queries"]

    # warmup passes (bench protocol): codegen + Arrow worker + cold
    # lineitem page cache
    _force(registry.QUERIES["mau"](spark, sf_dir))
    spark.range(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    _force(
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    )

    controls = {n: _min_of(spark, sf_dir, n, 2) for n in CONTROLS}
    control_ratio = control_median_ratio(controls, prior)
    out = {
        "host_speed_md5_64mb": _host_speed_index(),
        "controls": controls,
        "control_ratio": control_ratio,
        "polluted": (
            None
            if control_ratio is None
            else control_ratio > CONTROL_POLLUTED_RATIO
        ),
        "disputed_min_of_3": {},
        "prior": {n: prior.get(n) for n in DISPUTED + CONTROLS},
    }
    for name in DISPUTED:
        out["disputed_min_of_3"][name] = _min_of(spark, sf_dir, name, 3)
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
