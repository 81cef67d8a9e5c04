"""Round-16 tests: ADVICE fixes (true control median, widened
union-find output type) and the EMBEDDING near-dup family lifecycle
(published stores, incremental pairs/clusters, streaming ingest)."""

from __future__ import annotations

import pytest


# ----------------------------------------------- r15 ADVICE fixes


def test_control_median_ratio_even_count_true_median():
    """r15 ADVICE #1: ratios[len//2] picked the UPPER-middle element
    for even counts, so a missing prior (renamed control, fresh repo)
    turned the 2-ratio case into max() — biasing toward a false
    polluted=true that voids the run's deltas by rule. The shared
    helper must compute the true median (mean of the two middle
    elements when the count is even) and be the ONE implementation
    both bench and the reprice scripts import."""
    from bench import control_median_ratio

    # odd count: the middle element
    assert control_median_ratio(
        {"a": 1.0, "b": 2.0, "c": 4.0}, {"a": 1.0, "b": 1.0, "c": 1.0}
    ) == 2.0
    # even count: mean of the two middle elements, NOT the upper one
    assert control_median_ratio(
        {"a": 1.0, "b": 2.0}, {"a": 1.0, "b": 1.0}
    ) == 1.5
    # a control without a prior drops out of the ratio set
    assert control_median_ratio(
        {"a": 1.0, "b": 9.0}, {"a": 1.0}
    ) == 1.0
    # no priors at all -> None (fresh repo)
    assert control_median_ratio({"a": 1.0}, {}) is None


def test_reprice_scripts_share_the_median_helper():
    """The duplicated median logic in scripts/ must be gone — every
    reprice script imports bench.control_median_ratio (the drift the
    advice warned about is only closed if there is one copy)."""
    import glob
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in glob.glob(os.path.join(root, "scripts", "reprice_*.py")):
        src = open(path).read()
        if "control_ratio" not in src:
            continue  # script doesn't gate on controls
        assert "control_median_ratio" in src, path
        assert "ratios[len(ratios) // 2]" not in src, path


def test_driver_resolve_widens_heterogeneous_edge_types(spark):
    """r15 ADVICE #2: _resolve_driver_side typed both output columns
    from schema[0] (the src column); an (int src, long dst) edge
    frame must yield bigint vertex/component like the distributed
    paths' symmetric-union coercion, not error or truncate."""
    from pyspark.sql import functions as F

    from programmers_data_spark.operators import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src int, dst int"
    ).select(F.col("src"), F.col("dst").cast("long").alias("dst"))
    out = connected_components(edges, "src", "dst")
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint",
        "bigint",
    ]
    got = {(r.vertex, r.component) for r in out.collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_driver_resolve_rejects_non_integral_mismatch(spark):
    from programmers_data_spark.operators import connected_components

    edges = spark.createDataFrame(
        [("a", 1)], "src string, dst int"
    )
    with pytest.raises(Exception, match="homogeneous"):
        connected_components(edges, "src", "dst")
