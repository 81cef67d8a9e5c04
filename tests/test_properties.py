"""Property-based tests (hypothesis) for the load-strategy algebra.

The publish layer's correctness claims are algebraic — idempotence,
convergence, key uniqueness — and hold for ANY input, not just the
fixtures; hypothesis generates the adversarial cases (dup keys, ties,
empty deltas) that example-based tests miss.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from programmers_data_spark.publish import distinct_union, keep_latest, upsert

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),  # key
        st.integers(min_value=0, max_value=5),  # ts
        st.text(alphabet="abc", max_size=2),  # payload
    ),
    max_size=25,
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows or [(0, 0, "")], "key int, ts int, payload string"
    ).limit(len(rows))


@pytest.mark.usefixtures("spark")
class TestLoadStrategyProperties:
    @given(rows=ROWS)
    @_SETTINGS
    def test_keep_latest_unique_and_maximal(self, spark, rows):
        """keep_latest emits exactly one row per key, carrying the max ts."""
        df = _df(spark, rows)
        out = keep_latest(df, ["key"], "ts", tie_break="payload").collect()
        keys = [r.key for r in out]
        assert len(keys) == len(set(keys))
        by_key_max = {}
        for k, ts, _ in rows:
            by_key_max[k] = max(by_key_max.get(k, ts), ts)
        for r in out:
            assert r.ts == by_key_max[r.key]

    @given(rows=ROWS)
    @_SETTINGS
    def test_distinct_union_idempotent(self, spark, rows):
        """old ∪ old distinct == old distinct (K5 re-run safety)."""
        df = _df(spark, rows)
        once = {tuple(r) for r in distinct_union(df, df).collect()}
        assert once == {tuple(r) for r in df.distinct().collect()}

    @given(rows=ROWS, delta=ROWS)
    @_SETTINGS
    def test_upsert_source_wins_and_keys_unique(self, spark, rows, delta):
        """After upsert: every source key's rows come from source only;
        target rows without a delta key survive untouched."""
        target = keep_latest(_df(spark, rows), ["key"], "ts", tie_break="payload")
        source = keep_latest(_df(spark, delta), ["key"], "ts", tie_break="payload")
        out = upsert(target, source, ["key"]).collect()
        keys = [r.key for r in out]
        assert len(keys) == len(set(keys))
        src = {r.key: (r.ts, r.payload) for r in source.collect()}
        tgt = {r.key: (r.ts, r.payload) for r in target.collect()}
        for r in out:
            expected = src.get(r.key, tgt.get(r.key))
            assert (r.ts, r.payload) == expected


EDGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=14),
        st.integers(min_value=0, max_value=14),
    ),
    min_size=1,
    max_size=20,
)


@pytest.mark.parametrize("algorithm", ["label_prop", "two_phase"])
@given(edges=EDGES)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_connected_components_matches_union_find(spark, algorithm, edges):
    """Both CC algorithms (min-label propagation and large-star/
    small-star) must agree with a serial union-find on any random
    graph (self-loops, multi-edges, chains, stars included)."""
    from programmers_data_spark.operators import (
        connected_components,
        connected_components_two_phase,
    )

    cc = (
        connected_components
        if algorithm == "label_prop"
        else connected_components_two_phase
    )

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expected = {v: find(v) for v in parent}
    # canonicalize: component id = min vertex of the component
    comp_min: dict[int, int] = {}
    for v, r in expected.items():
        comp_min[r] = min(comp_min.get(r, v), v)
    expected = {v: comp_min[find(v)] for v in parent}

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r["vertex"], r["component"]) for r in cc(df).collect()}
    assert got == set(expected.items())


# (doc_id, band) memberships: small band alphabet forces hot buckets,
# duplicate memberships exercise the dropDuplicates path
BANDINGS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),  # doc_id
        st.integers(min_value=0, max_value=1),  # band_idx
        st.sampled_from(["x", "y", "z"]),  # band hash
    ),
    min_size=1,
    max_size=40,
)


@given(rows=BANDINGS, hot_threshold=st.sampled_from([0, 2, 100]))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_salted_band_pairs_equals_naive_join(spark, rows, hot_threshold):
    """salted_band_pairs is a plan-level rewrite: for ANY banding table
    and ANY hot threshold (0 = everything salted, 100 = nothing) the
    pair set equals the naive bucket self-join's."""
    from pyspark.sql import functions as F

    from programmers_data_spark.operators import salted_band_pairs

    banded = spark.createDataFrame(
        rows, "doc_id long, band_idx int, band string"
    )
    a = banded.select(F.col("doc_id").alias("doc_a"), "band_idx", "band")
    b = banded.select(F.col("doc_id").alias("doc_b"), "band_idx", "band")
    naive = {
        (r.doc_a, r.doc_b)
        for r in a.join(b, ["band_idx", "band"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .collect()
    }
    got = {
        (r.doc_a, r.doc_b)
        for r in salted_band_pairs(
            banded, hot_threshold=hot_threshold, n_salts=4
        ).collect()
    }
    assert got == naive
