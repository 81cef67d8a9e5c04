"""End-to-end tests for the reference-pipeline jobs: each runs the
full extract→transform→load and re-runs to prove the load strategy's
idempotence/convergence (the reference's implicit contract — its DAGs
re-run daily against overlapping data)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from programmers_data_spark import pipelines
from programmers_data_spark.catalog import load_table, register_views


def test_name_gender_full_refresh(spark, tmp_path):
    csv = "name,gender\nAdaleigh,F\nAmryn,Unknown\nApurva,M\n"
    path = str(tmp_path / "name_gender")
    assert pipelines.name_gender(spark, csv, path) == 3
    # re-run = same state (K1 refresh, not append)
    assert pipelines.name_gender(spark, csv, path) == 3
    out = spark.read.parquet(path)
    assert set(out.columns) == {"name", "gender"}


def _ohlcv(dates, base=100.0):
    return pd.DataFrame(
        {
            "date": dates,
            "open": [base + i for i in range(len(dates))],
            "high": [base + 1 + i for i in range(len(dates))],
            "low": [base - 1 + i for i in range(len(dates))],
            "close": [base + 0.5 + i for i in range(len(dates))],
            "volume": [1000 + i for i in range(len(dates))],
        }
    )


def test_update_symbol_keep_latest_converges(spark, tmp_path):
    path = str(tmp_path / "stock_info")
    n1 = pipelines.update_symbol(spark, _ohlcv(["2023-01-02", "2023-01-03"]), path)
    assert n1 == 2
    # overlapping re-pull: day 3 re-arrives with corrected close + day 4
    n2 = pipelines.update_symbol(
        spark, _ohlcv(["2023-01-03", "2023-01-04"], base=200.0), path
    )
    assert n2 == 3  # one row per date, latest pull wins
    out = {r.date: r.close for r in spark.read.parquet(path).collect()}
    assert out["2023-01-03"] == 200.5  # corrected value won


def test_update_symbol_distinct_mode(spark, tmp_path):
    path = str(tmp_path / "stock_v2")
    pdf = _ohlcv(["2023-01-02"])
    assert pipelines.update_symbol(spark, pdf, path, mode="distinct") == 1
    # identical re-pull adds nothing (K5 SELECT DISTINCT *)
    assert pipelines.update_symbol(spark, pdf, path, mode="distinct") == 1


def test_update_country_nested_projection(spark, tmp_path):
    recs = [
        {"name": {"official": "Republic of Korea"}, "population": 51, "area": 100.2},
        {"name": {"official": "Japan"}, "population": 125, "area": 377.9},
    ]
    path = str(tmp_path / "country_info")
    assert pipelines.update_country(spark, recs, path) == 2
    out = spark.read.parquet(path)
    assert set(out.columns) == {"country", "population", "area"}
    assert dict(out.dtypes)["population"] == "bigint"


def test_weather_keep_latest(spark, tmp_path):
    doc = {
        "daily": [
            {"dt": 1672617600, "temp": {"day": 1.5, "min": -1.0, "max": 3.0}},
            {"dt": 1672704000, "temp": {"day": 2.5, "min": 0.0, "max": 4.0}},
        ]
    }
    path = str(tmp_path / "weather_forecast")
    assert pipelines.weather(spark, doc, path) == 2
    # late re-forecast of day 2
    doc2 = {"daily": [{"dt": 1672704000, "temp": {"day": 9.9, "min": 5.0, "max": 11.0}}]}
    assert pipelines.weather(spark, doc2, path) == 2
    out = {r.date: r.temp for r in spark.read.parquet(path).collect()}
    assert out["2023-01-03"] == 9.9


def test_table_copy_daily_upsert(spark, sf_smoke, tmp_path):
    """v2 semantics: run-date filter + keyed upsert, re-run idempotent."""
    events = load_table(spark, sf_smoke, "events").select(
        "event_id", "user_id", F.col("ts").alias("created_at")
    )
    day = str(events.select(F.to_date(F.min("created_at"))).collect()[0][0])
    path = str(tmp_path / "copy")
    n1 = pipelines.table_copy(
        spark, events, path, upsert_keys=["event_id"], run_date=day
    )
    n2 = pipelines.table_copy(
        spark, events, path, upsert_keys=["event_id"], run_date=day
    )
    assert n1 == n2 > 0


def test_run_retries_transient_failure():
    """A job that fails twice then succeeds completes within the retry
    envelope (retries=3), with the delay applied between attempts —
    NameGenderCSVtoRedshift_v2.py:84-87 semantics."""
    calls = {"n": 0}
    slept = []

    def flaky(run_date):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return f"ok-{run_date}"

    res = pipelines.run(
        flaky, "2024-03-01", retries=3, retry_delay=1.5, sleep=slept.append
    )
    assert res.attempts == 3
    assert res.value == "ok-2024-03-01"
    assert slept == [1.5, 1.5]


def test_run_exhausted_retries_notifies_and_raises():
    """Final failure fires the K11 notification and re-raises."""
    import pytest

    notes = []

    def always_fails(run_date):
        raise RuntimeError("permanent")

    with pytest.raises(RuntimeError, match="permanent"):
        pipelines.run(
            always_fails, "2024-03-01", retries=1, notify=notes.append,
            sleep=lambda s: None,
        )
    assert len(notes) == 1 and "2024-03-01" in notes[0]


def test_run_dated_rerun_is_idempotent(spark, sf_smoke, tmp_path):
    """The `{{ execution_date }}` contract end-to-end: the same dated
    table_copy run re-executed through the harness converges to the
    same table state (same rows, same count)."""
    events = load_table(spark, sf_smoke, "events").select(
        "event_id", "user_id", F.col("ts").alias("created_at")
    )
    day = str(events.select(F.to_date(F.min("created_at"))).collect()[0][0])
    path = str(tmp_path / "dated_copy")

    def job(run_date):
        return pipelines.table_copy(
            spark, events, path, upsert_keys=["event_id"], run_date=run_date
        )

    r1 = pipelines.run(job, day)
    state1 = sorted(
        spark.read.parquet(path).select("event_id").toPandas()["event_id"]
    )
    r2 = pipelines.run(job, day)
    state2 = sorted(
        spark.read.parquet(path).select("event_id").toPandas()["event_id"]
    )
    assert r1.value == r2.value > 0
    assert state1 == state2


def test_backfill_catchup_covers_range_in_order(spark, sf_smoke, tmp_path):
    """catchup=True runs every execution date in order and the union of
    dated upserts equals the direct multi-day load; catchup=False runs
    only the latest date (MySQL_to_Redshift_v2.py:36 semantics)."""
    events = load_table(spark, sf_smoke, "events").select(
        "event_id", "user_id", F.col("ts").alias("created_at")
    )
    days = [
        r[0]
        for r in events.select(F.to_date("created_at").alias("d"))
        .distinct()
        .orderBy("d")
        .limit(3)
        .collect()
    ]
    path = str(tmp_path / "backfilled")

    def job(run_date):
        return pipelines.table_copy(
            spark, events, path, upsert_keys=["event_id"], run_date=run_date
        )

    results = pipelines.backfill(job, days[0], days[-1])
    assert [r.run_date for r in results] == days  # daily, in order
    expected = events.filter(
        F.to_date("created_at").isin(days)
    ).count()
    assert spark.read.parquet(path).count() == expected

    # catchup=False: only the final date runs
    seen = []
    skipped = pipelines.backfill(
        lambda d: seen.append(d), days[0], days[-1], catchup=False
    )
    assert len(skipped) == 1 and seen == [days[-1]]


def test_gsheet_load_cleans_numerics(spark, tmp_path):
    rows = [
        ["item", "price", "share"],
        ["a", "$1,234", "12%"],
        ["b", "$99", "7.5"],
    ]
    path = str(tmp_path / "sheet")
    assert pipelines.gsheet_load(spark, rows, path, numeric_cols=["price", "share"]) == 2
    out = {r.item: (r.price, r.share) for r in spark.read.parquet(path).collect()}
    assert out["a"] == (1234.0, 0.12)
    assert out["b"] == (99.0, 7.5)


def test_sql_to_sheet_export(spark, sf_smoke):
    register_views(spark, sf_smoke)
    delivered = {}
    n = pipelines.sql_to_sheet(
        spark,
        "SELECT r_name, r_regionkey FROM region ORDER BY r_regionkey",
        lambda h, rows: delivered.update(header=h, rows=rows),
    )
    assert n == 5
    assert delivered["header"] == ["r_name", "r_regionkey"]


def test_curate_corpus_end_to_end(spark, sf_smoke, tmp_path):
    """The composed curation job: monotone funnel, published table
    carries the split column, survivors contain no verified near-dup
    pair, and re-running publishes an identical generation (the
    deterministic-pipeline property the split/dedup stages promise)."""
    from programmers_data_spark.pipelines import curate_corpus
    from programmers_data_spark.publish import read_versioned
    from programmers_data_spark.queries.dedup_ops import dedup_minhash

    table = str(tmp_path / "curated")
    funnel = curate_corpus(spark, sf_smoke, table)
    assert (
        funnel["raw"]
        >= funnel["quality_gated"]
        >= funnel["exact_deduped"]
        >= funnel["near_deduped"]
        > 0
    )
    out = read_versioned(spark, table)
    assert funnel["published"] == funnel["near_deduped"] == out.count()
    assert "split" in out.columns
    assert set(
        r.split for r in out.select("split").distinct().collect()
    ) <= {"train", "val"}

    ids = {r.doc_id for r in out.select("doc_id").collect()}
    for pair in dedup_minhash(spark, sf_smoke).collect():
        assert not (pair.doc_a in ids and pair.doc_b in ids), (
            f"near-dup pair survived: {pair}"
        )

    funnel2 = curate_corpus(spark, sf_smoke, table)
    assert funnel2 == funnel
    out2 = read_versioned(spark, table)
    assert out2.subtract(out).count() == 0 and out.subtract(out2).count() == 0


def test_curate_corpus_canonical_strategy(spark, sf_smoke, tmp_path):
    """Canonical near-dup removal keeps exactly one doc per pair
    cluster: at least as many survivors as the greedy cut, still no
    surviving verified pair, and every pair cluster keeps its minimum
    member."""
    from programmers_data_spark.pipelines import curate_corpus
    from programmers_data_spark.publish import read_versioned
    from programmers_data_spark.queries.dedup_ops import dedup_minhash

    greedy = curate_corpus(
        spark, sf_smoke, str(tmp_path / "g"), near_dup="greedy"
    )
    canonical = curate_corpus(
        spark, sf_smoke, str(tmp_path / "c"), near_dup="canonical"
    )
    assert canonical["near_deduped"] >= greedy["near_deduped"]
    ids = {
        r.doc_id
        for r in read_versioned(spark, str(tmp_path / "c"))
        .select("doc_id")
        .collect()
    }
    for pair in dedup_minhash(spark, sf_smoke).collect():
        assert not (pair.doc_a in ids and pair.doc_b in ids)

    import pytest

    with pytest.raises(ValueError, match="unknown near_dup"):
        curate_corpus(
            spark, sf_smoke, str(tmp_path / "x"), near_dup="nope"
        )


def test_curate_corpus_best_quality_strategy(spark, sf_smoke, tmp_path):
    """Quality-aware near-dup removal (r10 VERDICT ask #7): one
    survivor per alive cluster (same count as canonical), no
    surviving verified pair, the survivor is exactly the max-logit /
    min-id member of its alive cluster, and for clusters that are
    identical between the pipeline's scoped pair graph and the
    registered dedup_keep_best_quality query's graph, the keeper
    matches the query's keeper — the composition contract."""
    import pyspark.sql.functions as F

    from programmers_data_spark import registry
    from programmers_data_spark.pipelines import curate_corpus
    from programmers_data_spark.publish import read_versioned
    from programmers_data_spark.catalog import load_table
    from programmers_data_spark.queries.dedup_ops import (
        dedup_minhash,
        verified_pair_store,
    )
    from programmers_data_spark.queries.round10_ops import quality_logits
    from programmers_data_spark.queries.text_quality_ops import (
        gopher_quality_flags,
    )

    registry.load_all()

    canonical = curate_corpus(
        spark, sf_smoke, str(tmp_path / "c"), near_dup="canonical"
    )
    best = curate_corpus(
        spark, sf_smoke, str(tmp_path / "b"), near_dup="best_quality"
    )
    assert best["near_deduped"] == canonical["near_deduped"]
    assert best["quality_gated"] == canonical["quality_gated"]

    published = {
        r.doc_id
        for r in read_versioned(spark, str(tmp_path / "b"))
        .select("doc_id")
        .collect()
    }
    for pair in dedup_minhash(spark, sf_smoke).collect():
        assert not (pair.doc_a in published and pair.doc_b in published)

    # recompute the pipeline's alive-at-near-dup set with the same
    # registered stages it composes
    docs = load_table(spark, sf_smoke, "documents")
    kept = (
        gopher_quality_flags(spark, sf_smoke)
        .filter(F.col("keep"))
        .select("doc_id")
    )
    gated = docs.join(kept, "doc_id", "semi")
    canon = (
        gated.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    alive = {
        r.doc_id for r in gated.join(canon, "doc_id", "semi")
        .select("doc_id").collect()
    }

    # clusters over the pair store scoped to alive docs
    store_pairs = [
        (r.doc_a, r.doc_b)
        for r in verified_pair_store(spark, sf_smoke).collect()
    ]
    scoped = [
        (a, b) for a, b in store_pairs if a in alive and b in alive
    ]
    logits = {
        r.doc_id: r.logit
        for r in quality_logits(
            gated.join(canon, "doc_id", "semi").select("doc_id", "text")
        ).collect()
    }

    def components(edges):
        adj: dict[int, set[int]] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        seen: set[int] = set()
        comps = []
        for v in adj:
            if v in seen:
                continue
            comp, stack = set(), [v]
            while stack:
                u = stack.pop()
                if u in comp:
                    continue
                comp.add(u)
                stack.extend(adj[u] - comp)
            seen |= comp
            comps.append(frozenset(comp))
        return comps

    pipeline_clusters = components(scoped)
    assert pipeline_clusters, "no alive near-dup cluster — vacuous"
    for comp in pipeline_clusters:
        expect = min(comp, key=lambda d: (-logits.get(d, 0), d))
        survivors = comp & published
        assert survivors == {expect}, (sorted(comp), survivors, expect)

    # composition contract vs the registered query: identical cluster
    # -> identical keeper (query clusters live on the AUGMENTED pair
    # graph, so only clusters unchanged by scoping/augmentation apply)
    query_keepers = {}
    for r in registry.QUERIES["dedup_keep_best_quality"](
        spark, sf_smoke
    ).collect():
        query_keepers.setdefault(r.cluster_id, r.keeper_doc_id)
    query_clusters = {
        frozenset(c): k
        for c, k in _query_cluster_sets(store_pairs).items()
    }
    checked = 0
    for comp in pipeline_clusters:
        if comp in query_clusters:
            cluster_id = min(comp)
            if cluster_id in query_keepers:
                survivor = next(iter(comp & published))
                assert survivor == query_keepers[cluster_id], comp
                checked += 1
    assert checked > 0, "no cluster overlapped the registered query"


def _query_cluster_sets(pairs):
    """Connected components of the full (unscoped) pair store, keyed
    by member frozenset -> min id (the query's cluster_id rule)."""
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seen: set[int] = set()
    out: dict[tuple, int] = {}
    for v in adj:
        if v in seen:
            continue
        comp, stack = set(), [v]
        while stack:
            u = stack.pop()
            if u in comp:
                continue
            comp.add(u)
            stack.extend(adj[u] - comp)
        seen |= comp
        out[tuple(sorted(comp))] = min(comp)
    return out
