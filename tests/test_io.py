"""Unit tests for the source/sink layers (SURVEY §2.1/§2.2)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from programmers_data_spark import sinks, sources
from programmers_data_spark.catalog import load_table


# ----------------------------------------------------------------- sources


def test_csv_roundtrip(spark, sf_smoke, tmp_path):
    """S1/S8: write fixture rows as CSV, read back typed."""
    nation = load_table(spark, sf_smoke, "nation")
    path = str(tmp_path / "nation_csv")
    sinks.write_csv(nation, path, coalesce=1)
    back = sources.read_csv(
        spark,
        path,
        schema="n_nationkey int, n_name string, n_regionkey int",
    )
    assert back.count() == nation.count()
    assert set(back.columns) == {"n_nationkey", "n_name", "n_regionkey"}
    assert dict(back.dtypes)["n_nationkey"] == "int"


def test_csv_from_text_http_payload(spark):
    """S1: the NameGenderCSVtoRedshift extract+transform shape —
    header skipped, rows split executor-side, typed columns."""
    payload = "name,gender\nAdaleigh,F\nAmryn,Unknown\nApurva,M\n"
    df = sources.csv_from_text(spark, payload, "name string, gender string")
    rows = {(r.name, r.gender) for r in df.collect()}
    assert rows == {("Adaleigh", "F"), ("Amryn", "Unknown"), ("Apurva", "M")}


def test_json_records_nested_projection(spark):
    """S2+T2: UpdateCountry's d['name']['official'] as col('name.official')."""
    recs = [
        {"name": {"official": "Republic of Korea"}, "population": 51, "area": 100.2},
        {"name": {"official": "Japan"}, "population": 125, "area": 377.9},
    ]
    df = sources.json_records(spark, recs)
    out = df.select(
        F.col("name.official").alias("country"), "population", "area"
    ).collect()
    assert {r.country for r in out} == {"Republic of Korea", "Japan"}


def test_json_document_array_field(spark):
    """S3: Weather_to_Redshift iterates data['daily'] — one row each."""
    doc = {
        "lat": 37.5,
        "daily": [
            {"dt": 1672531200, "temp": {"day": 1.5}},
            {"dt": 1672617600, "temp": {"day": 2.5}},
        ],
    }
    df = sources.json_document(spark, doc, "daily")
    assert df.count() == 2
    days = [r["day"] for r in df.select(F.col("temp.day").alias("day")).collect()]
    assert sorted(days) == [1.5, 2.5]


def test_from_pandas_arrow(spark):
    """S4: pandas (yfinance-shaped OHLCV) → DataFrame via Arrow."""
    pd = pytest.importorskip("pandas")
    pdf = pd.DataFrame(
        {
            "date": pd.to_datetime(["2023-01-02", "2023-01-03"]),
            "open": [100.0, 101.5],
            "close": [101.0, 102.5],
            "volume": [1000, 2000],
        }
    )
    df = sources.from_pandas(spark, pdf)
    assert df.count() == 2
    assert dict(df.dtypes)["volume"] == "bigint"


def test_read_sheet_rows(spark):
    """S6: list-of-lists with header line selection and empty-row drop."""
    rows = [
        ["col1", "col2", "col3"],
        ["1", "2", "3"],
        ["", "", ""],
        ["4", "5", "6"],
    ]
    df = sources.read_sheet(spark, rows)
    assert df.columns == ["col1", "col2", "col3"]
    assert df.count() == 2


def test_read_sheet_network_is_gated(spark):
    with pytest.raises((NotImplementedError, ValueError)):
        sources.read_sheet(spark, sheet_url="https://example.invalid/sheet")


def test_read_sheet_fetch_seam_end_to_end(spark, tmp_path):
    """S6 through the public entry with an injected fetch callable —
    the seam the gspread client plugs into (gsheet.py:78-99): url →
    raw payload (preamble junk + header at line 2) → header-line
    selection → p2f/currency cleaning → parquet load, no network."""
    from programmers_data_spark.functions import cleaning

    seen_urls: list[str] = []

    def fake_fetch(url: str) -> list[list[str]]:
        seen_urls.append(url)
        return [
            ["Quarterly report", "", ""],  # preamble the reference skips
            ["generated 2024-01-01", "", ""],
            ["item", "price", "share"],  # header line 2
            ["widget", "$1,200", "45%"],
            ["", "", ""],  # blank row dropped
            ["gadget", "$800", "55%"],
        ]

    df = sources.read_sheet(
        spark, sheet_url="https://sheets.example/abc", header_line=2, fetch=fake_fetch
    )
    assert seen_urls == ["https://sheets.example/abc"]
    assert df.columns == ["item", "price", "share"]

    cleaned = df.select(
        "item",
        cleaning.clean_numeric("price").alias("price"),
        cleaning.percent_to_fraction("share").alias("share"),
    )
    path = str(tmp_path / "sheet_out")
    cleaned.write.parquet(path)
    out = {r.item: (r.price, r.share) for r in spark.read.parquet(path).collect()}
    assert out == {"widget": (1200.0, 0.45), "gadget": (800.0, 0.55)}


def test_jdbc_roundtrip_embedded_derby(spark, sf_smoke, tmp_path):
    """S5 executed end-to-end: write a fixture table into an embedded
    Derby database (the Derby jars ship with Spark) through the JDBC
    sink, read it back with read_jdbc, and verify that a numeric
    partitionColumn splits the scan into the requested number of
    range-bounded partitions (MySQL_to_Redshift.py:34-45 semantics)."""
    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    cust = load_table(spark, sf_smoke, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    n = cust.count()
    sinks.write_jdbc(cust, url, "customer_tbl", driver=driver)

    # unpartitioned read: single partition, full fidelity
    plain = sources.read_jdbc(spark, url, "customer_tbl", driver=driver)
    assert plain.count() == n
    assert {c.lower() for c in plain.columns} == {"c_custkey", "c_name", "c_acctbal"}

    # partitioned read: 4 range-bounded queries in parallel
    lo, hi = cust.agg(F.min("c_custkey"), F.max("c_custkey")).collect()[0]
    parted = sources.read_jdbc(
        spark,
        url,
        "customer_tbl",
        partition_column="c_custkey",
        num_partitions=4,
        lower_bound=int(lo),
        upper_bound=int(hi) + 1,
        driver=driver,
    )
    assert parted.rdd.getNumPartitions() == 4
    assert parted.count() == n
    plan = parted._jdf.queryExecution().executedPlan().toString()
    assert "numPartitions=4" in plan
    # keys survive the round trip exactly
    assert (
        parted.select(F.col("c_custkey").cast("long"))
        .subtract(cust.select(F.col("c_custkey").cast("long")))
        .count()
        == 0
    )

    # bounds validation guard
    with pytest.raises(ValueError, match="bounds"):
        sources.read_jdbc(
            spark, url, "customer_tbl", partition_column="c_custkey"
        )


def test_read_sql_view(spark, sf_smoke):
    """S7: SQL over registered views."""
    from programmers_data_spark.catalog import register_views

    register_views(spark, sf_smoke)
    df = sources.read_sql(spark, "SELECT count(*) AS n FROM region")
    assert df.collect()[0].n == 5


# ------------------------------------------------------------------- sinks


def test_export_rows_cleans_and_caps(spark, sf_smoke):
    """K9: stringify + null-fill + cap, delivered as (header, rows)."""
    region = load_table(spark, sf_smoke, "region")
    delivered = {}

    def deliver(header, rows):
        delivered["header"] = header
        delivered["rows"] = rows

    n = sinks.export_rows(region.orderBy("r_regionkey"), deliver, max_rows=3)
    assert n == 3
    assert delivered["header"] == ["r_regionkey", "r_name"]
    assert all(isinstance(c, str) for row in delivered["rows"] for c in row)


def test_notify_on_failure_fires_and_reraises():
    """K11: callback receives context + traceback, exception propagates."""
    messages = []

    @sinks.notify_on_failure(messages.append, context="unit")
    def boom():
        raise RuntimeError("kapow")

    with pytest.raises(RuntimeError):
        boom()
    assert len(messages) == 1
    assert "unit" in messages[0] and "kapow" in messages[0]


def test_notify_on_failure_passthrough():
    messages = []

    @sinks.notify_on_failure(messages.append)
    def ok():
        return 42

    assert ok() == 42
    assert messages == []


# -------------------------------------------------------------- multimodal


def test_resize_media_binary_roundtrip(spark, sf_smoke):
    """binary→binary mapInPandas path: payload truncated to the pixel
    buffer size, dims attached."""
    from programmers_data_spark.multimodal import attach_binary_payload, resize_media

    docs = load_table(spark, sf_smoke, "documents").limit(20)
    media = attach_binary_payload(docs, "doc_id", "text")
    out = resize_media(media, width=8, height=4).collect()
    assert len(out) == 20
    for r in out:
        assert r.width == 8 and r.height == 4
        assert r.n_bytes <= 32
        assert r.payload is None or len(r.payload) == r.n_bytes


def test_real_decode_paths_are_gated(spark, sf_smoke):
    """Without the optional codec deps, fake=False on NON-PNG payloads
    raises (decode/resize now fall back to the builtin pure-stdlib PNG
    codec, so the gate fires per-payload executor-side for formats the
    builtin can't read) instead of silently faking output."""
    from programmers_data_spark import multimodal
    from programmers_data_spark.multimodal import (
        attach_binary_payload,
        decode_media,
        extract_features,
        resize_media,
        sample_frames,
    )
    import pytest as _pytest

    if multimodal.pillow_available() and multimodal.ffprobe_available():
        _pytest.skip("real codecs present; gates do not fire")
    docs = load_table(spark, sf_smoke, "documents").limit(2)
    media = attach_binary_payload(docs, "doc_id", "text")
    gated = [extract_features]
    if not multimodal.pillow_available():
        gated += [decode_media, resize_media]
    if not multimodal.ffprobe_available():
        gated += [sample_frames]
    for fn in gated:
        with _pytest.raises(Exception) as ei:
            fn(media, fake=False).collect()
        assert "NotImplementedError" in str(ei.value) or isinstance(
            ei.value, NotImplementedError
        )


def _png_media_df(spark, sizes):
    """Tiny real PNGs (Pillow) as a MEDIA_SCHEMA DataFrame."""
    import io

    from PIL import Image

    from programmers_data_spark.multimodal import MEDIA_SCHEMA

    rows = []
    for i, (w, h) in enumerate(sizes):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), color=(i * 40 % 256, 0, 0)).save(buf, format="PNG")
        payload = buf.getvalue()
        rows.append((i, payload, "image/png", len(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


@pytest.mark.skipif(
    not __import__("importlib.util", fromlist=["util"]).find_spec("PIL"),
    reason="Pillow not installed",
)
def test_real_pillow_decode_and_resize(spark):
    """fake=False with Pillow importable: header dimensions come from
    the actual image, and resize re-encodes a decodable PNG."""
    import io

    from PIL import Image

    from programmers_data_spark.multimodal import decode_media, resize_media

    media = _png_media_df(spark, [(5, 7), (12, 3)])
    decoded = {r.media_id: r for r in decode_media(media, fake=False).collect()}
    assert (decoded[0].width, decoded[0].height) == (5, 7)
    assert (decoded[1].width, decoded[1].height) == (12, 3)

    resized = resize_media(media, width=4, height=4, fake=False).collect()
    for r in resized:
        with Image.open(io.BytesIO(bytes(r.payload))) as im:
            assert (im.width, im.height) == (4, 4)


@pytest.mark.skipif(
    not __import__("shutil").which("ffprobe") or not __import__("shutil").which("ffmpeg"),
    reason="ffmpeg/ffprobe not installed",
)
def test_real_ffprobe_frame_sampling(spark, tmp_path):
    """fake=False with ffprobe on PATH: keyframe packet positions of a
    synthesized clip come back one row per keyframe."""
    import subprocess

    from programmers_data_spark.multimodal import MEDIA_SCHEMA, sample_frames

    clip = tmp_path / "clip.mp4"
    subprocess.run(
        [
            "ffmpeg", "-v", "error", "-f", "lavfi", "-i",
            "testsrc=duration=1:size=64x64:rate=10", "-pix_fmt", "yuv420p",
            "-movflags", "+faststart", str(clip),
        ],
        check=True,
    )
    payload = clip.read_bytes()
    media = spark.createDataFrame(
        [(1, payload, "video/mp4", len(payload))], MEDIA_SCHEMA
    )
    frames = sample_frames(media, fake=False).collect()
    assert len(frames) >= 1
    assert [r.frame_idx for r in frames] == list(range(len(frames)))


def test_write_partitioned_layout_and_pruning(spark, sf_smoke, tmp_path):
    """write_partitioned: one file per partition dir, and a filter on
    the partition column prunes to that directory in the plan."""
    import glob

    from programmers_data_spark.catalog import load_table
    from programmers_data_spark.sinks import write_partitioned

    events = load_table(spark, sf_smoke, "events")
    out = str(tmp_path / "events_by_type")
    write_partitioned(events, out, ["event_type"], sort_by=["user_id"])

    for d in glob.glob(f"{out}/event_type=*"):
        files = glob.glob(f"{d}/*.parquet")
        assert len(files) == 1, f"{d} has {len(files)} files"

    back = spark.read.parquet(out).filter("event_type = 'click'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan
    assert back.count() == events.filter("event_type = 'click'").count()


def test_compact_parquet_merges_small_files(spark, sf_smoke, tmp_path):
    """compact_parquet: a fragmented table collapses to few files with
    identical contents."""
    import glob

    from programmers_data_spark.catalog import load_table
    from programmers_data_spark.sinks import compact_parquet

    events = load_table(spark, sf_smoke, "events")
    out = str(tmp_path / "fragmented")
    events.repartition(16).write.parquet(out)
    n_before = len(glob.glob(f"{out}/*.parquet"))
    assert n_before >= 16

    n_rows = compact_parquet(spark, out)
    n_after = len(glob.glob(f"{out}/*.parquet"))
    assert n_after < n_before
    assert n_rows == events.count()
    assert spark.read.parquet(out).count() == n_rows


def test_fixture_timestamps_read_as_instants(spark, sf_smoke):
    """Regression canary for the round-3 fixture regeneration: plain
    parquet TIMESTAMP (isAdjustedToUTC=false) must scan as
    TimestampType — TIMESTAMP_NTZ breaks unix_micros and diverges
    from DuckDB's naive-as-UTC reading (catalog pins
    spark.sql.parquet.inferTimestampNTZ.enabled=false)."""
    for t in ("events", "orders", "lineitem"):
        for _name, dt in load_table(spark, sf_smoke, t).dtypes:
            assert dt != "timestamp_ntz", (t, _name, dt)


def test_parse_with_rejects_quarantines_bad_lines(spark):
    """Malformed rows (wrong arity, uncastable cells) land in the
    reject table with their raw line; good rows parse fully typed;
    nothing is dropped or aborted."""
    from programmers_data_spark.sources import parse_with_rejects

    lines = [
        "alice,30",
        "bob,notanumber",
        "carol",
        "dave,44",
        "eve,55,extra",
    ]
    ds = spark.createDataFrame([(ln,) for ln in lines], "value string")
    good, rejects = parse_with_rejects(ds, "name string, age int")
    g = {(r.name, r.age) for r in good.collect()}
    assert g == {("alice", 30), ("dave", 44)}
    raw = {r.raw_line for r in rejects.collect()}
    assert raw == {"bob,notanumber", "carol", "eve,55,extra"}
    assert good.count() + rejects.count() == len(lines)
