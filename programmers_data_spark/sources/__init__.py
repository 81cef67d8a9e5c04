"""Source connectors (SURVEY §2.1, S1-S8) — Spark-first readers.

The reference pulls from HTTP CSV, REST JSON, yfinance pandas frames,
MySQL, Google Sheets, and S3 CSV, always landing rows into Redshift.
Here every source lands a DataFrame:

- S1/S8  CSV files (header row, typed schema)      → ``read_csv``
- S1     CSV payload fetched over HTTP             → ``csv_from_text``
         (driver fetch + parallelize: the fetch is inherently a
         single-client network call; parsing/typing is distributed)
- S2     REST JSON array of records                → ``json_records``
- S3     REST JSON document with a nested array    → ``json_document``
- S4     pandas time-series frame (Arrow)          → ``from_pandas``
- S5     JDBC table scan                           → ``read_jdbc``
- S6     spreadsheet scan                          → ``read_sheet``
         (network client gated behind an import-try; the
         list-of-lists → DataFrame plumbing is real and tested)
- S7     warehouse SQL over registered views       → ``read_sql``

Scale posture: file/JDBC readers keep Catalyst pushdown and split
planning (predicate/column pruning reach the scan; JDBC partitions on
a numeric column). Driver-fetched payloads (HTTP/sheet) are small by
nature — the reference's own use is ≤ a few MB — and are immediately
parallelized; anything bigger belongs on object storage and the file
readers.
"""

from __future__ import annotations

import json
from typing import Any, Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

__all__ = [
    "read_csv",
    "csv_from_text",
    "json_records",
    "json_document",
    "from_pandas",
    "read_jdbc",
    "read_sheet",
    "read_sql",
    "read_jsonl",
    "parse_jsonl_with_rejects",
]


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """S1/S8: CSV scan with header handling (COPY ... IGNOREHEADER 1,
    Gsheet_to_Redshift.py:119-130). An explicit schema keeps the read
    single-pass (no inference job) and split-planned."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def csv_from_text(
    spark: SparkSession,
    text: str,
    schema: StructType | str,
    sep: str = ",",
    skip_header: bool = True,
) -> DataFrame:
    """S1: HTTP-fetched CSV payload → DataFrame
    (NameGenderCSVtoRedshift.py:24-39 extract+transform).

    The driver holds the payload (it made the GET); rows parallelize
    immediately and parsing (split/typing) runs on executors via the
    csv reader over a text Dataset — no row-at-a-time Python loop.
    """
    lines = [ln for ln in text.strip().split("\n") if ln]
    if skip_header and lines:
        lines = lines[1:]
    ds = spark.createDataFrame([(ln,) for ln in lines], "value string")
    return _parse_delimited(ds, schema, sep)


def _parse_delimited(ds: DataFrame, schema: StructType | str, sep: str) -> DataFrame:
    """Split a one-column text Dataset into typed columns (executor-side)."""
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    parts = F.split(F.col("value"), sep)
    return ds.select(
        *[
            parts.getItem(i).cast(f.dataType).alias(f.name)
            for i, f in enumerate(schema.fields)
        ]
    )


def json_records(
    spark: SparkSession,
    records: Iterable[dict[str, Any]] | str,
    schema: StructType | str | None = None,
) -> DataFrame:
    """S2: REST JSON array → DataFrame (UpdateCountry.py:27-35).

    Accepts the parsed list or the raw JSON text. Nested dicts map to
    struct columns, so UpdateCountry's d["name"]["official"] becomes
    col("name.official") — projection, not Python indexing.
    """
    if isinstance(records, str):
        records = json.loads(records)
    records = list(records)
    if schema is not None:
        return spark.createDataFrame(records, schema)
    # schema-from-JSON inference, distributed: round-trip through the
    # JSON datasource rather than driver-side sampling
    ds = spark.createDataFrame([(json.dumps(r),) for r in records], "value string")
    inferred = spark.read.json(ds.select("value").rdd.map(lambda r: r.value))
    return inferred


def json_document(
    spark: SparkSession,
    doc: dict[str, Any] | str,
    array_field: str,
    schema: StructType | str | None = None,
) -> DataFrame:
    """S3: single JSON document, one row per element of
    ``doc[array_field]`` (Weather_to_Redshift.py:30-39 iterates
    data["daily"]). The array explodes engine-side."""
    if isinstance(doc, str):
        doc = json.loads(doc)
    return json_records(spark, doc[array_field], schema)


def from_pandas(spark: SparkSession, pdf: Any, schema: StructType | str | None = None) -> DataFrame:
    """S4: pandas frame → DataFrame over Arrow (UpdateSymbol.py:25-35
    yfinance history). Timestamps keep type; no strftime round-trip."""
    if schema is not None:
        return spark.createDataFrame(pdf, schema)
    return spark.createDataFrame(pdf)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **properties: str,
) -> DataFrame:
    """S5: JDBC table scan (MySQL_to_Redshift.py:34-45 source side).

    With a numeric ``partition_column`` the scan issues
    ``num_partitions`` range-bounded queries in parallel — the Spark
    replacement for the reference's single-query SqlToS3 staging.
    Predicates/projections push down to the database.
    """
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC reads need lower/upper bounds")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in properties.items():
        reader = reader.option(k, v)
    return reader.load()


def read_sheet(
    spark: SparkSession,
    rows: list[list[str]] | None = None,
    *,
    sheet_url: str | None = None,
    header_line: int = 0,
    fetch: "Callable[[str], list[list[str]]] | None" = None,
) -> DataFrame:
    """S6: spreadsheet scan (plugins/gsheet.py:78-99 get_google_sheet_to_csv).

    The sheet API client isn't available in this environment; the
    list-of-lists → typed-DataFrame plumbing (header-line selection,
    empty-row drop) is real. Pass ``rows`` as the client would return
    them, or a ``sheet_url`` plus an optional ``fetch`` callable —
    the seam the production gspread client plugs into (and tests
    drive with a fake), so the full url→rows→clean→load path runs
    through one public entry point.
    """
    if rows is None:
        if sheet_url is None:
            raise ValueError("need rows or sheet_url")
        if fetch is not None:
            rows = fetch(sheet_url)
        else:
            try:  # pragma: no cover - network client not installed here
                import gspread  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "sheet API client not available in this environment; "
                    "pass rows= (the get_all_values() payload) or a "
                    "fetch= callable instead"
                ) from e
            raise NotImplementedError(
                "network fetch not wired in this environment"
            )
    header, *data = rows[header_line:]
    data = [r for r in data if any(str(c).strip() for c in r)]
    cols = [str(h).strip() or f"col{i}" for i, h in enumerate(header)]
    return spark.createDataFrame(
        [[str(c) for c in r] for r in data], ", ".join(f"`{c}` string" for c in cols)
    )


def read_sql(spark: SparkSession, sql: str) -> DataFrame:
    """S7: warehouse SQL scan over registered views
    (plugins/gsheet.py:137 get_pandas_df equivalent)."""
    return spark.sql(sql)


def parse_with_rejects(
    ds: DataFrame,
    schema: StructType | str,
    sep: str = ",",
    value_col: str = "value",
) -> tuple[DataFrame, DataFrame]:
    """Malformed-row quarantine for delimited ingestion: returns
    (good, rejects) from a one-column raw-text Dataset. Good rows
    parse to the full typed schema; every other row — wrong field
    count, uncastable value — lands in the reject table with its raw
    line and a reason, never silently dropped and never aborting the
    job.

    The reference's pipelines assume clean feeds and abort on check
    failure (quality.CountCheck); at 100 TB a 0.001% bad-line rate is
    CERTAIN, and neither aborting a ten-hour load nor nulling fields
    in place is acceptable. Quarantine is the standard answer: the
    load proceeds, the reject table is monitored (volume_anomaly_days
    applies directly), and repaired rows re-enter through the normal
    incremental path.

    Implementation is one pass, all codegen: from_csv in PERMISSIVE
    mode tags malformed rows in a corrupt-record column; a row is
    good iff that column is null AND every non-nullable... (CSV cast
    failures leave nulls, so a row parsed from the wrong arity or
    with uncastable cells keeps its raw line). Both outputs share the
    single parsed projection — Catalyst plans one scan feeding two
    filters.
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    aug = StructType(schema.fields + [StructField("_corrupt", StringType())])
    parsed = ds.withColumn(
        "_p",
        F.from_csv(
            F.col(value_col),
            aug.simpleString(),
            {
                "sep": sep,
                "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": "_corrupt",
            },
        ),
    )
    is_bad = F.col("_p._corrupt").isNotNull()
    good = parsed.filter(~is_bad).select(
        *[F.col(f"_p.{f.name}").alias(f.name) for f in schema.fields]
    )
    rejects = parsed.filter(is_bad).select(
        F.col(value_col).alias("raw_line"),
        F.lit("malformed: arity or type mismatch").alias("reason"),
    )
    return good, rejects


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """JSON-lines corpus scan — the de-facto interchange format for
    training-document corpora (one JSON object per line, typically
    gzip shards). Spark's JSON datasource IS line-delimited by
    default, so this wrapper's value is the contract: an explicit
    schema keeps the read single-pass (no inference job over 100 TB
    of text) and split-planned; gzip shards are non-splittable, so
    parallelism = shard count — pair with write_jsonl_shards, which
    bounds and balances the shards deterministically."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def parse_jsonl_with_rejects(
    ds: DataFrame,
    schema: StructType | str,
    value_col: str = "value",
    keep_cols: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Malformed-line quarantine for JSONL ingestion — the JSON twin
    of parse_with_rejects, same contract: (good, rejects) from a
    one-column raw-text Dataset, one codegen pass, no silent drops,
    no job aborts. A crawled JSONL corpus at scale ALWAYS carries
    truncated lines, stray non-JSON, and schema drift; good rows
    parse to the full typed schema, everything else keeps its raw
    line + reason in the reject table (volume_anomaly_days monitors
    it; repaired rows re-enter through the incremental path).

    ``keep_cols`` names provenance columns of ``ds`` (shard id,
    source file, ingest batch) threaded through to BOTH outputs —
    quarantined lines are only actionable if they still say where
    they came from."""
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    keep = [F.col(c) for c in (keep_cols or [])]
    aug = StructType(schema.fields + [StructField("_corrupt", StringType())])
    parsed = ds.withColumn(
        "_p",
        F.from_json(
            F.col(value_col),
            aug,
            {
                "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": "_corrupt",
            },
        ),
    )
    # from_json yields NULL for unparseable input and tags partial
    # parses in the corrupt column — either way the raw line is bad
    is_bad = F.col("_p").isNull() | F.col("_p._corrupt").isNotNull()
    good = parsed.filter(~is_bad).select(
        *keep,
        *[F.col(f"_p.{f.name}").alias(f.name) for f in schema.fields],
    )
    rejects = parsed.filter(is_bad).select(
        *keep,
        F.col(value_col).alias("raw_line"),
        F.lit("malformed: not a JSON object or type mismatch").alias(
            "reason"
        ),
    )
    return good, rejects
