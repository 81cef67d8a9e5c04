"""Physical table layout: hash-bucketed and sort-clustered storage.

The fixture catalog reads plain parquet, which is right for one-shot
queries — but a table that is JOINED or AGGREGATED on the same key
every run should be laid out so the shuffle happens once, at write
time, instead of on every query. Two layouts, both plain
Spark-native (no table format dependency):

- ``save_bucketed``: hash-bucket (and optionally sort) by key into a
  fixed bucket count. A bucketed⋈bucketed equi-join on the bucket key
  with matching bucket counts plans with ZERO Exchange nodes — at
  1000 executors that converts the nightly fact⋈fact join from the
  dominant shuffle into a map-side zip of co-located buckets. Same
  for groupBy on the bucket key. This is the "bucketing for
  co-located joins" posture SCALE.md promises, made executable.
- ``save_sorted``: range-repartition + sortWithinPartitions by a
  clustering key before writing plain parquet. Parquet row-group
  min/max stats become selective under that order, so point/range
  predicates on the cluster key prune row groups instead of scanning
  them (the poor-man's Z-ORDER for a single dominant predicate
  column).

Bucketed tables must live in the session catalog (Spark resolves
bucket metadata through it), so ``save_bucketed`` registers an
EXTERNAL table at an explicit path — the static
``spark.sql.warehouse.dir`` never constrains test/production layout.

Reference anchor: the reference keeps every table as Redshift
DISTKEY/SORTKEY storage (e.g. plugins/redshift_summary.py's CTAS into
key-distributed tables); bucketed+sorted parquet is the Spark-native
expression of exactly that pair of knobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
) -> None:
    """Write ``df`` as an external bucketed table ``name`` at
    ``path``: one hash shuffle now, zero on every future join/agg
    keyed by ``bucket_by`` against a co-bucketed table.

    ``sort_by`` additionally orders rows inside each bucket file so a
    sort-merge join skips its per-task sort. Pick ``n_buckets`` so a
    bucket is a few hundred MB at target scale (buckets are the unit
    of join parallelism; too few starves the cluster, too many makes
    small files — see publish.compact_table for the latter's cost).
    """
    writer = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_by)
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(name, format="parquet")


def load_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table WITH its bucket metadata (a plain
    ``spark.read.parquet(path)`` of the same files loses the bucket
    spec and re-shuffles on the next join)."""
    return spark.table(name)


def save_sorted(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    n_files: int | None = None,
) -> None:
    """Write parquet range-clustered on ``cluster_by``: rows are
    range-repartitioned then sorted within each file, so every file
    (and row group) covers a narrow key range and min/max stats prune
    scans for predicates on the cluster key."""
    part = (
        df.repartitionByRange(n_files, *cluster_by)
        if n_files
        else df.repartitionByRange(*cluster_by)
    )
    part.sortWithinPartitions(*cluster_by).write.mode("overwrite").parquet(
        path
    )
