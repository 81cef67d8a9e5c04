"""Subquery-decorrelation query shapes (TPC-H Q2/Q11/Q12/Q16/Q17/Q21/Q22).

The reference never writes a subquery — its UPSERT pattern (SURVEY
§2.4, K7) is the only implicit semi/anti join — but an engine that
replaces it must cover the standard decorrelation shapes: scalar
subquery (global aggregate broadcast back into a filter), correlated
aggregate subquery (per-key aggregate joined back on the key), and
EXISTS / NOT EXISTS (left-semi / left-anti joins). Each query here is
one such shape, adapted to the fixture schema (no partsupp table, no
shipmode/commitdate columns — predicates use the columns that exist).

Float determinism contract (same as analytics.py): money/quantity
aggregates accumulate in DECIMAL (exact, order-independent over any
partitioning) and only the final output column is cast to DOUBLE.
Threshold comparisons against an average are cross-multiplied
(qty * cnt < frac * sum) so both engines compare exact decimals
instead of a double division whose last ulp depends on plan shape.

Scale posture:
- Scalar subqueries reduce to a 1-row aggregate; Spark broadcasts it
  (literal-sized) — no shuffle added to the big side.
- Correlated aggregates become a shuffle-agg on the correlation key
  joined back on that same key: at 100 TB both sides hash-partition
  identically, so AQE plans one co-partitioned exchange, and bucketed
  tables would make it shuffle-free.
- EXISTS/NOT-EXISTS become left_semi/left_anti shuffle joins on the
  order key; the distinct projection BEFORE the join shrinks the
  build side (orderkey,suppkey pairs, not full lineitems).
- min-per-group uses min(struct(...)) — a plain partial-aggregable
  min, not a window sort, so it map-side combines and never
  materializes a per-key sorted run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


def _dec(col: str | F.Column, prec: int = 18, scale: int = 2) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


@query(
    "cheapest_supplier_per_part",
    oracle="""
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             CAST(l_extendedprice AS DECIMAL(12,2)) AS price
      FROM lineitem
    ), mn AS (
      SELECT l_partkey, min(price) AS best_price
      FROM offers GROUP BY 1
    ), best AS (
      SELECT o.l_partkey AS p_partkey, mn.best_price,
             min(o.l_suppkey) AS best_supp
      FROM offers o
      JOIN mn ON o.l_partkey = mn.l_partkey AND o.price = mn.best_price
      GROUP BY 1, 2
    )
    SELECT p.p_partkey, p.p_name, s.s_name,
           CAST(b.best_price AS DOUBLE) AS best_price
    FROM best b
    JOIN part p ON p.p_partkey = b.p_partkey
    JOIN supplier s ON s.s_suppkey = b.best_supp
    WHERE p.p_size = 15 AND p.p_type = 'ECONOMY'
    """,
)
def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-shaped correlated-min subquery: for each ECONOMY/size-15 part,
    the supplier offering the lowest lineitem price.

    Decorrelation: min(struct(price, suppkey)) per partkey — an
    ordinary partial-aggregable min (ties broken by suppkey, so the
    result is deterministic), then joins back to the filtered part
    slice and supplier dim. No window sort anywhere. No broadcast
    hint: part grows with SF; AQE broadcast-selects at small SF.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY")
    )
    supp = load_table(spark, sf_dir, "supplier")
    best = li.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        F.min(
            F.struct(
                _dec("l_extendedprice", 12, 2).alias("price"),
                F.col("l_suppkey"),
            )
        ).alias("b")
    )
    return (
        best.join(part, "p_partkey")
        .join(supp, best["b.l_suppkey"] == supp["s_suppkey"])
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.col("b.price").cast("double").alias("best_price"),
        )
    )


@query(
    "supplier_value_share",
    oracle="""
    WITH value_by_supp AS (
      SELECT l_suppkey,
             sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS val
      FROM lineitem GROUP BY 1
    )
    SELECT l_suppkey, CAST(val AS DOUBLE) AS supplier_value
    FROM value_by_supp
    WHERE val > (SELECT sum(CAST(l_extendedprice AS DECIMAL(12,2))
                            * (1 - CAST(l_discount AS DECIMAL(4,2))))
                        * 0.002
                 FROM lineitem)
    """,
)
def supplier_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11-shaped scalar subquery: suppliers carrying more than 0.2% of
    total discounted revenue.

    Decorrelation: the global total is a 1-row aggregate broadcast
    (crossJoin) into the per-supplier HAVING filter — Catalyst plans
    a BroadcastNestedLoopJoin over one row, which costs nothing; the
    only real shuffle is the per-supplier aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    val = (_dec("l_extendedprice", 12, 2) * (1 - _dec("l_discount", 4, 2)))
    per_supp = li.groupBy("l_suppkey").agg(F.sum(val).alias("val"))
    total = li.agg((F.sum(val) * F.lit(0.002).cast("decimal(4,3)")).alias("threshold"))
    return (
        per_supp.join(F.broadcast(total))
        .filter(F.col("val") > F.col("threshold"))
        .select("l_suppkey", F.col("val").cast("double").alias("supplier_value"))
    )


@query(
    "priority_line_counts",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12-shaped conditional-count rollup: high- vs low-priority line
    counts per return flag for 1998 shipments (fixture has no
    l_shipmode; l_returnflag plays its role).

    The shipdate filter is pushed to the parquet scan; the big-big
    join shuffles both sides on orderkey (bucket both by orderkey at
    scale); the 3-key group-by collapses map-side.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "supplier_cnt_by_part",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#3' AND p_size <= 15
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def supplier_cnt_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16-shaped NOT IN + count-distinct: distinct supplier count per
    (brand, type, size), excluding negative-balance suppliers.

    Decorrelation: NOT IN becomes a left_anti join against the
    "excluded suppliers" slice — SF-proportional, so no forced
    broadcast hint (AQE broadcasts it while it fits, keeping the
    anti join shuffle-free at test SF). count(DISTINCT) shuffles on
    the grouping keys; at scale
    the pre-aggregated distinct (group by keys+suppkey first) is what
    Spark's planner already produces (two-phase distinct aggregate).
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3") & (F.col("p_size") <= 15)
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(bad_supp, "l_suppkey", "left_anti")
        .join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "small_qty_revenue",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey,
             sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
             count(*) AS cnt
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN per_part ON per_part.l_partkey = lineitem.l_partkey
    WHERE p_brand = 'Brand#23'
      AND CAST(l_quantity AS DECIMAL(12,2)) * 5 * cnt < sum_qty
    """,
)
def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17-shaped correlated-average subquery: revenue lost to
    small-quantity Brand#23 orders (quantity below 20% of the part's
    average), as a yearly average.

    Decorrelation: the per-part average joins back on partkey. The
    threshold test is cross-multiplied (qty*5*cnt < sum_qty) so both
    engines compare exact decimals — no double-division boundary for
    rows sitting on the 20% line. At 100 TB both join inputs are
    partitioned by partkey (one exchange, reused by AQE).
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(_dec("l_quantity", 12, 2)).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(per_part, "l_partkey")
        .filter(_dec("l_quantity", 12, 2) * 5 * F.col("cnt") < F.col("sum_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice", 12, 2)).cast("double") / 7.0).alias(
                "avg_yearly"
            )
        )
    )


@query(
    "waiting_suppliers",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT l_orderkey, l_suppkey, l_returnflag
      FROM lineitem
    )
    SELECT s_name, count(*) AS numwait
    FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
          WHERE l_returnflag = 'R') l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_3'
      AND EXISTS (SELECT 1 FROM pairs l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM pairs l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)
def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21-shaped EXISTS / NOT EXISTS chain: suppliers in one nation
    who were the sole 'R'-flagged supplier on a multi-supplier order.

    Decorrelation: both correlated EXISTS become joins on orderkey
    against the DISTINCT (orderkey, suppkey) projection — left_semi
    for EXISTS, left_anti for NOT EXISTS, with the suppkey-inequality
    as a non-equi conjunct. The distinct projection first is the
    scale lever: the semi/anti build sides carry two ints per row.

    Only two distinct pair sets are materialized as build sides: the
    full (orderkey, suppkey) set for the EXISTS probe (returnflag is
    irrelevant there) and the R-filtered set for NOT EXISTS. The
    driving l1 rows are the same R-filtered pairs; Catalyst defers
    their DISTINCT until after the semi/anti joins (which never
    multiply rows), so the driving side reaches the joins with ZERO
    pre-join shuffle and the dedup exchange runs over the surviving
    rows only — previously the full R slice shuffled once before the
    joins, a second full-fact-slice shuffle at 100×. Guarded in
    tests/test_scale.py (no exchange below the semi join's probe).
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")

    r_pairs = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    l1 = r_pairs
    l2 = (
        li.select(
            F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
        ).distinct()
    )
    l3 = r_pairs.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    waited = l1.join(
        l2,
        (l1["l_orderkey"] == l2["o2"]) & (l1["l_suppkey"] != l2["s2"]),
        "left_semi",
    ).join(
        l3,
        (l1["l_orderkey"] == l3["o3"]) & (l1["l_suppkey"] != l3["s3"]),
        "left_anti",
    )
    return (
        waited.join(supp, waited["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


@query(
    "idle_rich_customers",
    oracle="""
    WITH pos AS (
      SELECT sum(CAST(c_acctbal AS DECIMAL(12,2))) AS total, count(*) AS cnt
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer, pos
    WHERE CAST(c_acctbal AS DECIMAL(12,2)) * cnt > total
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-shaped scalar-subquery + NOT EXISTS: per nation, customers
    whose balance beats the positive-balance average but who placed no
    order since 1999.

    The average test is cross-multiplied (acctbal * cnt > total, exact
    decimals) so no double-division boundary; the scalar aggregate is
    a broadcast 1-row join; NOT EXISTS is a left_anti shuffle join on
    custkey against the date-filtered orders projection.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp")
        )
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    pos = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_dec("c_acctbal", 12, 2)).alias("total"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        cust.join(F.broadcast(pos))
        .filter(_dec("c_acctbal", 12, 2) * F.col("cnt") > F.col("total"))
        .join(orders, "c_custkey", "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal", 12, 2)).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "bulk_suppliers_for_parts",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_2')
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'small%')
        GROUP BY l_suppkey
        HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 500
      )
    ORDER BY s_suppkey
    """,
)
def bulk_suppliers_for_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20-shaped nested-IN chain: suppliers (in two nations) who
    shipped more than 500 units of 'small…' parts.

    Decorrelation: the inner IN is a left_semi on partkey (no hint —
    the filtered part slice is an SF-growing fraction; AQE broadcasts
    it while it fits); the HAVING subquery is an
    aggregate-then-semi-join — the outer IN becomes a left_semi of the
    tiny supplier dim against the aggregated suppkey set. Quantity
    accumulates in DECIMAL so the HAVING boundary is exact in both
    engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part_keys = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    heavy = (
        li.join(part_keys, "l_partkey", "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(_dec("l_quantity", 12, 2)).alias("qty"))
        .filter(F.col("qty") > 500)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    return (
        supp.join(
            F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"], "left_semi"
        )
        .join(heavy, "s_suppkey", "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )
