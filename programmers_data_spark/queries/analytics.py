"""Analytics / bench headliner queries (TPC-H-shaped).

The reference's analytics surface is J1/J2 equi-joins + A1/A2
aggregates + W1/W2 windows + O1 sorts (SURVEY §2.4-2.7); these queries
exercise the same operator classes on the star-schema fixtures at
bench-relevant sizes.

Float determinism contract (applies to every money aggregate here):
accumulate in small-precision DECIMAL — exact and order-independent,
so Spark's partial aggregation over any partitioning produces the
same value as DuckDB's serial sum — then CAST the final aggregate to
DOUBLE. Raw double sums would differ in the last ulp by summation
order and break the driver's value hash. Averages are spelled
sum/count (one terminal double division) rather than avg().

Scale posture:
- lineitem⋈orders is the big-big join: both sides shuffle-hash on
  orderkey; at 100 TB you bucket both tables by orderkey to make it
  shuffle-free. nation/region (and customer in top_customers after
  the aggregate) are broadcast — verified in the plan.
- group-by keys here are low-cardinality (flag/status, region,
  priority) → map-side partial aggregation collapses almost all rows
  before the shuffle.
- top-k uses orderBy+limit which Spark executes as TakeOrdered
  (per-partition heap + driver merge), not a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..registry import query


def _dec(col: str | F.Column, prec: int = 18, scale: int = 2) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


@query(
    "pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      sum(l_quantity) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2)))
               * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      sum(l_quantity) / count(*) AS avg_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
      CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
      count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: filter + 2-key groupBy + 8 aggs
    (reference operator classes A1/A2 at bench scale)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp")
    )
    price = _dec("l_extendedprice", 12, 2)
    disc = _dec("l_discount", 4, 2)
    tax = _dec("l_tax", 4, 2)
    cnt = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax))
            .cast("double")
            .alias("sum_charge"),
            (F.sum("l_quantity") / cnt).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / cnt).alias("avg_price"),
            (F.sum(disc).cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "region_revenue",
    oracle="""
    SELECT r_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           count(DISTINCT o_orderkey) AS n_orders
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
)
def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-shaped star join: lineitem⋈orders (big-big, shuffle on
    orderkey) then dims down the chain (J1 at scale). Only the
    fixed-cardinality dims (nation, region) carry explicit broadcast
    hints; customer grows with SF, so its join strategy is left to
    AQE + autoBroadcastJoinThreshold (still broadcast at test SF,
    shuffle at 100× — guarded in tests/test_scale.py).

    The distinct-order count rides the join key, so lineitem is
    pre-aggregated per orderkey BEFORE the join: afterwards every
    orderkey is unique, count(1) replaces countDistinct (no expand
    shuffle), and the join's probe side shrinks from lineitems to
    orders. The pre-agg shuffle partitions on orderkey — the same
    layout the join needs, so no exchange is added.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (_dec("l_extendedprice", 12, 2) * (F.lit(1) - _dec("l_discount", 4, 2))).alias(
            "disc_price"
        ),
    )
    per_order = li.groupBy("l_orderkey").agg(F.sum("disc_price").alias("order_rev"))
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.sum("order_rev").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("r_name")
    )


@query(
    "top_customers",
    oracle="""
    WITH rev AS (
      SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             count(*) AS n_orders
      FROM orders GROUP BY o_custkey
    )
    SELECT c_custkey, c_name, revenue, n_orders
    FROM rev JOIN customer ON o_custkey = c_custkey
    ORDER BY revenue DESC, c_custkey
    LIMIT 10
    """,
)
def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k after aggregation: executes as TakeOrdered (no global
    sort); the dimension join happens after the aggregate so only the
    winning keys join. Customer grows with SF — no forced broadcast;
    AQE picks broadcast while it fits the threshold."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        rev.join(cust, rev.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "revenue", "n_orders")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(10)
    )


@query(
    "order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS n
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-shaped EXISTS: left-semi join with a non-equi residual
    condition (SURVEY §2.4 — semi/anti exposed as engine extras)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    matched = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        matched.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderpriority")
    )


@query(
    "top3_per_segment",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rn
    FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             row_number() OVER (
               PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
             ) AS rn
      FROM customer
    )
    WHERE rn <= 3
    ORDER BY c_mktsegment, rn
    """,
)
def top3_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranking window (W1 generalized): the
    100 TB-safe form of per-group top-k — one shuffle on the group
    key, no global sort."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        cust.select("c_mktsegment", "c_custkey", "c_acctbal")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .orderBy("c_mktsegment", "rn")
    )


@query(
    "nation_customer_stats",
    oracle="""
    SELECT r_name, n_name,
           count(*) AS n_customers,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal,
           min(c_acctbal) AS min_acctbal,
           max(c_acctbal) AS max_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name
    """,
)
def nation_customer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension rollup: fact⋈broadcast-dims, multi-agg. min/max pass
    input doubles through exactly; the sum uses the decimal contract."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_acctbal"),
            F.min("c_acctbal").alias("min_acctbal"),
            F.max("c_acctbal").alias("max_acctbal"),
        )
        .orderBy("r_name", "n_name")
    )


@query(
    "brand_revenue",
    oracle="""
    SELECT p_brand,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           sum(l_quantity) AS total_qty
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈part-dim join + rollup. No broadcast hint on part: it grows
    with SF (SF×200k rows), and an explicit hint is honored regardless of
    the size estimate — at SF100k it would OOM the executors, not fall
    back. AQE picks broadcast at small SF on its own (plan-guarded in
    tests/test_scale.py) and shuffle-hash on l_partkey at scale."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_quantity",
        (_dec("l_extendedprice", 12, 2) * (F.lit(1) - _dec("l_discount", 4, 2))).alias(
            "disc_price"
        ),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum("disc_price").cast("double").alias("revenue"),
            F.sum("l_quantity").alias("total_qty"),
        )
        .orderBy("p_brand")
    )


@query(
    "daily_revenue",
    oracle="""
    SELECT strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem
    GROUP BY 1
    ORDER BY 1
    """,
)
def daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series rollup with ~2.5k groups — the shape that becomes a
    partition-pruned incremental build at 100 TB (partition output by
    date, recompute only late partitions)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
            (_dec("l_extendedprice", 12, 2) * (F.lit(1) - _dec("l_discount", 4, 2))).alias(
                "disc_price"
            ),
        )
        .groupBy("ship_date")
        .agg(
            F.sum("disc_price").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("ship_date")
    )


@query(
    "shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customers ⋈ date-filtered
    orders ⋈ unshipped lineitems → top-10 orders by revenue. Both
    date predicates push to the scans; customer and filtered orders
    both scale with SF, so join strategy is AQE's call (broadcast at
    test SF, sort-merge at 100×); top-k is TakeOrdered, not a sort."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15")
    ).select(
        "l_orderkey",
        (_dec("l_extendedprice", 12, 2) * (F.lit(1) - _dec("l_discount", 4, 2))).alias(
            "disc_price"
        ),
    )
    return (
        li.join(
            orders.join(cust, orders.o_custkey == cust.c_custkey),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum("disc_price").cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "promo_revenue_share",
    oracle="""
    SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
           CAST(sum(CASE WHEN p_type = 'PROMO'
                  THEN CAST(l_extendedprice AS DECIMAL(12,2))
                       * (1 - CAST(l_discount AS DECIMAL(4,2)))
                  ELSE CAST(0 AS DECIMAL(12,2)) END) * 100 AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS promo_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    GROUP BY 1
    ORDER BY 1
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo-type revenue share per ship month —
    conditional aggregate over a part-dim join (no hint: part grows with
    SF, AQE broadcast-selects at small SF), with both sums decimal-exact
    so the final double division matches bitwise."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
        (_dec("l_extendedprice", 12, 2) * (F.lit(1) - _dec("l_discount", 4, 2))).alias(
            "disc_price"
        ),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    # both sums stay exact in decimal; the ONLY inexact step is one
    # terminal double division, identical in both engines (decimal
    # division would truncate at engine-specific scales)
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", F.col("disc_price")).otherwise(
            F.lit(0).cast("decimal(12,2)")
        )
    )
    total = F.sum("disc_price")
    return (
        joined.groupBy("ship_month")
        .agg(
            ((promo * 100).cast("double") / total.cast("double")).alias(
                "promo_pct"
            )
        )
        .orderBy("ship_month")
    )


@query(
    "nation_trade_volume",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           strftime(l_shipdate, '%Y') AS l_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS volume
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
      AND sn.n_name <> cn.n_name
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-border trade volume by (supplier nation,
    customer nation, year). The one genuinely big-big join is
    lineitem⋈orders on orderkey; both nation aliases broadcast by
    hint, while the SF-growing supplier/customer key maps are left to
    AQE. Two years of shipdate predicate push to
    the lineitem scan, cutting the shuffle before it happens — at
    100 TB this is the difference between shuffling 2/7 of the fact
    table and all of it."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31"))
    ).select(
        "l_orderkey",
        "l_suppkey",
        F.date_format("l_shipdate", "yyyy").alias("l_year"),
        (_dec("l_extendedprice", 12, 2) * (F.lit(1) - _dec("l_discount", 4, 2))).alias(
            "disc_price"
        ),
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("disc_price").cast("double").alias("volume"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "returned_item_customers",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers who returned the most revenue in a
    quarter. The quarter predicate shrinks orders ~45× but the slice
    still scales with SF, so no forced broadcast — AQE broadcasts it
    while small; the returnflag predicate pushes to the lineitem
    scan; top-20 is TakeOrdered."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select(
        "l_orderkey",
        (_dec("l_extendedprice", 12, 2) * (F.lit(1) - _dec("l_discount", 4, 2))).alias(
            "disc_price"
        ),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("disc_price").alias("disc_sum"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_custkey",
            "c_name",
            F.col("disc_sum").cast("double").alias("revenue"),
            "c_acctbal",
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "order_count_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count —
    left outer join (J2) preserving order-less customers as count 0,
    then a second aggregation over the first's output. The second
    groupBy has tiny cardinality, so its shuffle is negligible; the
    first is a shuffle on custkey that at 100 TB you avoid by
    bucketing both tables on the customer key."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS suppkey,
             sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM rev JOIN supplier ON suppkey = s_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
)
def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the max quarterly
    revenue — a scalar-subquery max compared against the aggregate.
    Spark form: aggregate per supplier, then compare against a 1-row
    broadcast `agg(max)` over the SAME aggregate. Both branches share
    an identical shuffle subtree (scan → partial sum → Exchange on
    l_suppkey), so exchange reuse (spark.sql.exchange.reuse, on by
    default) plans ONE lineitem scan — unlike the earlier
    `Window.partitionBy()` form, which funneled the SF-growing
    per-supplier aggregate (SF×10k rows) through a single task.
    Revenue equality is exact because both sides accumulate in
    decimal; comparing doubles for equality here would be fragile."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
        # no-op semantically (suppkey is never null) but load-bearing
        # for the plan: the join branch gets an isnotnull(l_suppkey)
        # inferred onto its scan while the max branch doesn't, and the
        # differing filters break exchange-subtree canonicalization —
        # AQE then runs TWO lineitem scans. Pinning the filter on the
        # shared input makes both branches identical, so the runtime
        # stage cache reuses one shuffle (asserted in test_scale).
        & F.col("l_suppkey").isNotNull()
    ).select(
        "l_suppkey",
        (_dec("l_extendedprice", 12, 2) * (F.lit(1) - _dec("l_discount", 4, 2))).alias(
            "disc_price"
        ),
    )
    rev = li.groupBy("l_suppkey").agg(F.sum("disc_price").alias("rev_dec"))
    max_rev = rev.agg(F.max("rev_dec").alias("max_rev"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(max_rev))
        .filter(F.col("rev_dec") == F.col("max_rev"))
        .join(supp, rev.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("rev_dec").cast("double").alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


@query(
    "large_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_totalprice,
           sum(l_quantity) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 180
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a
    threshold (aggregate-HAVING producing a key set) semi-joined back
    to the fact tables. The HAVING aggregate and the re-join both
    shuffle on orderkey — co-partitioned, so AQE reuses the exchange;
    at 100 TB bucketing lineitem+orders by orderkey makes the whole
    pipeline shuffle-free."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big_keys = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 180)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big_keys, orders.o_orderkey == big_keys.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@query(
    "discounted_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-conjuncts predicate spanning both join
    sides. The part-only conjuncts (brand, size) stay with the
    broadcast dim and the lineitem-only bound (quantity <= 30 across
    all branches) is derivable for scan pushdown; the mixed residual
    evaluates post-join inside codegen — no UDF, no driver loop."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_quantity",
        (_dec("l_extendedprice", 12, 2) * (F.lit(1) - _dec("l_discount", 4, 2))).alias(
            "disc_price"
        ),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & q.between(20, 30))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.sum("disc_price").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "forecast_revenue_change",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, zero joins — the
    query that measures raw scan bandwidth. Every predicate reaches
    the parquet reader (PushedFilters), the projection reads 4 of 11
    columns, and the single global aggregate needs a one-row shuffle.
    At 100 TB this is bounded by I/O alone — exactly what you want."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice", 12, 2) * _dec("l_discount", 4, 2))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "market_share",
    oracle="""
    WITH allrev AS (
      SELECT strftime(o_orderdate, '%Y') AS o_year,
             CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2))) AS volume,
             r_name
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      JOIN part     ON l_partkey = p_partkey
      WHERE p_type = 'PROMO'
    )
    SELECT o_year,
           CAST(sum(CASE WHEN r_name = 'AMERICA' THEN volume
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) AS amer_share
    FROM allrev
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one region's share of PROMO-part revenue per
    order year. Conditional-sum / total-sum on the same aggregate pass
    — a single shuffle on year; the p_type filter cuts the fact rows
    via the broadcast part join before any exchange. Both sums stay
    decimal-exact; the one double division terminates."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        (_dec("l_extendedprice", 12, 2) * (F.lit(1) - _dec("l_discount", 4, 2))).alias(
            "volume"
        ),
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select(
        "p_partkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.date_format("o_orderdate", "yyyy").alias("o_year")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    amer = F.sum(
        F.when(F.col("r_name") == "AMERICA", F.col("volume")).otherwise(
            F.lit(0).cast("decimal(12,2)")
        )
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("o_year")
        .agg((amer.cast("double") / F.sum("volume").cast("double")).alias("amer_share"))
        .orderBy("o_year")
    )


@query(
    "product_type_profit",
    oracle="""
    SELECT n_name AS nation,
           strftime(o_orderdate, '%Y') AS o_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))
                    - CAST(p_retailprice AS DECIMAL(12,2))
                      * CAST(l_quantity AS DECIMAL(9,1))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%bolt%'
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (discounted revenue minus retail cost ×
    quantity — the fixture has no partsupp, so p_retailprice stands in
    for ps_supplycost; cited semantics otherwise per SURVEY §2.5) by
    supplier nation and order year for parts matching a name pattern.
    The LIKE filter reduces the filtered part slice ahead of the join;
    it is still a fixed fraction of an SF-growing table, so no broadcast
    hint — AQE broadcast-selects at small SF and shuffles at scale."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey", "p_retailprice")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        (
            _dec("l_extendedprice", 12, 2) * (F.lit(1) - _dec("l_discount", 4, 2))
        ).alias("gross"),
        F.col("l_quantity").cast("decimal(9,1)").alias("qty_dec"),
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.date_format("o_orderdate", "yyyy").alias("o_year")
    )
    profit_term = F.col("gross") - _dec("p_retailprice", 12, 2) * F.col("qty_dec")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("nation", "o_year")
        .agg(F.sum(profit_term).cast("double").alias("profit"))
        .orderBy("nation", "o_year")
    )
