"""Join / set-operation / window-function pack over the TPC-H-ish
fixtures (SURVEY.md §2.4-2.6 + build-plan stage 5).

The reference never joins two tables; these operators complete the
engine surface with the shapes any real deployment of it needs, built
entirely from Catalyst primitives.

Determinism contract with the DuckDB oracles:
- Floating SUM/AVG accumulate exactly (scaled-BIGINT integer sums, see
  `_dsum`), surfaced as DOUBLE with a single correctly-rounded
  division — bit-identical across engines regardless of aggregation
  order. Spark's partial/final aggregation order is nondeterministic,
  so summing raw doubles would drift.
- Every LIMIT carries a total-order tiebreaker.

Scale notes:
- `nation`/`region` (25/5 rows) are broadcast explicitly: the join is
  map-side at any fact-table size.
- customer⋈orders⋈lineitem all shuffle on their join keys; AQE handles
  skew splitting. At 100 TB you'd bucket customer/orders on custkey —
  the declared plan is unchanged.
- Window functions partition by a key (custkey/user) — never the
  unpartitioned-window trap the reference's encoder fell into
  (ML notebook:101-114, see SURVEY §4.3.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from ..sources import load_table, local_rows_df


def _dsum(c: Column, scale: int = 2) -> Column:
    """Exact (order-independent) sum of a fixed-`scale` double column,
    surfaced as double.

    Implemented as a scaled-BIGINT sum — `sum(round(x·10^s))/10^s` —
    which benches ~3× faster than decimal aggregation. PRECONDITION:
    inputs must be IEEE doubles representing values with at most
    `scale` decimal places (true of every fixture money/quantity
    column). Then x·10^s rounds to the exact scaled integer, the sum
    is exact, and the single division is correctly rounded — equal to
    the DECIMAL-accumulate-then-cast path bit for bit. For arbitrary
    doubles (e.g. a true 3-decimal value with scale=2) the two paths
    can differ by 1 ulp of the last kept digit (double-rounding);
    use the decimal form for such data."""
    factor = 10 ** scale
    return F.sum(F.round(c * factor).cast("bigint")) / F.lit(float(factor))


def _davg(c: Column, scale: int = 2) -> Column:
    """Order-independent average: exact scaled sum, one double division."""
    return _dsum(c, scale) / F.count("*")


# --------------------------------------------------------------------------
# TPC-H Q1 shape — pricing summary (scan → filter → hash agg)
# --------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc_price, 4).alias("sum_disc_price"),
            _davg(F.col("l_quantity")).alias("avg_qty"),
            _davg(F.col("l_extendedprice")).alias("avg_price"),
            _davg(F.col("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q1_SQL = """
SELECT
    l_returnflag,
    l_linestatus,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        AS sum_disc_price,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
    CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
    COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

# --------------------------------------------------------------------------
# TPC-H Q3 shape — shipping priority (3-way join → agg → top-k)
# --------------------------------------------------------------------------


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(revenue, 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_Q3_SQL = """
SELECT
    l_orderkey,
    o_orderdate,
    o_orderpriority,
    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""

# --------------------------------------------------------------------------
# TPC-H Q5 shape — revenue by nation within a region (broadcast dims)
# --------------------------------------------------------------------------


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        # TPC-H Q5's "local supplier" condition: supplier and customer
        # share a nation — an extra equi-predicate, not a new join.
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .join(nation, F.col("c_nationkey") == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_dsum(revenue, 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


_Q5_SQL = """
SELECT
    n_name,
    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""

# --------------------------------------------------------------------------
# TPC-H Q10 shape — returned-item revenue per customer, top-k
# --------------------------------------------------------------------------


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which customers returned the most revenue in a quarter: the
    classic fact⋈fact⋈dim join with a wide GROUP BY and a small top-k.

    Scale shape: both selective filters (date window, returnflag 'R')
    push to their parquet scans BEFORE the joins; nation broadcasts;
    the only full-width exchange is the customer-grain aggregate; the
    top-20 is TakeOrderedAndProject.  `_dsum` keeps the revenue sum
    exact and order-independent for oracle parity."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_dsum(revenue, 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_Q10_SQL = """
SELECT
    c_custkey,
    c_name,
    c_acctbal,
    n_name,
    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""

# --------------------------------------------------------------------------
# TPC-H Q4 shape — order priority check (EXISTS decorrelated to a
# residual-condition semi-join)
# --------------------------------------------------------------------------


def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many orders per priority had at least one late-shipping line
    (TPC-H Q4's EXISTS shape; the fixture has no commit/receipt dates,
    so "late" = shipped more than 60 days after the order date).

    The correlated EXISTS becomes a LEFT-SEMI join with an equi-key
    (orderkey) plus a residual non-equi condition evaluated inside the
    join — one shuffle each side, no duplication, no post-join dedup;
    the quarter filter pushes into the orders scan before the join."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# TPC-H Q6 shape — forecast revenue change (pure scan → filter → agg)
# --------------------------------------------------------------------------


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue that would vanish if small discounts were dropped
    (TPC-H Q6): the purest pushdown benchmark — three range predicates
    and one global sum, no join, no group.

    Every predicate (date window, discount band, quantity cap) reaches
    the parquet scan as a PushedFilter; the plan is scan → single
    partial/final agg pair — at 100 TB this is bounded by scan
    bandwidth alone, the floor any engine should hit."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias(
                "revenue"
            )
        )
    )


_Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
           AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# TPC-H Q15 shape — top supplier (derived revenue view + scalar MAX)
# --------------------------------------------------------------------------


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quarter's highest-revenue supplier(s) (TPC-H Q15): a derived
    per-supplier revenue relation consumed twice — once for the scalar
    MAX, once for the equality filter — the view-reuse shape.

    The revenue aggregate shuffles once on l_suppkey; its global MAX is
    a 1-row broadcast (nested-loop scalar join, the q22 decorrelation);
    the supplier dim broadcasts into the surviving ≤|ties| rows.
    `_dsum` makes the revenue — and therefore the MAX equality — exact
    and order-independent, so ties resolve identically across engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "total_revenue"
        )
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_revenue"))
    supplier = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    )
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(supplier, rev.l_suppkey == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_Q15_SQL = """
WITH rev AS (
    SELECT l_suppkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev
JOIN supplier ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# TPC-H Q14 shape — promotion revenue share (conditional aggregate over
# a fact⋈dim join)
# --------------------------------------------------------------------------


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of one month's revenue from promo-type parts (TPC-H Q14):
    `100 · Σ[p_type=PROMO] rev / Σ rev` — the conditional-aggregate-
    over-join shape.

    The month filter pushes into the lineitem scan; part joins
    broadcast; BOTH sums run in the same hash aggregate (one pass, one
    exchange).  `_dsum` keeps each sum exact and order-independent so
    the final ratio is bit-stable across engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    agg = li.join(part, li.l_partkey == part.p_partkey).agg(
        _dsum(promo_rev, 4).alias("promo_revenue"),
        _dsum(rev, 4).alias("total_revenue"),
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")).alias(
            "promo_pct"
        ),
    )


_Q14_SQL = """
WITH agg AS (
    SELECT
        CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
             AS DOUBLE) AS total_revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
)
SELECT promo_revenue, total_revenue,
       100.0 * promo_revenue / total_revenue AS promo_pct
FROM agg
"""


# --------------------------------------------------------------------------
# TPC-H Q22 shape — idle high-balance customers (scalar subquery +
# anti-join + aggregate)
# --------------------------------------------------------------------------


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per market segment, the customers whose balance beats the
    positive-balance average but who never placed an URGENT order
    (TPC-H Q22's shape with the fixture's columns: mktsegment stands in
    for the phone country code, the urgent anti-join for the no-orders
    one, which is empty on this fixture).

    The scalar average broadcasts as a 1-row nested-loop side (the
    standard decorrelation), the anti-join runs on custkey, and the
    final aggregate is one exchange on mktsegment.  `_dsum` keeps the
    balance sum exact for oracle parity."""
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        _davg(F.col("c_acctbal")).alias("avg_bal")
    )
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            _dsum(F.col("c_acctbal")).alias("total_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


_Q22_SQL = """
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
    FROM customer WHERE c_acctbal > 0.0
)
AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# --------------------------------------------------------------------------
# TPC-H Q17 shape — small-quantity-order revenue (correlated scalar
# subquery, decorrelated to a single-shuffle window)
# --------------------------------------------------------------------------


def q17_small_quantity_revenue(
    spark: SparkSession, sf_dir: str, brand: str = "Brand#13"
) -> DataFrame:
    """Revenue lost to small orders: lineitems of one brand's parts
    whose quantity is below 20% of that part's average quantity
    (`l_quantity < 0.2 * (SELECT AVG(l_quantity) ... WHERE l_partkey =
    p_partkey)` — TPC-H Q17 adapted to the fixture's part columns,
    which carry p_brand but no p_container).

    The correlated scalar subquery decorrelates to a WINDOW over
    l_partkey instead of a self-join: the brand filter broadcasts into
    the lineitem scan first (so the window's input is the brand's
    lineitems only — partkey determines part, so the per-part average
    is unchanged), then ONE shuffle on l_partkey computes both the
    per-part sum and count, and the threshold test runs map-side.  The
    naive form scans lineitem twice and shuffles twice.

    Determinism: l_quantity is integral, so `0.2·avg` is tested as the
    exact integer predicate `5·qty·cnt < sum` — no floating division
    on the comparison path, bit-identical across engines; the revenue
    sum is `_dsum`-exact with one final double division by 7."""
    li = load_table(spark, sf_dir, "lineitem")
    brand_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == brand)
        .select("p_partkey")
    )
    li_brand = li.join(
        F.broadcast(brand_parts), li.l_partkey == brand_parts.p_partkey
    )
    w = Window.partitionBy("l_partkey")
    return (
        li_brand.withColumn(
            "qsum", F.sum(F.col("l_quantity").cast("bigint")).over(w)
        )
        .withColumn("qcnt", F.count(F.lit(1)).over(w))
        .filter(
            F.col("l_quantity").cast("bigint") * 5 * F.col("qcnt")
            < F.col("qsum")
        )
        .agg((_dsum(F.col("l_extendedprice"), 2) / F.lit(7.0)).alias("avg_yearly"))
    )


_Q17_SQL = """
WITH brand_li AS (
    SELECT l.*
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13'
),
pa AS (
    SELECT l_partkey,
           SUM(CAST(l_quantity AS BIGINT)) AS qsum,
           COUNT(*) AS qcnt
    FROM brand_li
    GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
           AS avg_yearly
FROM brand_li l
JOIN pa ON pa.l_partkey = l.l_partkey
WHERE 5 * CAST(l.l_quantity AS BIGINT) * pa.qcnt < pa.qsum
"""


# --------------------------------------------------------------------------
# TPC-H Q18 shape — large-volume customers (HAVING set feeding a
# semi-join back into the big table)
# --------------------------------------------------------------------------


def q18_large_volume_customers(
    spark: SparkSession, sf_dir: str, min_quantity: int = 300
) -> DataFrame:
    """Customers whose single orders total more than `min_quantity`
    units (TPC-H Q18): the groupBy-HAVING on lineitem produces a tiny
    qualifying-order set that must then filter lineitem AGAIN for the
    detail rows.

    Scale shape: the HAVING set (≈1 in 400 orders) is broadcast as a
    left-semi filter into orders, the surviving orders join customer
    broadcast-side (the enriched set stays tiny), and that result
    broadcasts into the second lineitem pass — so the big table is
    scanned twice (inherent to Q18) but NEVER shuffled; the only
    exchange is the first pass's l_orderkey aggregation.  The final
    per-order aggregate re-sums quantity from the broadcast-joined
    detail rows; top-100 is TakeOrderedAndProject with a full
    tie-break (o_totalprice DESC, o_orderdate, o_orderkey)."""
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qsum"))
        .filter(F.col("qsum") > min_quantity)
        .select("l_orderkey")
    )
    sel_orders = orders.join(
        F.broadcast(big), orders.o_orderkey == big.l_orderkey, "left_semi"
    )
    enriched = cust.join(
        F.broadcast(sel_orders), cust.c_custkey == sel_orders.o_custkey
    ).select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    return (
        li.join(F.broadcast(enriched), li.l_orderkey == enriched.o_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("double")
            .alias("total_qty")
        )
        .orderBy(
            F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey")
        )
        .limit(100)
    )


_Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS BIGINT)) > 300
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
LIMIT 100
"""


# --------------------------------------------------------------------------
# Semi / anti joins
# --------------------------------------------------------------------------


def semi_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with at least one URGENT order — left-semi join (one
    probe, no duplication, no post-join dedup)."""
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")


_SEMI_SQL = """
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
"""


def anti_no_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no URGENT order — left-anti join."""
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")


_ANTI_SQL = """
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
FROM customer c
WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
"""


def left_join_order_linecounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders LEFT JOIN lineitem — preserved rows get zero counts.
    Aggregate lineitem BEFORE the join: shrinks the shuffled build side
    from |lineitem| to |orders| (partial aggregation pushed below the
    join — the optimizer won't do this rewrite for you)."""
    orders = load_table(spark, sf_dir, "orders")
    li_agg = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("_n"), _dsum(F.col("l_quantity")).alias("_q"))
    )
    return orders.join(
        li_agg, orders.o_orderkey == li_agg.l_orderkey, "left"
    ).select(
        "o_orderkey",
        "o_orderstatus",
        F.coalesce(F.col("_n"), F.lit(0)).alias("line_count"),
        F.coalesce(F.col("_q"), F.lit(0.0)).alias("total_qty"),
    )


_LEFT_SQL = """
SELECT
    o_orderkey,
    o_orderstatus,
    COALESCE(ln.n, 0) AS line_count,
    COALESCE(ln.q, 0.0) AS total_qty
FROM orders
LEFT JOIN (
    SELECT l_orderkey, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q
    FROM lineitem GROUP BY l_orderkey
) ln ON o_orderkey = ln.l_orderkey
"""

# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------


def union_order_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged UNION ALL of two disjoint slices (SURVEY §2.4 gap-fill)."""
    orders = load_table(spark, sf_dir, "orders")
    high = orders.filter(F.col("o_totalprice") >= 300000).select(
        "o_orderkey", F.lit("high").alias("tier"), "o_totalprice"
    )
    low = orders.filter(F.col("o_totalprice") < 50000).select(
        "o_orderkey", F.lit("low").alias("tier"), "o_totalprice"
    )
    return high.unionAll(low)


_UNION_SQL = """
SELECT o_orderkey, 'high' AS tier, o_totalprice FROM orders WHERE o_totalprice >= 300000
UNION ALL
SELECT o_orderkey, 'low' AS tier, o_totalprice FROM orders WHERE o_totalprice < 50000
"""


def intersect_building_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: BUILDING-segment customers ∩ customers with URGENT
    orders (distinct semantics)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return building.intersect(urgent)


_INTERSECT_SQL = """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


def except_customers_without_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): all customers minus those with an open ('O')
    order."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    all_c = cust.select(F.col("c_custkey").alias("custkey"))
    open_c = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return all_c.subtract(open_c)


_EXCEPT_SQL = """
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
"""

def fuzzy_name_join(
    spark: SparkSession, sf_dir: str, n_probes: int = 20, max_distance: int = 2
) -> DataFrame:
    """Approximate string join (entity resolution): deterministic typo
    probes (each of the first `n_probes` part names with its third
    character dropped) matched back to the catalog by edit distance —
    the fuzzy-key lookup every dedup/linkage pipeline needs, with
    edit-distance semantics complementing the token-set (Jaccard/
    MinHash) family.

    Scale shape: BLOCKING does the work — candidates must share the
    first character (the equi-key, so this is a broadcast HASH join,
    not a nested loop) and differ in length by ≤ 1 (residual band),
    and only candidates pay the O(len²) levenshtein, JVM-side.  At
    100 TB the same plan uses q-gram prefix blocking (multiple equi
    keys per string) — more keys, same join geometry.  Deletion typos
    move edit distance by exactly 1, so blocking on (first char,
    ±1 length) provably loses no true match for this probe family."""
    part = load_table(spark, sf_dir, "part")
    probes = F.broadcast(
        part.filter(F.col("p_partkey") < n_probes).select(
            F.col("p_partkey").alias("probe_id"),
            F.concat(
                F.substring("p_name", 1, 2), F.expr("substring(p_name, 4)")
            ).alias("typo"),
        ).withColumn("blk", F.substring("typo", 1, 1))
    )
    cands = part.withColumn("blk", F.substring("p_name", 1, 1)).join(
        probes, "blk"
    ).filter(F.abs(F.length("typo") - F.length("p_name")) <= 1)
    return (
        cands.withColumn("distance", F.levenshtein("typo", "p_name"))
        .filter(F.col("distance") <= max_distance)
        .select("probe_id", "typo", "p_partkey", "p_name", "distance")
        .orderBy("probe_id", "p_partkey")
    )


_FUZZY_JOIN_SQL = """
WITH probes AS (
    SELECT p_partkey AS probe_id,
           substr(p_name, 1, 2) || substr(p_name, 4) AS typo
    FROM part
    WHERE p_partkey < 20
)
SELECT pr.probe_id, pr.typo, pt.p_partkey, pt.p_name,
       CAST(levenshtein(pr.typo, pt.p_name) AS INT) AS distance
FROM probes pr
JOIN part pt
  ON substr(pr.typo, 1, 1) = substr(pt.p_name, 1, 1)
 AND abs(length(pr.typo) - length(pt.p_name)) <= 1
WHERE levenshtein(pr.typo, pt.p_name) <= 2
ORDER BY probe_id, p_partkey
"""


def unpivot_status_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt) — the inverse of the PIVOT entry: a wide
    per-status metrics row (count / exact total / exact avg) melted to
    tidy (status, metric, value) triples, the shape feature stores and
    plotting layers want.

    Spark's `unpivot` plans as a single Expand over the aggregated
    rows — no shuffle beyond the one aggregation exchange; the
    metric-name column is a literal, so downstream filters on it
    constant-fold."""
    orders = load_table(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderstatus").agg(
        F.count("*").cast("double").alias("n_orders"),
        _dsum(F.col("o_totalprice")).alias("total_price"),
        _davg(F.col("o_totalprice")).alias("avg_price"),
    )
    return wide.unpivot(
        ["o_orderstatus"],
        ["n_orders", "total_price", "avg_price"],
        "metric",
        "value",
    ).orderBy("o_orderstatus", "metric")


_UNPIVOT_SQL = """
WITH wide AS (
    SELECT o_orderstatus,
           CAST(COUNT(*) AS DOUBLE) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS avg_price
    FROM orders
    GROUP BY o_orderstatus
)
SELECT o_orderstatus, metric, value
FROM (
    SELECT o_orderstatus, 'n_orders' AS metric, n_orders AS value FROM wide
    UNION ALL
    SELECT o_orderstatus, 'total_price', total_price FROM wide
    UNION ALL
    SELECT o_orderstatus, 'avg_price', avg_price FROM wide
)
ORDER BY o_orderstatus, metric
"""


def grouping_sets_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form ROLLUP/CUBE are sugar
    for: per-status totals, per-priority totals, and the grand total in
    ONE pass, WITHOUT the cross-combinations CUBE would add.  The
    grouping_id column disambiguates a real NULL key from a
    set-collapsed one (the standard contract).

    Spark plans this as a single Expand + hash aggregate — each input
    row fans out once per grouping set, partial aggregation still
    applies, one exchange total; at 100 TB this beats three separate
    scans+aggregations unioned."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count("*").alias("n_orders"),
            _dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("gid", "o_orderstatus", "o_orderpriority")
    )


_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY gid, o_orderstatus, o_orderpriority
"""


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------


def window_analytics_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic-window function surface in one relation: per
    priority class, each order's neighbors (lag/lead), its rank
    position as a fraction (percent_rank / cume_dist), and its price
    quartile (ntile) — the functions a dashboard or feature pipeline
    leans on beyond plain row_number.

    Every window partitions by o_orderpriority and orders by
    (o_totalprice DESC, o_orderkey) — a total order, so ntile bucket
    boundaries and lag/lead neighbors are deterministic and
    engine-independent.  One shuffle on the partition key serves all
    five functions (Spark evaluates them in a single Window node)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.lag("o_totalprice").over(w).alias("prev_price"),
            F.lead("o_totalprice").over(w).alias("next_price"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("o_orderpriority", F.desc("o_totalprice"), "o_orderkey")
    )


_WINDOW_PACK_SQL = """
SELECT o_orderpriority, o_orderkey, o_totalprice,
       lag(o_totalprice) OVER w AS prev_price,
       lead(o_totalprice) OVER w AS next_price,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       CAST(ntile(4) OVER w AS INT) AS quartile
FROM orders
WINDOW w AS (
    PARTITION BY o_orderpriority
    ORDER BY o_totalprice DESC, o_orderkey ASC
)
ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey
"""


def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number over (PARTITION BY custkey ORDER BY totalprice DESC) —
    partitioned window, scales by hash-distributing customers."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


_TOP3_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
           ) AS rn
    FROM orders
)
WHERE rn <= 3
"""


def running_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + lag within each customer's order history.
    Frame order is total (orderdate, orderkey) so the running decimal
    sum is deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_revenue"),
        F.lag("o_totalprice").over(w).alias("prev_totalprice"),
    )


_RUNNING_SQL = """
SELECT
    o_custkey,
    o_orderkey,
    o_orderdate,
    o_totalprice,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS DOUBLE) AS running_revenue,
    LAG(o_totalprice) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ) AS prev_totalprice
FROM orders
"""

# --------------------------------------------------------------------------
# ROLLUP (multi-level aggregation in one pass)
# --------------------------------------------------------------------------


def rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("orders"),
            _dsum(F.col("o_totalprice")).alias("total_revenue"),
        )
        .orderBy(
            F.asc_nulls_first("o_orderstatus"), F.asc_nulls_first("o_orderpriority")
        )
    )


_ROLLUP_SQL = """
SELECT
    o_orderstatus,
    o_orderpriority,
    COUNT(*) AS orders,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^2 grouping-set combinations in one pass (partial
    aggregation per grouping set, single shuffle) — the
    grouping-sets companion to the ROLLUP above."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("orders"),
            _dsum(F.col("o_totalprice")).alias("total_revenue"),
        )
        .orderBy(
            F.asc_nulls_first("o_orderstatus"), F.asc_nulls_first("o_orderpriority")
        )
    )


_CUBE_SQL = """
SELECT
    o_orderstatus,
    o_orderpriority,
    COUNT(*) AS orders,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per priority, one column per order status.
    Explicit pivot values keep the plan single-pass (no extra distinct
    job to discover columns) — the form that scales."""
    orders = load_table(spark, sf_dir, "orders")
    statuses = ["F", "O", "P"]
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", statuses)
        .agg(F.count(F.lit(1)))
        .na.fill(0, [s for s in statuses])
        .withColumnsRenamed({s: f"status_{s}" for s in statuses})
        .orderBy("o_orderpriority")
    )


_PIVOT_SQL = """
SELECT
    o_orderpriority,
    COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_F,
    COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_O,
    COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_P
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape: orders priced above their own
    customer's average. Expressed decorrelated — one window pass
    computing the per-customer average, then a filter — which is the
    plan Catalyst's subquery decorrelation would target anyway: a
    single shuffle on o_custkey, no per-row subquery execution. Oracle
    states it as the correlated subquery to prove semantic equivalence."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    cust_avg = (
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).over(w)
        / F.lit(100.0)
    ) / F.count("*").over(w)
    return (
        orders.withColumn("cust_avg", cust_avg)
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.col("cust_avg").alias("customer_avg_price"),
        )
    )


_ABOVE_AVG_SQL = """
SELECT
    o_orderkey,
    o_custkey,
    o_totalprice,
    (
        SELECT CAST(SUM(CAST(ROUND(i.o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
               / COUNT(*)
        FROM orders i
        WHERE i.o_custkey = o.o_custkey
    ) AS customer_avg_price
FROM orders o
WHERE o.o_totalprice > (
    SELECT CAST(SUM(CAST(ROUND(i.o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
           / COUNT(*)
    FROM orders i
    WHERE i.o_custkey = o.o_custkey
)
"""


PRICE_TIERS = [
    ("budget", 0.0, 100_000.0),
    ("standard", 100_000.0, 250_000.0),
    ("premium", 250_000.0, 400_000.0),
    ("luxury", 400_000.0, 1e12),
]


def range_join_price_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE join: orders banded into tier intervals via
    lo <= price < hi against a broadcast tier dimension. With the dim
    broadcast, the inequality join is a map-side nested-loop over 4
    rows — no shuffle, no quadratic blowup, any fact-table scale."""
    orders = load_table(spark, sf_dir, "orders")
    tiers = F.broadcast(
        local_rows_df(spark, PRICE_TIERS, "tier string, lo double, hi double")
    )
    joined = orders.join(
        tiers,
        (orders.o_totalprice >= tiers.lo) & (orders.o_totalprice < tiers.hi),
    )
    return (
        joined.groupBy("tier")
        .agg(
            F.count("*").alias("orders"),
            _dsum(F.col("o_totalprice")).alias("revenue"),
        )
        .orderBy("tier")
    )


_RANGE_JOIN_SQL = """
SELECT
    tier,
    COUNT(*) AS orders,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
JOIN (
    VALUES ('budget', 0.0, 100000.0),
           ('standard', 100000.0, 250000.0),
           ('premium', 250000.0, 400000.0),
           ('luxury', 400000.0, 1e12)
) AS tiers(tier, lo, hi)
  ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY tier
ORDER BY tier
"""


# --------------------------------------------------------------------------
# As-of join — latest event at-or-before each order (operator Spark lacks)
# --------------------------------------------------------------------------


def asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT AS-OF JOIN across tables: for every event, the user's most
    recent order at-or-before the event time (ties on order date —
    common, dates are day-granular — broken by largest o_orderkey;
    events whose user has no prior order keep NULLs).

    Spark has no native as-of join, and the naive formulation — an
    inequality join followed by a per-key argmax — explodes into
    O(events × orders-per-user) intermediate rows before the argmax
    prunes them.  This is the scalable UNION-MERGE formulation instead:
    tag both inputs, union them, and run one window pass partitioned by
    the key, ordered by (time, side, o_orderkey), carrying the last
    non-null order attributes forward.  ONE shuffle on the key, zero
    join blowup, O(rows) work — the same merge-scan as-of every
    time-series engine implements natively.  Per-user history skew is
    bounded by history length, not by the cross product.
    (`events.purchase_attribution` is the single-table sibling with
    interleaved sides; here the probe and reference are different
    tables with different schemas.)

    Times compare at epoch-second granularity (the module's
    precision-proof common ground with the nanosecond event fixture).
    """
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    od = orders.select(
        F.col("o_custkey").alias("k"),
        F.unix_timestamp("o_orderdate").alias("t_s"),
        F.lit(0).alias("is_probe"),
        "o_orderkey",
        "o_totalprice",
        F.lit(None).cast("long").alias("event_id"),
    )
    ev = events.select(
        F.col("user_id").alias("k"),
        F.unix_timestamp("ts").alias("t_s"),
        F.lit(1).alias("is_probe"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
        "event_id",
    )
    # event rows sort AFTER orders at the same second (is_probe=1), so
    # "at-or-before" is inclusive; equal-date orders resolve to the
    # largest o_orderkey — the deterministic tiebreak the oracle mirrors
    w = (
        Window.partitionBy("k")
        .orderBy("t_s", "is_probe", F.coalesce("o_orderkey", F.lit(-1)))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = od.unionByName(ev).select(
        "k",
        "t_s",
        "is_probe",
        "event_id",
        F.last("o_orderkey", ignorenulls=True).over(w).alias("last_order_key"),
        F.last("o_totalprice", ignorenulls=True).over(w).alias("last_order_price"),
        F.last(
            F.when(F.col("is_probe") == 0, F.col("t_s")), ignorenulls=True
        ).over(w).alias("last_order_date_s"),
    )
    return merged.filter(F.col("is_probe") == 1).select(
        "event_id",
        F.col("k").alias("user_id"),
        F.col("t_s").alias("event_ts_s"),
        "last_order_key",
        "last_order_price",
        "last_order_date_s",
        (F.col("t_s") - F.col("last_order_date_s")).alias("seconds_since_order"),
    )


# Oracle: independent nested-loop formulation (LATERAL + ORDER BY +
# LIMIT 1) rather than a window restatement of the Spark plan.
_ASOF_SQL = """
SELECT
    e.event_id,
    e.user_id,
    CAST(FLOOR(EXTRACT(epoch FROM e.ts)) AS BIGINT) AS event_ts_s,
    o.o_orderkey AS last_order_key,
    o.o_totalprice AS last_order_price,
    o.od_s AS last_order_date_s,
    CAST(FLOOR(EXTRACT(epoch FROM e.ts)) AS BIGINT) - o.od_s
        AS seconds_since_order
FROM events e
LEFT JOIN LATERAL (
    SELECT o_orderkey, o_totalprice,
           CAST(FLOOR(EXTRACT(epoch FROM o_orderdate)) AS BIGINT) AS od_s
    FROM orders
    WHERE o_custkey = e.user_id
      AND CAST(FLOOR(EXTRACT(epoch FROM o_orderdate)) AS BIGINT)
          <= CAST(FLOOR(EXTRACT(epoch FROM e.ts)) AS BIGINT)
    ORDER BY od_s DESC, o_orderkey DESC
    LIMIT 1
) o ON TRUE
"""


# --------------------------------------------------------------------------
# SCD Type-2 history build (CDC / dimension maintenance)
# --------------------------------------------------------------------------


def scd2_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse a change log into a slowly-changing-dimension (type 2)
    history: each customer's order-status timeline becomes effective-
    dated periods (valid_from / valid_to, versioned, is_current on the
    open row) — the dimension-maintenance half of every warehouse CDC
    pipeline, here derived from the orders log.

    Change detection is a `lag` per customer; period close is a `lead`
    over the surviving change rows.  Both windows partition by custkey
    with identical ordering, so Catalyst reuses ONE exchange + sort for
    the whole build (no unpartitioned window anywhere); per-customer
    history length bounds the state, never the table size.  Same-day
    status flips order deterministically by o_orderkey.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    chg = (
        orders.select("o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey")
        .withColumn("prev_status", F.lag("o_orderstatus").over(w))
        .filter(
            F.col("prev_status").isNull()
            | (F.col("prev_status") != F.col("o_orderstatus"))
        )
    )
    return (
        chg.select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderdate").alias("valid_from"),
            F.row_number().over(w).cast("bigint").alias("version"),
            F.lead("o_orderdate").over(w).alias("valid_to"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )


_SCD2_SQL = """
WITH ordered AS (
    SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
           LAG(o_orderstatus) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS prev_status
    FROM orders
),
chg AS (
    SELECT * FROM ordered
    WHERE prev_status IS NULL OR prev_status <> o_orderstatus
)
SELECT o_custkey AS custkey,
       o_orderstatus AS status,
       o_orderdate AS valid_from,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) AS BIGINT) AS version,
       LEAD(o_orderdate) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) AS valid_to,
       LEAD(o_orderdate) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) IS NULL AS is_current
FROM chg
"""


# --------------------------------------------------------------------------
# TPC-H Q7 shape — volume shipping between two nations (double-dim
# join with a symmetric nation-pair predicate)
# --------------------------------------------------------------------------


def q7_volume_shipping(
    spark: SparkSession,
    sf_dir: str,
    nation_a: str = "NATION_19",
    nation_b: str = "NATION_20",
) -> DataFrame:
    """Bilateral trade volume: revenue shipped from suppliers of one
    nation to customers of the other, both directions, per year
    (TPC-H Q7 on the fixture's columns).

    The symmetric OR predicate `(n1=a AND n2=b) OR (n1=b AND n2=a)` is
    pre-split: each nation dim is filtered to the 2-row {a,b} subset
    BEFORE its broadcast join (so supplier and customer shrink to the
    two nations' rows at the scan), and the residual after the join is
    just `supp_nation != cust_nation` — equivalent for a 2-name set,
    and the selectivity lands in the joins instead of a post-join
    filter.  lineitem is filtered to the 2-year window first; the only
    exchanges are the orders/customer fact joins."""
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(nation_a, nation_b)
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(_dsum(volume, 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM (
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           YEAR(l_shipdate) AS l_year,
           l_extendedprice * (1 - l_discount) AS volume
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_20')
        OR (n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_19'))
      AND l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# --------------------------------------------------------------------------
# TPC-H Q8 shape — national market share (two independent nation
# lookups + ratio of conditional to total aggregate)
# --------------------------------------------------------------------------


def q8_market_share(
    spark: SparkSession,
    sf_dir: str,
    target_nation: str = "NATION_5",
    region: str = "ASIA",
    part_type: str = "PROMO",
) -> DataFrame:
    """The target nation's share of PROMO-part revenue sold into one
    region, per order year (TPC-H Q8; p_type stands in for the
    three-word type).

    Every dimension prunes before the fact joins: part filters to one
    type and broadcasts into lineitem, customer pre-joins its
    region-filtered nation subset, and the supplier nation name rides
    a broadcast so the numerator CASE is map-side.  The share is a
    ratio of two exact scaled sums computed in ONE aggregate pass
    (conditional numerator via CASE, like the reference's q07
    affordability split), so numerator and denominator never scan
    twice.  One double division at the end keeps oracle parity."""
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == region)
    nat = load_table(spark, sf_dir, "nation")
    cust_nat = nat.join(
        F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("cn_key"))
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(cust_nat), F.col("c_nationkey") == F.col("cn_key"))
        .select("c_custkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == part_type)
        .select("p_partkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target_vol = F.when(F.col("supp_nation") == target_nation, volume).otherwise(
        F.lit(0.0)
    )
    return (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            _dsum(target_vol, 4).alias("target_volume"),
            _dsum(volume, 4).alias("total_volume"),
        )
        .withColumn(
            "mkt_share", F.col("target_volume") / F.col("total_volume")
        )
        .orderBy("o_year")
    )


_Q8_SQL = """
WITH all_nations AS (
    SELECT YEAR(o_orderdate) AS o_year,
           l_extendedprice * (1 - l_discount) AS volume,
           n2.n_name AS supp_nation
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region    ON n1.n_regionkey = r_regionkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA'
      AND p_type = 'PROMO'
      AND o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
)
SELECT o_year,
       CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_5' THEN volume
                          ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE)
           AS target_volume,
       CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS total_volume,
       CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_5' THEN volume
                          ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE)
         / CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS mkt_share
FROM all_nations
GROUP BY o_year
ORDER BY o_year
"""


# --------------------------------------------------------------------------
# TPC-H Q9 shape — product-line profit by nation and year (multi-way
# join + arithmetic over two tables' measures)
# --------------------------------------------------------------------------


def q9_product_profit(
    spark: SparkSession, sf_dir: str, name_token: str = "gear"
) -> DataFrame:
    """Profit on one product line per supplier nation and order year
    (TPC-H Q9 adapted: the fixture has no partsupp, so unit cost is
    the part's `p_retailprice` instead of `ps_supplycost` — the join
    graph and the two-table profit expression are unchanged).

    part filters on the name token and broadcasts WITH its retailprice
    so the profit expression `ext·(1-disc) − retail·qty` evaluates
    map-side in the lineitem scan; nation rides the supplier broadcast.
    The only exchanges are the orders join (for the year) and the
    final 2-key aggregate.  Profit is a 4-decimal-exact `_dsum`
    (retailprice has 2 decimals × integral qty ⊂ 4-decimal grid)."""
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains(name_token))
        .select("p_partkey", "p_retailprice")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").select(
                    "n_nationkey", F.col("n_name").alias("nation")
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "nation")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(_dsum(profit, 4).alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


_Q9_SQL = """
SELECT nation, o_year,
       CAST(SUM(CAST(amount AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
FROM (
    SELECT n_name AS nation,
           YEAR(o_orderdate) AS o_year,
           l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity
               AS amount
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%gear%'
) profit
GROUP BY nation, o_year
ORDER BY nation ASC, o_year DESC
"""


# --------------------------------------------------------------------------
# TPC-H Q12 shape — late-shipment priority counts (join + dual
# conditional aggregate)
# --------------------------------------------------------------------------


def q12_late_shipment_priority(
    spark: SparkSession, sf_dir: str, grace_days: int = 90
) -> DataFrame:
    """Per line status, how many late-shipped lineitems (shipped more
    than `grace_days` after the order date) belonged to critical- vs
    normal-priority orders (TPC-H Q12 adapted: the fixture has no
    l_shipmode/commitdate/receiptdate, so l_linestatus buckets the
    rows and order-date-to-ship-date latency defines 'late').

    The latency predicate is a pure column comparison — it evaluates
    inside the join's whole-stage-codegen span, no UDF.  Both priority
    counters come from ONE aggregate pass with CASE (the Q12 signature
    shape); the join shuffles on orderkey only after lineitem is
    pre-filtered to the date window."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {grace_days} DAYS")
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


_Q12_SQL = """
SELECT l_linestatus,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS high_line_count,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# --------------------------------------------------------------------------
# TPC-H Q13 shape — customer order-count distribution (outer join with
# a join-condition filter + two stacked aggregations)
# --------------------------------------------------------------------------


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of customers by how many non-urgent orders they
    placed, zero-order customers included (TPC-H Q13; the priority
    exclusion stands in for the comment-pattern exclusion the fixture
    lacks).

    The exclusion lives in the JOIN CONDITION, not a WHERE — that is
    the Q13 trap: filtering after a left join would drop the zero-order
    customers that the distribution's biggest bucket counts.  Counting
    `o_orderkey` (not `*`) makes the preserved null rows count 0.
    Two stacked aggregates: the first shuffles on custkey, the second
    on the (tiny) count domain."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
                    AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --------------------------------------------------------------------------
# TPC-H Q19 shape — disjunctive multi-band predicate join (OR-of-ANDs
# pushdown)
# --------------------------------------------------------------------------


def q19_banded_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from three disjoint (brand, size-band, quantity-band)
    channels in one pass (TPC-H Q19 on the fixture's part columns —
    p_size/l_quantity bands replace the container/shipmode lists).

    The three conjunctive bands are OR-ed into a single residual on
    the part⋈lineitem join.  What matters at scale: the disjunction's
    COMMON factors (`p_size >= 1`, the brand IN-set, `l_quantity <=
    30`) are derivable by Catalyst and push into both parquet scans as
    `PushedFilters`, so the join sees only plausible rows; the full
    OR evaluates codegen-side.  Part is broadcast; lineitem never
    shuffles.  One-row exact-sum output."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    li = load_table(spark, sf_dir, "lineitem")
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#21")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(band)
        .agg(_dsum(revenue, 4).alias("revenue"))
    )


_Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


# --------------------------------------------------------------------------
# TPC-H Q21 shape — suppliers who kept orders waiting (semi + anti
# self-correlation, rewritten as one aggregation)
# --------------------------------------------------------------------------


def q21_waiting_suppliers(
    spark: SparkSession, sf_dir: str, grace_days: int = 60, top_n: int = 20
) -> DataFrame:
    """Suppliers who were the SOLE late shipper on multi-supplier
    finalized orders (TPC-H Q21 adapted: 'late' is ship-date more than
    `grace_days` past the order date, standing in for the fixture-less
    receipt/commit pair; the EXISTS/NOT-EXISTS self-correlation is
    intact).

    Scale rewrite: the classic plan self-joins lineitem twice (semi
    for 'another supplier exists', anti for 'no other late supplier').
    Both correlations only need per-order supplier sets, so ONE
    groupBy(orderkey) computes `n_supp = countDistinct(suppkey)` and
    `late_supps = collect_set(late suppkey)`, and a qualifying order —
    `n_supp > 1 AND size(late_supps) = 1` — already NAMES its sole
    late shipper (`late_supps[1]`): the whole EXISTS/NOT-EXISTS pair
    is one scan, one join and one aggregate, with no second pass over
    lineitem at all (the previous shape re-ran the lineitem⋈orders
    join to re-find the late rows of qualifying orders — guide §2.4).
    The late-supplier set per order is bounded by suppliers-per-order,
    so the aggregate state stays tiny at any scale.  The DuckDB oracle
    keeps the EXISTS form; values match because the rewrite is exact,
    not approximate."""
    orders_f = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem")
    lo = (
        li.join(
            orders_f.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr(f"INTERVAL {grace_days} DAYS")
            ).alias("late"),
        )
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).alias(
            "late_supps"
        ),
    )
    waiting = per_order.filter(
        (F.col("n_supp") > 1) & (F.size("late_supps") == 1)
    ).select(
        "l_orderkey", F.element_at("late_supps", 1).alias("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(
            F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(top_n)
    )


_Q21_SQL = """
WITH lo AS (
    SELECT l_orderkey, l_suppkey,
           l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    WHERE o_orderstatus = 'F'
)
SELECT s_name, COUNT(*) AS numwait
FROM (
    SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
    FROM lo l1
    WHERE l1.late
      AND EXISTS (
          SELECT 1 FROM lo l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lo l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.late
      )
) w
JOIN supplier ON s_suppkey = w.l_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
"""


# --------------------------------------------------------------------------
# Derived partsupp — the fixture ships no partsupp table, so the four
# partsupp-dependent TPC-H shapes (Q2/Q11/Q16/Q20) run over the
# supplier-part relationships OBSERVED in lineitem: one row per
# distinct (partkey, suppkey) pair, availqty = total shipped quantity,
# supplycost = cheapest observed line price (2-decimal exact, so every
# downstream sum stays order-independent for the DuckDB oracles).
# --------------------------------------------------------------------------


def _derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One groupBy over lineitem; every Q2/Q11/Q16/Q20 plan reuses this
    single-exchange relation. At 100 TB you'd materialize it bucketed
    by ps_partkey — the consumers join on that key."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("ps_availqty"),
            F.min("l_extendedprice").alias("ps_supplycost"),
        )
    )


_PARTSUPP_CTE = """
WITH partsupp AS (
    SELECT l_partkey AS ps_partkey,
           l_suppkey AS ps_suppkey,
           SUM(CAST(l_quantity AS BIGINT)) AS ps_availqty,
           MIN(l_extendedprice) AS ps_supplycost
    FROM lineitem
    GROUP BY l_partkey, l_suppkey
)
"""


# --------------------------------------------------------------------------
# TPC-H Q2 shape — minimum-cost supplier (correlated MIN subquery
# decorrelated to a window)
# --------------------------------------------------------------------------


def q2_min_cost_supplier(
    spark: SparkSession,
    sf_dir: str,
    region: str = "ASIA",
    size_min: int = 40,
    top_n: int = 100,
) -> DataFrame:
    """For each large part, the region's cheapest supplier(s) — ties
    kept, exactly as TPC-H Q2's correlated `ps_supplycost = (SELECT
    MIN ...)` demands (p_size ≥ threshold stands in for the type/size
    predicate pair; partsupp is the derived relation above).

    The correlated MIN decorrelates to a window over ps_partkey
    computed AFTER the region restriction (the subquery is
    region-correlated too — computing the min before the supplier join
    would be wrong, not just slow).  Suppliers+nations of the region
    broadcast into the derived partsupp, one window pass marks the
    per-part min, and the part dim joins broadcast-side last since
    only min-cost rows survive."""
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == region)
    nat = load_table(spark, sf_dir, "nation").join(
        F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nat.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") >= size_min)
        .select("p_partkey", "p_name", "p_brand")
    )
    ps = _derived_partsupp(spark, sf_dir)
    w = Window.partitionBy("ps_partkey")
    return (
        ps.join(
            F.broadcast(
                supp.select("s_suppkey", "s_name", "s_acctbal", "n_name")
            ),
            F.col("ps_suppkey") == F.col("s_suppkey"),
        )
        .withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .join(F.broadcast(parts), F.col("ps_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_name",
            "ps_supplycost",
        )
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey")
        )
        .limit(top_n)
    )


_Q2_SQL = _PARTSUPP_CTE + """
SELECT s_acctbal, s_name, n_name AS nation, p_partkey, p_name, ps_supplycost
FROM part
JOIN partsupp ON p_partkey = ps_partkey
JOIN supplier ON s_suppkey = ps_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE p_size >= 40
  AND r_name = 'ASIA'
  AND ps_supplycost = (
      SELECT MIN(ps2.ps_supplycost)
      FROM partsupp ps2
      JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
      JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
      JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
      WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'ASIA'
  )
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT 100
"""


# --------------------------------------------------------------------------
# TPC-H Q11 shape — important stock (HAVING against a scalar-subquery
# fraction of the global total)
# --------------------------------------------------------------------------


def q11_important_stock(
    spark: SparkSession,
    sf_dir: str,
    nation: str = "NATION_19",
    mean_multiple: float = 2.0,
) -> DataFrame:
    """Parts whose inventory value at one nation's suppliers exceeds
    `mean_multiple`x the nation's MEAN per-part inventory value
    (TPC-H Q11 over the derived partsupp; the spec's fixed fraction of
    the total is 0.0001/SF -- tied to the scale factor -- so the
    scale-free equivalent 'k x mean part value' keeps the shape
    meaningful at every SF instead of emptying out as the part count
    grows).

    Both the per-part values and the global total come from the SAME
    single-exchange aggregate: the per-part sums are computed once and
    the threshold is their re-aggregation broadcast back as a 1-row
    cross join — the nation-filtered partsupp is never scanned twice.
    value = supplycost·availqty is 2-decimal × integer, so `_dsum`
    keeps both sums exact and the HAVING compare engine-stable."""
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == nation)
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat.select("n_nationkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    ps = _derived_partsupp(spark, sf_dir).join(
        F.broadcast(supp), F.col("ps_suppkey") == F.col("s_suppkey")
    )
    value = F.col("ps_supplycost") * F.col("ps_availqty")
    per_part = ps.groupBy("ps_partkey").agg(_dsum(value, 2).alias("part_value"))
    total = per_part.agg(
        (
            _dsum(F.col("part_value"), 2)
            * F.lit(mean_multiple)
            / F.count("*")
        ).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("ps_partkey", "part_value")
        .orderBy(F.desc("part_value"), F.asc("ps_partkey"))
    )


_Q11_SQL = _PARTSUPP_CTE + """
, scoped AS (
    SELECT ps_partkey,
           CAST(SUM(CAST(ps_supplycost * ps_availqty AS DECIMAL(18,2)))
                AS DOUBLE) AS part_value
    FROM partsupp
    JOIN supplier ON s_suppkey = ps_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_19'
    GROUP BY ps_partkey
)
SELECT ps_partkey, part_value
FROM scoped
WHERE part_value > (
    SELECT CAST(SUM(CAST(part_value AS DECIMAL(18,2))) AS DOUBLE) * 2.0
           / COUNT(*)
    FROM scoped
)
ORDER BY part_value DESC, ps_partkey ASC
"""


# --------------------------------------------------------------------------
# TPC-H Q16 shape — supplier count per part descriptor (anti-subquery
# exclusion + count-distinct rollup)
# --------------------------------------------------------------------------


def q16_supplier_part_counts(
    spark: SparkSession,
    sf_dir: str,
    excluded_brand: str = "Brand#1",
    excluded_type: str = "PROMO",
    top_n: int = 40,
) -> DataFrame:
    """How many distinct suppliers can deliver each (brand, type, size)
    part descriptor, excluding one brand, one type, and blacklisted
    suppliers (TPC-H Q16; negative account balance stands in for the
    complaints comment-scan, via an anti-join exactly like the
    NOT IN subquery).

    The part dim carries the two inequality filters down its scan,
    broadcasts into the derived partsupp, and the blacklist anti-join
    is a broadcast too (tiny).  One exchange total: the final
    countDistinct over the 3-key descriptor."""
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != excluded_brand)
            & (F.col("p_type") != excluded_type)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    blacklist = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    ps = _derived_partsupp(spark, sf_dir)
    return (
        ps.join(F.broadcast(parts), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(blacklist),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"),
            F.asc("p_brand"),
            F.asc("p_type"),
            F.asc("p_size"),
        )
        .limit(top_n)
    )


_Q16_SQL = _PARTSUPP_CTE + """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp
JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND ps_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
LIMIT 40
"""


# --------------------------------------------------------------------------
# TPC-H Q20 shape — surplus-stock suppliers (nested IN subqueries →
# stacked semi-joins)
# --------------------------------------------------------------------------


def q20_surplus_suppliers(
    spark: SparkSession,
    sf_dir: str,
    name_token: str = "widget",
    nation: str = "NATION_19",
) -> DataFrame:
    """Suppliers in one nation holding surplus stock of a product line:
    their availqty for some matching part exceeds half of what they
    themselves shipped of it in 1996 (TPC-H Q20 over the derived
    partsupp; `2·availqty > shipped` keeps the half-threshold compare
    in exact integers).

    The nested `IN (parts) ... qty > 0.5·(correlated lineitem sum)`
    chain becomes: token-filtered part broadcast into partsupp, a
    per-(part,supplier) 1996 shipment aggregate joined on the SAME
    two keys, then one left-semi into supplier — each IN level is a
    semi-join, never a duplicate-producing inner join."""
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains(name_token))
        .select("p_partkey")
    )
    shipped = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("shipped_qty"))
    )
    surplus = (
        _derived_partsupp(spark, sf_dir)
        .join(F.broadcast(parts), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .filter(F.col("ps_availqty") * 2 > F.col("shipped_qty"))
        .select("ps_suppkey")
    )
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == nation)
    return (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat.select("n_nationkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            surplus, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi"
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


_Q20_SQL = _PARTSUPP_CTE + """
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_19'
  AND s_suppkey IN (
      SELECT ps_suppkey
      FROM partsupp
      WHERE ps_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE '%widget%'
      )
      AND 2 * ps_availqty > (
          SELECT SUM(CAST(l_quantity AS BIGINT))
          FROM lineitem
          WHERE l_partkey = ps_partkey
            AND l_suppkey = ps_suppkey
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1997-01-01'
      )
  )
ORDER BY s_name
"""


def lateral_top2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with LIMIT — per-customer top-2
    orders expressed the way an analyst writes it (a dependent
    subquery per outer row).  The point is what Catalyst DOES with it:
    the lateral decorrelates into `row_number` over (o_custkey) with a
    **WindowGroupLimit** pushed below the shuffle (each map task keeps
    only 2 rows per key before exchanging) and a plain equi-join back
    to customers — the same single-shuffle plan as the hand-written
    window top-k (`window_top3_orders_per_customer`), so the naive
    formulation costs nothing at 100 TB.  Plan pinned in
    tests/test_plans.py."""
    from ..sources import register_views

    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_totalprice
        FROM customer c JOIN LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) t
        WHERE c.c_mktsegment = 'BUILDING'
        """
    )


_LATERAL_SQL = """
SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_totalprice
FROM customer c JOIN LATERAL (
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE o.o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 2
) t ON TRUE
WHERE c.c_mktsegment = 'BUILDING'
"""


QUERIES = {
    "join_lateral_top2_orders": lateral_top2_orders,
    "join_asof_latest_order": asof_latest_order,
    "tpch_q1_pricing_summary": q1_pricing_summary,
    "join_range_price_tiers": range_join_price_tiers,
    "tpch_q3_shipping_priority": q3_shipping_priority,
    "tpch_q5_region_revenue": q5_region_revenue,
    "tpch_q10_returned_items": q10_returned_items,
    "tpch_q4_order_priority_check": q4_order_priority_check,
    "tpch_q6_forecast_revenue": q6_forecast_revenue,
    "tpch_q15_top_supplier": q15_top_supplier,
    "tpch_q14_promo_revenue": q14_promo_revenue,
    "tpch_q17_small_qty_revenue": q17_small_quantity_revenue,
    "tpch_q18_large_volume_customers": q18_large_volume_customers,
    "tpch_q22_idle_customers": q22_idle_customers,
    "tpch_q7_volume_shipping": q7_volume_shipping,
    "tpch_q8_market_share": q8_market_share,
    "tpch_q9_product_profit": q9_product_profit,
    "tpch_q12_late_priority": q12_late_shipment_priority,
    "tpch_q13_customer_distribution": q13_customer_distribution,
    "tpch_q19_banded_revenue": q19_banded_revenue,
    "tpch_q21_waiting_suppliers": q21_waiting_suppliers,
    "tpch_q2_min_cost_supplier": q2_min_cost_supplier,
    "tpch_q11_important_stock": q11_important_stock,
    "tpch_q16_supplier_part_counts": q16_supplier_part_counts,
    "tpch_q20_surplus_suppliers": q20_surplus_suppliers,
    "join_semi_urgent_customers": semi_urgent_customers,
    "join_anti_no_urgent_customers": anti_no_urgent_customers,
    "join_left_order_linecounts": left_join_order_linecounts,
    "setop_union_order_tiers": union_order_tiers,
    "setop_intersect_building_urgent": intersect_building_urgent,
    "setop_except_customers_without_open_orders": except_customers_without_open_orders,
    "window_top3_orders_per_customer": top3_orders_per_customer,
    "window_running_customer_revenue": running_customer_revenue,
    "window_analytics_pack": window_analytics_pack,
    "agg_grouping_sets": grouping_sets_status_priority,
    "agg_unpivot_status_metrics": unpivot_status_metrics,
    "join_fuzzy_part_names": fuzzy_name_join,
    "agg_rollup_status_priority": rollup_status_priority,
    "agg_cube_status_priority": cube_status_priority,
    "agg_pivot_priority_by_status": pivot_priority_by_status,
    "subq_orders_above_customer_avg": orders_above_customer_avg,
    "scd2_order_status_history": scd2_status_history,
}

ORACLES = {
    "join_lateral_top2_orders": _LATERAL_SQL,
    "join_asof_latest_order": _ASOF_SQL,
    "tpch_q1_pricing_summary": _Q1_SQL,
    "join_range_price_tiers": _RANGE_JOIN_SQL,
    "tpch_q3_shipping_priority": _Q3_SQL,
    "tpch_q5_region_revenue": _Q5_SQL,
    "tpch_q10_returned_items": _Q10_SQL,
    "tpch_q4_order_priority_check": _Q4_SQL,
    "tpch_q6_forecast_revenue": _Q6_SQL,
    "tpch_q15_top_supplier": _Q15_SQL,
    "tpch_q14_promo_revenue": _Q14_SQL,
    "tpch_q17_small_qty_revenue": _Q17_SQL,
    "tpch_q18_large_volume_customers": _Q18_SQL,
    "tpch_q22_idle_customers": _Q22_SQL,
    "tpch_q7_volume_shipping": _Q7_SQL,
    "tpch_q8_market_share": _Q8_SQL,
    "tpch_q9_product_profit": _Q9_SQL,
    "tpch_q12_late_priority": _Q12_SQL,
    "tpch_q13_customer_distribution": _Q13_SQL,
    "tpch_q19_banded_revenue": _Q19_SQL,
    "tpch_q21_waiting_suppliers": _Q21_SQL,
    "tpch_q2_min_cost_supplier": _Q2_SQL,
    "tpch_q11_important_stock": _Q11_SQL,
    "tpch_q16_supplier_part_counts": _Q16_SQL,
    "tpch_q20_surplus_suppliers": _Q20_SQL,
    "join_semi_urgent_customers": _SEMI_SQL,
    "join_anti_no_urgent_customers": _ANTI_SQL,
    "join_left_order_linecounts": _LEFT_SQL,
    "setop_union_order_tiers": _UNION_SQL,
    "setop_intersect_building_urgent": _INTERSECT_SQL,
    "setop_except_customers_without_open_orders": _EXCEPT_SQL,
    "window_top3_orders_per_customer": _TOP3_SQL,
    "window_running_customer_revenue": _RUNNING_SQL,
    "window_analytics_pack": _WINDOW_PACK_SQL,
    "agg_grouping_sets": _GROUPING_SETS_SQL,
    "agg_unpivot_status_metrics": _UNPIVOT_SQL,
    "join_fuzzy_part_names": _FUZZY_JOIN_SQL,
    "agg_rollup_status_priority": _ROLLUP_SQL,
    "agg_cube_status_priority": _CUBE_SQL,
    "agg_pivot_priority_by_status": _PIVOT_SQL,
    "subq_orders_above_customer_avg": _ABOVE_AVG_SQL,
    "scd2_order_status_history": _SCD2_SQL,
}
