"""The remaining TPC-H query shapes (Q2/Q6/Q7/Q8/Q9/Q10/Q12/Q13/Q14/
Q16/Q19/Q20), completing full 22-query TPC-H shape coverage together
with the shapes already in relational_queries.py (Q1/Q3/Q4/Q5/Q11/Q15/
Q17/Q18/Q21/Q22).

Beyond-reference additions: the reference (a single-table CDC/SCD2
pipeline, see SURVEY.md) issues none of these, but an analytics engine
claiming its query surface at 100 TB must run the standard decision-
support shapes. The driver testdata is TPC-H-lite — no partsupp, no
l_commitdate/l_receiptdate/l_shipmode, no p_container/p_mfgr — so the
shapes that need those (Q2/Q9/Q12/Q13/Q16/Q19/Q20) are adapted to the
available columns while preserving the structural essence each query
exists to exercise (noted per query). Every query has a hash-exact
DuckDB oracle.

Numeric-parity rules (same as relational_queries.py): aggregate
monetary doubles in DECIMAL (exact, order-independent), cast to DOUBLE
only at the output boundary; on the DuckDB side route wide-decimal →
double casts through VARCHAR (DuckDB's direct cast is not correctly
rounded past ~17 significant digits — pinned by the canary test in
tests/test_plans.py); alias identically on both sides; break ordering
ties with key columns before any LIMIT.

Scale notes: every join is an equi-join Catalyst can hash/sort-merge;
region/nation are explicitly broadcast (25/5 rows at any SF); the
other dims stay autoBroadcast/AQE candidates — at 100 TB part and
supplier exceed the broadcast threshold and these plans degrade
gracefully to shuffled joins on their keys. No unpartitioned windows
anywhere; per-group extrema use groupBy+join rather than a global
window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_historical_warehouse_platform_spark.schemas import load_table

__all__ = ["TPCH_QUERIES"]


def _dec(col, scale: int = 2):
    return F.col(col).cast(f"decimal(18,{scale})")


def _rev():
    """Exact-decimal revenue term: extendedprice * (1 - discount)."""
    return (
        _dec("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,2)")
    ).cast("decimal(28,4)")


# SQL twin of _rev()
_SQL_REV = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "CAST(1.0 - l_discount AS DECIMAL(18,2)) AS DECIMAL(28,4))"
)
# DuckDB-safe decimal→double: route through VARCHAR (correctly rounded)
_VD = "CAST(CAST({x} AS VARCHAR) AS DOUBLE)"


def q_tpch_q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar-MIN subquery over a
    supplier-part catalog + 4-way dim join + deterministic top-100.

    Adaptation (no partsupp): the catalog is derived from lineitem —
    per (part, supplier) the minimum extended price ever charged, with
    the supplier restricted to EUROPE, exactly the role ps_supplycost
    plays. The correlated `cost = (SELECT MIN(cost) ... WHERE same
    part)` is decorrelated Spark-side into a groupBy-min + equi-join —
    the rewrite Catalyst itself applies to the SQL form, stated
    explicitly so the plan is join-reuse-friendly."""
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part")
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region")
    europe_sup = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    catalog = (
        li.join(europe_sup, li.l_suppkey == europe_sup.s_suppkey)
        .groupBy("l_partkey", "l_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min("l_extendedprice").alias("min_price"))
        # Pin the catalog CTE once (r12 optimization round, guide §2.4
        # / §3.3): it feeds BOTH the per-part best-price aggregate and
        # the final join, and without the boundary each consumer
        # re-runs the full lineitem ⋈ europe-supplier ⋈ groupBy subtree
        # (2 lineitem scans + the join twice in the before-plan). The
        # pinned frame is the AGGREGATED catalog — |parts ⋈ suppliers
        # seen together|, orders of magnitude smaller than lineitem —
        # so at 100 TB the trade is one executor-local materialization
        # of a dim-sized table vs a second full fact-table pass. Lazy:
        # materializes inside the query's own job; same rows, same
        # hash (deterministic aggregate).
        .localCheckpoint(eager=False)
    )
    best = catalog.groupBy("l_partkey").agg(F.min("min_price").alias("best_price"))
    parts = p.filter((F.col("p_type") == "LARGE") & (F.col("p_size") <= 10)).select(
        "p_partkey", "p_brand"
    )
    return (
        catalog.join(best, "l_partkey")
        .filter(F.col("min_price") == F.col("best_price"))
        .join(parts, catalog.l_partkey == parts.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "min_price")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


SQL_TPCH_Q2 = """
WITH catalog AS (
  SELECT l_partkey, l_suppkey, s_name, s_acctbal, n_name,
         MIN(l_extendedprice) AS min_price
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY 1, 2, 3, 4, 5)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, min_price
FROM catalog c
JOIN part ON c.l_partkey = p_partkey
WHERE p_type = 'LARGE' AND p_size <= 10
  AND min_price = (SELECT MIN(min_price) FROM catalog c2
                   WHERE c2.l_partkey = c.l_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q_tpch_q6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6: scalar aggregate whose entire predicate set (date
    range + discount band + quantity cap) must push to the scan —
    the canonical filter-pushdown probe."""
    li = load_table(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (_dec("l_extendedprice") * F.col("l_discount").cast("decimal(18,2)")).cast(
                    "decimal(28,4)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


SQL_TPCH_Q6 = f"""
SELECT {_VD.format(x="SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(28,4)))")} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_tpch_q7_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7: bidirectional nation-pair trade volume — the same
    dimension table (nation) joined twice under different roles, with
    a disjunctive cross-role predicate that cannot be pushed to either
    join alone."""
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n1, s.s_nationkey == F.col("sn_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n2, c.c_nationkey == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


SQL_TPCH_Q7 = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       {_VD.format(x=f"SUM({_SQL_REV})")} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders    ON l_orderkey = o_orderkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def q_tpch_q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8: a nation's market share = conditional fraction of a
    filtered multi-join volume, per year. Both the numerator and the
    denominator come out of ONE aggregation pass (conditional SUM) —
    no self-join, no second scan."""
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    s = load_table(spark, sf, "supplier")
    p = load_table(spark, sf, "part")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region")
    # customer side pinned to region ASIA; supplier side names the nation
    cust_nat = (
        n.join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    supp_nat = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    vol = _rev()
    return (
        li.join(p.filter(F.col("p_type") == "PROMO"), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cust_nat), c.c_nationkey == F.col("cn_key"), "left_semi")
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(supp_nat), s.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(F.lit(0).cast("decimal(28,4)"))).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("o_year")
    )


SQL_TPCH_Q8 = f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       {_VD.format(x=f"SUM(CASE WHEN n2.n_name = 'NATION_2' THEN {_SQL_REV} ELSE CAST(0 AS DECIMAL(28,4)) END)")}
         / {_VD.format(x=f"SUM({_SQL_REV})")} AS mkt_share,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part      ON l_partkey = p_partkey
JOIN orders    ON l_orderkey = o_orderkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region    ON n1.n_regionkey = r_regionkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'PROMO' AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
ORDER BY 1
"""


def q_tpch_q9_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9: profit by (supplier nation, order year) for parts
    matched by a substring pattern — LIKE-filtered dim join feeding a
    two-key rollup.

    Adaptation (no partsupp.ps_supplycost): unit cost is the part's
    retail price, so profit = revenue − p_retailprice × quantity; the
    shape (pattern-filtered part join, 5-table star, profit expression
    aggregated by nation × year) is unchanged."""
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    s = load_table(spark, sf, "supplier")
    p = load_table(spark, sf, "part")
    n = load_table(spark, sf, "nation")
    profit = (
        _rev()
        - (_dec("p_retailprice") * _dec("l_quantity")).cast("decimal(28,4)")
    ).cast("decimal(28,4)")
    return (
        li.join(p.filter(F.col("p_name").like("%gear%")), li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("sum_profit"), F.count(F.lit(1)).alias("n_lines"))
        .orderBy("nation", F.desc("o_year"))
    )


SQL_TPCH_Q9 = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       {_VD.format(x=f"SUM(CAST({_SQL_REV} - CAST(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,4)) AS DECIMAL(28,4)))")} AS sum_profit,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%gear%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


def q_tpch_q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in one
    quarter — fact-dim join, group by the full customer tuple,
    deterministic order-by-measure + tiebreak + LIMIT."""
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
            ),
            li.l_orderkey == o.o_orderkey,
        )
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


SQL_TPCH_Q10 = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       {_VD.format(x=f"SUM({_SQL_REV})")} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q_tpch_q12_priority_by_class(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape: join the fact to orders and pivot order
    priority into conditional counts per line class.

    Adaptation (no l_shipmode/commitdate/receiptdate): the class
    dimension is l_returnflag and the date filter is on l_shipdate;
    the CASE-bucketed conditional aggregation over a joined priority
    column — what Q12 exists to exercise — is unchanged."""
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_returnflag").isin("A", "R")
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


SQL_TPCH_Q12 = """
SELECT l_returnflag,
       COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
       COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag IN ('A', 'R')
GROUP BY 1
ORDER BY 1
"""


def q_tpch_q13_customer_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count — a LEFT
    OUTER join that must preserve zero-order customers, then a
    second aggregation over the first's result (agg-of-agg).

    Adaptation (no o_comment): the excluded-order predicate is on
    o_orderpriority instead of a comment pattern; the outer-join +
    double-aggregation shape is unchanged."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


SQL_TPCH_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey) per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_tpch_q14_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14: promotion revenue share — conditional-numerator /
    total-denominator percentage out of one aggregation pass over a
    month of fact rows joined to part."""
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part")
    vol = _rev()
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(p, li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0).cast("decimal(28,4)"))).cast("double")
                / F.sum(vol).cast("double")
            ).alias("promo_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


SQL_TPCH_Q14 = f"""
SELECT 100.0 * {_VD.format(x=f"SUM(CASE WHEN p_type = 'PROMO' THEN {_SQL_REV} ELSE CAST(0 AS DECIMAL(28,4)) END)")}
         / {_VD.format(x=f"SUM({_SQL_REV})")} AS promo_revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""


def q_tpch_q16_supplier_relationship(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16: distinct-supplier counts per part attribute group
    with a NOT-IN supplier exclusion.

    Adaptation (no partsupp): the part↔supplier association is
    observed lineitem pairs; the excluded-supplier list (the
    "complaints" subquery) is suppliers with negative account
    balance. NOT IN becomes a broadcast anti-join Spark-side —
    the null-safe rewrite Catalyst applies to the SQL form."""
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part")
    s = load_table(spark, sf, "supplier")
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = p.filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        li.join(parts, li.l_partkey == parts.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


SQL_TPCH_Q16 = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q_tpch_q19_disjunctive_brackets(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under a disjunction of conjunctive
    brackets spanning BOTH join sides (part attributes AND lineitem
    quantity) — the OR-of-ANDs predicate the optimizer must evaluate
    post-join while still pushing the common part of each branch.

    Adaptation (no p_container): brackets pair p_brand with p_size
    bands instead of container classes."""
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part")
    qty = F.col("l_quantity")
    br1 = (F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & qty.between(1, 11)
    br2 = (F.col("p_brand") == "Brand#20") & F.col("p_size").between(1, 10) & qty.between(10, 20)
    br3 = (F.col("p_brand") == "Brand#5") & F.col("p_size").between(1, 15) & qty.between(20, 30)
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(br1 | br2 | br3)
        .agg(F.sum(_rev()).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


SQL_TPCH_Q19 = f"""
SELECT {_VD.format(x=f"SUM({_SQL_REV})")} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#5'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


def q_tpch_q20_excess_shippers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20: suppliers selected through a chain of nested IN
    subqueries (supplier IN ← grouped-HAVING over fact rows ← part
    IN) — the decorrelation stress test.

    Adaptation (no partsupp.availqty): the HAVING threshold is an
    absolute shipped-quantity floor instead of half the stocked
    quantity. Spark-side both IN levels become semi-joins feeding a
    grouped filter."""
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part")
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    small_parts = p.filter(F.col("p_type") == "SMALL").select("p_partkey")
    heavy = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(small_parts, li.l_partkey == small_parts.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 400)
        .select("l_suppkey")
    )
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


SQL_TPCH_Q20 = """
SELECT s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'SMALL')
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 400)
ORDER BY s_name
"""


TPCH_QUERIES: dict[str, tuple] = {
    "tpch_q2_min_cost_supplier": (q_tpch_q2_min_cost_supplier, SQL_TPCH_Q2),
    "tpch_q6_forecast_revenue": (q_tpch_q6_forecast_revenue, SQL_TPCH_Q6),
    "tpch_q7_volume_shipping": (q_tpch_q7_volume_shipping, SQL_TPCH_Q7),
    "tpch_q8_market_share": (q_tpch_q8_market_share, SQL_TPCH_Q8),
    "tpch_q9_product_profit": (q_tpch_q9_product_profit, SQL_TPCH_Q9),
    "tpch_q10_returned_items": (q_tpch_q10_returned_items, SQL_TPCH_Q10),
    "tpch_q12_priority_by_class": (q_tpch_q12_priority_by_class, SQL_TPCH_Q12),
    "tpch_q13_customer_distribution": (q_tpch_q13_customer_distribution, SQL_TPCH_Q13),
    "tpch_q14_promo_revenue": (q_tpch_q14_promo_revenue, SQL_TPCH_Q14),
    "tpch_q16_supplier_relationship": (q_tpch_q16_supplier_relationship, SQL_TPCH_Q16),
    "tpch_q19_disjunctive_brackets": (q_tpch_q19_disjunctive_brackets, SQL_TPCH_Q19),
    "tpch_q20_excess_shippers": (q_tpch_q20_excess_shippers, SQL_TPCH_Q20),
}
