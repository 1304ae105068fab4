"""Relational operator coverage over the driver testdata.

One named query per operator family in SURVEY.md §2 (aggregations
A1-A7, projections/filters P1-P9, joins J1-J3 + standard families,
windows W1-W3, sorts/limits O1-O5, set ops U1-U3, scalar functions
F1-F13, streaming-window batch twins ST8), each with a DuckDB oracle.

Numeric-parity rules (the driver hash-compares values):

- SUM/AVG over doubles is order-dependent in the last bit → aggregate
  in DECIMAL (exact, order-independent), then CAST to DOUBLE — the
  decimal→double conversion is deterministic IEEE in both engines.
- AVG = CAST(decimal SUM AS DOUBLE) / COUNT — one double division.
- Alias every computed column identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_historical_warehouse_platform_spark.operators.asof import asof_join
from cdc_historical_warehouse_platform_spark.schemas import load_table

__all__ = ["RELATIONAL_QUERIES"]


def _dec(col, scale: int = 2):
    return F.col(col).cast(f"decimal(18,{scale})")


def _sumd(col: str, alias: str, scale: int = 2):
    """Order-independent double sum: decimal-aggregate then cast."""
    return F.sum(_dec(col, scale)).cast("double").alias(alias)


# --------------------------------------------------------------------------
# Aggregations
# --------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """A1/A2-style grouped aggregate with conditional + distinct counts
    (TPC-H Q1 shape: scan → partial agg → final agg; no join)."""
    li = load_table(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _sumd("l_quantity", "sum_qty"),
            _sumd("l_extendedprice", "sum_base_price"),
            F.sum(
                (_dec("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,2)")).cast(
                    "decimal(28,4)"
                )
            )
            .cast("double")
            .alias("sum_disc_price"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
            F.countDistinct("l_orderkey").alias("distinct_orders"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       COUNT(*) AS count_order,
       COUNT(DISTINCT l_orderkey) AS distinct_orders
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_conditional_counts(spark: SparkSession, sf: str) -> DataFrame:
    """A2: scalar aggregate with CASE-conditional counts + MAX + SUM
    (db_mutator.py:188-206 shape)."""
    o = load_table(spark, sf, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("total_orders"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("finished_orders"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("open_orders"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("partial_orders"),
        F.max("o_orderdate").alias("latest_order"),
        _sumd("o_totalprice", "total_value"),
    )


SQL_CONDITIONAL_COUNTS = """
SELECT COUNT(*) AS total_orders,
       COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS finished_orders,
       COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS open_orders,
       COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS partial_orders,
       MAX(o_orderdate) AS latest_order,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM orders
"""


def q_grouped_having(spark: SparkSession, sf: str) -> DataFrame:
    """A6: GROUP BY + HAVING (duplicate-check shape, README.md:502-508)."""
    li = load_table(spark, sf, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("line_count"), _sumd("l_quantity", "total_qty"))
        .filter(F.col("line_count") > 5)
        .orderBy("l_orderkey")
    )


SQL_GROUPED_HAVING = """
SELECT l_orderkey, COUNT(*) AS line_count,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM lineitem
GROUP BY l_orderkey
HAVING COUNT(*) > 5
ORDER BY l_orderkey
"""


def q_union_metric_rows(spark: SparkSession, sf: str) -> DataFrame:
    """A7/U1: UNION ALL of labelled metric rows (README.md:490-498)."""
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    li = load_table(spark, sf, "lineitem")
    rows = [
        o.agg(F.lit("orders").alias("metric"), F.count(F.lit(1)).alias("value")),
        c.agg(F.lit("customers").alias("metric"), F.count(F.lit(1)).alias("value")),
        li.agg(F.lit("lineitems").alias("metric"), F.count(F.lit(1)).alias("value")),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


SQL_UNION_METRICS = """
SELECT 'orders' AS metric, COUNT(*) AS value FROM orders
UNION ALL
SELECT 'customers', COUNT(*) FROM customer
UNION ALL
SELECT 'lineitems', COUNT(*) FROM lineitem
"""


def q_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Grouping-set coverage: ROLLUP over region→nation customer counts
    (free in Spark per SURVEY §2.4 note)."""
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region")
    joined = c.join(n, c.c_nationkey == n.n_nationkey).join(
        r, n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("customers"))
        .orderBy(
            F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first()
        )
    )


SQL_ROLLUP = """
SELECT r_name, n_name, COUNT(*) AS customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
"""


def q_cube(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE over order status × priority."""
    o = load_table(spark, sf, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), _sumd("o_totalprice", "revenue"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


SQL_CUBE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def q_pivot_status_priority(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot (conditional-aggregate form so the oracle is plain SQL)."""
    o = load_table(spark, sf, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
        .orderBy("o_orderpriority")
    )


SQL_PIVOT = """
SELECT o_orderpriority,
       COUNT(CASE WHEN o_orderstatus='F' THEN 1 END) AS "F",
       COUNT(CASE WHEN o_orderstatus='O' THEN 1 END) AS "O",
       COUNT(CASE WHEN o_orderstatus='P' THEN 1 END) AS "P"
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------


def q_revenue_by_nation(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-way join: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region
    with small dims broadcast (TPC-H Q5 shape)."""
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region")
    rev = (_dec("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,2)")).cast(
        "decimal(28,4)"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count(F.lit(1)).alias("line_count"))
        .orderBy("r_name", "n_name")
    )


SQL_REVENUE_BY_NATION = """
SELECT r_name, n_name,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS line_count
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


def q_semi_join(spark: SparkSession, sf: str) -> DataFrame:
    """Left-semi: customers that have at least one order (U2 family)."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


SQL_SEMI = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
ORDER BY c_custkey
"""


def q_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    """Left-anti: customers with no orders — the ledger anti-membership
    pattern (scd2_loader.py:570-575 → SURVEY §2.3)."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("customers_without_orders"))
        .orderBy("c_mktsegment")
    )


SQL_ANTI = """
SELECT c_mktsegment, COUNT(*) AS customers_without_orders
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def q_outer_join_coalesce(spark: SparkSession, sf: str) -> DataFrame:
    """Left-outer + null-handling projection (P9: coalesce over the
    unmatched side), orders-per-customer including order-less ones."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    per_cust = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    return (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left_outer")
        .select(
            "c_custkey",
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
            F.when(F.col("n_orders").isNull(), F.lit("inactive"))
            .otherwise(F.lit("active"))
            .alias("activity"),
        )
        .orderBy("c_custkey")
    )


SQL_OUTER_COALESCE = """
SELECT c_custkey,
       COALESCE(n_orders, 0) AS n_orders,
       CASE WHEN n_orders IS NULL THEN 'inactive' ELSE 'active' END AS activity
FROM customer
LEFT JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) t
  ON c_custkey = t.o_custkey
ORDER BY c_custkey
"""


def q_full_outer_join(spark: SparkSession, sf: str) -> DataFrame:
    """Full-outer: customer vs supplier presence per nation."""
    c = load_table(spark, sf, "customer")
    s = load_table(spark, sf, "supplier")
    cn = c.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("customers"))
    sn = s.groupBy("s_nationkey").agg(F.count(F.lit(1)).alias("suppliers"))
    return (
        cn.join(sn, cn.c_nationkey == sn.s_nationkey, "full_outer")
        .select(
            F.coalesce(F.col("c_nationkey"), F.col("s_nationkey")).alias("nationkey"),
            F.coalesce(F.col("customers"), F.lit(0)).alias("customers"),
            F.coalesce(F.col("suppliers"), F.lit(0)).alias("suppliers"),
        )
        .orderBy("nationkey")
    )


SQL_FULL_OUTER = """
SELECT COALESCE(cn.k, sn.k) AS nationkey,
       COALESCE(customers, 0) AS customers,
       COALESCE(suppliers, 0) AS suppliers
FROM (SELECT c_nationkey AS k, COUNT(*) AS customers FROM customer GROUP BY 1) cn
FULL OUTER JOIN (SELECT s_nationkey AS k, COUNT(*) AS suppliers FROM supplier GROUP BY 1) sn
  ON cn.k = sn.k
ORDER BY nationkey
"""


def q_asof_join_events(spark: SparkSession, sf: str) -> DataFrame:
    """Generic as-of join (J3): for each purchase event, the most recent
    prior-or-equal signup event of the same user. Implemented with the
    union+window single-shuffle technique (operators/asof.py); the
    oracle uses an equivalent correlated window."""
    ev = load_table(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("signup_ts"), F.col("event_id").alias("signup_event")
    )
    out = asof_join(
        purchases,
        signups,
        on="user_id",
        left_ts="ts",
        right_ts="signup_ts",
        right_payload=["signup_event"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_signup_ts").alias("last_signup_ts"),
        F.col("asof_signup_event").alias("last_signup_event"),
    ).orderBy("event_id")


SQL_ASOF_EVENTS = """
WITH tagged AS (
  SELECT event_id, user_id, ts,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS side,
         CASE WHEN event_type = 'signup' THEN ts END AS s_ts,
         CASE WHEN event_type = 'signup' THEN event_id END AS s_id
  FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events) e
  WHERE event_type IN ('purchase', 'signup')
),
matched AS (
  SELECT *,
         last_value(s_ts IGNORE NULLS) OVER w AS last_signup_ts,
         last_value(s_id IGNORE NULLS) OVER w AS last_signup_event
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, ts, last_signup_ts, last_signup_event
FROM matched WHERE side = 1
ORDER BY event_id
"""


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------


def q_top_orders_per_customer(spark: SparkSession, sf: str) -> DataFrame:
    """W1 pattern: row_number per key → top-3 orders by price."""
    o = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )


SQL_TOP_PER_CUSTOMER = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) t WHERE rn <= 3
ORDER BY o_custkey, rn
"""


def q_lag_lead_timeline(spark: SparkSession, sf: str) -> DataFrame:
    """W3: lag/lead over per-customer order timelines (the consecutive-
    pair validation pattern, verify_scd2.py:313-342)."""
    o = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lag("o_orderdate").over(w).alias("prev_order_date"),
        F.lead("o_orderdate").over(w).alias("next_order_date"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias(
            "days_since_prev"
        ),
    ).orderBy("o_custkey", "o_orderkey")


SQL_LAG_LEAD = """
SELECT o_custkey, o_orderkey, o_orderdate,
       lag(o_orderdate) OVER w AS prev_order_date,
       lead(o_orderdate) OVER w AS next_order_date,
       CAST(date_diff('day', CAST(lag(o_orderdate) OVER w AS DATE), CAST(o_orderdate AS DATE)) AS INT) AS days_since_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
"""


def q_cumulative_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Running frame: cumulative per-customer revenue ordered by date
    (decimal accumulation so both engines agree exactly)."""
    o = load_table(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("cum_revenue"),
    ).orderBy("o_custkey", "o_orderkey")


SQL_CUM_REVENUE = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_revenue
FROM orders
ORDER BY o_custkey, o_orderkey
"""


def q_rank_dense_rank(spark: SparkSession, sf: str) -> DataFrame:
    """rank/dense_rank/ntile over part sizes within brand."""
    p = load_table(spark, sf, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return p.select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.ntile(4).over(w).alias("price_quartile"),
    ).orderBy("p_brand", "price_rank", "p_partkey")


SQL_RANK = """
SELECT p_brand, p_partkey, p_retailprice,
       rank() OVER w AS price_rank,
       dense_rank() OVER w AS price_dense_rank,
       ntile(4) OVER w AS price_quartile
FROM part
WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
ORDER BY p_brand, price_rank, p_partkey
"""


# --------------------------------------------------------------------------
# Sorts / limits / top-k
# --------------------------------------------------------------------------


def q_topk_orders(spark: SparkSession, sf: str) -> DataFrame:
    """O4: global top-k (Spark plans TakeOrderedAndProject — no full
    sort shuffle). Deterministic tiebreak on the key."""
    o = load_table(spark, sf, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


SQL_TOPK = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------


def q_except_intersect(spark: SparkSession, sf: str) -> DataFrame:
    """U2/U3: EXCEPT + INTERSECT + DISTINCT over nation keys."""
    c = load_table(spark, sf, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    ).distinct()
    s = load_table(spark, sf, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    ).distinct()
    only_customers = c.exceptAll(s).withColumn("membership", F.lit("customers_only"))
    both = c.intersectAll(s).withColumn("membership", F.lit("both"))
    return only_customers.unionByName(both).orderBy("membership", "nationkey")


SQL_EXCEPT_INTERSECT = """
WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
     s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
SELECT nationkey, 'customers_only' AS membership FROM (SELECT * FROM c EXCEPT ALL SELECT * FROM s)
UNION ALL
SELECT nationkey, 'both' FROM (SELECT * FROM c INTERSECT ALL SELECT * FROM s)
ORDER BY membership, nationkey
"""


# --------------------------------------------------------------------------
# Scalar function coverage
# --------------------------------------------------------------------------


def q_scalar_functions(spark: SparkSession, sf: str) -> DataFrame:
    """F1-F13 sweep: concat, CASE, date_trunc, epoch extraction,
    interval arithmetic, round, md5, substring, null handling — one
    projection over orders (all pushdown-friendly, no UDFs)."""
    o = load_table(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.concat(F.lit("order-"), F.col("o_orderkey").cast("string")).alias("order_label"),
        F.when(F.col("o_orderstatus") == "F", F.lit("finished"))
        .when(F.col("o_orderstatus") == "O", F.lit("open"))
        .otherwise(F.lit("other"))
        .alias("status_label"),
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month"),
        F.year("o_orderdate").alias("order_year"),
        (F.unix_timestamp(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
         - F.unix_timestamp(F.col("o_orderdate"))).alias("epoch_30d"),
        # no round(): Spark rounds the shortest-decimal-repr (HALF_UP on
        # ties like 154.265) while DuckDB rounds the binary value — raw
        # IEEE division is bit-identical in both engines
        (F.col("o_totalprice") / 1000.0).alias("price_k"),
        F.md5(F.col("o_orderkey").cast("string")).alias("key_md5"),
        F.substring(F.col("o_orderpriority"), 1, 1).alias("priority_code"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("X")), F.lit("?")).alias(
            "status_or_q"
        ),
        F.length("o_orderpriority").alias("priority_len"),
    ).orderBy("o_orderkey")


SQL_SCALARS = """
SELECT o_orderkey,
       CONCAT('order-', CAST(o_orderkey AS VARCHAR)) AS order_label,
       CASE WHEN o_orderstatus='F' THEN 'finished'
            WHEN o_orderstatus='O' THEN 'open'
            ELSE 'other' END AS status_label,
       date_trunc('month', o_orderdate) AS order_month,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
       CAST(EXTRACT(EPOCH FROM (o_orderdate + INTERVAL 30 DAY)) - EXTRACT(EPOCH FROM o_orderdate) AS BIGINT) AS epoch_30d,
       o_totalprice / 1000.0 AS price_k,
       md5(CAST(o_orderkey AS VARCHAR)) AS key_md5,
       substr(o_orderpriority, 1, 1) AS priority_code,
       COALESCE(NULLIF(o_orderstatus, 'X'), '?') AS status_or_q,
       CAST(length(o_orderpriority) AS INT) AS priority_len
FROM orders
ORDER BY o_orderkey
"""


def q_json_extraction(spark: SparkSession, sf: str) -> DataFrame:
    """F13: JSON parsing of events.props (the reference's JSONB metrics
    column, pipeline_metadata.py:77) + grouped agg on the result."""
    ev = load_table(spark, sf, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


SQL_JSON = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Streaming-window batch twins (ST8) over events
# --------------------------------------------------------------------------


def q_tumbling_window(spark: SparkSession, sf: str) -> DataFrame:
    """ST8: tumbling 1-hour window aggregate (batch twin of
    ``groupBy(window(ts,'1 hour'))`` — expressed via date_trunc so the
    oracle matches; the streaming variant lives in streaming/)."""
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"), _sumd("value", "total_value"))
        .orderBy("window_start", "event_type")
    )


SQL_TUMBLING = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events) e
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


def q_sliding_window(spark: SparkSession, sf: str) -> DataFrame:
    """ST8 sliding: per-user trailing-15-minute event count/sum via a
    range frame over epoch seconds (Spark rangeBetween needs a numeric
    ordering column)."""
    ev = load_table(spark, sf, "events")
    sec = F.unix_timestamp("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(sec)
        .rangeBetween(-900, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("events_15m"),
        F.sum(_dec("value")).over(w).cast("double").alias("value_15m"),
    ).orderBy("user_id", "event_id")


SQL_SLIDING = """
SELECT user_id, event_id, ts,
       COUNT(*) OVER w AS events_15m,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS value_15m
FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events) e
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(EXTRACT(EPOCH FROM ts)) AS BIGINT)
             RANGE BETWEEN 900 PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""


def q_session_windows(spark: SparkSession, sf: str) -> DataFrame:
    """ST8 session windows: 30-minute-gap sessionization via the
    lag+cumsum technique (batch twin of ``session_window``; identical
    SQL in both engines, scales as one shuffle on user_id)."""
    ev = load_table(spark, sf, "events")
    w_ts = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gapped = ev.withColumn(
        "new_session",
        (
            F.col("ts").cast("long")
            - F.lag(F.col("ts").cast("long")).over(w_ts)
            > 1800
        )
        .cast("int"),
    ).withColumn(
        "session_id",
        F.sum(F.coalesce(F.col("new_session"), F.lit(0))).over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        gapped.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("events_in_session"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_id")
    )


SQL_SESSION = """
WITH gapped AS (
  SELECT *,
         CASE WHEN CAST(floor(EXTRACT(EPOCH FROM ts)) AS BIGINT)
                   - lag(CAST(floor(EXTRACT(EPOCH FROM ts)) AS BIGINT))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events) e
),
sessions AS (
  SELECT *,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM gapped
)
SELECT user_id, session_id,
       COUNT(*) AS events_in_session,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


RELATIONAL_QUERIES: dict[str, tuple] = {
    "agg_pricing_summary": (q_pricing_summary, SQL_PRICING),
    "agg_conditional_counts": (q_conditional_counts, SQL_CONDITIONAL_COUNTS),
    "agg_grouped_having": (q_grouped_having, SQL_GROUPED_HAVING),
    "agg_union_metric_rows": (q_union_metric_rows, SQL_UNION_METRICS),
    "agg_rollup": (q_rollup, SQL_ROLLUP),
    "agg_cube": (q_cube, SQL_CUBE),
    "agg_pivot": (q_pivot_status_priority, SQL_PIVOT),
    "join_revenue_by_nation": (q_revenue_by_nation, SQL_REVENUE_BY_NATION),
    "join_semi": (q_semi_join, SQL_SEMI),
    "join_anti": (q_anti_join, SQL_ANTI),
    "join_outer_coalesce": (q_outer_join_coalesce, SQL_OUTER_COALESCE),
    "join_full_outer": (q_full_outer_join, SQL_FULL_OUTER),
    "join_asof_events": (q_asof_join_events, SQL_ASOF_EVENTS),
    "window_top_per_customer": (q_top_orders_per_customer, SQL_TOP_PER_CUSTOMER),
    "window_lag_lead": (q_lag_lead_timeline, SQL_LAG_LEAD),
    "window_cumulative_revenue": (q_cumulative_revenue, SQL_CUM_REVENUE),
    "window_rank_dense": (q_rank_dense_rank, SQL_RANK),
    "sort_topk_orders": (q_topk_orders, SQL_TOPK),
    "setop_except_intersect": (q_except_intersect, SQL_EXCEPT_INTERSECT),
    "scalar_functions": (q_scalar_functions, SQL_SCALARS),
    "json_extraction": (q_json_extraction, SQL_JSON),
    "events_tumbling_window": (q_tumbling_window, SQL_TUMBLING),
    "events_sliding_window": (q_sliding_window, SQL_SLIDING),
    "events_session_windows": (q_session_windows, SQL_SESSION),
}


# --------------------------------------------------------------------------
# Point lookups / pagination / SQL-API surface (P3, P5, O5)
# --------------------------------------------------------------------------


def q_point_lookup(spark: SparkSession, sf: str) -> DataFrame:
    """P3: current-record point filter (scd2_loader.py:193-200) — the
    key-equality + flag predicate that must prune to one partition/
    row-group at scale (verify via PushedFilters in .explain)."""
    from cdc_historical_warehouse_platform_spark.plans.reference_queries import build_dim

    dim = build_dim(spark, sf)
    return dim.filter(
        (F.col("order_key") % 97 == 0) & F.col("is_current")
    ).select("order_key", "quantity", "order_status", "valid_from")


SQL_POINT_LOOKUP = None  # assigned below (needs DIM_SQL)


def q_key_history(spark: SparkSession, sf: str) -> DataFrame:
    """P5: per-key history scan ordered by valid_from
    (verify_scd2.py:257-277)."""
    from cdc_historical_warehouse_platform_spark.plans.reference_queries import build_dim

    dim = build_dim(spark, sf)
    return (
        dim.filter(F.col("order_key") % 199 == 0)
        .select("order_key", "quantity", "order_status", "valid_from", "valid_to")
        .orderBy("order_key", "valid_from")
    )


def q_pagination(spark: SparkSession, sf: str) -> DataFrame:
    """O5: keyset-style page — ORDER BY ... LIMIT 1000 OFFSET 1000
    (README.md:658-663). Spark plans a global sort + offset+limit."""
    o = load_table(spark, sf, "orders")
    return (
        o.orderBy("o_orderdate", "o_orderkey")
        .offset(1000)
        .limit(1000)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
    )


SQL_PAGINATION = """
SELECT o_orderkey, o_orderdate, o_totalprice
FROM orders ORDER BY o_orderdate, o_orderkey LIMIT 1000 OFFSET 1000
"""


def q_sql_api(spark: SparkSession, sf: str) -> DataFrame:
    """The spark.sql() text surface over registered temp views — same
    engine, SQL front-end (SURVEY.md §3.1 'SQL strings' parity)."""
    from cdc_historical_warehouse_platform_spark.schemas import register_testdata_views

    register_testdata_views(spark, sf)
    return spark.sql(
        """
        SELECT c_mktsegment,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )


SQL_SQL_API = """
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def q_string_functions(spark: SparkSession, sf: str) -> DataFrame:
    """String-function sweep #2: upper/lower, lpad, translate,
    regexp_extract, repeat, reverse, position (F1-family closure)."""
    p = load_table(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_padded"),
        F.translate("p_brand", "#", "-").alias("brand_dashed"),
        F.regexp_extract("p_type", r"^(\w+)", 1).alias("type_first_word"),
        F.reverse("p_name").alias("name_reversed"),
        F.instr("p_name", "a").alias("first_a_pos"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
    ).orderBy("p_partkey")


SQL_STRING_FUNCTIONS = r"""
SELECT p_partkey,
       upper(p_brand) AS brand_upper,
       lower(p_type) AS type_lower,
       lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_padded,
       replace(p_brand, '#', '-') AS brand_dashed,
       regexp_extract(p_type, '^(\w+)', 1) AS type_first_word,
       reverse(p_name) AS name_reversed,
       CAST(strpos(p_name, 'a') AS INT) AS first_a_pos,
       substr(p_name, 1, 5) AS name_prefix
FROM part
ORDER BY p_partkey
"""


from cdc_historical_warehouse_platform_spark.plans.reference_queries import DIM_SQL as _DIM_SQL  # noqa: E402

RELATIONAL_QUERIES.update(
    {
        "filter_point_lookup_current": (
            q_point_lookup,
            f"""
            SELECT order_key, quantity, order_status, valid_from
            FROM ({_DIM_SQL}) d
            WHERE order_key % 97 = 0 AND is_current
            """,
        ),
        "filter_key_history": (
            q_key_history,
            f"""
            SELECT order_key, quantity, order_status, valid_from, valid_to
            FROM ({_DIM_SQL}) d
            WHERE order_key % 199 = 0
            ORDER BY order_key, valid_from
            """,
        ),
        "sort_pagination": (q_pagination, SQL_PAGINATION),
        "sql_api_revenue_by_segment": (q_sql_api, SQL_SQL_API),
        "scalar_string_functions": (q_string_functions, SQL_STRING_FUNCTIONS),
    }
)


def q_stats_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Statistical aggregates: exact linear-interpolation percentiles
    (Spark `percentile` == DuckDB `quantile_cont`), min/max/range."""
    o = load_table(spark, sf, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            (F.max("o_totalprice") - F.min("o_totalprice")).alias("price_range"),
            F.percentile("o_totalprice", 0.25).alias("p25"),
            F.percentile("o_totalprice", 0.5).alias("p50"),
            F.percentile("o_totalprice", 0.95).alias("p95"),
        )
        .orderBy("o_orderstatus")
    )
    # NOTE: variance deliberately absent from the oracle-facing output:
    # converting a DECIMAL(38,4) sum-of-squares to double differs by
    # 1 ulp across engines at ~20 significant digits (found at sf0.1).
    # Variance is validated against numpy in tests/test_datapipe.py.


SQL_STATS_QUANTILES = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       max(o_totalprice) - min(o_totalprice) AS price_range,
       quantile_cont(o_totalprice, 0.25) AS p25,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.95) AS p95
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""

RELATIONAL_QUERIES["agg_stats_quantiles"] = (q_stats_quantiles, SQL_STATS_QUANTILES)


def q_unshipped_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: selective filters on both join sides + grouped
    revenue + top-k — the classic pushdown/join-order exercise."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    rev = (_dec("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,2)")).cast(
        "decimal(28,4)"
    )
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, c.c_custkey == o.o_custkey)
        .filter(F.col("o_orderdate") < cutoff)
        .join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


SQL_UNSHIPPED = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q_small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 shape: compare each row against its group's average
    (window-avg formulation — one shuffle, no self-join)."""
    li = load_table(spark, sf, "lineitem")
    w = Window.partitionBy("l_partkey")
    avg_qty = (
        F.sum(_dec("l_quantity")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    below = li.withColumn("avg_qty", avg_qty).filter(
        F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty")
    )
    return below.agg(
        F.count(F.lit(1)).alias("n_small_lines"),
        _sumd("l_extendedprice", "small_line_revenue"),
    )


SQL_SMALL_QTY = """
WITH t AS (
  SELECT l_quantity, l_extendedprice,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (PARTITION BY l_partkey) AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY l_partkey) AS avg_qty
  FROM lineitem)
SELECT COUNT(*) AS n_small_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_line_revenue
FROM t WHERE l_quantity < 0.5 * avg_qty
"""


def q_approx_aggregates(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate-aggregate surface (HLL distinct + t-digest quantile).

    The estimates themselves are engine-specific, so the oracle-checked
    output is (a) the exact distinct count and (b) booleans asserting
    each estimator lands within its documented error bound of the exact
    value computed in the same pass — the oracle expects TRUE, so an
    estimator drifting out of bounds fails the value hash. The raw
    estimate magnitudes stay pinned by pytest."""
    li = load_table(spark, sf, "lineitem")
    price = F.col("l_extendedprice").cast("double")
    agg = li.agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("__hll"),
        F.percentile_approx(price, 0.5, 10000).alias("__approx_median"),
        F.percentile(price, 0.45).alias("__p45"),
        F.percentile(price, 0.55).alias("__p55"),
    )
    return agg.select(
        "exact_orders",
        (
            F.abs(F.col("__hll") - F.col("exact_orders"))
            / F.col("exact_orders")
            <= 0.05
        ).alias("hll_within_5pct"),
        (
            (F.col("__approx_median") >= F.col("__p45"))
            & (F.col("__approx_median") <= F.col("__p55"))
        ).alias("approx_median_within_decile"),
    )


SQL_APPROX_AGG = """
SELECT COUNT(DISTINCT l_orderkey) AS exact_orders,
       TRUE AS hll_within_5pct,
       TRUE AS approx_median_within_decile
FROM lineitem
"""


RELATIONAL_QUERIES.update(
    {
        "join_unshipped_revenue": (q_unshipped_revenue, SQL_UNSHIPPED),
        "window_small_quantity_revenue": (q_small_quantity_revenue, SQL_SMALL_QTY),
        "agg_approx_aggregates": (q_approx_aggregates, SQL_APPROX_AGG),
    }
)


def q_salted_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-resilient two-phase top-k (operators/skew.py) — exact, so
    the oracle is the plain window formulation: identical output, but
    no single task ever sees a whole hot key."""
    from cdc_historical_warehouse_platform_spark.operators.skew import salted_topk_per_key

    o = load_table(spark, sf, "orders")
    out = salted_topk_per_key(
        o,
        key="o_custkey",
        order_by=[F.col("o_totalprice").desc()],
        k=3,
        tiebreak=F.col("o_orderkey").asc(),
    )
    return out.select(
        "o_custkey", "o_orderkey", "o_totalprice", F.col("rank").alias("rn")
    ).orderBy("o_custkey", "rn")


RELATIONAL_QUERIES["window_salted_topk"] = (q_salted_topk, SQL_TOP_PER_CUSTOMER)


def q_unpivot_balances(spark: SparkSession, sf: str) -> DataFrame:
    """Unpivot / melt (the inverse of agg_pivot): per-nation customer
    vs supplier account-balance totals as (nation, side, total) long
    rows via DataFrame.unpivot — wide→long is a zero-shuffle map after
    the two small aggregates. Decimal-exact sums (cast to double only
    at the output boundary) keep the DuckDB twin hash-exact."""
    c = load_table(spark, sf, "customer")
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    cb = c.groupBy("c_nationkey").agg(
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("customer_total")
    )
    sb = s.groupBy("s_nationkey").agg(
        F.sum(F.col("s_acctbal").cast("decimal(18,2)")).alias("supplier_total")
    )
    wide = (
        n.select("n_nationkey", "n_name")
        .join(cb, n.n_nationkey == cb.c_nationkey, "left")
        .join(sb, n.n_nationkey == sb.s_nationkey, "left")
        .select(
            "n_name",
            F.coalesce(F.col("customer_total"), F.lit(0)).cast("double").alias("customer_total"),
            F.coalesce(F.col("supplier_total"), F.lit(0)).cast("double").alias("supplier_total"),
        )
    )
    return (
        wide.unpivot(
            ids=["n_name"],
            values=["customer_total", "supplier_total"],
            variableColumnName="side",
            valueColumnName="total",
        )
        .orderBy("n_name", "side")
    )


SQL_UNPIVOT_BALANCES = """
WITH cb AS (
  SELECT c_nationkey AS nk, CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS customer_total
  FROM customer GROUP BY 1),
sb AS (
  SELECT s_nationkey AS nk, CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS supplier_total
  FROM supplier GROUP BY 1),
wide AS (
  SELECT n.n_name,
         COALESCE(cb.customer_total, 0) AS customer_total,
         COALESCE(sb.supplier_total, 0) AS supplier_total
  FROM nation n
  LEFT JOIN cb ON n.n_nationkey = cb.nk
  LEFT JOIN sb ON n.n_nationkey = sb.nk)
SELECT n_name, side, total FROM (
  SELECT n_name, 'customer_total' AS side, customer_total AS total FROM wide
  UNION ALL
  SELECT n_name, 'supplier_total' AS side, supplier_total AS total FROM wide)
ORDER BY n_name, side
"""

RELATIONAL_QUERIES["relational_unpivot"] = (q_unpivot_balances, SQL_UNPIVOT_BALANCES)


def q_window_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    """RANGE-frame windowed aggregation — the time-based frame the
    ROWS-frame queries can't express: each order's trailing-30-day
    revenue for its customer (peers included by VALUE distance, not
    row position, so same-day orders share a frame regardless of
    order). Spark needs a numeric range key: days-since-epoch with
    rangeBetween(-30, 0) ≡ DuckDB's RANGE BETWEEN INTERVAL 30 DAYS
    PRECEDING. Frame sums run in DECIMAL so the running accumulation
    is order-independent and the oracle hash-exact."""
    from pyspark.sql import Window

    o = load_table(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")))
        .rangeBetween(-30, 0)
    )
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .over(w)
            .cast("double")
            .alias("trailing_30d_revenue"),
            F.count(F.lit(1)).over(w).alias("trailing_30d_orders"),
        )
        .orderBy("o_orderkey")
    )


SQL_WINDOW_RANGE_FRAME = """
SELECT o_orderkey, o_custkey, strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate, o_totalprice,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trailing_30d_revenue,
       count(*) OVER w AS trailing_30d_orders
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
             RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
ORDER BY o_orderkey
"""

RELATIONAL_QUERIES["window_range_frame"] = (q_window_range_frame, SQL_WINDOW_RANGE_FRAME)


def q_window_ntile_percentile(spark: SparkSession, sf: str) -> DataFrame:
    """Distribution-rank window functions over customer balances per
    market segment: ntile(4) quartile bucket, percent_rank, and
    cume_dist. The order key is made TOTAL (balance desc, custkey asc)
    so tie handling can never differ between engines; the only float
    ops are the two int/int divisions these functions are defined as.
    One hash exchange on the segment + per-partition sort."""
    from pyspark.sql import Window

    c = load_table(spark, sf, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        c.select(
            "c_custkey",
            "c_mktsegment",
            "c_acctbal",
            F.ntile(4).over(w).alias("balance_quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume_dist"),
        )
        .orderBy("c_custkey")
    )


SQL_WINDOW_NTILE = """
SELECT c_custkey, c_mktsegment, c_acctbal,
       CAST(ntile(4) OVER w AS INT) AS balance_quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume_dist
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
ORDER BY c_custkey
"""

RELATIONAL_QUERIES["window_ntile_percentile"] = (q_window_ntile_percentile, SQL_WINDOW_NTILE)


def q_subquery_exists(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape — EXISTS with a correlated non-equi predicate:
    count orders per priority that have at least one lineitem shipped
    more than 60 days after the order date. The semi-join keeps the
    probe side un-duplicated (no DISTINCT needed) and Catalyst pushes
    the equi part to the join keys, leaving the date comparison as the
    join residual."""
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


SQL_SUBQUERY_EXISTS = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_subquery_not_exists(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape — scalar subquery + filtered NOT EXISTS:
    "dormant rich customers" — balance above the average positive
    balance AND no order since 2000-01-01 (every synthetic customer
    has *some* order, so the NOT EXISTS carries a date predicate to
    stay non-trivial). Expressed through the SQL front-end so the
    uncorrelated scalar average plans as a ScalarSubquery expression
    (its own tiny stage — NO BroadcastNestedLoopJoin, which the
    repo-wide plan guard forbids) and the NOT EXISTS plans as a
    left-anti hash join against the date-FILTERED — and therefore much
    smaller — order key set (filter pushed into the scan)."""
    from cdc_historical_warehouse_platform_spark.schemas import register_testdata_views

    register_testdata_views(spark, sf)
    return spark.sql(
        """
        SELECT c_mktsegment,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        FROM customer c
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                                  / COUNT(*)
                           FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )


SQL_SUBQUERY_NOT_EXISTS = """
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS a
  FROM customer WHERE c_acctbal > 0)
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.a
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def q_subquery_in_having(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape — IN over a grouped-HAVING subquery: large-order
    customers. The HAVING aggregate runs decimal-exact; the IN becomes
    a broadcast semi-join of orders against the (tiny) qualifying key
    set, so the big lineitem re-join only sees qualifying orders."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("__sq"))
        .filter(F.col("__sq") > 180)
        .select("l_orderkey")
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


SQL_SUBQUERY_IN_HAVING = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey
                     HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 180)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20
"""


def q_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping_id — the general form
    beyond the rollup/cube special cases already covered
    (agg_rollup/agg_cube). Expressed through the SQL front-end (the
    DataFrame API only exposes rollup/cube); one Expand + one
    aggregate exchange, identical plan family to cube."""
    from cdc_historical_warehouse_platform_spark.schemas import register_testdata_views

    register_testdata_views(spark, sf)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping_id() AS BIGINT) AS gid,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY gid, l_returnflag, l_linestatus
        """
    )


SQL_GROUPING_SETS = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY gid, l_returnflag, l_linestatus
"""


def q_subquery_correlated_scalar(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 shape — CORRELATED scalar subquery in the WHERE
    clause: revenue from lineitems whose quantity is below half the
    average quantity ordered for that same part, by brand. The last
    subquery form not yet driver-checked (Q4 EXISTS, Q22 uncorrelated
    scalar + NOT EXISTS, Q18 IN-over-HAVING are siblings).

    Exactness: the avg comparison is restated as
    ``2 * qty * COUNT(*) < SUM(qty)`` in DECIMAL, so no float
    division can flip a boundary row between engines. Catalyst
    decorrelates each scalar subquery into a per-partkey aggregate
    left-joined on the correlation key (RewriteCorrelatedScalarSubquery)
    — no BroadcastNestedLoopJoin / CartesianProduct anywhere (pinned by
    tests/test_plans.py). Cost note: the two subqueries become two
    column-pruned (l_partkey, l_quantity) aggregate scans beside the
    base scan; the hand-optimized single-aggregate join shape is what
    subquery_in_having's `big` subtree already demonstrates — this
    entry deliberately exercises the front-end form."""
    from cdc_historical_warehouse_platform_spark.schemas import register_testdata_views

    register_testdata_views(spark, sf)
    return spark.sql(
        """
        SELECT p.p_brand,
               COUNT(*) AS n_small,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS lost_revenue
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE CAST(l.l_quantity AS DECIMAL(18,2)) * 2 *
              (SELECT COUNT(*) FROM lineitem l2
               WHERE l2.l_partkey = l.l_partkey)
            < (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
               FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        GROUP BY p.p_brand
        ORDER BY p.p_brand
        """
    )


SQL_SUBQUERY_CORRELATED_SCALAR = """
SELECT p.p_brand,
       COUNT(*) AS n_small,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS lost_revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE CAST(l.l_quantity AS DECIMAL(18,2)) * 2 *
      (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    < (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
       FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
GROUP BY p.p_brand
ORDER BY p.p_brand
"""


RELATIONAL_QUERIES.update(
    {
        "subquery_exists": (q_subquery_exists, SQL_SUBQUERY_EXISTS),
        "subquery_not_exists": (q_subquery_not_exists, SQL_SUBQUERY_NOT_EXISTS),
        "subquery_in_having": (q_subquery_in_having, SQL_SUBQUERY_IN_HAVING),
        "subquery_correlated_scalar": (
            q_subquery_correlated_scalar,
            SQL_SUBQUERY_CORRELATED_SCALAR,
        ),
        "agg_grouping_sets": (q_grouping_sets, SQL_GROUPING_SETS),
    }
)


def q_interval_join_events(spark: SparkSession, sf: str) -> DataFrame:
    """Pure range join — NO equi key (operators/rangejoin.py): every
    purchase event within ±5 minutes of any error event (incident
    correlation). Without the bucketing, Catalyst plans this as a
    BroadcastNestedLoopJoin (forbidden by the repo plan guard); with
    it, the plan is a plain hash equi-join on the time bin plus a
    residual. Delta reported in exact microseconds (unix_micros /
    epoch_us agree across engines)."""
    from cdc_historical_warehouse_platform_spark.operators.rangejoin import interval_join

    ev = load_table(spark, sf, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), F.col("ts").alias("err_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    joined = interval_join(
        errors, purchases, "err_ts", "purchase_ts", -300, 300
    )
    return joined.select(
        "err_id",
        "purchase_id",
        (F.unix_micros(F.col("purchase_ts")) - F.unix_micros(F.col("err_ts"))).alias(
            "delta_us"
        ),
    ).orderBy("err_id", "purchase_id")


SQL_INTERVAL_JOIN = """
SELECT l.event_id AS err_id, r.event_id AS purchase_id,
       epoch_us(r.ts) - epoch_us(l.ts) AS delta_us
FROM events l JOIN events r
  ON r.ts >= l.ts - INTERVAL 300 SECOND
 AND r.ts <= l.ts + INTERVAL 300 SECOND
WHERE l.event_type = 'error' AND r.event_type = 'purchase'
ORDER BY err_id, purchase_id
"""

RELATIONAL_QUERIES["join_interval_events"] = (q_interval_join_events, SQL_INTERVAL_JOIN)


def q_subquery_sole_late_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape — the EXISTS + NOT EXISTS pair over the SAME
    correlated table with different predicates: suppliers who were the
    ONLY late supplier (shipped > 90 days after the order date) in a
    finished multi-supplier order. The semi-join keeps orders that
    involve a second supplier; the anti-join removes orders where any
    OTHER supplier was also late — its residual references BOTH outer
    tables (the probe row's supplier and its order's date), the classic
    doubly-correlated NOT EXISTS. Both plan as hash joins on
    l_orderkey with non-equi residuals; supplier is broadcast."""
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = (
        load_table(spark, sf, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    late = F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    l1 = li.join(o, li.l_orderkey == o.o_orderkey).filter(F.col("l_shipdate") > late)
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    multi = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    )
    l3 = li.select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    sole = multi.join(
        l3,
        (F.col("l_orderkey") == F.col("k3"))
        & (F.col("l_suppkey") != F.col("s3"))
        & (F.col("d3") > late),
        "left_anti",
    )
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        sole.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


SQL_SOLE_LATE_SUPPLIER = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders o
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""

RELATIONAL_QUERIES["subquery_sole_late_supplier"] = (
    q_subquery_sole_late_supplier,
    SQL_SOLE_LATE_SUPPLIER,
)


def q_agg_important_parts(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 shape — grouped HAVING against a scalar derived from
    the GLOBAL aggregate: parts whose lineitem revenue exceeds 1.2×
    the mean part revenue (TPC-H scales Q11's fraction by 1/SF; the
    mean-multiple form is the same plan shape and stays selective at
    every scale factor). The global (total, count) is a 1-row keyless
    aggregate broadcast back over the per-part rows (scalar-build
    BNLJ — map-side; the repo plan guard admits exactly this shape),
    and the threshold compare stays in exact integer-DECIMAL
    arithmetic (v·n·10 > total·12) so membership is
    engine-independent — no float boundary can flip a row."""
    li = load_table(spark, sf, "lineitem")
    rev = (
        _dec("l_extendedprice")
        * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,2)")
    ).cast("decimal(28,4)")
    per_part = li.groupBy("l_partkey").agg(F.sum(rev).alias("__v"))
    total = per_part.agg(
        F.sum("__v").alias("__total"), F.count(F.lit(1)).alias("__n")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("__v") * F.col("__n") * F.lit(10) > F.col("__total") * F.lit(12)
        )
        .select("l_partkey", F.col("__v").cast("double").alias("part_value"))
        .orderBy(F.col("part_value").desc(), F.col("l_partkey"))
    )


SQL_IMPORTANT_PARTS = """
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(1.0 - l_discount AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS v
  FROM lineitem GROUP BY l_partkey),
t AS (SELECT SUM(v) AS total, COUNT(*) AS n FROM per_part)
SELECT l_partkey, CAST(v AS DOUBLE) AS part_value
FROM per_part, t
WHERE v * n * 10 > total * 12
ORDER BY part_value DESC, l_partkey
"""

RELATIONAL_QUERIES["agg_important_parts"] = (q_agg_important_parts, SQL_IMPORTANT_PARTS)


def q_join_top_quarter_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 shape — view + MAX-scalar equality: the supplier(s)
    with the highest revenue over 1996Q1. The per-supplier revenue
    "view" is computed once; its 1-row MAX is broadcast and matched by
    an EQUI join on the exact DECIMAL revenue value (ties all
    returned, per the spec), so both the winner set and the value are
    engine-independent. The shared revenue subtree is deduped by
    ReuseExchange."""
    li = load_table(spark, sf, "lineitem")
    rev = (
        _dec("l_extendedprice")
        * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,2)")
    ).cast("decimal(28,4)")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(rev).alias("total_revenue"))
    )
    best = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(
            F.broadcast(best), F.col("total_revenue") == F.col("__max_rev")
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


SQL_TOP_QUARTER_SUPPLIER = """
WITH revenue AS (
  SELECT l_suppkey,
         SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(1.0 - l_discount AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""

RELATIONAL_QUERIES["join_top_quarter_supplier"] = (
    q_join_top_quarter_supplier,
    SQL_TOP_QUARTER_SUPPLIER,
)


def q_join_lateral_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT — top-2
    customers by balance per nation through the SQL front-end.
    Catalyst decorrelates the per-nation LIMIT into a rank rewrite
    (DecorrelateInnerQuery), so the plan is a window over one shuffle
    on the join key — never a per-nation loop. Total order inside the
    LATERAL (balance DESC, custkey ASC) keeps ties deterministic."""
    from cdc_historical_warehouse_platform_spark.schemas import register_testdata_views

    register_testdata_views(spark, sf)
    return spark.sql(
        """
        SELECT n.n_name, l.c_custkey,
               CAST(l.c_acctbal AS DOUBLE) AS c_acctbal
        FROM nation n,
        LATERAL (
          SELECT c_custkey, c_acctbal
          FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey ASC
          LIMIT 2
        ) l
        ORDER BY n.n_name, l.c_acctbal DESC, l.c_custkey
        """
    )


SQL_LATERAL_TOPK = """
SELECT n.n_name, l.c_custkey, CAST(l.c_acctbal AS DOUBLE) AS c_acctbal
FROM nation n,
LATERAL (
  SELECT c_custkey, c_acctbal
  FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey ASC
  LIMIT 2
) l
ORDER BY n.n_name, l.c_acctbal DESC, l.c_custkey
"""

RELATIONAL_QUERIES["join_lateral_topk"] = (q_join_lateral_topk, SQL_LATERAL_TOPK)


def q_setop_all_variants(spark: SparkSession, sf: str) -> DataFrame:
    """Multiset set operations — INTERSECT ALL / EXCEPT ALL
    (DataFrame.intersectAll / exceptAll), the bag-semantics variants
    next to the DISTINCT forms already covered: per order-priority,
    how many F-status order rows survive each operation against the
    P-status bag. Summarized by a count per (op, priority) so the
    result is small and ordering-free."""
    o = load_table(spark, sf, "orders")
    f_rows = o.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    p_rows = o.filter(F.col("o_orderstatus") == "P").select("o_orderpriority")
    inter = (
        f_rows.intersectAll(p_rows)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("setop", F.lit("intersect_all"))
    )
    exc = (
        f_rows.exceptAll(p_rows)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("setop", F.lit("except_all"))
    )
    return inter.unionByName(exc).select("setop", "o_orderpriority", "n").orderBy(
        "setop", "o_orderpriority"
    )


SQL_SETOP_ALL = """
WITH f_rows AS (SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'),
p_rows AS (SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'P'),
i AS (SELECT o_orderpriority FROM f_rows INTERSECT ALL SELECT o_orderpriority FROM p_rows),
e AS (SELECT o_orderpriority FROM f_rows EXCEPT ALL SELECT o_orderpriority FROM p_rows)
SELECT 'intersect_all' AS setop, o_orderpriority, COUNT(*) AS n FROM i GROUP BY o_orderpriority
UNION ALL
SELECT 'except_all' AS setop, o_orderpriority, COUNT(*) AS n FROM e GROUP BY o_orderpriority
ORDER BY setop, o_orderpriority
"""

RELATIONAL_QUERIES["setop_all_variants"] = (q_setop_all_variants, SQL_SETOP_ALL)


def q_agg_exact_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated percentiles — percentile_cont (the ordered-set
    aggregate) per order priority. Both engines implement the same SQL
    interpolation formula (lo + (hi-lo)·frac over the sorted group) in
    double arithmetic, so the result is bit-exact cross-engine — the
    exact tier next to agg_approx_aggregates' sketch-based quantiles.
    One shuffle on the group key; Spark plans WITHIN GROUP as a
    sort-based aggregate, not a global sort."""
    o = load_table(spark, sf, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.expr(
                "percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice)"
            ).alias("median_price"),
            F.expr(
                "percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice)"
            ).alias("p90_price"),
            F.expr(
                "percentile_cont(0.99) WITHIN GROUP (ORDER BY o_totalprice)"
            ).alias("p99_price"),
        )
        .orderBy("o_orderpriority")
    )


SQL_EXACT_PERCENTILES = """
SELECT o_orderpriority,
       percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS median_price,
       percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS p90_price,
       percentile_cont(0.99) WITHIN GROUP (ORDER BY o_totalprice) AS p99_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

RELATIONAL_QUERIES["agg_exact_percentiles"] = (
    q_agg_exact_percentiles,
    SQL_EXACT_PERCENTILES,
)


def q_agg_linear_regression(spark: SparkSession, sf: str) -> DataFrame:
    """Statistical aggregates the deterministic way: per-priority OLS
    slope/intercept/R² of order value vs order date (days since
    epoch). Built-in regr_slope/corr sum float products in partition
    order (non-reproducible across parallelism AND engines), so the
    moments are accumulated in EXACT integer/DECIMAL arithmetic —
    order-independent at any partitioning — and only the final
    closed-form arithmetic runs in double, with an identical
    expression tree on both engines. One shuffle on the group key."""
    o = load_table(spark, sf, "orders")
    base = o.select(
        "o_orderpriority",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).cast("long").alias("x"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
    )
    agg = base.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,4)")).alias("syy"),
        F.sum((F.col("x").cast("decimal(10,0)") * F.col("y")).cast("decimal(38,2)")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    sy = F.col("sy").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    num = n * sxy - sx * sy
    den_x = n * sxx - sx * sx
    den_y = n * syy - sy * sy
    slope = num / den_x
    return agg.select(
        "o_orderpriority",
        "n",
        slope.alias("slope"),
        ((sy - (num / den_x) * sx) / n).alias("intercept"),
        ((num * num) / (den_x * den_y)).alias("r2"),
    ).orderBy("o_orderpriority")


# DuckDB's wide-DECIMAL→DOUBLE cast is not correctly rounded once the
# value exceeds ~17 significant digits (observed: 253968519192240.4127
# → .44 instead of the nearest double .4; Spark/Java round correctly),
# so the oracle routes the two 18-digit moments through VARCHAR, whose
# strtod IS correctly rounded. Narrow aggregates cast directly.
SQL_LINEAR_REGRESSION = """
WITH base AS (
  SELECT o_orderpriority,
         CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
         CAST(o_totalprice AS DECIMAL(18,2)) AS y
  FROM orders),
agg AS (
  SELECT o_orderpriority, COUNT(*) AS n,
         SUM(x) AS sx, SUM(x*x) AS sxx,
         SUM(y) AS sy, SUM(CAST(y*y AS DECIMAL(38,4))) AS syy,
         SUM(CAST(CAST(x AS DECIMAL(10,0)) * y AS DECIMAL(38,2))) AS sxy
  FROM base GROUP BY o_orderpriority),
-- every wide-decimal moment goes DOUBLE via VARCHAR (DuckDB's direct
-- wide-DECIMAL cast is not correctly rounded past ~2^53 stored units;
-- sy is hugeint-backed too, not just the 18-digit syy/sxy); the
-- integral moments cast exactly
casts AS (
  SELECT o_orderpriority, n,
         CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
         CAST(sxx AS DOUBLE) AS sxxd,
         CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS syd,
         CAST(CAST(syy AS VARCHAR) AS DOUBLE) AS syyd,
         CAST(CAST(sxy AS VARCHAR) AS DOUBLE) AS sxyd
  FROM agg),
m AS (
  SELECT o_orderpriority, n, nd, sxd, syd,
         nd*sxyd - sxd*syd AS num,
         nd*sxxd - sxd*sxd AS den_x,
         nd*syyd - syd*syd AS den_y
  FROM casts)
SELECT o_orderpriority, n,
       num/den_x AS slope,
       (syd - (num/den_x)*sxd)/nd AS intercept,
       (num*num)/(den_x*den_y) AS r2
FROM m
ORDER BY o_orderpriority
"""

RELATIONAL_QUERIES["agg_linear_regression"] = (
    q_agg_linear_regression,
    SQL_LINEAR_REGRESSION,
)


def q_events_resample_ffill(spark: SparkSession, sf: str) -> DataFrame:
    """Time-series resample + gap fill — the missing-interval operator
    every metrics warehouse needs: per event type, an hourly spine for
    one day, average event value where data exists, and forward-fill
    (last observation carried forward) across empty hours. The spine
    comes from a map-side sequence explode (never a join), the hourly
    aggregate is DECIMAL-exact before the double division, and the
    fill is one `last(..., ignorenulls)` running window per type —
    exactly the plan shape at any scale: spine size is types×24
    regardless of event volume."""
    ev = load_table(spark, sf, "events").filter(
        (F.col("ts") >= F.lit("2024-01-01 00:00:00"))
        & (F.col("ts") < F.lit("2024-01-02 00:00:00"))
    )
    hourly = ev.groupBy(
        "event_type", F.hour("ts").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,6)")).alias("__vsum"),
    )
    # derive the type set from the already-aggregated hourly result
    # (types x <=24 rows); ReuseExchange dedupes the shared aggregate,
    # so events are scanned once — never a second full-volume pass
    spine = (
        hourly.select("event_type")
        .distinct()
        .select("event_type", F.explode(F.sequence(F.lit(0), F.lit(23))).alias("hour"))
    )
    w = Window.partitionBy("event_type").orderBy("hour").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # cast the exact DECIMAL sum to double BEFORE the division (decimal
    # division would truncate at the decimal scale; both engines divide
    # doubles here)
    avg = F.col("__vsum").cast("double") / F.col("n_events")
    return (
        spine.join(hourly, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            avg.alias("avg_value"),
        )
        .withColumn("filled_value", F.last("avg_value", ignorenulls=True).over(w))
        .withColumn("is_gap", F.col("avg_value").isNull())
        .orderBy("event_type", "hour")
    )


SQL_RESAMPLE_FFILL = """
WITH ev AS (
  SELECT * FROM events
  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-01-02 00:00:00'),
hourly AS (
  SELECT event_type, CAST(hour(ts) AS INT) AS hour,
         COUNT(*) AS n_events,
         SUM(CAST(value AS DECIMAL(28,6))) AS vsum
  FROM ev GROUP BY 1, 2),
spine AS (
  SELECT t.event_type, CAST(h.h AS INT) AS hour
  FROM (SELECT DISTINCT event_type FROM ev) t, generate_series(0, 23) h(h))
SELECT event_type, hour,
       COALESCE(n_events, 0) AS n_events,
       CAST(CAST(vsum AS VARCHAR) AS DOUBLE) / n_events AS avg_value,
       last_value(CAST(CAST(vsum AS VARCHAR) AS DOUBLE) / n_events IGNORE NULLS)
         OVER (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
       (vsum IS NULL) AS is_gap
FROM spine LEFT JOIN hourly USING (event_type, hour)
ORDER BY event_type, hour
"""

RELATIONAL_QUERIES["events_resample_ffill"] = (
    q_events_resample_ffill,
    SQL_RESAMPLE_FFILL,
)


def q_setop_union_by_name(spark: SparkSession, sf: str) -> DataFrame:
    """Schema-flexible union — unionByName(allowMissingColumns=True),
    the API that makes heterogeneous-source consolidation writable
    without hand-aligned selects: order events and lineitem events
    with partially overlapping columns union by NAME (position-proof),
    absent columns null-filled. DuckDB's UNION ALL BY NAME is the
    exact twin. Aggregated per source tag so the row is small and
    decimal-exact."""
    o = load_table(spark, sf, "orders").select(
        F.lit("order").alias("src"),
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("total"),
        F.col("o_orderpriority").alias("priority"),
    )
    li = load_table(spark, sf, "lineitem").select(
        F.lit("line").alias("src"),
        F.col("l_orderkey").alias("key"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("extended"),
        F.col("l_returnflag").alias("flag"),
    )
    u = o.unionByName(li, allowMissingColumns=True)
    return (
        u.groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("priority").alias("n_priority"),
            F.count("flag").alias("n_flag"),
            F.sum("total").cast("double").alias("sum_total"),
            F.sum("extended").cast("double").alias("sum_extended"),
        )
        .orderBy("src")
    )


SQL_UNION_BY_NAME = """
WITH u AS (
  SELECT 'order' AS src, o_orderkey AS key,
         CAST(o_totalprice AS DECIMAL(18,2)) AS total,
         o_orderpriority AS priority
  FROM orders
  UNION ALL BY NAME
  SELECT 'line' AS src, l_orderkey AS key,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS extended,
         l_returnflag AS flag
  FROM lineitem)
SELECT src, COUNT(*) AS n,
       COUNT(priority) AS n_priority,
       COUNT(flag) AS n_flag,
       CAST(SUM(total) AS DOUBLE) AS sum_total,
       CAST(SUM(extended) AS DOUBLE) AS sum_extended
FROM u GROUP BY src ORDER BY src
"""

RELATIONAL_QUERIES["setop_union_by_name"] = (
    q_setop_union_by_name,
    SQL_UNION_BY_NAME,
)


def q_events_cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort retention matrix over the events stream (r6): users are
    cohorted by first-activity week; each (cohort_week, week_offset)
    cell counts distinct users active that many weeks later, with the
    retention rate against the cohort size. The classic warehouse
    report shape: a per-entity MIN (first touch) joined back onto the
    fact, two grouped distinct-counts, one ratio.

    Scale shape: first-touch is a groupBy(user) min (one shuffle on
    user_id, no window); the join back is an equi-join on user_id that
    co-partitions with the groupBy at cluster scale; cells and cohort
    sizes are two grouped aggregates over integer weeks. Integer week
    arithmetic (datediff // 7) is exact in both engines."""
    ev = load_table(spark, sf, "events")
    origin = F.lit("2024-01-01")
    week = lambda c: F.floor(F.datediff(F.to_date(c), F.to_date(origin)) / 7).cast("int")  # noqa: E731
    first = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    # Pin the cohort map once (r12 optimization round, guide §2.4): it
    # feeds both the cohort sizes and the cell join, and without the
    # pin each consumer re-ran the first-touch aggregation over the
    # whole event stream. User-sized, two ints per user. Lazy.
    cohorts = first.select(
        "user_id", week(F.col("first_ts")).alias("cohort_week")
    ).localCheckpoint(eager=False)
    sizes = cohorts.groupBy("cohort_week").agg(
        F.countDistinct("user_id").alias("cohort_size")
    )
    cells = (
        ev.select("user_id", week(F.col("ts")).alias("event_week"))
        .join(cohorts, "user_id")
        .groupBy("cohort_week", (F.col("event_week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("active_users"))
    )
    return (
        cells.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "active_users",
            "cohort_size",
            (F.col("active_users").cast("double") / F.col("cohort_size").cast("double")).alias(
                "retention_rate"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


SQL_COHORT_RETENTION = """
WITH first AS (
  SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id),
cohorts AS (
  SELECT user_id,
         CAST(FLOOR(date_diff('day', DATE '2024-01-01', CAST(first_ts AS DATE)) / 7.0) AS INT) AS cohort_week
  FROM first),
sizes AS (
  SELECT cohort_week, COUNT(DISTINCT user_id) AS cohort_size FROM cohorts GROUP BY 1),
cells AS (
  SELECT c.cohort_week,
         CAST(FLOOR(date_diff('day', DATE '2024-01-01', CAST(e.ts AS DATE)) / 7.0) AS INT) - c.cohort_week AS week_offset,
         COUNT(DISTINCT e.user_id) AS active_users
  FROM events e JOIN cohorts c USING (user_id)
  GROUP BY 1, 2)
SELECT cohort_week, week_offset, active_users, cohort_size,
       CAST(active_users AS DOUBLE) / CAST(cohort_size AS DOUBLE) AS retention_rate
FROM cells JOIN sizes USING (cohort_week)
ORDER BY cohort_week, week_offset
"""

RELATIONAL_QUERIES["events_cohort_retention"] = (
    q_events_cohort_retention,
    SQL_COHORT_RETENTION,
)


def q_events_funnel_steps(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered funnel analysis (r6): view → click → purchase, each step
    strictly AFTER the user's previous step (sequence semantics, not
    mere membership). Per step: earliest qualifying timestamp per user
    via a grouped MIN over the step's events filtered against the
    previous step's time — three chained groupBy-min + equi-joins on
    user_id, no window, no per-user iteration. The report row set is
    fixed-size (one per step) with conversion against step 1.

    At cluster scale each chain link is one co-partitioned shuffle on
    user_id; step frames shrink monotonically so the later joins
    broadcast."""
    ev = load_table(spark, sf, "events")
    # Pin the step frames once (r12 optimization round, guide §2.4):
    # v feeds four consumers (the c chain, its own step count, the
    # conversion base) and c two — without the pins each consumer
    # re-ran the whole upstream filter-join-aggregate chain (7 event
    # scans in the audited plan). Both frames are per-user aggregates,
    # far smaller than the event stream. Lazy pins: computed inside
    # the query's own action.
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .localCheckpoint(eager=False)
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .localCheckpoint(eager=False)
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    steps = (
        v.agg(F.count(F.lit(1)).alias("users")).select(F.lit(1).alias("step"), F.lit("view").alias("step_name"), "users")
        .unionByName(
            c.agg(F.count(F.lit(1)).alias("users")).select(F.lit(2).alias("step"), F.lit("click_after_view").alias("step_name"), "users")
        )
        .unionByName(
            p.agg(F.count(F.lit(1)).alias("users")).select(F.lit(3).alias("step"), F.lit("purchase_after_click").alias("step_name"), "users")
        )
    )
    base = v.agg(F.count(F.lit(1)).alias("base_users"))
    return (
        steps.crossJoin(F.broadcast(base))
        .select(
            "step",
            "step_name",
            "users",
            (F.col("users").cast("double") / F.col("base_users").cast("double")).alias(
                "conversion_vs_first"
            ),
        )
        .orderBy("step")
    )


SQL_FUNNEL_STEPS = """
WITH ev AS (
  -- CAST(ts AS TIMESTAMP): micro-truncate so strict happens-after
  -- comparisons match Spark's micro-truncated loads if the driver
  -- ever ships nanosecond parquet timestamps
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
v AS (
  SELECT user_id, MIN(ts) AS t1 FROM ev WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM ev e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM ev e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id),
steps AS (
  SELECT 1 AS step, 'view' AS step_name, (SELECT COUNT(*) FROM v) AS users
  UNION ALL
  SELECT 2, 'click_after_view', (SELECT COUNT(*) FROM c)
  UNION ALL
  SELECT 3, 'purchase_after_click', (SELECT COUNT(*) FROM p))
SELECT step, step_name, users,
       CAST(users AS DOUBLE) / CAST((SELECT COUNT(*) FROM v) AS DOUBLE) AS conversion_vs_first
FROM steps
ORDER BY step
"""

RELATIONAL_QUERIES["events_funnel_steps"] = (
    q_events_funnel_steps,
    SQL_FUNNEL_STEPS,
)


def q_events_transition_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Event-type transition matrix (r6): per-user time-ordered event
    stream → consecutive-pair (prev, next) counts with row-normalized
    transition probabilities — the clickstream Markov diagnostic. One
    lag window PARTITIONED by user (never a global sort), one grouped
    count, and a per-prev total via a second small aggregate joined
    back (25 rows at any scale — broadcast)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        # Pin once (r12 optimization round, guide §2.4): both the
        # per-prev totals and the final join consume this ≤|types|²-row
        # aggregate, and without the pin each re-ran the per-user lag
        # window over the whole event stream. Lazy.
        .localCheckpoint(eager=False)
    )
    totals = pairs.groupBy("prev_type").agg(
        F.sum("n_transitions").alias("n_from_prev")
    )
    return (
        pairs.join(F.broadcast(totals), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n_transitions",
            (
                F.col("n_transitions").cast("double")
                / F.col("n_from_prev").cast("double")
            ).alias("transition_prob"),
        )
        .orderBy("prev_type", "next_type")
    )


SQL_TRANSITION_MATRIX = """
WITH pairs AS (
  -- CAST(ts AS TIMESTAMP): micro-truncate in case the driver ships
  -- nanosecond parquet timestamps (load_table truncates Spark-side)
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type,
         event_type AS next_type
  FROM events),
counts AS (
  SELECT prev_type, next_type, COUNT(*) AS n_transitions
  FROM pairs WHERE prev_type IS NOT NULL
  GROUP BY 1, 2),
totals AS (
  SELECT prev_type, SUM(n_transitions) AS n_from_prev FROM counts GROUP BY 1)
SELECT prev_type, next_type, n_transitions,
       CAST(n_transitions AS DOUBLE) / CAST(n_from_prev AS DOUBLE) AS transition_prob
FROM counts JOIN totals USING (prev_type)
ORDER BY prev_type, next_type
"""

RELATIONAL_QUERIES["events_transition_matrix"] = (
    q_events_transition_matrix,
    SQL_TRANSITION_MATRIX,
)


def q_agg_listagg_ordered(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg): per region,
    the comma-joined alphabetical list of its nations. Spark spells it
    array_join(array_sort(collect_list(...))) — collect_list is
    order-nondeterministic under parallelism, so the sort INSIDE the
    aggregate is what makes the result stable (same reason the oracle
    uses string_agg ... ORDER BY). Grouped sizes are bounded by the
    dimension fan-out, not the fact table."""
    r = load_table(spark, sf, "region")
    n = load_table(spark, sf, "nation")
    return (
        r.join(n, r["r_regionkey"] == n["n_regionkey"])
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
        .orderBy("r_name")
    )


SQL_LISTAGG_ORDERED = """
SELECT r_name,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       count(*) AS n_nations
FROM region JOIN nation ON r_regionkey = n_regionkey
GROUP BY r_name
ORDER BY r_name
"""

RELATIONAL_QUERIES["agg_listagg_ordered"] = (q_agg_listagg_ordered, SQL_LISTAGG_ORDERED)


def q_agg_boolean_aggregates(spark: SparkSession, sf: str) -> DataFrame:
    """Boolean aggregate family (bool_and / bool_or / count_if — ANSI
    EVERY/ANY): per order priority, whether every order is finalized,
    whether any crosses the high-value line, and how many do. Pure
    two-phase HashAggregate (booleans fold map-side like any other
    partial agg); the count_if twin pins the FILTER-clause shape."""
    o = load_table(spark, sf, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.bool_and(F.col("o_orderstatus") == "F").alias("all_finalized"),
            F.bool_or(F.col("o_totalprice") > 200000.0).alias("any_high_value"),
            F.count_if(F.col("o_totalprice") > 200000.0).alias("n_high_value"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


SQL_BOOLEAN_AGGREGATES = """
SELECT o_orderpriority,
       bool_and(o_orderstatus = 'F') AS all_finalized,
       bool_or(o_totalprice > 200000.0) AS any_high_value,
       count(*) FILTER (WHERE o_totalprice > 200000.0) AS n_high_value,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

RELATIONAL_QUERIES["agg_boolean_aggregates"] = (
    q_agg_boolean_aggregates,
    SQL_BOOLEAN_AGGREGATES,
)


# --------------------------------------------------------------------------
# Blocked fuzzy-match join (Levenshtein with prefix blocking)
# --------------------------------------------------------------------------


def q_fuzzy_part_names(spark: SparkSession, sf: str) -> DataFrame:
    """Entity-resolution-style fuzzy self-join: pairs of distinct part
    names within edit distance 3, found WITHOUT an all-pairs compare.

    The scale mechanism is blocking: candidates are generated only
    inside a deterministic block (2-char name prefix), so the join is
    a hash equi-join on the block key and the quadratic Levenshtein
    verify runs per block, bounded by block size — sum(block²), never
    n². Prefix blocking has the standard documented recall loss
    (pairs differing in the first two chars are missed); swapping the
    block key for a phonetic code or a q-gram inverted index changes
    recall, not the plan shape. At 100 TB the distinct-name reduction
    happens first (groupBy on name ≪ corpus rows), hot prefixes can
    be salted, and the verify stays JVM-side (levenshtein is a
    codegen'd built-in in both engines — no Python anywhere)."""
    part = load_table(spark, sf, "part")
    names = part.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_parts"))
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("n_parts").alias("parts_a"),
        F.substring("p_name", 1, 2).alias("blk"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("n_parts").alias("parts_b"),
        F.substring("p_name", 1, 2).alias("blk"),
    )
    return (
        a.join(b, "blk")
        .where(F.col("name_a") < F.col("name_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("edit_dist") <= 3)
        .select("name_a", "name_b", "parts_a", "parts_b", "edit_dist")
        .orderBy("name_a", "name_b")
    )


SQL_FUZZY_PART_NAMES = """
WITH names AS (
  SELECT p_name, COUNT(*) AS n_parts FROM part GROUP BY p_name),
blocked AS (
  SELECT a.p_name AS name_a, b.p_name AS name_b,
         a.n_parts AS parts_a, b.n_parts AS parts_b,
         levenshtein(a.p_name, b.p_name) AS edit_dist
  FROM names a JOIN names b
    ON substr(a.p_name, 1, 2) = substr(b.p_name, 1, 2)
   AND a.p_name < b.p_name)
SELECT name_a, name_b, parts_a, parts_b, edit_dist
FROM blocked WHERE edit_dist <= 3
ORDER BY name_a, name_b
"""


# --------------------------------------------------------------------------
# Market-basket affinity (co-occurrence support + lift)
# --------------------------------------------------------------------------


def q_basket_brand_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Market-basket co-occurrence: brand pairs that appear in the
    same order, with support counts and lift. The classic association
    shape (the 2-itemset tier of Apriori) done as relational algebra.

    Scale shape: the basket table (order, brand) is deduped first, so
    the pair generation is a self equi-join on the basket key whose
    fan-out is bounded by (distinct brands per order choose 2) — a
    per-basket constant (≤ 25 brands here), never corpus-quadratic.
    The dimension (part→brand) and the per-brand marginals are
    broadcast; the only real shuffle is on the basket key. Lift is
    computed from exact integer counts — the single double division
    at the end is deterministic on both engines."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    # Pin the deduped basket table once (r12 optimization round, guide
    # §2.4): four consumers (order count, brand marginals, both pair
    # sides) otherwise re-run the fact-dimension join + distinct — the
    # audited plan scanned lineitem and part 5× each. Basket-sized
    # (two scalars per distinct (order, brand)). Lazy.
    ob = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_orders = ob.select(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    brand_cnt = ob.groupBy("p_brand").agg(F.count(F.lit(1)).alias("cnt"))
    a = ob.select(F.col("l_orderkey"), F.col("p_brand").alias("brand_a"))
    b = ob.select(F.col("l_orderkey"), F.col("p_brand").alias("brand_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("support_cnt"))
    )
    ca = brand_cnt.select(
        F.col("p_brand").alias("brand_a"), F.col("cnt").alias("cnt_a")
    )
    cb = brand_cnt.select(
        F.col("p_brand").alias("brand_b"), F.col("cnt").alias("cnt_b")
    )
    return (
        pairs.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .crossJoin(F.broadcast(n_orders))
        .where(F.col("support_cnt") >= 20)
        .select(
            "brand_a",
            "brand_b",
            "support_cnt",
            (
                (F.col("support_cnt") * F.col("n_orders")).cast("double")
                / (F.col("cnt_a") * F.col("cnt_b")).cast("double")
            ).alias("lift"),
        )
        .orderBy(F.col("support_cnt").desc(), "brand_a", "brand_b")
        .limit(25)
    )


SQL_BASKET_BRAND_PAIRS = """
WITH ob AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
n_orders AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM ob),
brand_cnt AS (SELECT p_brand, COUNT(*) AS cnt FROM ob GROUP BY p_brand),
pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, COUNT(*) AS support_cnt
  FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2)
SELECT brand_a, brand_b, support_cnt,
       CAST(support_cnt * (SELECT n FROM n_orders) AS DOUBLE)
         / CAST(ca.cnt * cb.cnt AS DOUBLE) AS lift
FROM pairs JOIN brand_cnt ca ON ca.p_brand = brand_a
           JOIN brand_cnt cb ON cb.p_brand = brand_b
WHERE support_cnt >= 20
ORDER BY support_cnt DESC, brand_a, brand_b
LIMIT 25
"""


# --------------------------------------------------------------------------
# Exact higher central moments (skewness / kurtosis, deterministic)
# --------------------------------------------------------------------------


def q_higher_moments(spark: SparkSession, sf: str) -> DataFrame:
    """Per-flag skewness and excess kurtosis of l_quantity, the
    deterministic way. Built-in skewness()/kurtosis() stream doubles
    in partition order (non-reproducible across parallelism AND
    engines), so the four raw power sums are accumulated in EXACT
    DECIMAL arithmetic — order-independent at any partitioning — and
    only the final closed-form arithmetic runs in double, with an
    identical expression tree on both engines (same trick as
    q_agg_linear_regression). Map-side partial aggregation applies;
    one shuffle on the group key, four extra decimal columns of
    aggregation state per group."""
    li = load_table(spark, sf, "lineitem")
    x = F.col("l_quantity").cast("decimal(12,2)")
    x2 = (x * x).cast("decimal(12,4)")
    base = li.select(
        "l_returnflag",
        x.alias("x"),
        x2.alias("x2"),
        (x2 * x).cast("decimal(38,6)").alias("x3"),
        (x2 * x2).cast("decimal(38,8)").alias("x4"),
    )
    agg = base.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("x").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum("x3").alias("s3"),
        F.sum("x4").alias("s4"),
    )
    nd = F.col("n_rows").cast("double")
    mean = F.col("s1").cast("double") / nd
    ex2 = F.col("s2").cast("double") / nd
    ex3 = F.col("s3").cast("double") / nd
    ex4 = F.col("s4").cast("double") / nd
    var_pop = ex2 - mean * mean
    m3 = ex3 - F.lit(3.0) * mean * ex2 + F.lit(2.0) * mean * mean * mean
    m4 = (
        ex4
        - F.lit(4.0) * mean * ex3
        + F.lit(6.0) * mean * mean * ex2
        - F.lit(3.0) * mean * mean * mean * mean
    )
    return agg.select(
        "l_returnflag",
        "n_rows",
        mean.alias("mean_qty"),
        var_pop.alias("var_pop"),
        (m3 / (var_pop * F.sqrt(var_pop))).alias("skewness"),
        (m4 / (var_pop * var_pop) - F.lit(3.0)).alias("kurtosis_excess"),
    ).orderBy("l_returnflag")


# The wide power sums are hugeint-backed in DuckDB, whose direct
# wide-DECIMAL→DOUBLE cast is not correctly rounded past ~2^53 stored
# units (see SQL_LINEAR_REGRESSION) — every moment goes DOUBLE via
# VARCHAR, whose strtod IS correctly rounded; Spark's decimal→double
# cast is correctly rounded natively.
SQL_HIGHER_MOMENTS = """
WITH base AS (
  SELECT l_returnflag,
         CAST(l_quantity AS DECIMAL(12,2)) AS x,
         CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(12,4)) AS x2
  FROM lineitem),
agg AS (
  SELECT l_returnflag, COUNT(*) AS n_rows,
         SUM(x) AS s1, SUM(x2) AS s2,
         SUM(CAST(x2 * x AS DECIMAL(38,6))) AS s3,
         SUM(CAST(x2 * x2 AS DECIMAL(38,8))) AS s4
  FROM base GROUP BY l_returnflag),
casts AS (
  SELECT l_returnflag, n_rows,
         CAST(n_rows AS DOUBLE) AS nd,
         CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / CAST(n_rows AS DOUBLE) AS mean,
         CAST(CAST(s2 AS VARCHAR) AS DOUBLE) / CAST(n_rows AS DOUBLE) AS ex2,
         CAST(CAST(s3 AS VARCHAR) AS DOUBLE) / CAST(n_rows AS DOUBLE) AS ex3,
         CAST(CAST(s4 AS VARCHAR) AS DOUBLE) / CAST(n_rows AS DOUBLE) AS ex4
  FROM agg),
moments AS (
  SELECT l_returnflag, n_rows, mean,
         ex2 - mean * mean AS var_pop,
         ex3 - 3.0 * mean * ex2 + 2.0 * mean * mean * mean AS m3,
         ex4 - 4.0 * mean * ex3 + 6.0 * mean * mean * ex2
             - 3.0 * mean * mean * mean * mean AS m4
  FROM casts)
SELECT l_returnflag, n_rows, mean AS mean_qty, var_pop,
       m3 / (var_pop * sqrt(var_pop)) AS skewness,
       m4 / (var_pop * var_pop) - 3.0 AS kurtosis_excess
FROM moments ORDER BY l_returnflag
"""


RELATIONAL_QUERIES.update(
    {
        "join_fuzzy_part_names": (q_fuzzy_part_names, SQL_FUZZY_PART_NAMES),
        "basket_brand_pairs": (q_basket_brand_pairs, SQL_BASKET_BRAND_PAIRS),
        "agg_higher_moments": (q_higher_moments, SQL_HIGHER_MOMENTS),
    }
)


# --------------------------------------------------------------------------
# Z-order layout keys (multi-dimensional clustering, operators/layout.py)
# --------------------------------------------------------------------------


def q_zorder_tiles(spark: SparkSession, sf: str) -> DataFrame:
    """Z-order (Morton) layout keys over orders, summarized per coarse
    Z-tile. The key interleaves the bits of two quantized dimensions
    (customer key, order date) so one sort order clusters BOTH — the
    lakehouse OPTIMIZE-ZORDER primitive behind
    operators/layout.py::write_zordered. Pure integer shift/mask
    arithmetic: JVM codegen on Spark, bit-identical SQL on DuckDB, so
    the layout key itself is oracle-checked bit-for-bit. The tile
    summary (top 4 bits = 16 quadtree cells) is what a file-skipping
    manifest sees: tight per-tile key ranges mean tight per-file
    bounding boxes. Map-only + one 16-group aggregate."""
    from cdc_historical_warehouse_platform_spark.operators import layout

    o = load_table(spark, sf, "orders")
    qa = layout.quantize(F.col("o_custkey"), 0, 1500)
    qb = layout.quantize(
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        ),
        0,
        2557,
    )
    keyed = o.select(
        "o_orderkey", layout.zorder_key2(qa, qb).alias("zkey")
    )
    return (
        keyed.groupBy(F.shiftrightunsigned("zkey", 28).alias("ztile"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("zkey").alias("zkey_min"),
            F.max("zkey").alias("zkey_max"),
        )
        .orderBy("ztile")
    )


def _sql_zorder_tiles() -> str:
    from cdc_historical_warehouse_platform_spark.operators import layout

    qa = layout.quantize_sql("o_custkey", 0, 1500)
    qb = layout.quantize_sql(
        "date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))", 0, 2557
    )
    z = layout.zorder_sql(qa, qb)
    return f"""
WITH keyed AS (
  SELECT o_orderkey, {z} AS zkey FROM orders)
SELECT zkey >> 28 AS ztile, COUNT(*) AS n_orders,
       MIN(zkey) AS zkey_min, MAX(zkey) AS zkey_max
FROM keyed GROUP BY 1 ORDER BY ztile
"""


RELATIONAL_QUERIES["layout_zorder_tiles"] = (q_zorder_tiles, _sql_zorder_tiles())


# --------------------------------------------------------------------------
# r6 fourth batch: gaps-and-islands, deterministic mode, exact z-score
# anomaly flags, fixed-iteration integer PageRank
# --------------------------------------------------------------------------


def q_events_gap_islands(spark: SparkSession, sf: str) -> DataFrame:
    """Gaps-and-islands (r6): per-user runs of CONSECUTIVE active days
    in the events stream — the classic rn-difference trick. A day
    index minus a per-user row_number over distinct active days is
    constant exactly within one unbroken run, so grouping on it yields
    the islands; each reports its start/end day and length.

    Scale shape: the distinct + window + groupBy all partition by
    user_id (no global window), so one shuffle on the user key serves
    all three and skew is bounded by one user's active-day count
    (≤ days in the observation window). Integer day arithmetic only —
    exact in both engines."""
    ev = load_table(spark, sf, "events")
    days = (
        ev.select(
            "user_id",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias(
                "day_idx"
            ),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day_idx")
    islands = days.withColumn(
        "island", F.col("day_idx") - F.row_number().over(w)
    )
    return (
        islands.groupBy("user_id", "island")
        .agg(
            F.min("day_idx").alias("start_day"),
            F.max("day_idx").alias("end_day"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .select("user_id", "start_day", "end_day", "n_days")
        .orderBy("user_id", "start_day")
    )


SQL_GAP_ISLANDS = """
WITH days AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx
  FROM events),
islands AS (
  SELECT user_id, day_idx,
         day_idx - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day_idx) AS island
  FROM days)
SELECT user_id, MIN(day_idx) AS start_day, MAX(day_idx) AS end_day,
       COUNT(*) AS n_days
FROM islands GROUP BY user_id, island
ORDER BY user_id, start_day
"""

RELATIONAL_QUERIES["events_gap_islands"] = (q_events_gap_islands, SQL_GAP_ISLANDS)


def q_agg_mode_frequent(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic per-group MODE (r6): the most frequent
    o_orderpriority within each (o_orderstatus, order year), ties
    broken toward the lexically smallest value — built-in mode() has
    engine-defined tie-breaks, so both sides state the tie-break
    explicitly (count DESC, value ASC) and hash-agree by construction.

    Scale shape: counts are a two-phase hash aggregate on the full
    grouping key; the argmax-per-group is a window partitioned by the
    group (cardinality = groups × priorities, tiny next to the fact) —
    never a global sort."""
    o = load_table(spark, sf, "orders")
    counts = o.groupBy(
        "o_orderstatus",
        F.year("o_orderdate").alias("order_year"),
        "o_orderpriority",
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("o_orderstatus", "order_year").orderBy(
        F.desc("n"), F.asc("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            "order_year",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("mode_count"),
        )
        .orderBy("o_orderstatus", "order_year")
    )


SQL_MODE_FREQUENT = """
WITH counts AS (
  SELECT o_orderstatus, EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS order_year,
         o_orderpriority, COUNT(*) AS n
  FROM orders GROUP BY 1, 2, 3)
SELECT o_orderstatus, CAST(order_year AS INT) AS order_year,
       o_orderpriority AS mode_priority, n AS mode_count
FROM counts
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY o_orderstatus, order_year
  ORDER BY n DESC, o_orderpriority ASC) = 1
ORDER BY o_orderstatus, order_year
"""

RELATIONAL_QUERIES["agg_mode_frequent"] = (q_agg_mode_frequent, SQL_MODE_FREQUENT)


def q_events_anomaly_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """Population z-score outlier flags in EXACT integer arithmetic
    (r6): an event is anomalous within its event_type when
    |value − μ| > k·σ. Doubles make that boundary engine-dependent, so
    both sides restate it over integer cents c = round(100·value):
        (n·c − S)² > k²·(n·Q − S²),   S = Σc, Q = Σc²
    — all BIGINT/DECIMAL products, no division, no float compare.

    Scale shape: the per-type moments are one map-side-combined
    aggregate into a handful of rows, broadcast back onto the fact —
    the big side is never shuffled. The squared products are kept in
    DECIMAL(38,0) so the compare cannot overflow at any realistic n
    (int64 would cap around 10^5 rows/group at cent scale)."""
    ev = load_table(spark, sf, "events")
    cents = ev.withColumn(
        "c", F.round(F.col("value") * 100).cast("long")
    )
    stats = cents.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
    )
    k = 3
    joined = cents.join(F.broadcast(stats), "event_type")
    dev = (F.col("n") * F.col("c") - F.col("s")).cast("decimal(38,0)")
    var_n2 = (
        F.col("n").cast("decimal(38,0)") * F.col("q").cast("decimal(38,0)")
        - F.col("s").cast("decimal(38,0)") * F.col("s").cast("decimal(38,0)")
    )
    return (
        joined.filter(dev * dev > F.lit(k * k) * var_n2)
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
    )


SQL_ANOMALY_ZSCORE = """
WITH cents AS (
  SELECT event_id, user_id, event_type, value,
         CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events),
stats AS (
  SELECT event_type, COUNT(*) AS n, SUM(c) AS s, SUM(c * c) AS q
  FROM cents GROUP BY 1)
SELECT event_id, user_id, event_type, value
FROM cents JOIN stats USING (event_type)
WHERE CAST(n * c - s AS DECIMAL(38,0)) * CAST(n * c - s AS DECIMAL(38,0))
      > 9 * (CAST(n AS DECIMAL(38,0)) * CAST(q AS DECIMAL(38,0))
             - CAST(s AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0)))
ORDER BY event_id
"""

RELATIONAL_QUERIES["events_anomaly_zscore"] = (
    q_events_anomaly_zscore,
    SQL_ANOMALY_ZSCORE,
)


def q_events_ewma_smoothing(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user EWMA smoothing (r11) — the metric-monitoring recursive
    s_n = α·x_n + (1−α)·s_{n−1} with α = 1/2, closed over the user's
    first 32 events: s_n = 0.5ⁿ·(c₁ + Σᵢ 2^(i−1)·cᵢ)/100.

    Exactness discipline (the anomaly-zscore cents pattern): terms are
    integer cents SHIFTED by powers of two — a BIGINT sum whose value
    is independent of aggregation order (float EWMA sums would round
    differently under Spark's partial aggregation vs DuckDB's window),
    then ONE exact multiply by 2⁻ⁿ and one correctly-rounded /100.
    Max magnitude 2³¹·56 102 ≈ 1.2e14 — exact in BIGINT and under the
    double mantissa.

    Scale shape: one shuffle on user_id for the row_number + grouped
    aggregate; no window over the full stream (the 32-event cap is a
    filter, not a sort-limit)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 32)
        .withColumn("c", F.round(F.col("value") * 100).cast("bigint"))
    )
    agg = d.groupBy("user_id").agg(
        F.max("rn").alias("n_events_used"),
        # SQL shiftleft: the PySpark wrapper wants a literal bit count
        F.sum(F.expr("c * shiftleft(CAST(1 AS BIGINT), rn - 1)")).alias("s"),
        F.max(F.when(F.col("rn") == 1, F.col("c"))).alias("c1"),
    )
    ewma = (
        (F.col("c1") + F.col("s")).cast("double")
        * F.pow(F.lit(0.5), F.col("n_events_used"))
        / F.lit(100.0)
    )
    return agg.select(
        "user_id", "n_events_used", ewma.alias("ewma_value")
    ).orderBy("user_id")


SQL_EWMA_SMOOTHING = """
WITH r AS (
  SELECT user_id, value, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
d AS (SELECT user_id, rn, CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM r WHERE rn <= 32),
a AS (SELECT user_id,
             CAST(MAX(rn) AS INT) AS n_events_used,
             SUM(c * (CAST(1 AS BIGINT) << (rn - 1))) AS s,
             MAX(CASE WHEN rn = 1 THEN c END) AS c1
      FROM d GROUP BY user_id)
SELECT user_id, n_events_used,
       CAST(c1 + s AS DOUBLE) * POWER(0.5, n_events_used) / 100.0 AS ewma_value
FROM a ORDER BY user_id
"""

RELATIONAL_QUERIES["events_ewma_smoothing"] = (
    q_events_ewma_smoothing,
    SQL_EWMA_SMOOTHING,
)


def q_graph_pagerank_top(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-iteration PageRank (r6) over the customer↔supplier trade
    graph (an edge where a customer's order contains a supplier's
    line), via operators/graph.py — integer micro-rank units so three
    unrolled iterations are bit-exact against the DuckDB CTE oracle.
    Nodes are disjointly encoded (customer 2k, supplier 2k+1); output
    is the top-25 nodes by final rank, ties toward the smaller id.

    Scale shape: edge derivation is an equi-join on l_orderkey (fact
    co-partitioning), then each iteration shuffles only on the node
    key — the standard distributed PageRank plan. Top-k is
    TakeOrderedAndProject, never a full sort."""
    from cdc_historical_warehouse_platform_spark.operators.graph import pagerank

    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("cust_node"),
            (F.col("l_suppkey") * 2 + 1).alias("supp_node"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("cust_node").alias("src"), F.col("supp_node").alias("dst")
    ).unionAll(
        pairs.select(
            F.col("supp_node").alias("src"), F.col("cust_node").alias("dst")
        )
    )
    ranks = pagerank(edges, iterations=3)
    return (
        ranks.select(F.col("node").cast("long").alias("node"), "rank")
        .orderBy(F.desc("rank"), F.asc("node"))
        .limit(25)
    )


def _sql_pagerank_top() -> str:
    from cdc_historical_warehouse_platform_spark.operators.graph import (
        UNIT,
        pagerank_iteration_sql,
    )

    return f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey * 2 AS cust_node, l_suppkey * 2 + 1 AS supp_node
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
edges AS (
  SELECT cust_node AS src, supp_node AS dst FROM pairs
  UNION ALL
  SELECT supp_node AS src, cust_node AS dst FROM pairs),
deg AS (
  SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
r0 AS (SELECT src AS node, CAST({UNIT} AS BIGINT) AS rank FROM deg),
r1 AS ({pagerank_iteration_sql("r0")}),
r2 AS ({pagerank_iteration_sql("r1")}),
r3 AS ({pagerank_iteration_sql("r2")})
SELECT node, CAST(rank AS BIGINT) AS rank FROM r3
ORDER BY rank DESC, node ASC LIMIT 25
"""


RELATIONAL_QUERIES["graph_pagerank_top"] = (q_graph_pagerank_top, _sql_pagerank_top())


def q_graph_khop_distance(spark: SparkSession, sf: str) -> DataFrame:
    """Bounded shortest paths (r6): exact hop-distance out to 3 hops
    from the supplier nodes of ONE nation over the customer↔supplier
    trade graph (operators/graph.bounded_shortest_paths — the min-plus
    sibling of the PageRank query; same node encoding). Distances and
    the per-distance node counts are pure integers, hash-exact against
    a 3×-unrolled-CTE oracle.

    Scale shape: identical to PageRank's — each hop is one equi-join +
    one min-groupBy on the node key; the per-hop output is the reached
    set, which the groupBy keeps deduplicated (no frontier explosion)."""
    from cdc_historical_warehouse_platform_spark.operators.graph import bounded_shortest_paths

    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    su = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("cust_node"),
            (F.col("l_suppkey") * 2 + 1).alias("supp_node"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("cust_node").alias("src"), F.col("supp_node").alias("dst")
    ).unionAll(
        pairs.select(
            F.col("supp_node").alias("src"), F.col("cust_node").alias("dst")
        )
    )
    seeds = su.filter(F.col("s_nationkey") == 0).select(
        (F.col("s_suppkey") * 2 + 1).alias("node")
    )
    dist = bounded_shortest_paths(edges, seeds, hops=3)
    return (
        dist.groupBy("dist")
        .agg(F.count(F.lit(1)).alias("n_nodes"), F.min("node").alias("min_node"))
        .orderBy("dist")
    )


def _sql_khop_distance() -> str:
    from cdc_historical_warehouse_platform_spark.operators.graph import (
        shortest_paths_iteration_sql,
    )

    return f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey * 2 AS cust_node, l_suppkey * 2 + 1 AS supp_node
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
edges AS (
  SELECT cust_node AS src, supp_node AS dst FROM pairs
  UNION ALL
  SELECT supp_node AS src, cust_node AS dst FROM pairs),
d0 AS (
  SELECT s_suppkey * 2 + 1 AS node, 0 AS dist FROM supplier WHERE s_nationkey = 0),
d1 AS ({shortest_paths_iteration_sql("d0")}),
d2 AS ({shortest_paths_iteration_sql("d1")}),
d3 AS ({shortest_paths_iteration_sql("d2")})
SELECT dist, COUNT(*) AS n_nodes, MIN(node) AS min_node
FROM d3 GROUP BY dist ORDER BY dist
"""


RELATIONAL_QUERIES["graph_khop_distance"] = (q_graph_khop_distance, _sql_khop_distance())


def q_ivm_join_view(spark: SparkSession, sf: str) -> DataFrame:
    """Join-view IVM through the driver gate (r6): maintain the
    orders ⋈ customer view via signed-multiplicity deltas
    (operators/ivm_join.py — the first-order rule Δ(A⋈B) = ΔA⋈B ∪
    (A+ΔA)⋈ΔB) through a deterministic three-step two-sided sequence:

      init: A = pre-1997 orders, B = odd-key customers
      Δ1:   A += 1997–1998 orders;      B += even-key customers
      Δ2:   A −= the F-status pre-1997 orders (retraction)

    The Spark side ONLY ever applies deltas; the oracle computes the
    FINAL states' join directly — equality proves maintenance ≡
    recompute through the hash gate. Output is the consolidated view
    rolled up per (nation, orderstatus) with multiset row counts.

    Scale shape: every delta term broadcasts the delta and scans the
    opposite state once (no state shuffle); the final consolidate +
    rollup is the read-time aggregation."""
    from cdc_historical_warehouse_platform_spark.operators.ivm_join import (
        as_inserts,
        as_retractions,
        consolidate,
        join_view_delta,
        recompute_join_view,
    )

    o = load_table(spark, sf, "orders").select(
        F.col("o_custkey").alias("k"), "o_orderkey", "o_orderstatus", "o_orderdate"
    )
    c = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("k"), "c_nationkey"
    )
    a0 = as_inserts(o.filter(F.col("o_orderdate") < F.lit("1997-01-01")))
    b0 = as_inserts(c.filter(F.col("k") % 2 == 1))
    d_a1 = as_inserts(
        o.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01"))
            & (F.col("o_orderdate") < F.lit("1999-01-01"))
        )
    )
    d_b1 = as_inserts(c.filter(F.col("k") % 2 == 0))
    d_a2 = as_retractions(
        o.filter(
            (F.col("o_orderdate") < F.lit("1997-01-01"))
            & (F.col("o_orderstatus") == "F")
        )
    )

    view = recompute_join_view(a0, b0, ["k"])
    # table-derived delta waves -> no forced broadcast (AQE sizes them)
    view = view.unionByName(
        join_view_delta(a0, b0, d_a1, d_b1, ["k"], hint_broadcast=False)
    )
    a1 = a0.unionByName(d_a1)
    b1 = b0.unionByName(d_b1)
    view = view.unionByName(
        join_view_delta(a1, b1, d_a2, None, ["k"], hint_broadcast=False)
    )
    return (
        consolidate(view)
        .groupBy("c_nationkey", "o_orderstatus")
        .agg(F.sum("__mult").cast("long").alias("n_rows"))
        .orderBy("c_nationkey", "o_orderstatus")
    )


SQL_IVM_JOIN_VIEW = """
WITH a_final AS (
  SELECT o_custkey AS k, o_orderstatus FROM orders
  WHERE o_orderdate < TIMESTAMP '1999-01-01'
    AND NOT (o_orderdate < TIMESTAMP '1997-01-01' AND o_orderstatus = 'F')),
b_final AS (
  SELECT c_custkey AS k, c_nationkey FROM customer)
SELECT c_nationkey, o_orderstatus, COUNT(*) AS n_rows
FROM a_final JOIN b_final USING (k)
GROUP BY c_nationkey, o_orderstatus
ORDER BY c_nationkey, o_orderstatus
"""

RELATIONAL_QUERIES["ivm_join_view"] = (q_ivm_join_view, SQL_IVM_JOIN_VIEW)


def q_events_resample_interpolate(spark: SparkSession, sf: str) -> DataFrame:
    """Resample + LINEAR interpolation (r6) — the ffill sibling for
    metrics where a gap should slope between its neighbors, not hold
    flat. Per event type, hourly averages in exact integer MICRO-units
    (avg = (100·Σcents·10000) div n — truncating div, non-negative),
    then each empty hour interpolates between its nearest known hours:

        v = (v0·(h1−h) + v1·(h−h0)) div (h1−h0)

    — the weighted form keeps the numerator NON-NEGATIVE, so Spark's
    truncating `div` and DuckDB's flooring `//` agree (a v1−v0 form
    would not: the two engines round negative quotients apart).
    Boundary hours fall back to the nearest known value (bfill before
    the first observation, ffill after the last).

    Scale shape: one two-phase hourly aggregate (events scanned once,
    spine derived from the aggregate), then four window functions over
    the types×24 spine, all partitioned by event_type."""
    ev = load_table(spark, sf, "events").filter(
        (F.col("ts") >= F.lit("2024-01-01 00:00:00"))
        & (F.col("ts") < F.lit("2024-01-02 00:00:00"))
    )
    hourly = ev.groupBy("event_type", F.hour("ts").alias("hour")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("__cents"),
    )
    spine = (
        hourly.select("event_type")
        .distinct()
        .select("event_type", F.explode(F.sequence(F.lit(0), F.lit(23))).alias("hour"))
    )
    base = spine.join(hourly, ["event_type", "hour"], "left").withColumn(
        "known_micro",
        F.expr("(__cents * 10000) div n_events"),
    )
    wp = Window.partitionBy("event_type").orderBy("hour").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wn = Window.partitionBy("event_type").orderBy("hour").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    known_hour = F.when(F.col("known_micro").isNotNull(), F.col("hour"))
    filled = (
        base.withColumn("__pv", F.last("known_micro", ignorenulls=True).over(wp))
        .withColumn("__ph", F.last(known_hour, ignorenulls=True).over(wp))
        .withColumn("__nv", F.first("known_micro", ignorenulls=True).over(wn))
        .withColumn("__nh", F.first(known_hour, ignorenulls=True).over(wn))
    )
    interp = (
        F.when(F.col("known_micro").isNotNull(), F.col("known_micro"))
        .when(F.col("__pv").isNull(), F.col("__nv"))
        .when(F.col("__nv").isNull(), F.col("__pv"))
        .otherwise(
            F.expr(
                "(__pv * (__nh - hour) + __nv * (hour - __ph)) div (__nh - __ph)"
            )
        )
    )
    return filled.select(
        "event_type",
        "hour",
        F.col("known_micro").isNull().alias("is_gap"),
        interp.cast("long").alias("value_micro"),
    ).orderBy("event_type", "hour")


SQL_RESAMPLE_INTERPOLATE = """
WITH ev AS (
  SELECT * FROM events
  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-01-02 00:00:00'),
hourly AS (
  SELECT event_type, CAST(hour(ts) AS INT) AS hour,
         COUNT(*) AS n_events,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
  FROM ev GROUP BY 1, 2),
spine AS (
  SELECT t.event_type, CAST(h.h AS INT) AS hour
  FROM (SELECT DISTINCT event_type FROM hourly) t, generate_series(0, 23) h(h)),
base AS (
  SELECT s.event_type, s.hour,
         (cents * 10000) // n_events AS known_micro
  FROM spine s LEFT JOIN hourly USING (event_type, hour)),
filled AS (
  SELECT event_type, hour, known_micro,
         LAST_VALUE(known_micro IGNORE NULLS) OVER
           (PARTITION BY event_type ORDER BY hour
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         LAST_VALUE(CASE WHEN known_micro IS NOT NULL THEN hour END IGNORE NULLS) OVER
           (PARTITION BY event_type ORDER BY hour
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
         FIRST_VALUE(known_micro IGNORE NULLS) OVER
           (PARTITION BY event_type ORDER BY hour
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         FIRST_VALUE(CASE WHEN known_micro IS NOT NULL THEN hour END IGNORE NULLS) OVER
           (PARTITION BY event_type ORDER BY hour
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
  FROM base)
SELECT event_type, hour,
       known_micro IS NULL AS is_gap,
       CAST(CASE WHEN known_micro IS NOT NULL THEN known_micro
                 WHEN pv IS NULL THEN nv
                 WHEN nv IS NULL THEN pv
                 ELSE (pv * (nh - hour) + nv * (hour - ph)) // (nh - ph)
            END AS BIGINT) AS value_micro
FROM filled
ORDER BY event_type, hour
"""

RELATIONAL_QUERIES["events_resample_interpolate"] = (
    q_events_resample_interpolate,
    SQL_RESAMPLE_INTERPOLATE,
)


def q_customer_rfm_segments(spark: SparkSession, sf: str) -> DataFrame:
    """RFM segmentation (r6): per customer, Recency (days from last
    order to the corpus horizon), Frequency (order count) and Monetary
    (DECIMAL-exact lifetime total), each cut into quintiles with
    ntile(5) — the classic marketing-warehouse segmentation. ntile's
    tie handling is positional, so every ORDER BY carries the customer
    key as the final tiebreak and both engines walk the identical
    ordering; output is the per-(r,f,m) segment's size and exact
    monetary total.

    Scale shape: one grouped aggregate over orders (two-phase), then
    three ntile windows over the CUSTOMER-level table (dimension-sized,
    not fact-sized) — at extreme customer counts the same statistic
    ships as approx-percentile cuts; the exact quintile contract here
    is what the oracle can certify."""
    o = load_table(spark, sf, "orders")
    horizon = F.lit("2001-09-01").cast("date")
    per_cust = o.groupBy("o_custkey").agg(
        F.datediff(horizon, F.max(F.col("o_orderdate").cast("date"))).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
    )
    from cdc_historical_warehouse_platform_spark.operators.rank import exact_ntile

    # three exact-NTILE cuts WITHOUT an unpartitioned window (the
    # registry's zero-global-sort discipline): hierarchical bucketed
    # rank + the closed-form tile mapping (operators/rank.py); the
    # oracle uses native NTILE() — hash equality proves the formula.
    # Bucket widths are AUTO-derived (derive_bucket's bounded min/max
    # probe) so no hand-picked width can degenerate to a single-bucket
    # global sort; DESC cuts bucket on the negated key.
    scored = exact_ntile(
        per_cust, 5,
        [F.asc("recency_days"), F.asc("o_custkey")],
        None, "r_score", key=F.col("recency_days"),
    )
    scored = exact_ntile(
        scored, 5,
        [F.desc("frequency"), F.asc("o_custkey")],
        None, "f_score", key=F.col("frequency"), descending=True,
    )
    scored = exact_ntile(
        scored, 5,
        [F.desc("monetary"), F.asc("o_custkey")],
        None, "m_score", key=F.col("monetary"), descending=True,
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            # exact DECIMAL sum, cast to double at the output boundary
            # (the repo-wide parity convention — toPandas Decimal vs
            # DuckDB float64 would false-fail the hash otherwise)
            F.sum("monetary").cast("decimal(28,2)").cast("double").alias("segment_value"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


SQL_CUSTOMER_RFM = """
WITH per_cust AS (
  SELECT o_custkey,
         date_diff('day', MAX(CAST(o_orderdate AS DATE)), DATE '2001-09-01') AS recency_days,
         COUNT(*) AS frequency,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
  FROM orders GROUP BY 1),
scored AS (
  SELECT *,
         NTILE(5) OVER (ORDER BY recency_days ASC, o_custkey ASC) AS r_score,
         NTILE(5) OVER (ORDER BY frequency DESC, o_custkey ASC) AS f_score,
         NTILE(5) OVER (ORDER BY monetary DESC, o_custkey ASC) AS m_score
  FROM per_cust)
SELECT r_score, f_score, m_score,
       COUNT(*) AS n_customers,
       CAST(CAST(SUM(monetary) AS DECIMAL(28,2)) AS DOUBLE) AS segment_value
FROM scored GROUP BY 1, 2, 3
ORDER BY r_score, f_score, m_score
"""

RELATIONAL_QUERIES["customer_rfm_segments"] = (
    q_customer_rfm_segments,
    SQL_CUSTOMER_RFM,
)


def q_scalar_map_functions(spark: SparkSession, sf: str) -> DataFrame:
    """Map-type surface (r6): per order, a linenumber→quantity MAP
    built from sorted entries (map_from_entries ∘ array_sort ∘
    collect_list — the sort INSIDE the aggregate is what makes the
    map's iteration order deterministic), then the map function family:
    size, element_at, map_contains_key, map_keys/map_values (rendered
    as joined strings so the driver hash can compare them — DuckDB has
    no identical MAP type, so its twin derives the SAME strings from
    sorted lists, proving the semantics rather than the storage)."""
    li = (
        load_table(spark, sf, "lineitem")
        .filter(F.col("l_orderkey") % 100 == 0)
        # the synthetic testdata repeats line numbers within an order —
        # map keys must be unique, so fold duplicates with MAX first
        .groupBy("l_orderkey", "l_linenumber")
        .agg(F.max("l_quantity").alias("l_quantity"))
    )
    m = F.map_from_entries(
        F.array_sort(
            F.collect_list(F.struct(F.col("l_linenumber").alias("k"), F.col("l_quantity").alias("v")))
        )
    )
    return (
        li.groupBy("l_orderkey")
        .agg(m.alias("m"))
        .select(
            "l_orderkey",
            F.size("m").alias("n_items"),
            F.element_at("m", 1).alias("qty_line1"),
            F.map_contains_key("m", F.lit(3)).alias("has_line3"),
            F.array_join(
                F.transform(F.map_keys("m"), lambda k: k.cast("string")), ","
            ).alias("keys_str"),
            F.array_join(
                F.transform(F.map_values("m"), lambda v: v.cast("string")), ","
            ).alias("vals_str"),
        )
        .orderBy("l_orderkey")
    )


SQL_MAP_FUNCTIONS = """
WITH uniq AS (
  SELECT l_orderkey, l_linenumber, MAX(l_quantity) AS l_quantity
  FROM lineitem WHERE l_orderkey % 100 = 0
  GROUP BY 1, 2),
grouped AS (
  SELECT l_orderkey,
         list_sort(list({'k': l_linenumber, 'v': l_quantity})) AS entries
  FROM uniq GROUP BY 1)
SELECT l_orderkey,
       CAST(len(entries) AS INT) AS n_items,
       list_transform(list_filter(entries, e -> e.k = 1), e -> e.v)[1] AS qty_line1,
       len(list_filter(entries, e -> e.k = 3)) > 0 AS has_line3,
       array_to_string(list_transform(entries, e -> CAST(e.k AS VARCHAR)), ',') AS keys_str,
       array_to_string(list_transform(entries, e -> CAST(e.v AS VARCHAR)), ',') AS vals_str
FROM grouped
ORDER BY l_orderkey
"""

RELATIONAL_QUERIES["scalar_map_functions"] = (
    q_scalar_map_functions,
    SQL_MAP_FUNCTIONS,
)


def q_agg_bitwise(spark: SparkSession, sf: str) -> DataFrame:
    """Bitwise aggregate family (r6): bit_and / bit_or / bit_xor over
    integer columns per group — the flag-mask rollup shape (e.g. "which
    permission bits hold for EVERY row"). Exact integers end to end;
    two-phase hash aggregate, map-side combined (all three are
    commutative/associative)."""
    li = load_table(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.bit_and(F.col("l_linenumber")).alias("mask_and"),
            F.bit_or(F.col("l_linenumber")).alias("mask_or"),
            F.bit_xor(F.col("l_quantity").cast("long")).alias("qty_xor"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


SQL_AGG_BITWISE = """
SELECT l_returnflag,
       BIT_AND(l_linenumber) AS mask_and,
       BIT_OR(l_linenumber) AS mask_or,
       BIT_XOR(CAST(l_quantity AS BIGINT)) AS qty_xor,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""

RELATIONAL_QUERIES["agg_bitwise"] = (q_agg_bitwise, SQL_AGG_BITWISE)


def q_window_distinct_running(spark: SparkSession, sf: str) -> DataFrame:
    """Running COUNT(DISTINCT) over a window (r8) — per supplier, the
    number of distinct parts shipped up to and including each line,
    under a TOTAL order (shipdate, orderkey, linenumber). Spark has no
    DISTINCT window aggregate, so the idiomatic form is
    ``size(collect_set(...))`` over an unbounded-preceding frame; the
    oracle takes the classic first-occurrence formulation (flag the
    first row of each (supplier, part), cumulative-sum the flags) —
    hash equality proves the two formulations coincide, which only
    holds if both engines apply the identical total order.

    Scale shape: one shuffle on the supplier key serves the window;
    state per partition is the supplier's distinct-part set (bounded
    by the part catalog, not the fact table). Suppliers are capped to
    keep the driver-gate output stable-sized; the cap is a pushed-down
    scan filter."""
    li = load_table(spark, sf, "lineitem").filter(F.col("l_suppkey") <= 50)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        li.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.size(F.collect_set("l_partkey").over(w)).alias("distinct_parts"),
        )
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    )


SQL_WINDOW_DISTINCT_RUNNING = """
WITH flagged AS (
  SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
         CASE WHEN row_number() OVER (
                PARTITION BY l_suppkey, l_partkey
                ORDER BY l_shipdate, l_orderkey, l_linenumber) = 1
              THEN 1 ELSE 0 END AS first_seen
  FROM lineitem WHERE l_suppkey <= 50
)
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(SUM(first_seen) OVER (
         PARTITION BY l_suppkey
         ORDER BY l_shipdate, l_orderkey, l_linenumber
         ROWS UNBOUNDED PRECEDING) AS INT) AS distinct_parts
FROM flagged
ORDER BY l_suppkey, l_orderkey, l_linenumber
"""

RELATIONAL_QUERIES["window_distinct_running"] = (
    q_window_distinct_running,
    SQL_WINDOW_DISTINCT_RUNNING,
)


def q_agg_mad_robust(spark: SparkSession, sf: str) -> DataFrame:
    """Median absolute deviation per group (r8) — the robust-statistics
    pair to the exact-moment rows: MAD = median(|x − median(x)|), both
    medians EXACT (percentile_cont 0.5, linear interpolation — the
    same cross-engine interpolation contract agg_exact_percentiles
    pinned). Two grouped aggregates with the group medians broadcast
    back between them; the fact table shuffles once per aggregate on
    the (tiny-cardinality) group key, never on rows."""
    o = load_table(spark, sf, "orders").select(
        "o_orderpriority", F.col("o_totalprice").cast("double").alias("p")
    )
    med = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(p, 0.5)").alias("med")
    )
    return (
        o.join(F.broadcast(med), "o_orderpriority")
        .select("o_orderpriority", F.abs(F.col("p") - F.col("med")).alias("d"), "med")
        .groupBy("o_orderpriority")
        .agg(
            F.first("med").alias("median_price"),
            F.expr("percentile(d, 0.5)").alias("mad"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderpriority")
    )


SQL_AGG_MAD_ROBUST = """
WITH base AS (
  SELECT o_orderpriority, CAST(CAST(o_totalprice AS VARCHAR) AS DOUBLE) AS p
  FROM orders
),
med AS (
  SELECT o_orderpriority, percentile_cont(0.5) WITHIN GROUP (ORDER BY p) AS med
  FROM base GROUP BY o_orderpriority
)
SELECT b.o_orderpriority,
       ANY_VALUE(m.med) AS median_price,
       percentile_cont(0.5) WITHIN GROUP (ORDER BY ABS(b.p - m.med)) AS mad,
       COUNT(*) AS n
FROM base b JOIN med m USING (o_orderpriority)
GROUP BY b.o_orderpriority
ORDER BY b.o_orderpriority
"""

RELATIONAL_QUERIES["agg_mad_robust"] = (q_agg_mad_robust, SQL_AGG_MAD_ROBUST)


# --- event throttle dedup (r10) ----------------------------------------------


def q_events_throttle_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Time-window event suppression — the CDC/telemetry dedup-throttle:
    within each (user, event_type) stream, an event arriving less than
    2 minutes after its predecessor is noise (duplicate clicks, retry
    storms, sensor chatter) and gets dropped. Gap computation is one
    properly-partitioned lag window over exact int64 microseconds
    (unix_micros ↔ DuckDB epoch_us — no float timestamp arithmetic),
    then a per-type rollup. kept_id_sum is an exact integer digest of
    WHICH events survived, so the oracle hash pins the kept set, not
    just its size."""
    events = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    kept = gap_us.isNull() | (gap_us >= F.lit(120_000_000))
    return (
        events.select("event_type", "event_id", kept.alias("kept"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
            F.sum(
                F.when(F.col("kept"), F.col("event_id")).otherwise(F.lit(0))
            ).alias("kept_id_sum"),
        )
        .orderBy("event_type")
    )


SQL_EVENTS_THROTTLE = """
WITH d AS (
  SELECT event_type, event_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id
         ) AS gap_us
  FROM events)
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us >= 120000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us >= 120000000
                     THEN event_id ELSE 0 END) AS BIGINT) AS kept_id_sum
FROM d GROUP BY event_type ORDER BY event_type
"""

RELATIONAL_QUERIES["events_throttle_dedup"] = (
    q_events_throttle_dedup,
    SQL_EVENTS_THROTTLE,
)


def q_agg_winsorized_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Winsorized mean at the 10th/90th percentile per return flag
    (r12) — the robust-statistics complement to agg_mad_robust: clamp
    every price to the [p10, p90] order statistics before averaging,
    so tail outliers stop dominating the mean.

    Exactness discipline (the cents pattern): prices enter as integer
    cents; the order statistics are EXACT ranks (k_lo = ceil(n/10),
    k_hi = n - k_lo + 1 — pure integer arithmetic, no percentile
    interpolation to disagree across engines); the clamped sum is one
    BIGINT; the only float op is the final division.

    Scale shape: the fact table is never sorted — order statistics
    come from a cumulative count over the (flag, DISTINCT cent value)
    table (bounded by the price DOMAIN, not the row count, at any
    scale; the window partitions by flag and orders a domain-sized
    input). Bounds broadcast back onto the fact for the clamped
    aggregate: two linear passes, zero fact-side windows."""
    li = load_table(spark, sf, "lineitem")
    d = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("c"),
    )
    counts = d.groupBy("l_returnflag", "c").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("l_returnflag").orderBy("c")
    cum = counts.withColumn("cum", F.sum("cnt").over(w))
    totals = counts.groupBy("l_returnflag").agg(F.sum("cnt").alias("n"))
    ranked = cum.join(F.broadcast(totals), "l_returnflag").withColumn(
        "k_lo", F.expr("CAST((n + 9) div 10 AS BIGINT)")
    )
    bounds = ranked.groupBy("l_returnflag", "n").agg(
        F.min(F.when(F.col("cum") >= F.col("k_lo"), F.col("c"))).alias("lo_c"),
        F.min(
            F.when(F.col("cum") >= F.col("n") - F.col("k_lo") + 1, F.col("c"))
        ).alias("hi_c"),
    )
    clamped = d.join(F.broadcast(bounds), "l_returnflag").select(
        "l_returnflag",
        "n",
        F.least(F.greatest(F.col("c"), F.col("lo_c")), F.col("hi_c")).alias(
            "wc"
        ),
        "lo_c",
        "hi_c",
    )
    return (
        clamped.groupBy("l_returnflag", "n", "lo_c", "hi_c")
        .agg(F.sum("wc").alias("ws"))
        .select(
            "l_returnflag",
            F.col("n").alias("n_rows"),
            (F.col("lo_c").cast("double") / 100.0).alias("p10_price"),
            (F.col("hi_c").cast("double") / 100.0).alias("p90_price"),
            (
                F.col("ws").cast("double")
                / (F.col("n") * F.lit(100)).cast("double")
            ).alias("winsorized_mean"),
        )
        .orderBy("l_returnflag")
    )


SQL_WINSORIZED_STATS = """
WITH d AS (
  SELECT l_returnflag, CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c
  FROM lineitem),
counts AS (
  SELECT l_returnflag, c, COUNT(*) AS cnt FROM d GROUP BY 1, 2),
cum AS (
  SELECT l_returnflag, c, cnt,
         SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY c) AS cum
  FROM counts),
totals AS (SELECT l_returnflag, CAST(SUM(cnt) AS BIGINT) AS n FROM counts GROUP BY 1),
bounds AS (
  SELECT cum.l_returnflag, n,
         MIN(CASE WHEN cum >= (n + 9) // 10 THEN c END) AS lo_c,
         MIN(CASE WHEN cum >= n - (n + 9) // 10 + 1 THEN c END) AS hi_c
  FROM cum JOIN totals USING (l_returnflag)
  GROUP BY 1, 2)
SELECT d.l_returnflag,
       n AS n_rows,
       CAST(lo_c AS DOUBLE) / 100.0 AS p10_price,
       CAST(hi_c AS DOUBLE) / 100.0 AS p90_price,
       CAST(SUM(LEAST(GREATEST(c, lo_c), hi_c)) AS DOUBLE)
         / CAST(n * 100 AS DOUBLE) AS winsorized_mean
FROM d JOIN bounds USING (l_returnflag)
GROUP BY 1, 2, lo_c, hi_c
ORDER BY 1
"""

RELATIONAL_QUERIES["agg_winsorized_stats"] = (
    q_agg_winsorized_stats,
    SQL_WINSORIZED_STATS,
)


def q_agg_weighted_median(spark: SparkSession, sf: str) -> DataFrame:
    """Quantity-weighted LOWER median price per return flag (r12):
    the smallest price whose cumulative quantity weight reaches half
    the total — the weighted-percentile shape a data-mix planner needs
    (token-weighted median doc quality, bytes-weighted median shard
    size) that plain percentile rows can't express.

    Exactness: prices as integer cents, quantities as exact integers
    (TPC-H quantities are whole numbers); the defining inequality is
    2·cum ≥ W in BIGINT — no float percentile, no interpolation. Same
    domain-bounded scale shape as agg_winsorized_stats: the window
    runs over (flag, DISTINCT cent) rows, never the fact."""
    li = load_table(spark, sf, "lineitem")
    d = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("c"),
        F.round(F.col("l_quantity")).cast("bigint").alias("q"),
    )
    counts = d.groupBy("l_returnflag", "c").agg(F.sum("q").alias("wt"))
    w = Window.partitionBy("l_returnflag").orderBy("c")
    cum = counts.withColumn("cum", F.sum("wt").over(w))
    totals = counts.groupBy("l_returnflag").agg(F.sum("wt").alias("tw"))
    return (
        cum.join(F.broadcast(totals), "l_returnflag")
        .filter(F.col("cum") * 2 >= F.col("tw"))
        .groupBy("l_returnflag", "tw")
        .agg(F.min("c").alias("mc"))
        .select(
            "l_returnflag",
            F.col("tw").alias("total_weight"),
            (F.col("mc").cast("double") / 100.0).alias("weighted_median_price"),
        )
        .orderBy("l_returnflag")
    )


SQL_WEIGHTED_MEDIAN = """
WITH d AS (
  SELECT l_returnflag,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c,
         CAST(ROUND(l_quantity) AS BIGINT) AS q
  FROM lineitem),
counts AS (SELECT l_returnflag, c, SUM(q) AS wt FROM d GROUP BY 1, 2),
cum AS (
  SELECT l_returnflag, c,
         SUM(wt) OVER (PARTITION BY l_returnflag ORDER BY c) AS cum
  FROM counts),
totals AS (SELECT l_returnflag, CAST(SUM(wt) AS BIGINT) AS tw FROM counts GROUP BY 1)
SELECT cum.l_returnflag,
       tw AS total_weight,
       CAST(MIN(c) AS DOUBLE) / 100.0 AS weighted_median_price
FROM cum JOIN totals USING (l_returnflag)
WHERE cum * 2 >= tw
GROUP BY 1, 2
ORDER BY 1
"""

RELATIONAL_QUERIES["agg_weighted_median"] = (
    q_agg_weighted_median,
    SQL_WEIGHTED_MEDIAN,
)


def q_events_mann_whitney_u(spark: SparkSession, sf: str) -> DataFrame:
    """Mann–Whitney U rank-sum test per event type (r12): compares the
    value distributions of two user cohorts (even vs odd user_id) —
    the nonparametric A/B-test shape a metrics platform runs beside
    the z-score row. Ties take midranks.

    Exactness discipline: everything stays in BIGINT by working with
    DOUBLED midranks — for value v, 2·midrank(v) = 2·|{<v}| + |{=v}| + 1
    (an integer even when the midrank is half-integral), so
    2·R_A = Σ_v cntA(v)·(2·cum_less(v) + cnt(v) + 1) and
    2·U_A = 2·R_A − nA·(nA+1) are exact; U_B follows from
    U_A + U_B = nA·nB. No floats anywhere.

    Scale shape: one grouped count onto (type, DISTINCT cent value) —
    domain-bounded like agg_winsorized_stats — then a window over that
    domain-sized table; the event stream itself is never sorted."""
    ev = load_table(spark, sf, "events")
    d = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
        (F.col("user_id") % 2 == 0).alias("is_a"),
    )
    counts = d.groupBy("event_type", "c").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("cnt_a"),
    )
    w = Window.partitionBy("event_type").orderBy("c")
    cum = counts.withColumn(
        "cum_less", F.sum("cnt").over(w) - F.col("cnt")
    )
    return (
        cum.groupBy("event_type")
        .agg(
            F.sum("cnt_a").alias("n_a"),
            (F.sum("cnt") - F.sum("cnt_a")).alias("n_b"),
            F.sum(
                F.col("cnt_a")
                * (F.lit(2) * F.col("cum_less") + F.col("cnt") + F.lit(1))
            ).alias("r2_a"),
        )
        .select(
            "event_type",
            "n_a",
            "n_b",
            (F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1)).alias("u2_a"),
            (
                F.lit(2) * F.col("n_a") * F.col("n_b")
                - (F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1))
            ).alias("u2_b"),
        )
        .orderBy("event_type")
    )


SQL_MANN_WHITNEY = """
WITH d AS (
  SELECT event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS c,
         user_id % 2 = 0 AS is_a
  FROM events),
counts AS (
  SELECT event_type, c, COUNT(*) AS cnt,
         CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a
  FROM d GROUP BY 1, 2),
cum AS (
  SELECT event_type, c, cnt, cnt_a,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY c) - cnt AS cum_less
  FROM counts),
agg AS (
  SELECT event_type,
         CAST(SUM(cnt_a) AS BIGINT) AS n_a,
         CAST(SUM(cnt) - SUM(cnt_a) AS BIGINT) AS n_b,
         CAST(SUM(cnt_a * (2 * cum_less + cnt + 1)) AS BIGINT) AS r2_a
  FROM cum GROUP BY 1)
SELECT event_type, n_a, n_b,
       r2_a - n_a * (n_a + 1) AS u2_a,
       2 * n_a * n_b - (r2_a - n_a * (n_a + 1)) AS u2_b
FROM agg ORDER BY event_type
"""

RELATIONAL_QUERIES["events_mann_whitney_u"] = (
    q_events_mann_whitney_u,
    SQL_MANN_WHITNEY,
)


def q_events_autocorr_lag1(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user lag-1 autocorrelation of event values (r12) — the
    time-series persistence signal (is a user's next reading predicted
    by their last?) beside the EWMA row, over consecutive event pairs
    in (ts, event_id) order.

    Exactness: the Pearson components over (prev, curr) cent pairs are
    exact BIGINTs far under 2^53 (num = n·Σxy − Σx·Σy,
    dx = n·Σx² − (Σx)², dy likewise); the float tail is
    num / (sqrt(dx)·sqrt(dy)) — IEEE-correctly-rounded sqrt/mul/div on
    exactly-representable integers, identical in any engine (the
    agg_linear_regression discipline). Users with < 2 events or a
    constant series (dx·dy = 0) report NULL.

    Scale shape: one shuffle on user_id for the lag window + grouped
    sums; output is user-count-sized."""
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = (
        ev.withColumn("c", F.round(F.col("value") * 100).cast("bigint"))
        .withColumn("prev", F.lag("c").over(w))
        .filter(F.col("prev").isNotNull())
    )
    agg = d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("prev").alias("sx"),
        F.sum("c").alias("sy"),
        F.sum(F.col("prev") * F.col("c")).alias("sxy"),
        F.sum(F.col("prev") * F.col("prev")).alias("sxx"),
        F.sum(F.col("c") * F.col("c")).alias("syy"),
    )
    num = F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy")
    corr = F.when(
        (dx > 0) & (dy > 0),
        num.cast("double")
        / (F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double"))),
    )
    return agg.select(
        "user_id", "n_pairs", corr.alias("autocorr_lag1")
    ).orderBy("user_id")


SQL_AUTOCORR_LAG1 = """
WITH d AS (
  SELECT user_id,
         CAST(ROUND(value * 100) AS BIGINT) AS c,
         lag(CAST(ROUND(value * 100) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events),
p AS (SELECT user_id, prev, c FROM d WHERE prev IS NOT NULL),
agg AS (
  SELECT user_id, COUNT(*) AS n_pairs,
         CAST(SUM(prev) AS BIGINT) AS sx,
         CAST(SUM(c) AS BIGINT) AS sy,
         CAST(SUM(prev * c) AS BIGINT) AS sxy,
         CAST(SUM(prev * prev) AS BIGINT) AS sxx,
         CAST(SUM(c * c) AS BIGINT) AS syy
  FROM p GROUP BY 1)
SELECT user_id, n_pairs,
       CASE WHEN n_pairs * sxx - sx * sx > 0 AND n_pairs * syy - sy * sy > 0
            THEN CAST(n_pairs * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE)))
       END AS autocorr_lag1
FROM agg ORDER BY user_id
"""

RELATIONAL_QUERIES["events_autocorr_lag1"] = (
    q_events_autocorr_lag1,
    SQL_AUTOCORR_LAG1,
)


def q_asof_tolerance(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join with a STALENESS BOUND and strict inequality (r12):
    the two asof_join parameters the plain J3 row leaves unexercised —
    for each purchase, the most recent signup STRICTLY BEFORE it, and
    only if it happened within the last 7 days (older matches null
    out: "attribute the purchase to a recent signup or not at all").

    Same single-shuffle union+window plan as join_asof_events
    (operators/asof.py — no range-join explosion at any scale); the
    oracle is an INDEPENDENT correlated-subquery formulation, so the
    hash equality cross-checks the operator against a different
    algorithm, not a transliteration. Determinism: no two signups
    share (user_id, ts) in the testdata at any SF (checked r12), so
    the as-of winner is unique under both formulations."""
    ev = load_table(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts").alias("signup_ts"),
        F.col("event_id").alias("signup_event"),
    )
    out = asof_join(
        purchases,
        signups,
        on="user_id",
        left_ts="ts",
        right_ts="signup_ts",
        right_payload=["signup_event"],
        tolerance="7 DAYS",
        allow_exact_matches=False,
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_signup_ts").alias("recent_signup_ts"),
        F.col("asof_signup_event").alias("recent_signup_event"),
    ).orderBy("event_id")


SQL_ASOF_TOLERANCE = """
WITH p AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'purchase'),
s AS (
  SELECT event_id AS s_id, user_id, CAST(ts AS TIMESTAMP) AS s_ts
  FROM events WHERE event_type = 'signup')
SELECT p.event_id, p.user_id, p.ts,
       (SELECT max(s_ts) FROM s
        WHERE s.user_id = p.user_id AND s.s_ts < p.ts
          AND s.s_ts >= p.ts - INTERVAL 7 DAY) AS recent_signup_ts,
       (SELECT s_id FROM s
        WHERE s.user_id = p.user_id AND s.s_ts < p.ts
          AND s.s_ts >= p.ts - INTERVAL 7 DAY
        ORDER BY s_ts DESC LIMIT 1) AS recent_signup_event
FROM p ORDER BY p.event_id
"""

RELATIONAL_QUERIES["join_asof_tolerance"] = (
    q_asof_tolerance,
    SQL_ASOF_TOLERANCE,
)


def q_asof_nearest(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join, direction='nearest' (r12): for each error event,
    the CLOSEST click by the same user within ±1 hour, whichever side
    of the error it falls on — the pandas ``merge_asof(direction=
    'nearest')`` mode, completing the operator's direction surface
    (backward / forward / nearest; pinned against pandas in
    tests/test_asof.py).

    Plan (operators/asof.py): the nearest mode evaluates the backward
    and forward union+window passes over ONE union — one shuffle on
    the key, two in-partition sorts, no range-join explosion at any
    scale. Determinism: an exact distance tie resolves to the
    backward match (encoded identically in the oracle's ORDER BY
    abs-delta, ts); no two events share (user_id, ts) in the testdata
    at any SF."""
    from cdc_historical_warehouse_platform_spark.operators.asof import asof_join

    ev = load_table(spark, sf, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_event"),
    )
    out = asof_join(
        errors,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
        right_payload=["click_event"],
        tolerance="1 HOUR",
        direction="nearest",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_click_ts").alias("nearest_click_ts"),
        F.col("asof_click_event").alias("nearest_click_event"),
    ).orderBy("event_id")


SQL_ASOF_NEAREST = """
WITH e AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
  FROM events),
err AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'error'),
clk AS (SELECT event_id AS c_id, user_id, ts AS c_ts FROM e
        WHERE event_type = 'click')
SELECT err.event_id, err.user_id, err.ts,
       (SELECT c_ts FROM clk
        WHERE clk.user_id = err.user_id
          AND abs(epoch_us(c_ts) - epoch_us(err.ts)) <= 3600000000
        ORDER BY abs(epoch_us(c_ts) - epoch_us(err.ts)), c_ts
        LIMIT 1) AS nearest_click_ts,
       (SELECT c_id FROM clk
        WHERE clk.user_id = err.user_id
          AND abs(epoch_us(c_ts) - epoch_us(err.ts)) <= 3600000000
        ORDER BY abs(epoch_us(c_ts) - epoch_us(err.ts)), c_ts
        LIMIT 1) AS nearest_click_event
FROM err ORDER BY err.event_id
"""

RELATIONAL_QUERIES["join_asof_nearest"] = (
    q_asof_nearest,
    SQL_ASOF_NEAREST,
)


def q_scd2_fact_temporal_join(spark: SparkSession, sf: str) -> DataFrame:
    """Fact-to-SCD2 temporal join (r12) — THE canonical warehouse
    query the dimension exists for: every lineitem matched to the dim
    version that was valid AT ITS SHIP DATE (not a fixed as-of
    timestamp like scd2_as_of — a per-row event time). "What did we
    believe about this order when the item actually shipped?"

    Scale shape: the union+window as-of technique (operators/asof.py)
    — ONE shuffle on the order key, no interval-predicate join
    explosion; at 100 TB the fact never cross-products its key group.
    The oracle is the INDEPENDENT formulation — a half-open interval
    join against the dim timeline — so the hash equality cross-checks
    the as-of algorithm against interval semantics (non-overlap is
    separately pinned by scd2_interval_integrity)."""
    from cdc_historical_warehouse_platform_spark.plans.reference_queries import build_dim

    li = load_table(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("order_key"),
        "l_linenumber",
        F.col("l_shipdate").cast("timestamp").alias("ship_ts"),
    )
    dim = build_dim(spark, sf).select(
        "order_key",
        "valid_from",
        F.col("order_status").alias("status_at_ship"),
        F.col("quantity").alias("quantity_at_ship"),
    )
    out = asof_join(
        li,
        dim,
        on="order_key",
        left_ts="ship_ts",
        right_ts="valid_from",
        right_payload=["status_at_ship", "quantity_at_ship"],
    )
    return out.select(
        "order_key",
        "l_linenumber",
        "ship_ts",
        "asof_status_at_ship",
        "asof_quantity_at_ship",
    ).orderBy("order_key", "l_linenumber")


SQL_FACT_TEMPORAL_JOIN = f"""
SELECT l.l_orderkey AS order_key,
       l.l_linenumber,
       CAST(l.l_shipdate AS TIMESTAMP) AS ship_ts,
       d.order_status AS asof_status_at_ship,
       d.quantity AS asof_quantity_at_ship
FROM lineitem l
LEFT JOIN ({_DIM_SQL}) d
  ON d.order_key = l.l_orderkey
 AND d.valid_from <= CAST(l.l_shipdate AS TIMESTAMP)
 AND (d.valid_to IS NULL OR CAST(l.l_shipdate AS TIMESTAMP) < d.valid_to)
ORDER BY 1, 2
"""

RELATIONAL_QUERIES["scd2_fact_temporal_join"] = (
    q_scd2_fact_temporal_join,
    SQL_FACT_TEMPORAL_JOIN,
)
