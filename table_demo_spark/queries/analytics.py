"""Analytic / conformance queries beyond the reference's own surface.

SURVEY §2.3's negative space: the reference has no joins, sorts, limits,
set ops, rollups, distinct aggs, or session windows — Spark SQL gives us
all of them, but the engine must DECLARE and test them (SURVEY §2.3
note). Each query here exercises one family, styled after TPC-H, over
the driver fixtures.

Correctness discipline for float aggregates: sums are computed over
exact DECIMAL casts (a double is never exactly half-way between two
2-decimal values, so double->decimal(18,2) is unambiguous and identical
across engines), then surfaced as DOUBLE — so Spark's parallel partial
aggregation and DuckDB's sequential scan produce bit-identical results
regardless of summation order.

Scale notes (100 TB):
- dimension joins (region/nation/customer/supplier) are explicitly
  ``broadcast()`` — no shuffle of the fact table on the dim key.
- fact-fact joins (orders x lineitem) hash-shuffle on the join key once;
  AQE handles skew. With bucketed storage they become shuffle-free.
- top-k uses Spark's TakeOrderedAndProject (per-partition heap + driver
  merge of k rows), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from table_demo_spark.queries import Query
from table_demo_spark.queries.reference import _RIDES_CTE, SQL_IN_NYC
from table_demo_spark.sources.batch import load_table, rides_view


def _dec(col: str, prec: int = 18, scale: int = 2) -> F.Column:
    return F.col(col).cast(f"decimal({prec},{scale})")


# ---------------------------------------------------------------------------
# A1 — pricing summary (scan + filter + group agg; TPC-H Q1 family).
# ---------------------------------------------------------------------------
def a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(18,2)") + _dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn("avg_qty", F.col("sum_qty") / F.col("count_order"))
        .withColumn("avg_price", F.col("sum_base_price") / F.col("count_order"))
    )


A1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
    AS sum_disc_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
           * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)
    AS sum_charge,
  count(*) AS count_order,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# A2 — revenue per nation/region (star join; broadcast dimensions).
# ---------------------------------------------------------------------------
def a2_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        # dims are tiny at any scale factor -> broadcast, no fact shuffle
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


A2_ORACLE = """
SELECT
  r_name,
  n_name,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# ---------------------------------------------------------------------------
# A3 — top-k (sort + limit => TakeOrderedAndProject, no global sort).
# ---------------------------------------------------------------------------
def a3_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(_dec("o_totalprice")).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(10)
    )


A3_ORACLE = """
SELECT c_custkey, c_name,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# A4 — grouping sets / rollup with multiple aggregates.
# ---------------------------------------------------------------------------
def a4_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .rollup("c_mktsegment", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
        )
    )


A4_ORACLE = """
SELECT c_mktsegment, o_orderpriority, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY ROLLUP (c_mktsegment, o_orderpriority)
"""


# ---------------------------------------------------------------------------
# A5 — semi join (EXISTS): orders having any heavy lineitem.
# ---------------------------------------------------------------------------
def a5_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    heavy = li.filter(F.col("l_quantity") >= 48).select("l_orderkey")
    return (
        orders.join(heavy, orders.o_orderkey == heavy.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


A5_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# A6 — anti join + set op (EXCEPT): customers with no 'F' order.
# ---------------------------------------------------------------------------
def a6_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    all_c = customer.select(F.col("c_custkey").alias("custkey"))
    with_f = (
        orders.filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return all_c.exceptAll(with_f.distinct()).distinct()


A6_ORACLE = """
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
"""


# ---------------------------------------------------------------------------
# A7 — analytic row-window: top-3 customers by balance per nation.
# ---------------------------------------------------------------------------
def a7_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        customer.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


A7_ORACLE = """
SELECT * FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
  FROM customer
)
WHERE rnk <= 3
"""


# ---------------------------------------------------------------------------
# A8 — distinct aggregation.
# ---------------------------------------------------------------------------
def a8_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


A8_ORACLE = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# A9 — interval (range-predicate) join: lineitems shipped within 30 days
# of their order date.
# ---------------------------------------------------------------------------
def a9_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (
            F.unix_millis("l_shipdate")
            <= F.unix_millis("o_orderdate") + F.lit(30 * 86_400_000)
        )
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_fast_items")
    )


A9_ORACLE = """
SELECT o_orderpriority, count(*) AS n_fast_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate
  AND epoch_ms(l_shipdate) <= epoch_ms(o_orderdate) + CAST(2592000000 AS BIGINT)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# A10 — session windows over the event stream (gap-based sessionization).
# ---------------------------------------------------------------------------
SESSION_GAP = "30 minutes"
SESSION_GAP_MS = 30 * 60_000


def a10_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", SESSION_GAP).alias("s"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_millis(F.col("s.start")).alias("session_start"),
            "n_events",
        )
    )


# Oracle: classic gap-and-island sessionization — a new session starts
# when the gap to the previous event (per user) is >= the session gap,
# which is exactly Spark's session_window merge rule (an event extends
# the session iff it lands strictly inside [start, last+gap)).
A10_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER w) >= {SESSION_GAP_MS}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
)
SELECT user_id, epoch_ms(min(ts)) AS session_start, count(*) AS n_events
FROM sessions
GROUP BY user_id, session_no
"""


# ---------------------------------------------------------------------------
# A11 — semi-structured extraction from the JSON-ish props column.
# ---------------------------------------------------------------------------
def a11_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"), "value")
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count(F.lit(1)).alias("n"),
            F.max("k").alias("max_k"),
        )
    )


A11_ORACLE = """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       count(*) AS n,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# A12 — as-of join: each purchase event looks up the user's most recent
# click at-or-before it (operators/asof.py — single-shuffle union-and-
# carry implementation; oracle uses DuckDB's native ASOF JOIN).
# ---------------------------------------------------------------------------
def a12_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    # dedup right-side ties on (user, ts): deterministic winner = max id
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .select("user_id", F.col("ts").alias("c_ts"), "click_id")
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="p_ts",
        right_ts="c_ts",
        value_cols=["click_id", "c_ts"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_millis("p_ts").alias("purchase_ms"),
        F.coalesce(F.col("click_id_asof"), F.lit(-1)).alias("click_id"),
        F.coalesce(F.unix_millis("c_ts_asof"), F.lit(-1)).alias("click_ms"),
    )


A12_ORACLE = """
WITH purchases AS (
  SELECT event_id, user_id, ts AS p_ts FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, ts AS c_ts, max(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
)
SELECT p.event_id,
       p.user_id,
       epoch_ms(p.p_ts) AS purchase_ms,
       COALESCE(c.click_id, -1) AS click_id,
       COALESCE(epoch_ms(c.c_ts), -1) AS click_ms
FROM purchases p
ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.p_ts >= c.c_ts
"""


# ---------------------------------------------------------------------------
# A13 — skew-safe salted aggregation (operators/skew.py): identical
# semantics to a plain GROUP BY — the oracle IS the plain GROUP BY —
# but executed as per-partition partials + merge, so one hot key can't
# serialize the reduce stage at scale.
# ---------------------------------------------------------------------------
def a13_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        keys=["event_type"],
        sum_cols=["value"],
        count_alias="n",
        max_cols=["value"],
    )
    return out.select(
        "event_type",
        "n",
        F.round(F.col("sum_value"), 6).alias("sum_value"),
        F.round(F.col("max_value"), 6).alias("max_value"),
    )


A13_ORACLE = """
SELECT event_type,
       count(*) AS n,
       round(CAST(sum(value) AS DOUBLE), 6) AS sum_value,
       round(CAST(max(value) AS DOUBLE), 6) AS max_value
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# A14 — CUBE grouping sets (all 2^k subtotal combinations).
# ---------------------------------------------------------------------------
def a14_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("dow", F.dayofweek("ts"))
        .cube("event_type", "dow")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value").cast("double"), 6).alias("sum_value"),
        )
    )


A14_ORACLE = """
SELECT event_type, dow, count(*) AS n,
       round(CAST(sum(value) AS DOUBLE), 6) AS sum_value
FROM (SELECT event_type, dayofweek(ts) + 1 AS dow, value FROM events)
GROUP BY CUBE (event_type, dow)
"""


# ---------------------------------------------------------------------------
# A15 — sliding (hopping) event-time windows: width 2 days, slide 1 day
# (each event lands in exactly 2 windows). The reference has only
# tumble + over windows; sliding windows complete the window family.
# ---------------------------------------------------------------------------
def a15_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 days", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_millis(F.col("w.start")).alias("win_start"), "n")
    )


_DAY = 86_400_000
A15_ORACLE = f"""
SELECT ws AS win_start, count(*) AS n
FROM (
  SELECT (epoch_ms(ts) // {_DAY} - off) * {_DAY} AS ws
  FROM events, (SELECT unnest([0, 1]) AS off)
)
GROUP BY ws
"""


# ---------------------------------------------------------------------------
# A16 — string-predicate scan pruning over part (LIKE / prefix filters
# push into the parquet scan as StartsWith/Contains).
# ---------------------------------------------------------------------------
def a16_part_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(
            F.col("p_type").startswith("SMALL") | F.col("p_name").contains("blue")
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 6).alias("avg_price"),
        )
    )


A16_ORACLE = """
SELECT p_brand, count(*) AS n_parts,
       round(avg(p_retailprice), 6) AS avg_price
FROM part
WHERE p_type LIKE 'SMALL%' OR p_name LIKE '%blue%'
GROUP BY p_brand
"""


# ---------------------------------------------------------------------------
# A17 — anti join: customers that never placed an order.
# ---------------------------------------------------------------------------
def a17_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers that never placed a high-value order (left anti join)."""
    customer = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400_000
    )
    return (
        customer.join(big, customer.c_custkey == big.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_idle_customers"))
    )


A17_ORACLE = """
SELECT c_mktsegment, count(*) AS n_idle_customers
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > CAST(400000 AS DOUBLE))
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# A18 — full outer join: suppliers vs customers per nation.
# ---------------------------------------------------------------------------
def a18_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    sup = supplier.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    cust = customer.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    return sup.join(
        cust, sup.s_nationkey == cust.c_nationkey, "full_outer"
    ).select(
        F.coalesce("s_nationkey", "c_nationkey").alias("nationkey"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
    )


A18_ORACLE = """
WITH sup AS (SELECT s_nationkey, count(*) AS n_suppliers FROM supplier GROUP BY 1),
cust AS (SELECT c_nationkey, count(*) AS n_customers FROM customer GROUP BY 1)
SELECT COALESCE(s_nationkey, c_nationkey) AS nationkey,
       COALESCE(n_suppliers, 0) AS n_suppliers,
       COALESCE(n_customers, 0) AS n_customers
FROM sup FULL OUTER JOIN cust ON s_nationkey = c_nationkey
"""


# ---------------------------------------------------------------------------
# A19 — exact percentiles (median / p95, linear interpolation).
# ---------------------------------------------------------------------------
def a19_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.95)), 6).alias("p95"),
        F.count(F.lit(1)).alias("n"),
    )


A19_ORACLE = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
       round(quantile_cont(o_totalprice, 0.95), 6) AS p95,
       count(*) AS n
FROM orders
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# A20 — pivot (orderpriority x orderstatus revenue matrix).
#
# Spark compiles pivot to a single partial-aggregating hash aggregate
# with one conditional sum per pivot value — one shuffle on the
# grouping key, same shape as the hand-written conditional aggregation
# the oracle spells out. Pivot values are enumerated explicitly: at
# 100 TB an implicit pivot would need an extra distinct pass first.
# ---------------------------------------------------------------------------
def a20_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(_dec("o_totalprice")).cast("double"))
    )
    return out.select(
        "o_orderpriority",
        F.col("F").alias("rev_f"),
        F.col("O").alias("rev_o"),
        F.col("P").alias("rev_p"),
    )


A20_ORACLE = """
SELECT
  o_orderpriority,
  CAST(sum(CASE WHEN o_orderstatus = 'F'
                THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_f,
  CAST(sum(CASE WHEN o_orderstatus = 'O'
                THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_o,
  CAST(sum(CASE WHEN o_orderstatus = 'P'
                THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_p
FROM orders
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# A21 — correlated scalar subquery (SQL dialect).
#
# Catalyst de-correlates the subquery into an aggregate + join
# (RewriteCorrelatedScalarSubquery), so the executed plan is a
# shuffle-once aggregate joined back to the fact — no per-row
# re-execution, which is what makes the construct usable at scale.
# max() is order-independent, so the filter threshold is exact.
# ---------------------------------------------------------------------------
A21_SQL = """
SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS price
FROM orders o
WHERE o_totalprice >= (
  SELECT max(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
)
"""


def a21_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.sources.batch import register_tables

    register_tables(spark, sf_dir)
    return spark.sql(A21_SQL)


A21_ORACLE = A21_SQL


# ---------------------------------------------------------------------------
# A22 — lag over event-time (per-user inter-event gaps).
#
# lag() needs a per-key sort: one hash shuffle on user_id, in-partition
# sort (spillable). Gap arithmetic stays in epoch-ms integers, so the
# per-user gap aggregates are exact under any evaluation order.
# ---------------------------------------------------------------------------
def a22_lag_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
    )
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    gaps = ev.select(
        "user_id", (F.col("ms") - F.lag("ms").over(w)).alias("gap_ms")
    )
    return gaps.groupBy("user_id").agg(
        # first event's gap is NULL -> non-null gaps = n_events - 1
        (F.count("gap_ms") + 1).alias("n_events"),
        F.sum("gap_ms").alias("span_ms"),
        F.max("gap_ms").alias("max_gap_ms"),
    )


A22_ORACLE = """
WITH g AS (
  SELECT user_id,
         epoch_ms(ts) - lag(epoch_ms(ts))
           OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS gap_ms
  FROM events
)
SELECT user_id,
       CAST(count(gap_ms) + 1 AS BIGINT) AS n_events,
       CAST(sum(gap_ms) AS BIGINT) AS span_ms,
       max(gap_ms) AS max_gap_ms
FROM g
GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# A23 — market share (TPC-H Q8 shape): a six-table snowflake join with
# a ratio-to-total window on top. The join graph is the optimizer
# showcase: nation/region are broadcast (never shuffle the fact),
# supplier joins as a plain equi-join — at 100 TB supplier is
# millions of rows, not broadcastable, and AQE may still pick a
# broadcast at small SFs. The share divides per-(year, nation) volume
# by the year total via a window over the tiny aggregated result.
# ---------------------------------------------------------------------------
def a23_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    n1 = nation.alias("n1")
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    vol = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), customer.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(region), F.col("n1.n_regionkey") == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n2), supplier.s_nationkey == F.col("s_nkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            "supp_nation",
            (
                _dec("l_extendedprice")
                * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
            ).alias("v"),
        )
    )
    agg = vol.groupBy("o_year", "supp_nation").agg(
        F.sum("v").cast("double").alias("volume")
    )
    w = Window.partitionBy("o_year")
    # round(6): the year-total is a float sum whose addition order is
    # engine/partitioning-dependent — the ratio agrees only to ~1 ulp.
    return agg.withColumn(
        "mkt_share", F.round(F.col("volume") / F.sum("volume").over(w), 6)
    )


A23_ORACLE = """
WITH vol AS (
  SELECT year(o_orderdate) AS o_year, n2.n_name AS supp_nation,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS v
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
),
agg AS (
  SELECT o_year, supp_nation, CAST(sum(v) AS DOUBLE) AS volume
  FROM vol GROUP BY o_year, supp_nation
)
SELECT CAST(o_year AS BIGINT) AS o_year, supp_nation, volume,
       round(volume / sum(volume) OVER (PARTITION BY o_year), 6) AS mkt_share
FROM agg
"""


# ---------------------------------------------------------------------------
# A24 — explicit GROUPING SETS (SQL dialect): non-hierarchical grouping
# combinations that neither ROLLUP (a4) nor CUBE (a14) expresses, plus
# grouping() indicators to disambiguate real NULLs from grouped-out
# columns. Executes as one pass with an Expand node — not a UNION of
# re-scans, which is the difference at 100 TB.
# ---------------------------------------------------------------------------
def a24_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_a24")  # idempotent re-register
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
               CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM orders_a24
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


A24_ORACLE = """
SELECT o_orderpriority, o_orderstatus,
       CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
       CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
"""


# ---------------------------------------------------------------------------
# A25 — min-cost supplier (TPC-H Q2 shape, partsupp-free): for each
# STANDARD part, the EUROPE supplier(s) with the lowest observed unit
# price. The classic formulation is a correlated `= (SELECT min(...))`;
# the Spark-first plan replaces the self-join decorrelation with a
# window-min over the part key — ONE hash shuffle on p_partkey instead
# of two scans + a join. Equality on the double unit price is safe:
# both sides derive it from the same rows with one division, and min()
# selects an exact member of that set.
# ---------------------------------------------------------------------------
def a25_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    costs = (
        li.join(
            # part is a dimension: broadcast, and the p_type filter
            # prunes it before the join at any scale factor
            F.broadcast(part.filter(F.col("p_type") == "STANDARD")),
            li.l_partkey == part.p_partkey,
        )
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"),
        )
    )
    w = Window.partitionBy("p_partkey")
    return (
        costs.withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .select("p_partkey", "p_name", "s_name", "n_name", "unit_cost")
        .distinct()
    )


A25_ORACLE = """
WITH costs AS (
  SELECT p_partkey, p_name, s_name, n_name,
         l_extendedprice / l_quantity AS unit_cost
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_type = 'STANDARD' AND r_name = 'EUROPE'
)
SELECT DISTINCT p_partkey, p_name, s_name, n_name, unit_cost
FROM (
  SELECT *, min(unit_cost) OVER (PARTITION BY p_partkey) AS min_cost
  FROM costs
)
WHERE unit_cost = min_cost
"""


# ---------------------------------------------------------------------------
# A26 — conditional aggregation (SQL FILTER clause): several
# differently-filtered aggregates in ONE scan + ONE shuffle, instead of
# N filtered subqueries UNION'd back together — the difference between
# one pass and N passes over 100 TB.
# ---------------------------------------------------------------------------
def a26_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_a26")  # idempotent re-register
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_orders,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
               count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                    FILTER (WHERE o_orderstatus = 'F') AS DOUBLE)
                 AS finished_revenue,
               CAST(max(o_totalprice) FILTER (WHERE o_orderstatus = 'O')
                    AS DOUBLE) AS max_open_price
        FROM orders_a26
        GROUP BY o_orderpriority
        """
    )


A26_ORACLE = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
            FILTER (WHERE o_orderstatus = 'F') AS DOUBLE)
         AS finished_revenue,
       CAST(max(o_totalprice) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE)
         AS max_open_price
FROM orders
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# A27 — distribution window functions (ntile / percent_rank /
# cume_dist) folded to a decile summary. The order key is
# (o_totalprice, o_orderkey): the unique tiebreaker makes ntile's
# row-numbering — and therefore the whole result — deterministic across
# engines and partitionings. One shuffle on the partition key, then a
# per-group summary keeps the declared output small.
# ---------------------------------------------------------------------------
def a27_distribution_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    ranked = orders.select(
        "o_orderpriority",
        "o_totalprice",
        F.ntile(10).over(w).cast("long").alias("decile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return ranked.groupBy("o_orderpriority", "decile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("lo_price"),
        F.max("o_totalprice").alias("hi_price"),
        F.max("pr").alias("max_percent_rank"),
        F.max("cd").alias("max_cume_dist"),
    )


A27_ORACLE = """
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
         ntile(10) OVER w AS decile,
         percent_rank() OVER w AS pr,
         cume_dist() OVER w AS cd
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey)
)
SELECT o_orderpriority, decile,
       count(*) AS n_orders,
       min(o_totalprice) AS lo_price,
       max(o_totalprice) AS hi_price,
       max(pr) AS max_percent_rank,
       max(cd) AS max_cume_dist
FROM ranked
GROUP BY o_orderpriority, decile
"""


# ---------------------------------------------------------------------------
# A28 — unpivot (wide -> long): melt a per-flag aggregate's measure
# columns into (measure, value) rows with the native Expand-based
# `DataFrame.unpivot` — one pass, no re-scan per measure. The oracle
# spells the same reshape as a standard UNION ALL (the portable form).
# ---------------------------------------------------------------------------
def a28_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("sum_price"),
        F.count(F.lit(1)).cast("double").alias("n_items"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "n_items"],
        variableColumnName="measure",
        valueColumnName="value",
    )


A28_ORACLE = """
WITH wide AS (
  SELECT l_returnflag,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
         CAST(count(*) AS DOUBLE) AS n_items
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM wide
UNION ALL
SELECT l_returnflag, 'sum_price' AS measure, sum_price AS value FROM wide
UNION ALL
SELECT l_returnflag, 'n_items' AS measure, n_items AS value FROM wide
"""


# ---------------------------------------------------------------------------
# A29 — shuffle-free fact-fact join via bucketed storage: orders and
# lineitem are materialized hash-clustered on the order key into the
# same bucket count, then joined WITHOUT either side shuffling — the
# plan is a per-bucket merge (zero Exchange; pinned in
# tests/test_plans.py). This is the declared 100 TB answer to the one
# plan shape AQE can't fix: two fact tables meeting on a key. The
# result aggregates revenue per order priority, so the oracle is the
# plain (layout-independent) join — bucketing must change the plan,
# never the answer.
# ---------------------------------------------------------------------------
def a29_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.sources.bucketed import bucketed_pair

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    bo, bl = bucketed_pair(
        spark, sf_dir,
        orders, "orders_bkt", "o_orderkey",
        li, "lineitem_bkt", "l_orderkey",
    )
    joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("revenue"),
    )


A29_ORACLE = """
SELECT o_orderpriority,
       count(*) AS n_items,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# A30 — ordered array aggregation (string_agg / array_agg ORDER BY):
# top-3 order keys per customer by spend, serialized deterministically.
# collect_list has no intra-group order guarantee under parallel
# aggregation, so the engine imposes it structurally: collect structs
# keyed by the window rank, array_sort (rank is unique per group),
# then project + join — order-stable at any partitioning. Keys
# serialize as longs (float formatting never enters the output).
# ---------------------------------------------------------------------------
def a30_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    top = orders.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
    return top.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_top"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "o_orderkey"))),
                lambda s: s.o_orderkey.cast("string"),
            ),
            ",",
        ).alias("top_keys"),
    )


A30_ORACLE = """
WITH ranked AS (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
SELECT o_custkey,
       CAST(count(*) AS BIGINT) AS n_top,
       string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY rn) AS top_keys
FROM ranked
WHERE rn <= 3
GROUP BY o_custkey
"""


# ---------------------------------------------------------------------------
# A31 — batch MERGE INTO (key-based upsert/delete of a changeset):
# open orders get a 100.00 price adjustment (update), '5-LOW' priority
# orders are removed (delete), and a shifted-key copy of 'F'-status
# orders arrives as fresh inserts — one full-outer hash join, struct-
# atomic row replacement (operators/merge.py).
# ---------------------------------------------------------------------------
_A31_KEY_SHIFT = 10_000_000


def a31_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.operators.merge import merge_into

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    # ops are disjoint per key (delete wins): a changeset must carry at
    # most one row per key or the merge join fans out
    updates = orders.filter(
        (F.col("o_orderstatus") == "O") & (F.col("o_orderpriority") != "5-LOW")
    ).withColumn("o_totalprice", F.col("o_totalprice") + F.lit(100.0))
    deletes = orders.filter(F.col("o_orderpriority") == "5-LOW")
    inserts = orders.filter(F.col("o_orderstatus") == "F").withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(_A31_KEY_SHIFT)
    )
    source = (
        updates.withColumn("__op", F.lit("U"))
        .unionByName(inserts.withColumn("__op", F.lit("U")))
        .unionByName(deletes.withColumn("__op", F.lit("D")))
    )
    return merge_into(orders, source, ["o_orderkey"])


A31_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
  FROM orders
),
src AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         o_totalprice + CAST(100.0 AS DOUBLE) AS o_totalprice,
         o_orderpriority, 'U' AS op
  FROM base WHERE o_orderstatus = 'O' AND o_orderpriority <> '5-LOW'
  UNION ALL
  SELECT o_orderkey + {_A31_KEY_SHIFT}, o_custkey, o_orderstatus,
         o_totalprice, o_orderpriority, 'U' AS op
  FROM base WHERE o_orderstatus = 'F'
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         o_orderpriority, 'D' AS op
  FROM base WHERE o_orderpriority = '5-LOW'
)
SELECT
  coalesce(t.o_orderkey, s.o_orderkey) AS o_orderkey,
  CASE WHEN s.op IS NOT NULL THEN s.o_custkey ELSE t.o_custkey END
    AS o_custkey,
  CASE WHEN s.op IS NOT NULL THEN s.o_orderstatus ELSE t.o_orderstatus END
    AS o_orderstatus,
  CASE WHEN s.op IS NOT NULL THEN s.o_totalprice ELSE t.o_totalprice END
    AS o_totalprice,
  CASE WHEN s.op IS NOT NULL THEN s.o_orderpriority ELSE t.o_orderpriority END
    AS o_orderpriority
FROM base t FULL OUTER JOIN src s USING (o_orderkey)
WHERE s.op IS NULL OR s.op <> 'D'
"""


# ---------------------------------------------------------------------------
# A32 — changelog materialization (CDC fold to current state): a
# three-version synthetic CDC feed over orders — v1 inserts every key,
# v2 updates open orders' price, v3 deletes the '5-LOW' keys — folded
# with operators/cdc.materialize_changelog. Unlike A31 (one changeset,
# unique keys), keys here repeat across versions and the latest op must
# win; the fold is a max_by aggregation (map-side combined), not a
# window sort. Reference semantics: ElasticUpsertTableSink.scala:116-148
# applied as one batch.
# ---------------------------------------------------------------------------
def _cdc_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared synthetic CDC feed over orders (v1 insert / v2 update
    open orders / v3 delete 'P'-status) used by a32 and a36."""
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    v1 = base.select(
        "o_orderkey",
        F.lit(1).cast("long").alias("version"),
        F.lit("I").alias("op"),
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
    )
    v2 = (
        base.filter(F.col("o_orderstatus") == "O")
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(10.0))
        .select(
            "o_orderkey",
            F.lit(2).cast("long").alias("version"),
            F.lit("U").alias("op"),
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
        )
    )
    v3 = base.filter(F.col("o_orderstatus") == "P").select(
        "o_orderkey",
        F.lit(3).cast("long").alias("version"),
        F.lit("D").alias("op"),
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
    )
    return v1.unionByName(v2).unionByName(v3)


def a32_cdc_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.operators.cdc import materialize_changelog

    return materialize_changelog(_cdc_changelog(spark, sf_dir), ["o_orderkey"])


_CDC_CHANGELOG_CTE = """changelog AS (
  SELECT o_orderkey, CAST(1 AS BIGINT) AS version, 'I' AS op,
         o_custkey, o_orderstatus, o_totalprice
  FROM orders
  UNION ALL
  SELECT o_orderkey, CAST(2 AS BIGINT), 'U',
         o_custkey, o_orderstatus, o_totalprice + CAST(10.0 AS DOUBLE)
  FROM orders WHERE o_orderstatus = 'O'
  UNION ALL
  SELECT o_orderkey, CAST(3 AS BIGINT), 'D',
         o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderstatus = 'P'
)"""


A32_ORACLE = f"""
WITH {_CDC_CHANGELOG_CTE},
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderkey
                               ORDER BY version DESC) AS rn
  FROM changelog
)
SELECT o_orderkey, version, o_custkey, o_orderstatus, o_totalprice
FROM ranked WHERE rn = 1 AND op <> 'D'
"""


# ---------------------------------------------------------------------------
# A33 — histogram quantile estimation: equi-width histogram (bucket =
# floor(price/1000)) per return flag, then p50/p95/p99 by linear
# interpolation inside the straddling bucket. This is the 100 TB
# quantile strategy: ONE map-side-combined groupBy builds the histogram
# (shuffled bytes = O(#groups x #buckets), ~100 rows/group), and the
# window/interpolation runs over that tiny table. Contrast an_a19,
# which uses exact percentile_approx — this shape is fully mergeable
# and deterministic, the property a19's sketch gives up.
# ---------------------------------------------------------------------------
_A33_W = 1000.0  # bucket width in price units


def a33_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    hist = li.groupBy(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") / F.lit(_A33_W)).alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("l_returnflag").orderBy("bucket")
    cum = (
        hist.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("cum_prev", F.col("cum") - F.col("cnt"))
        .withColumn("n", F.sum("cnt").over(Window.partitionBy("l_returnflag")))
    )

    def est(q: float) -> F.Column:
        rank = F.lit(q) * F.col("n")
        interp = F.col("bucket") * F.lit(_A33_W) + F.lit(_A33_W) * (
            rank - F.col("cum_prev")
        ) / F.col("cnt")
        return F.min(
            F.when(F.col("cum") >= rank, F.struct("bucket", interp.alias("e")))
        )["e"]

    return cum.groupBy("l_returnflag").agg(
        est(0.5).alias("p50_est"),
        est(0.95).alias("p95_est"),
        est(0.99).alias("p99_est"),
    )


A33_ORACLE = """
WITH hist AS (
  SELECT l_returnflag,
         CAST(floor(l_extendedprice / CAST(1000.0 AS DOUBLE)) AS BIGINT)
           AS bucket,
         count(*) AS cnt
  FROM lineitem GROUP BY 1, 2
),
cum AS (
  SELECT *,
         sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY bucket) AS cum,
         sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY bucket) - cnt
           AS cum_prev,
         sum(cnt) OVER (PARTITION BY l_returnflag) AS n
  FROM hist
),
est AS (
  SELECT l_returnflag, bucket, cnt, cum, cum_prev, n,
         bucket * CAST(1000.0 AS DOUBLE)
           + CAST(1000.0 AS DOUBLE)
             * (CAST(0.5 AS DOUBLE) * n - cum_prev) / cnt AS e50,
         bucket * CAST(1000.0 AS DOUBLE)
           + CAST(1000.0 AS DOUBLE)
             * (CAST(0.95 AS DOUBLE) * n - cum_prev) / cnt AS e95,
         bucket * CAST(1000.0 AS DOUBLE)
           + CAST(1000.0 AS DOUBLE)
             * (CAST(0.99 AS DOUBLE) * n - cum_prev) / cnt AS e99
  FROM cum
)
SELECT l_returnflag,
       min(CASE WHEN cum >= CAST(0.5 AS DOUBLE) * n
                THEN struct_pack(bucket := bucket, e := e50) END).e
         AS p50_est,
       min(CASE WHEN cum >= CAST(0.95 AS DOUBLE) * n
                THEN struct_pack(bucket := bucket, e := e95) END).e
         AS p95_est,
       min(CASE WHEN cum >= CAST(0.99 AS DOUBLE) * n
                THEN struct_pack(bucket := bucket, e := e99) END).e
         AS p99_est
FROM est GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# A34 — z-order clustered storage + 2-d box predicate: events are
# rewritten clustered by the Morton key of (user_id, value)
# (operators/layout.py), then a two-dimensional range filter reads the
# copy. Correctness: layout changes must never change content — the
# result equals the same filter over the raw table. The skipping
# payoff (row groups whose min/max exclude the box are never read) is
# pinned by tests/test_operators.py::test_zorder_write_prunes_row_groups.
# ---------------------------------------------------------------------------
_A34_BOX = dict(u_lo=40, u_hi=60, v_lo=100.0, v_hi=200.0)


def a34_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from table_demo_spark.operators.layout import zorder_write

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    path = tempfile.mkdtemp(prefix="tds-zorder-") + "/events"
    zorder_write(
        ev, path, "user_id", "value", x_range=(0, 150), y_range=(0, 500)
    )
    b = _A34_BOX
    back = spark.read.parquet(path).filter(
        F.col("user_id").between(b["u_lo"], b["u_hi"])
        & F.col("value").between(b["v_lo"], b["v_hi"])
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(_dec("value")).cast("double").alias("sum_value"),
    )


A34_ORACLE = f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
WHERE user_id BETWEEN {_A34_BOX["u_lo"]} AND {_A34_BOX["u_hi"]}
  AND value BETWEEN CAST({_A34_BOX["v_lo"]} AS DOUBLE)
                AND CAST({_A34_BOX["v_hi"]} AS DOUBLE)
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# A35 — conversion funnel (event-sequence analytics): for every signup,
# did a click by the same user precede it within 1 hour? The funnel
# predicate is a conditional carry-forward — last(click_ts ignorenulls)
# over the user's event sequence — which is the scalable form of
# sequence matching: one window over one shuffle on user_id, no
# self-join of events to events, no per-user collect. Daily rollup of
# signup count, conversions, and rate.
# ---------------------------------------------------------------------------
_A35_WINDOW_MS = 3_600_000
_A35_DAY_MS = 86_400_000


def a35_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        "event_type",
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    last_click = F.last(
        F.when(F.col("event_type") == "click", F.col("ts_ms")),
        ignorenulls=True,
    ).over(w)
    signups = (
        ev.withColumn("last_click_ms", last_click)
        .filter(F.col("event_type") == "signup")
        .select(
            F.floor(F.col("ts_ms") / F.lit(_A35_DAY_MS)).alias("day"),
            (
                F.col("last_click_ms").isNotNull()
                & (F.col("ts_ms") - F.col("last_click_ms") <= _A35_WINDOW_MS)
            ).alias("converted"),
        )
    )
    return signups.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_signups"),
        F.sum(F.when(F.col("converted"), 1).otherwise(0))
        .cast("long")
        .alias("n_converted"),
        (
            F.sum(F.when(F.col("converted"), 1).otherwise(0))
            / F.count(F.lit(1))
        ).alias("conv_rate"),
    )


A35_ORACLE = f"""
WITH ev AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms, event_type, event_id FROM events
),
flagged AS (
  SELECT *,
         last_value(CASE WHEN event_type = 'click' THEN ts_ms END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                 ROWS UNBOUNDED PRECEDING) AS last_click_ms
  FROM ev
),
signups AS (
  SELECT CAST(floor(ts_ms / {_A35_DAY_MS}) AS BIGINT) AS day,
         (last_click_ms IS NOT NULL
          AND ts_ms - last_click_ms <= {_A35_WINDOW_MS}) AS converted
  FROM flagged WHERE event_type = 'signup'
)
SELECT day,
       CAST(count(*) AS BIGINT) AS n_signups,
       CAST(sum(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT)
         AS n_converted,
       CAST(sum(CASE WHEN converted THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
         AS conv_rate
FROM signups GROUP BY day
"""


# ---------------------------------------------------------------------------
# A36 — SCD Type 2 history build (operators/cdc.scd2_history): the
# same CDC feed as A32 folded the *other* way — every non-delete
# change becomes a versioned row with a validity interval
# [valid_from, valid_to); the open interval is the current row, and a
# trailing delete leaves the key with history but no current row.
# ---------------------------------------------------------------------------
def a36_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.operators.cdc import scd2_history

    return scd2_history(_cdc_changelog(spark, sf_dir), ["o_orderkey"])


A36_ORACLE = f"""
WITH {_CDC_CHANGELOG_CTE},
hist AS (
  SELECT *,
         lead(version) OVER (PARTITION BY o_orderkey ORDER BY version)
           AS valid_to
  FROM changelog
)
SELECT o_orderkey, version AS valid_from, valid_to,
       valid_to IS NULL AS is_current,
       o_custkey, o_orderstatus, o_totalprice
FROM hist WHERE op <> 'D'
"""


# ---------------------------------------------------------------------------
# A37 — date-spine densification via recursive CTE.
#
# Gap-free daily reporting: a WITH RECURSIVE spine generates every day
# of the window, then left-joins the (sparse) daily aggregate, zero-
# filling days with no orders. Spark 4 executes the recursion natively
# (UnionLoop); the recursion is O(#days) driver-side metadata — the
# heavy side (the fact aggregation) stays fully distributed, and the
# 90-row spine joins broadcast. The window stays < the default
# recursion depth limit (100 levels) so the query runs on a vanilla
# session.
# ---------------------------------------------------------------------------
_SPINE_START, _SPINE_END = "1995-01-01", "1995-03-31"


def a37_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(f"""
WITH RECURSIVE spine(day) AS (
  SELECT DATE'{_SPINE_START}'
  UNION ALL
  SELECT date_add(day, 1) FROM spine WHERE day < DATE'{_SPINE_END}'
),
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n_orders,
         sum(o_totalprice) AS revenue
  FROM orders
  WHERE o_orderdate >= TIMESTAMP'{_SPINE_START} 00:00:00'
    AND o_orderdate <= TIMESTAMP'{_SPINE_END} 00:00:00'
  GROUP BY 1
)
SELECT unix_millis(CAST(s.day AS TIMESTAMP)) AS day_ms,
       coalesce(n_orders, CAST(0 AS BIGINT)) AS n_orders,
       coalesce(revenue, CAST(0.0 AS DOUBLE)) AS revenue
FROM spine s LEFT JOIN daily ON s.day = daily.day
""")


A37_ORACLE = f"""
WITH RECURSIVE spine(day) AS (
  SELECT DATE'{_SPINE_START}'
  UNION ALL
  SELECT day + 1 FROM spine WHERE day < DATE'{_SPINE_END}'
),
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n_orders,
         sum(o_totalprice) AS revenue
  FROM orders
  WHERE o_orderdate >= TIMESTAMP'{_SPINE_START} 00:00:00'
    AND o_orderdate <= TIMESTAMP'{_SPINE_END} 00:00:00'
  GROUP BY 1
)
SELECT epoch_ms(CAST(s.day AS TIMESTAMP)) AS day_ms,
       coalesce(n_orders, 0) AS n_orders,
       coalesce(revenue, 0.0) AS revenue
FROM spine s LEFT JOIN daily ON s.day = daily.day
"""


# ---------------------------------------------------------------------------
# A38 — disjunctive multi-predicate scan (TPC-H Q19 shape).
#
# OR-of-AND predicate groups spanning a fact⋈dim join. The plan
# properties that matter at 100 TB: the lineitem-only conjuncts
# (l_quantity ranges) are extracted by Catalyst from the disjunction
# and pushed to the fact scan as a derived filter, part broadcasts
# (200k rows), and the whole residual predicate evaluates inside
# whole-stage codegen — no UDF, no second pass.
# ---------------------------------------------------------------------------
def a38_multi_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    g1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    g2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 35)
    )
    g3 = (F.col("p_type") == "PROMO") & (F.col("l_quantity") >= 40)
    revenue = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    return (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .filter(g1 | g2 | g3)
        .withColumn(
            "match_group",
            F.when(g1, "brand1_small").when(g2, "brand2_mid").otherwise("promo_bulk"),
        )
        .groupBy("match_group")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(revenue).cast("double").alias("revenue"),
        )
    )


A38_ORACLE = """
WITH m AS (
  SELECT CASE
           WHEN p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 1 AND 20 THEN 'brand1_small'
           WHEN p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
                AND l_quantity BETWEEN 10 AND 35 THEN 'brand2_mid'
           WHEN p_type = 'PROMO' AND l_quantity >= 40 THEN 'promo_bulk'
         END AS match_group,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
           AS revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey)
SELECT match_group, count(*) AS n_items,
       CAST(sum(revenue) AS DOUBLE) AS revenue
FROM m WHERE match_group IS NOT NULL
GROUP BY match_group
"""


# ---------------------------------------------------------------------------
# A39 — time-travel snapshot diff over a versioned table.
#
# version 1 = the base orders projection; version 2 = the same table
# after the a31 MERGE changeset. Both snapshots round-trip through a
# VersionedParquetTable (retained version=N directories), then the
# query reads v1 and v2 back BY VERSION and diffs them per status —
# the "what changed between snapshots" audit a lakehouse VERSION AS OF
# exists for. Decimal-cast sums keep the price delta bit-exact at any
# aggregation parallelism.
# ---------------------------------------------------------------------------
def a39_time_travel_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from table_demo_spark.operators.layout import VersionedParquetTable

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    tbl = VersionedParquetTable(tempfile.mkdtemp(prefix="tds-a39-"))
    tbl.write_version(base)
    tbl.write_version(a31_merge_into(spark, sf_dir))

    def _stats(df: DataFrame, n: str, s: str) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias(n),
            F.sum(_dec("o_totalprice")).alias(s),
        )

    v1 = _stats(tbl.read_version(spark, 1), "n_v1", "sum_v1")
    v2 = _stats(tbl.read_version(spark, 2), "n_v2", "sum_v2")
    return (
        v1.join(v2, "o_orderstatus", "full_outer")
        .select(
            "o_orderstatus",
            F.coalesce("n_v1", F.lit(0)).alias("n_v1"),
            F.coalesce("n_v2", F.lit(0)).alias("n_v2"),
            (
                F.coalesce("sum_v2", F.lit(0).cast("decimal(18,2)"))
                - F.coalesce("sum_v1", F.lit(0).cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("price_delta"),
        )
    )


# the merged-state CTE is A31's oracle re-scoped as a named CTE
_A39_MERGED = (
    A31_ORACLE.strip()
    .removeprefix("WITH ")
    .replace(")\nSELECT", "),\nmerged AS (SELECT", 1)
    + ")"
)

A39_ORACLE = f"""
WITH {_A39_MERGED},
v1 AS (
  SELECT o_orderstatus, count(*) AS n_v1,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS sum_v1
  FROM orders GROUP BY 1),
v2 AS (
  SELECT o_orderstatus, count(*) AS n_v2,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS sum_v2
  FROM merged GROUP BY 1)
SELECT coalesce(v1.o_orderstatus, v2.o_orderstatus) AS o_orderstatus,
       coalesce(n_v1, 0) AS n_v1,
       coalesce(n_v2, 0) AS n_v2,
       CAST(coalesce(sum_v2, CAST(0 AS DECIMAL(18,2)))
            - coalesce(sum_v1, CAST(0 AS DECIMAL(18,2))) AS DOUBLE)
         AS price_delta
FROM v1 FULL OUTER JOIN v2 USING (o_orderstatus)
"""


# ---------------------------------------------------------------------------
# A40 — cohort retention.
#
# The classic product-analytics rollup: users are cohorted by their
# first active day; retention counts how many of each cohort are
# active N days later. Two aggregations and one join — the cohort
# frame is one row per user (broadcastable at any realistic user
# count relative to the event fact), and the day index is exact
# integer epoch-day arithmetic, portable to the oracle verbatim.
# ---------------------------------------------------------------------------
def a40_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = (F.unix_millis(F.date_trunc("day", F.col("ts"))) / F.lit(86_400_000)
           ).cast("long")
    active = ev.select("user_id", day.alias("d")).distinct()
    cohort = active.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    return (
        active.join(cohort, "user_id")
        .groupBy(
            "cohort_day", (F.col("d") - F.col("cohort_day")).alias("day_offset")
        )
        .agg(F.count_distinct("user_id").cast("long").alias("n_active"))
    )


A40_ORACLE = """
WITH active AS (
  SELECT DISTINCT user_id,
         epoch_ms(date_trunc('day', ts)) // 86400000 AS d
  FROM events),
cohort AS (
  SELECT user_id, min(d) AS cohort_day FROM active GROUP BY user_id)
SELECT cohort_day, d - cohort_day AS day_offset,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
FROM active JOIN cohort USING (user_id)
GROUP BY cohort_day, day_offset
"""


# ---------------------------------------------------------------------------
# A41 — PageRank over the customer–supplier interaction graph.
#
# Nodes: customers and suppliers; undirected edges wherever a customer
# ordered from a supplier (distinct pairs via orders ⋈ lineitem, both
# directions materialized so no node dangles). Three power iterations
# unrolled into one declarative plan (operators/graph.py); the oracle
# unrolls the identical iterations in SQL, kmeans-style.
# ---------------------------------------------------------------------------
_A41_ITERS = 3
_A41_TOPK = 20


def a41_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.operators.graph import pagerank

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    ranks = pagerank(edges, iters=_A41_ITERS)
    # Distributed top-k (TakeOrderedAndProject), then number the k
    # survivors — the ranking window never sees the O(|V|) frame.
    top = ranks.orderBy(F.col("pr").desc(), F.col("node").asc()).limit(_A41_TOPK)
    w = Window.orderBy(F.col("pr").desc(), F.col("node").asc())
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "node", "pr")
    )


def _a41_oracle() -> str:
    from table_demo_spark.operators.graph import DAMPING, ROUND

    parts = [
        """pairs AS (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS c,
                  's' || CAST(l_suppkey AS VARCHAR) AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
           FROM edges GROUP BY src),
pr0 AS (SELECT node, 1.0 / n AS pr FROM nodes CROSS JOIN nn)"""
    ]
    for i in range(1, _A41_ITERS + 1):
        parts.append(f"""c{i} AS (
  SELECT e.dst, sum(p.pr / o.outdeg) AS c
  FROM edges e JOIN pr{i - 1} p ON e.src = p.node
               JOIN outdeg o ON e.src = o.src
  GROUP BY e.dst),
pr{i} AS (
  SELECT node,
         round(CAST({1.0 - DAMPING} AS DOUBLE) / n
               + CAST({DAMPING} AS DOUBLE) * coalesce(c, 0.0), {ROUND}) AS pr
  FROM nodes CROSS JOIN nn LEFT JOIN c{i} ON node = c{i}.dst)""")
    body = ",\n".join(parts)
    return f"""
WITH {body}
SELECT rank, node, pr FROM (
  SELECT CAST(row_number() OVER (ORDER BY pr DESC, node ASC) AS BIGINT)
           AS rank,
         node, pr
  FROM pr{_A41_ITERS})
WHERE rank <= {_A41_TOPK}
"""


# ---------------------------------------------------------------------------
# A42 — grid-bucketed spatial join (point-in-polygon at scale).
#
# Naive point-in-box over N points x M zones is a cross join; the
# scale shape maps each zone to the taxi grid cells it covers (a few
# thousand cells per zone — a broadcastable dim regardless of point
# count), equi-joins points on their cell id, and runs the exact
# containment check only on cell collisions. Monotonicity of the cell
# function guarantees the enumerated [x_lo..x_hi] x [y_lo..y_hi] cell
# rectangle is a superset of the zone's cells — no false negatives;
# false positives die in the exact verify. Zones may overlap (a point
# counts in each zone containing it).
# ---------------------------------------------------------------------------
_ZONES = [
    # (zone, lon_min, lon_max, lat_min, lat_max)
    ("downtown", -74.02, -73.95, 40.70, 40.78),
    ("midtown", -73.99, -73.90, 40.74, 40.85),
    ("airport", -73.88, -73.80, 40.60, 40.70),
    ("harbor", -74.05, -73.98, 40.55, 40.64),
]


def a42_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.functions.taxi import in_nyc, to_cell_id

    rides = rides_view(spark, sf_dir)
    pts = rides.filter(
        F.col("is_start") & in_nyc("start_lon", "start_lat")
    ).select(
        F.col("start_lon").alias("lon"),
        F.col("start_lat").alias("lat"),
        to_cell_id("start_lon", "start_lat").alias("cell"),
    )
    boxes = spark.createDataFrame(
        _ZONES, "zone string, lon_min double, lon_max double, "
        "lat_min double, lat_max double"
    )
    # zone -> covered cell rectangle (floor of the same grid formula at
    # the box corners; monotone in lon/lat, hence a superset)
    x_of = lambda lon: F.floor((F.lit(74.05) - F.abs(lon)) / F.lit(0.0014))
    y_of = lambda lat: F.floor((F.lit(41.0) - lat) / F.lit(0.00125))
    zone_cells = (
        boxes.select(
            "*",
            F.explode(
                F.sequence(x_of(F.col("lon_min")), x_of(F.col("lon_max")))
            ).alias("x"),
        )
        .select(
            "*",
            F.explode(
                F.sequence(y_of(F.col("lat_max")), y_of(F.col("lat_min")))
            ).alias("y"),
        )
        .select(
            "zone", "lon_min", "lon_max", "lat_min", "lat_max",
            (F.col("x") + F.col("y") * 250).cast("int").alias("cell"),
        )
    )
    hits = (
        pts.join(F.broadcast(zone_cells), "cell")
        .filter(
            F.col("lon").between(F.col("lon_min"), F.col("lon_max"))
            & F.col("lat").between(F.col("lat_min"), F.col("lat_max"))
        )
        .groupBy("zone")
        .agg(F.count(F.lit(1)).cast("long").alias("n_points"))
    )
    return boxes.select("zone").join(hits, "zone", "left").select(
        "zone", F.coalesce("n_points", F.lit(0).cast("long")).alias("n_points")
    )


_A42_VALUES = ", ".join(
    f"('{z}', CAST({a} AS DOUBLE), CAST({b} AS DOUBLE), "
    f"CAST({c} AS DOUBLE), CAST({d} AS DOUBLE))"
    for z, a, b, c, d in _ZONES
)

A42_ORACLE = f"""{_RIDES_CTE},
pts AS (
  SELECT start_lon AS lon, start_lat AS lat
  FROM rides
  WHERE is_start AND {SQL_IN_NYC.format(lon="start_lon", lat="start_lat")}),
boxes AS (
  SELECT * FROM (VALUES {_A42_VALUES})
    AS b(zone, lon_min, lon_max, lat_min, lat_max)),
hits AS (
  SELECT zone, CAST(count(*) AS BIGINT) AS n_points
  FROM pts JOIN boxes
    ON lon BETWEEN lon_min AND lon_max
   AND lat BETWEEN lat_min AND lat_max
  GROUP BY zone)
SELECT b.zone, coalesce(h.n_points, 0) AS n_points
FROM boxes b LEFT JOIN hits h USING (zone)
"""


# ---------------------------------------------------------------------------
# A43 — skyline (Pareto frontier): parts no other part dominates on
# (price min, size max).
#
# The naive formulation is an O(n²) dominance anti-join; the engine
# computes it with ONE sort of the price-reduced frame instead:
#   q dominates p  <=>  (max size at a strictly cheaper price) >= p.size
#                       OR (max size at p's own price) > p.size
# so a per-price max + a running max over prices ascending decides
# membership. Scale shape: hash agg to |distinct prices| rows, one
# window sort over that reduced frame, one equi-join back on price —
# O(n log d) total, no self-join. The oracle states the quadratic
# NOT EXISTS definition, pinning the rewrite's equivalence.
# ---------------------------------------------------------------------------


def a43_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    per_price = part.groupBy("p_retailprice").agg(F.max("p_size").alias("pmax"))
    w = (
        Window.orderBy(F.col("p_retailprice").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lt = per_price.withColumn("run_lt", F.max("pmax").over(w))
    dominated = (
        F.col("run_lt").isNotNull() & (F.col("run_lt") >= F.col("p_size"))
    ) | (F.col("pmax") > F.col("p_size"))
    return (
        part.join(lt, "p_retailprice")
        .filter(~dominated)
        .select("p_partkey", "p_retailprice", "p_size")
    )


A43_ORACLE = """
SELECT p.p_partkey, p.p_retailprice, p.p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice
    AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
"""


# ---------------------------------------------------------------------------
# A44 — triangle counting on the part co-purchase graph.
#
# Parts are connected when they appear in the same order; triangles
# (the clustering signal) are enumerated with the DEGREE-ORDERED
# wedge join (Latapy 2008 / "compact-forward"): every edge is
# oriented from its lower-degree endpoint to the higher (ties by id),
# wedges are generated only at the LOW end — so per-node fan-out is
# bounded by O(sqrt(|E|)) and total wedges by O(|E|^1.5) even on the
# dense co-purchase graph, where the naive u<v two-join generates
# sum(deg^2) wedges (measured 4x slower at sf0.1). The orientation
# changes no counts: each triangle has exactly one vertex with two
# out-edges in the degree order, so it is found exactly once. The
# pair-generation self-join is bounded per order (TPC-H orders hold
# <= 7 items); the graph is the BULK co-purchase graph (quantity >=
# 40) — the all-pairs graph over uniform-random TPC-H parts is near-
# complete at sf>=0.1, where triangle enumeration is Theta(n^3) for
# ANY algorithm and carries no signal. Per-node participation explodes each triangle to its
# three corners. The oracle states the orientation-free a<b<c
# formulation — hash equality pins the rewrite.
# ---------------------------------------------------------------------------

_A44_TOPK = 15
_A44_MIN_QTY = 40  # bulk co-purchases only: keeps the graph sparse


def a44_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= _A44_MIN_QTY)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e = (
        edges.join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
    )
    low_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = e.select(
        F.when(low_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(low_first, F.col("v")).otherwise(F.col("u")).alias("b"),
    )
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    # wedges at the low vertex, endpoints id-ordered so the closing
    # edge is already in canonical u<v form
    wedges = o1.join(
        o2,
        (F.col("o1.a") == F.col("o2.a")) & (F.col("o1.b") < F.col("o2.b")),
    ).select(
        F.col("o1.a").alias("x"),
        F.col("o1.b").alias("y"),
        F.col("o2.b").alias("z"),
    )
    e3 = edges.alias("e3")
    tri = wedges.join(
        e3, (F.col("y") == F.col("e3.u")) & (F.col("z") == F.col("e3.v"))
    ).select("x", "y", "z")
    corners = tri.select(F.explode(F.array("x", "y", "z")).alias("part"))
    counts = corners.groupBy("part").agg(
        F.count(F.lit(1)).cast("long").alias("tri_cnt")
    )
    w = Window.orderBy(F.col("tri_cnt").desc(), F.col("part").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _A44_TOPK)
        .select("rank", "part", "tri_cnt")
    )


A44_ORACLE = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_quantity >= {_A44_MIN_QTY}),
edges AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
tri AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM edges e1
  JOIN edges e2 ON e1.v = e2.u
  JOIN edges e3 ON e1.u = e3.u AND e2.v = e3.v
),
corners AS (
  SELECT x AS part FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
),
c AS (SELECT part, CAST(count(*) AS BIGINT) AS tri_cnt
      FROM corners GROUP BY part)
SELECT CAST(row_number() OVER (ORDER BY tri_cnt DESC, part ASC) AS BIGINT)
         AS rank,
       part, tri_cnt
FROM c
QUALIFY rank <= {_A44_TOPK}
"""


# ---------------------------------------------------------------------------
# A45 — TPC-H Q21 shape: suppliers who alone held up multi-supplier
# orders ("late" adapted to the fixture's columns: shipped more than
# 60 days after the order date; finalized orders only).
#
# The reference formulation is a correlated EXISTS + NOT EXISTS pair
# on lineitem — the oracle states exactly that. The engine computes
# the set-based rewrite instead: ONE pass over lineitem derives
# per-order supplier stats (distinct suppliers, distinct late
# suppliers), and the predicate becomes a row-local filter after an
# equi-join — no correlated re-scans of the fact table. Scale shape:
# two hash aggs over lineitem + broadcast dim joins; the quadratic
# per-row subqueries the SQL implies never run.
# ---------------------------------------------------------------------------

_A45_LATE_DAYS = 60
_A45_TOPK = 10


def a45_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supplier = load_table(spark, sf_dir, "supplier")
    lo = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == orders.o_orderkey,
    ).withColumn(
        "late",
        F.col("l_shipdate")
        > F.date_add(F.col("o_orderdate").cast("date"), _A45_LATE_DAYS),
    )
    stats = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    culprit = (
        lo.filter(F.col("late"))
        .join(stats, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    counts = (
        culprit.join(F.broadcast(supplier), culprit.l_suppkey == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )
    w = Window.orderBy(F.col("numwait").desc(), F.col("s_name").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _A45_TOPK)
        .select("rank", "s_name", "numwait")
    )


A45_ORACLE = f"""
WITH lo AS (
  SELECT l.*, o.o_orderdate
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
),
culprit AS (
  SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
  FROM lo l1
  WHERE l1.l_shipdate > l1.o_orderdate + INTERVAL {_A45_LATE_DAYS} DAY
    AND EXISTS (
      SELECT 1 FROM lo l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (
      SELECT 1 FROM lo l3
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > l3.o_orderdate + INTERVAL {_A45_LATE_DAYS} DAY)
),
counts AS (
  SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
  FROM culprit c JOIN supplier s ON c.l_suppkey = s.s_suppkey
  GROUP BY s.s_name
)
SELECT CAST(row_number() OVER (ORDER BY numwait DESC, s_name ASC) AS BIGINT)
         AS rank,
       s_name, numwait
FROM counts
QUALIFY rank <= {_A45_TOPK}
"""


# ---------------------------------------------------------------------------
# A46 — robust outlier detection: median absolute deviation per group.
#
# Exact medians (percentile(0.5), linear midpoint on even counts —
# identical semantics in DuckDB's median()) over customer balances per
# nation, MAD as the robust spread, outliers = |x - med| > 3 * MAD.
# Every derived float is rounded to 6 decimals BEFORE the comparison,
# in both engines, so the outlier predicate is decided on identical
# values. Scale shape: two grouped exact-percentile aggs with the
# 25-row medians broadcast back — at 100 TB the exact percentile
# becomes approx_percentile / the a33 histogram sketch (documented
# trade; shapes identical).
# ---------------------------------------------------------------------------


def a46_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    c = cust.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        cust.c_nationkey == nation.n_nationkey,
    ).select("n_name", "c_acctbal")
    med = c.groupBy("n_name").agg(
        F.round(F.expr("percentile(c_acctbal, 0.5)"), 6).alias("med")
    )
    dev = c.join(F.broadcast(med), "n_name").withColumn(
        "adev", F.round(F.abs(F.col("c_acctbal") - F.col("med")), 6)
    )
    mad = dev.groupBy("n_name").agg(
        F.round(F.expr("percentile(adev, 0.5)"), 6).alias("mad")
    )
    flagged = dev.join(F.broadcast(mad), "n_name")
    return (
        flagged.groupBy("n_name")
        .agg(
            F.first("med").alias("med"),
            F.first("mad").alias("mad"),
            F.count(F.lit(1)).cast("long").alias("n_cust"),
            F.sum(
                F.when(F.col("adev") > F.lit(3.0) * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .select("n_name", "med", "mad", "n_cust", "n_outliers")
    )


A46_ORACLE = """
WITH c AS (
  SELECT n.n_name, cu.c_acctbal
  FROM customer cu JOIN nation n ON cu.c_nationkey = n.n_nationkey
),
med AS (SELECT n_name, round(median(c_acctbal), 6) AS med FROM c GROUP BY n_name),
dev AS (
  SELECT c.n_name, round(abs(c.c_acctbal - m.med), 6) AS adev, m.med
  FROM c JOIN med m USING (n_name)
),
mad AS (SELECT n_name, round(median(adev), 6) AS mad FROM dev GROUP BY n_name)
SELECT d.n_name,
       any_value(d.med) AS med,
       any_value(ma.mad) AS mad,
       CAST(count(*) AS BIGINT) AS n_cust,
       CAST(sum(CASE WHEN d.adev > CAST(3.0 AS DOUBLE) * ma.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN mad ma USING (n_name)
GROUP BY d.n_name
"""


# ---------------------------------------------------------------------------
# A47 — incremental view maintenance: merge a materialized aggregate
# with a delta batch instead of recomputing.
#
# The 100 TB pipeline pattern: a per-user (count, sum) view maintained
# by folding in each new day's partial aggregate — O(delta) work, not
# O(history). The fixture splits events at max(ts) - 1 day ("base" vs
# "the day that just arrived"), merges agg(base) with agg(delta) via
# the full-outer null-safe-add operator (operators/cdc.py
# merge_agg_states), and the oracle computes the SAME split-and-merge;
# the property that merge(agg(base), agg(delta)) == agg(all) is pinned
# by a unit test, which is the actual IVM guarantee.
# ---------------------------------------------------------------------------

_A47_DELTA_MS = 86_400_000  # the trailing day is "the delta"


def a47_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.operators.cdc import merge_agg_states

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_millis("ts").alias("ms"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    cutoff = ev.agg((F.max("ms") - F.lit(_A47_DELTA_MS)).alias("cut"))
    ev = ev.crossJoin(F.broadcast(cutoff))

    def agg(df):
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )

    base = agg(ev.filter(F.col("ms") < F.col("cut")))
    delta = agg(ev.filter(F.col("ms") >= F.col("cut")))
    merged = merge_agg_states(base, delta, ["user_id"], ["n_events", "sum_cents"])
    n_delta = delta.select(
        "user_id", F.col("n_events").alias("n_delta")
    )
    return (
        merged.join(n_delta, "user_id", "left")
        .select(
            "user_id",
            "n_events",
            "sum_cents",
            F.coalesce(F.col("n_delta"), F.lit(0)).cast("long").alias("n_delta"),
        )
    )


A47_ORACLE = f"""
WITH ev AS (
  SELECT user_id, epoch_ms(ts) AS ms,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
cut AS (SELECT max(ms) - {_A47_DELTA_MS} AS cut FROM ev),
base AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(cents) AS BIGINT) AS sum_cents
  FROM ev, cut WHERE ms < cut GROUP BY user_id
),
delta AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(cents) AS BIGINT) AS sum_cents
  FROM ev, cut WHERE ms >= cut GROUP BY user_id
)
SELECT coalesce(b.user_id, d.user_id) AS user_id,
       CAST(coalesce(b.n_events, 0) + coalesce(d.n_events, 0) AS BIGINT)
         AS n_events,
       CAST(coalesce(b.sum_cents, 0) + coalesce(d.sum_cents, 0) AS BIGINT)
         AS sum_cents,
       CAST(coalesce(d.n_events, 0) AS BIGINT) AS n_delta
FROM base b FULL OUTER JOIN delta d ON b.user_id = d.user_id
"""


# ---------------------------------------------------------------------------
# A48 — sweep-line maximum concurrency.
#
# "Peak simultaneous sessions" — the classic interval-overlap maximum,
# computed without interval self-joins: each interval contributes a
# (+1 at start, -1 at end) event, one running sum over the
# time-ordered points gives the live count, its max is the peak.
# Half-open [start, end) semantics: at a boundary instant the -1
# sorts before the +1. O(n log n) via one per-group window sort vs
# the O(n²) overlap join. Intervals here: each event holds a
# "session" open for 30 minutes.
# ---------------------------------------------------------------------------

_A48_HOLD_MS = 30 * 60_000


def a48_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.unix_millis("ts").alias("ms")
    )
    pts = ev.select(
        "event_type", F.col("ms").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        ev.select(
            "event_type",
            (F.col("ms") + F.lit(_A48_HOLD_MS)).alias("t"),
            F.lit(-1).alias("delta"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = pts.withColumn("cur", F.sum("delta").over(w))
    peak = F.max("cur").over(Window.partitionBy("event_type"))
    flagged = run.withColumn("peak", peak).filter(F.col("cur") == F.col("peak"))
    return flagged.groupBy("event_type").agg(
        F.first("peak").cast("long").alias("peak_concurrent"),
        F.min("t").cast("long").alias("first_peak_ms"),
    )


A48_ORACLE = f"""
WITH ev AS (SELECT event_type, epoch_ms(ts) AS ms FROM events),
pts AS (
  SELECT event_type, ms AS t, 1 AS delta FROM ev
  UNION ALL
  SELECT event_type, ms + {_A48_HOLD_MS} AS t, -1 AS delta FROM ev
),
run AS (
  SELECT event_type, t,
         sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                          ROWS UNBOUNDED PRECEDING) AS cur
  FROM pts
),
pk AS (SELECT event_type, max(cur) AS peak FROM run GROUP BY event_type)
SELECT r.event_type,
       CAST(p.peak AS BIGINT) AS peak_concurrent,
       CAST(min(r.t) AS BIGINT) AS first_peak_ms
FROM run r JOIN pk p ON r.event_type = p.event_type AND r.cur = p.peak
GROUP BY r.event_type, p.peak
"""


# ---------------------------------------------------------------------------
# A49 — TPC-H Q13 shape: customer order-count distribution.
#
# The left-outer + double-aggregation idiom: customers joined to
# their (filtered) orders — zero-order customers MUST survive, which
# is why the filter lives in the JOIN CONDITION, not a WHERE — then
# the per-customer counts are themselves histogrammed. count(o) over
# a null-extended join counts matches only, giving the 0 bucket for
# free.
# ---------------------------------------------------------------------------


def a49_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


A49_ORACLE = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# A50 — hot/cold split join (explicit skew-join handling).
#
# Keys at or above the frequency threshold join via a broadcast of
# just their dim rows; the cold tail takes the ordinary shuffle join
# (operators/skew.py split_hot_join — complements a13's salted agg
# and the AQE runtime path). The oracle is the PLAIN join + agg: hash
# equality proves the split is semantics-preserving, which is the
# point — it's a pure execution-strategy rewrite.
# ---------------------------------------------------------------------------

_A50_HOT = 40


def a50_hot_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.operators.skew import split_hot_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = split_hot_join(
        li, part.withColumnRenamed("p_partkey", "l_partkey"), "l_partkey", _A50_HOT
    )
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
    )


A50_ORACLE = """
SELECT p.p_brand,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
"""


# ---------------------------------------------------------------------------
# A51 — bounded-depth BFS reachability (unrolled frontier expansion).
#
# "What can we reach in <= 3 hops from this seed set?" — the
# recommendation/impact-analysis traversal, expressed as unrolled
# joins like PageRank's iterations: each hop joins the frontier to
# the edge list, subtracts already-visited nodes (left_anti), and
# unions into the visited set. On the bulk co-purchase graph (a44's
# sparse edges), seeded from one brand's parts. Per hop: one equi-
# join + one anti-join — both hash-partitioned on the node id; the
# visited set stays deduplicated so frontiers can't re-expand.
# ---------------------------------------------------------------------------

_A51_HOPS = 3
_A51_BRAND = "Brand#11"


def a51_bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= _A44_MIN_QTY)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
    )
    part = load_table(spark, sf_dir, "part")
    seed = part.filter(F.col("p_brand") == _A51_BRAND).select(
        F.col("p_partkey").alias("node")
    )
    counts = [(0, seed)]
    visited, frontier = seed, seed
    for hop in range(1, _A51_HOPS + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
        )
        counts.append((hop, nxt))
        visited = visited.unionByName(nxt)
        frontier = nxt
    out = None
    for hop, frame in counts:
        row = frame.agg(
            F.lit(hop).cast("long").alias("hop"),
            F.count(F.lit(1)).cast("long").alias("n_new_nodes"),
        )
        out = row if out is None else out.unionByName(row)
    return out


A51_ORACLE = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_quantity >= {_A44_MIN_QTY}),
edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
h0 AS (SELECT p_partkey AS node FROM part WHERE p_brand = '{_A51_BRAND}'),
v0 AS (SELECT node FROM h0),
h1 AS (
  SELECT DISTINCT e.dst AS node FROM h0 f JOIN edges e ON f.node = e.src
  WHERE e.dst NOT IN (SELECT node FROM v0)
),
v1 AS (SELECT node FROM v0 UNION SELECT node FROM h1),
h2 AS (
  SELECT DISTINCT e.dst AS node FROM h1 f JOIN edges e ON f.node = e.src
  WHERE e.dst NOT IN (SELECT node FROM v1)
),
v2 AS (SELECT node FROM v1 UNION SELECT node FROM h2),
h3 AS (
  SELECT DISTINCT e.dst AS node FROM h2 f JOIN edges e ON f.node = e.src
  WHERE e.dst NOT IN (SELECT node FROM v2)
)
SELECT CAST(0 AS BIGINT) AS hop, CAST(count(*) AS BIGINT) AS n_new_nodes FROM h0
UNION ALL
SELECT CAST(1 AS BIGINT), CAST(count(*) AS BIGINT) FROM h1
UNION ALL
SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT) FROM h2
UNION ALL
SELECT CAST(3 AS BIGINT), CAST(count(*) AS BIGINT) FROM h3
"""


# ---------------------------------------------------------------------------
# A52 — important parts (TPC-H Q11 shape): per-part inventory value
# restricted to one region's suppliers, kept only if the part's value
# exceeds a fixed fraction of the regional total. The plan shape under
# test: a grouped aggregate compared against a GLOBAL scalar aggregate
# — Spark realizes the scalar as a 1-row broadcast (crossJoin of the
# re-aggregated per-part frame), never a second scan-wide shuffle.
# Decimal sums keep both engines bit-identical; the threshold compare
# is integer-scaled (value * 2000 > total) so no float fraction enters.
# ---------------------------------------------------------------------------

_A52_REGION = "ASIA"
_A52_SCALE = 2000  # keep parts with value > total/2000


def a52_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == _A52_REGION)
    dim = F.broadcast(
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey")
    )
    value = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    per_part = (
        li.join(dim, li.l_suppkey == dim.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(value).alias("__val"))
    )
    total = per_part.agg(F.sum("__val").alias("__total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("__val") * _A52_SCALE > F.col("__total"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("__val").cast("double").alias("part_value"),
        )
    )


A52_ORACLE = f"""
WITH regional AS (
  SELECT l.l_partkey,
         sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS val
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = '{_A52_REGION}'
  GROUP BY l.l_partkey
)
SELECT l_partkey AS p_partkey, CAST(val AS DOUBLE) AS part_value
FROM regional
WHERE val * {_A52_SCALE} > (SELECT sum(val) FROM regional)
"""


# ---------------------------------------------------------------------------
# A53 — top supplier (TPC-H Q15 shape): quarterly revenue per supplier,
# then the supplier(s) achieving the maximum. The "view + max join"
# shape: the per-supplier aggregate is computed once, re-aggregated to
# a 1-row max, and equi-filtered against it via broadcast — exact
# DECIMAL revenue makes the equality join safe across engines.
# ---------------------------------------------------------------------------

_A53_START, _A53_END = "1996-01-01", "1996-04-01"


def a53_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_A53_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_A53_END).cast("timestamp"))
    )
    revenue = li.groupBy("l_suppkey").agg(
        F.sum(
            _dec("l_extendedprice")
            * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
        ).alias("__rev")
    )
    best = revenue.agg(F.max("__rev").alias("__best"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(best))
        .filter(F.col("__rev") == F.col("__best"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("__rev").cast("double").alias("total_revenue"),
        )
    )


A53_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{_A53_START}'
    AND l_shipdate < TIMESTAMP '{_A53_END}'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.rev AS DOUBLE) AS total_revenue
FROM revenue r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.rev = (SELECT max(rev) FROM revenue)
"""


# ---------------------------------------------------------------------------
# A54 — parts/supplier relationship (TPC-H Q16 shape): how many
# distinct qualifying suppliers ship each (brand, size) family,
# excluding one brand and a NOT-IN denylist of suppliers (negative
# account balance). Supplier-part pairs come from lineitem (the
# fixture set has no partsupp); the denylist is a broadcast anti-join;
# the distinct count shuffles once on (brand, size).
# ---------------------------------------------------------------------------

_A54_EXCL_BRAND = "Brand#11"


def a54_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") != _A54_EXCL_BRAND
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


A54_ORACLE = f"""
SELECT p.p_brand, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> '{_A54_EXCL_BRAND}'
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_size
"""


# ---------------------------------------------------------------------------
# A55 — small-quantity-order revenue (TPC-H Q17 shape): average weekly
# revenue lost to orders below 20% of a part's average quantity. The
# correlated per-part AVG becomes a grouped aggregate re-joined to the
# fact table (Catalyst's decorrelation, written explicitly). The
# average is exact-DECIMAL-sum / count — deterministic in both engines
# — so the 0.2*avg threshold compares identically.
# ---------------------------------------------------------------------------

_A55_BRAND = "Brand#21"


def a55_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == _A55_BRAND)
    fact = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    avg_qty = fact.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (
            F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))
        ).alias("__avg_qty")
    )
    return (
        fact.join(F.broadcast(avg_qty), fact.l_partkey == F.col("__pk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("__avg_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / 7.0).alias(
                "avg_weekly"
            ),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


A55_ORACLE = f"""
WITH fact AS (
  SELECT l.* FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_brand = '{_A55_BRAND}'
),
avg_qty AS (
  SELECT l_partkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS aq
  FROM fact GROUP BY l_partkey
)
SELECT CAST(sum(CAST(f.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
         AS avg_weekly,
       CAST(count(*) AS BIGINT) AS n_lines
FROM fact f JOIN avg_qty a ON f.l_partkey = a.l_partkey
WHERE f.l_quantity < 0.2 * a.aq
"""


# ---------------------------------------------------------------------------
# A56 — large-volume customers (TPC-H Q18 shape): orders whose total
# quantity clears a threshold, joined back to orders + customer. The
# HAVING-subquery-IN shape collapses to groupBy + semi-equi-join; the
# order-level aggregate shuffles on l_orderkey once and the qualifying
# key set is tiny, so the back-join broadcasts it.
# ---------------------------------------------------------------------------

_A56_MIN_QTY = 300


def a56_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("__qty"))
        .filter(F.col("__qty") > _A56_MIN_QTY)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.unix_millis("o_orderdate").alias("o_orderdate_ms"),
            "o_totalprice",
            F.col("__qty").cast("double").alias("total_qty"),
        )
    )


A56_ORACLE = f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       epoch_ms(o.o_orderdate) AS o_orderdate_ms, o.o_totalprice,
       CAST(t.qty AS DOUBLE) AS total_qty
FROM (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > {_A56_MIN_QTY}
) t
JOIN orders o ON o.o_orderkey = t.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
"""


# ---------------------------------------------------------------------------
# A57 — excess-shipment suppliers (TPC-H Q20 shape): suppliers that
# shipped an outsized quantity of any name-prefixed part family in one
# year, listed with their nation. Two nested IN-subqueries in the
# reference formulation; here the inner one is a LIKE-filtered
# broadcast dim join and the outer one a semi join on the qualifying
# supplier keys — the fact table is touched once.
# ---------------------------------------------------------------------------

_A57_PREFIX = "small"
_A57_YEAR_START, _A57_YEAR_END = "1997-01-01", "1998-01-01"
_A57_MIN_QTY = 50


def a57_excess_shipment_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_A57_YEAR_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_A57_YEAR_END).cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith(_A57_PREFIX)
    )
    qualifying = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("__qty"))
        .filter(F.col("__qty") > _A57_MIN_QTY)
        .select("l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    return (
        supp.join(F.broadcast(qualifying), supp.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
    )


A57_ORACLE = f"""
SELECT s.s_suppkey, s.s_name, n.n_name
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE '{_A57_PREFIX}%'
    AND l.l_shipdate >= TIMESTAMP '{_A57_YEAR_START}'
    AND l.l_shipdate < TIMESTAMP '{_A57_YEAR_END}'
  GROUP BY l.l_suppkey, l.l_partkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > {_A57_MIN_QTY}
)
"""


# ---------------------------------------------------------------------------
# A58 — global sales opportunity (TPC-H Q22 shape): well-funded
# customers who never ordered, grouped by a derived "country code"
# (custkey mod 5 — the fixtures have no phone column). Three shapes in
# one plan: a global scalar subquery (avg positive balance, exact
# DECIMAL sum / count so both engines agree bit-for-bit), an anti join
# against orders, and a final small aggregate.
# ---------------------------------------------------------------------------


_A58_SINCE = "1999-07-01"  # "no orders in the recent period" cutoff


def a58_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("__avg")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(_A58_SINCE).cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(orders, "c_custkey", "left_anti")
        .groupBy((F.col("c_custkey") % 5).cast("long").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


A58_ORACLE = f"""
SELECT CAST(c_custkey % 5 AS BIGINT) AS cntrycode,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        FROM customer WHERE c_acctbal > 0
      )
  AND c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderdate >= TIMESTAMP '{_A58_SINCE}')
GROUP BY c_custkey % 5
"""


# ---------------------------------------------------------------------------
# A59 — hierarchical sketch rollup (the hypertable / continuous-
# aggregate shape): distinct users per (event_type, day) as HLL
# registers, then the per-type total derived by MERGING the daily
# registers (per-bucket max) — never by rescanning the fact table.
# This is the TimescaleDB/Druid rollup contract: register mergeability
# (max is associative/commutative/idempotent) makes the coarse level
# O(days x 256) regardless of fact volume, and the same merge serves
# any ad-hoc date range. Estimates use the bit-exact integer HLL of
# operators/sketch.py, so the oracle reproduces them exactly; exact
# distincts ride along to show the error.
# ---------------------------------------------------------------------------


def a59_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.operators.sketch import hll_estimate, hll_registers

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.unix_millis(F.date_trunc("DAY", F.col("ts"))).alias("day_ms"),
        "user_id",
    )
    daily_regs = hll_registers(ev, ["event_type", "day_ms"], "user_id")
    daily = hll_estimate(daily_regs, ["event_type", "day_ms"]).join(
        ev.groupBy("event_type", "day_ms").agg(
            F.countDistinct("user_id").cast("long").alias("exact_distinct")
        ),
        ["event_type", "day_ms"],
    )
    merged_regs = daily_regs.groupBy("event_type", "bucket").agg(
        F.max("m_j").alias("m_j")
    )
    total = (
        hll_estimate(merged_regs, ["event_type"])
        .join(
            ev.groupBy("event_type").agg(
                F.countDistinct("user_id").cast("long").alias("exact_distinct")
            ),
            ["event_type"],
        )
        .withColumn("day_ms", F.lit(-1).cast("long"))
    )
    cols = ["event_type", "day_ms", "n_registers", "est_distinct", "exact_distinct"]
    return daily.select(*cols).unionByName(total.select(*cols))


def _a59_oracle() -> str:
    from table_demo_spark.operators.sketch import (
        ALPHA_M2_SCALED,
        M_REGISTERS,
        RANK_CAP,
        VALUE_HEX,
    )

    full_rank = VALUE_HEX * 4 + 1
    est = (
        f"CAST({ALPHA_M2_SCALED!r} AS DOUBLE) / (s_present + "
        f"({M_REGISTERS} - n_registers) * (1::BIGINT << {RANK_CAP}))"
    )
    return f"""
WITH base AS (
  SELECT event_type, epoch_ms(date_trunc('day', ts)) AS day_ms,
         CAST(user_id AS VARCHAR) AS tok
  FROM events
),
ranks AS (
  SELECT event_type, day_ms,
         CAST('0x' || substring(md5(tok), 1, 2) AS BIGINT) AS bucket,
         least(CASE WHEN CAST('0x' || substring(md5(tok), 3, {VALUE_HEX}) AS BIGINT) > 0
                    THEN {full_rank} - length(bin(CAST('0x' || substring(md5(tok), 3, {VALUE_HEX}) AS BIGINT)))
                    ELSE {RANK_CAP} END, {RANK_CAP}) AS rank
  FROM base
),
daily_regs AS (
  SELECT event_type, day_ms, bucket, max(rank) AS m_j
  FROM ranks GROUP BY 1, 2, 3
),
daily_s AS (
  SELECT event_type, day_ms,
         CAST(count(*) AS BIGINT) AS n_registers,
         CAST(sum(1::BIGINT << ({RANK_CAP} - m_j)) AS BIGINT) AS s_present
  FROM daily_regs GROUP BY 1, 2
),
daily_exact AS (
  SELECT event_type, day_ms, CAST(count(DISTINCT tok) AS BIGINT) AS exact_distinct
  FROM base GROUP BY 1, 2
),
merged_regs AS (
  SELECT event_type, bucket, max(m_j) AS m_j FROM daily_regs GROUP BY 1, 2
),
total_s AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_registers,
         CAST(sum(1::BIGINT << ({RANK_CAP} - m_j)) AS BIGINT) AS s_present
  FROM merged_regs GROUP BY 1
),
total_exact AS (
  SELECT event_type, CAST(count(DISTINCT tok) AS BIGINT) AS exact_distinct
  FROM base GROUP BY 1
)
SELECT s.event_type, s.day_ms, n_registers, {est} AS est_distinct, e.exact_distinct
FROM daily_s s JOIN daily_exact e USING (event_type, day_ms)
UNION ALL
SELECT s.event_type, CAST(-1 AS BIGINT) AS day_ms, n_registers,
       {est} AS est_distinct, e.exact_distinct
FROM total_s s JOIN total_exact e USING (event_type)
"""


# ---------------------------------------------------------------------------
# A60 — event-path transition matrix (Markov path analytics): for each
# user's event sequence (ordered by ts, event_id tiebreak), count
# consecutive event_type transitions and derive per-source transition
# probabilities and ranks. One lag window per user partition (the sort
# is partition-local after the hash shuffle on user_id), one
# map-side-combined count agg over a bounded (|types|^2) key space,
# and the probability denominator is a window sum over that tiny
# aggregated frame. Probabilities are long/long double divisions —
# deterministic in both engines.
# ---------------------------------------------------------------------------


def a60_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_type").alias("to_type"),
        )
        .withColumn("from_type", F.lag("to_type").over(w))
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wf = Window.partitionBy("from_type")
    wr = Window.partitionBy("from_type").orderBy(
        F.col("n").desc(), F.col("to_type").asc()
    )
    return trans.select(
        "from_type",
        "to_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wf).cast("double"), 6
        ).alias("p"),
        F.row_number().over(wr).cast("long").alias("rank"),
    )


A60_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type AS to_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS from_type
  FROM events
),
trans AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE from_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       round(CAST(n AS DOUBLE)
             / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS p,
       CAST(row_number() OVER (PARTITION BY from_type
                               ORDER BY n DESC, to_type ASC) AS BIGINT) AS rank
FROM trans
"""


# ---------------------------------------------------------------------------
# A61 — bounded-round weighted shortest path (unrolled Bellman-Ford on
# the min-plus semiring): 3 relaxation rounds from a brand's seed set
# over the co-purchase graph (a44's edges, deterministic integer
# weights). Each round is one equi-join (dist x edges on the node id)
# + one min agg — the same per-iteration shape as PageRank (a41) and
# BFS (a51), but on (min, +) instead of (sum, x) / set union: the
# three classic graph semirings, all as relational algebra. Distances
# stay BIGINT-exact; co-partitioning edges by src makes every round's
# join shuffle-free on the edge side at 100 TB.
# ---------------------------------------------------------------------------

_A61_ROUNDS = 3
_A61_BRAND = "Brand#17"


def a61_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= _A44_MIN_QTY)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
        .withColumn(
            "w", ((F.col("src") + F.col("dst")) % 7 + 1).cast("long")
        )
    )
    part = load_table(spark, sf_dir, "part")
    dist = part.filter(F.col("p_brand") == _A61_BRAND).select(
        F.col("p_partkey").alias("node"), F.lit(0).cast("long").alias("dist")
    )
    for _ in range(_A61_ROUNDS):
        relaxed = dist.join(edges, dist.node == edges.src).select(
            F.col("dst").alias("node"),
            (F.col("dist") + F.col("w")).alias("dist"),
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
    return dist


def _a61_round_sql(prev: str, rnd: int) -> str:
    return f"""
r{rnd} AS (
  SELECT node, min(dist) AS dist FROM (
    SELECT node, dist FROM {prev}
    UNION ALL
    SELECT e.dst AS node, p.dist + e.w AS dist
    FROM {prev} p JOIN edges e ON p.node = e.src
  ) GROUP BY node
)"""


A61_ORACLE = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_quantity >= {_A44_MIN_QTY}),
edges AS (
  SELECT src, dst, CAST((src + dst) % 7 + 1 AS BIGINT) AS w FROM (
    SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
    FROM li a JOIN li b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  )
),
r0 AS (SELECT p_partkey AS node, CAST(0 AS BIGINT) AS dist
       FROM part WHERE p_brand = '{_A61_BRAND}'),
{",".join(_a61_round_sql(f"r{i}", i + 1).strip() for i in range(_A61_ROUNDS))}
SELECT node, CAST(dist AS BIGINT) AS dist FROM r{_A61_ROUNDS}
"""


# ---------------------------------------------------------------------------
# A62 — SCD2 validity audit (constraint checking as a query): per key,
# verify the versioned history a36 builds — version count, at most one
# open (current) row, zero overlapping intervals, and the legitimate
# delete-shaped gaps counted rather than flagged. The invariants are
# emitted as DATA (n_overlaps must scan as all-zero), which is how a
# warehouse audits table constraints at 100 TB: one hash shuffle on
# the key, one per-key window pass over version chains — the same
# bound as building the history itself.
# ---------------------------------------------------------------------------


def a62_validity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.operators.cdc import scd2_history

    hist = scd2_history(_cdc_changelog(spark, sf_dir), ["o_orderkey"])
    w = Window.partitionBy("o_orderkey").orderBy("valid_from")
    marked = hist.withColumn("prev_to", F.lag("valid_to").over(w))
    return marked.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_versions"),
        F.sum(F.when(F.col("valid_to").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_current"),
        F.sum(
            F.when(
                F.col("prev_to").isNotNull()
                & (F.col("prev_to") > F.col("valid_from")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_overlaps"),
        F.sum(
            F.when(
                F.col("prev_to").isNotNull()
                & (F.col("prev_to") < F.col("valid_from")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_gaps"),
        F.sum(
            F.when(
                F.col("valid_to").isNotNull(),
                F.col("valid_to") - F.col("valid_from"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("covered_versions"),
    )


A62_ORACLE = f"""
WITH {_CDC_CHANGELOG_CTE},
hist AS (
  SELECT o_orderkey, version AS valid_from,
         lead(version) OVER (PARTITION BY o_orderkey ORDER BY version)
           AS valid_to, op
  FROM changelog
),
rows_kept AS (SELECT * FROM hist WHERE op <> 'D'),
marked AS (
  SELECT o_orderkey, valid_from, valid_to,
         lag(valid_to) OVER (PARTITION BY o_orderkey ORDER BY valid_from)
           AS prev_to
  FROM rows_kept
)
SELECT o_orderkey,
       CAST(count(*) AS BIGINT) AS n_versions,
       CAST(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_current,
       CAST(sum(CASE WHEN prev_to IS NOT NULL AND prev_to > valid_from
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_overlaps,
       CAST(sum(CASE WHEN prev_to IS NOT NULL AND prev_to < valid_from
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
       CAST(sum(CASE WHEN valid_to IS NOT NULL THEN valid_to - valid_from
                     ELSE 0 END) AS BIGINT) AS covered_versions
FROM marked
GROUP BY o_orderkey
"""


# ---------------------------------------------------------------------------
# A63 — behavioral-profile KNN: top-k most-similar users by activity
# profile. Each user's events reduce to an 8-dim integer vector (sum
# of value-cents per 3-hour time-of-day bucket — PAA over the event
# series, stated in cents so both engines do exact BIGINT arithmetic
# after one shared float round), then a bounded probe set (user_id <
# A63_PROBES, bounded by construction like s1's query budget) scans
# the profile table for exact L2^2 top-k. The scale shape is the
# feature-store + brute-force-ANN pattern on a DERIVED table: the
# per-user aggregation is the reduction (events shuffle once,
# map-side partials; profiles are |users| rows, orders of magnitude
# smaller than events), the probe side broadcasts, and the profile
# side streams — at larger probe budgets the s-family's LSH/IVF paths
# apply unchanged to the profile vectors.
# ---------------------------------------------------------------------------

A63_BUCKETS = 8  # 3-hour time-of-day buckets
A63_PROBES = 8
A63_K = 5


def a63_profile_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cents = ev.select(
        "user_id",
        (F.hour("ts") / 3).cast("int").alias("b"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    prof = cents.groupBy("user_id").agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("b") == b, F.col("c"))), F.lit(0)
            )
            .cast("long")
            .alias(f"p{b}")
            for b in range(A63_BUCKETS)
        ]
    )
    probes = prof.filter(F.col("user_id") < A63_PROBES).select(
        F.col("user_id").alias("probe_user"),
        *[F.col(f"p{b}").alias(f"q{b}") for b in range(A63_BUCKETS)],
    )
    dist = sum(
        (F.col(f"q{b}") - F.col(f"p{b}")) * (F.col(f"q{b}") - F.col(f"p{b}"))
        for b in range(A63_BUCKETS)
    )
    pairs = (
        prof.crossJoin(F.broadcast(probes))
        .filter(F.col("user_id") != F.col("probe_user"))
        .select(
            "probe_user",
            F.col("user_id").alias("neighbor_user"),
            dist.cast("long").alias("dist"),
        )
    )
    w = Window.partitionBy("probe_user").orderBy(
        F.col("dist").asc(), F.col("neighbor_user").asc()
    )
    return pairs.select(
        "probe_user",
        "neighbor_user",
        "dist",
        F.row_number().over(w).cast("long").alias("rnk"),
    ).filter(F.col("rnk") <= A63_K)


def _a63_oracle() -> str:
    prof_cols = ", ".join(
        f"CAST(COALESCE(sum(CASE WHEN b = {b} THEN c END), 0) AS BIGINT) AS p{b}"
        for b in range(A63_BUCKETS)
    )
    dist = " + ".join(
        f"(q.p{b} - p.p{b}) * (q.p{b} - p.p{b})" for b in range(A63_BUCKETS)
    )
    return f"""
WITH cents AS (
  SELECT user_id, CAST(hour(ts) // 3 AS INT) AS b,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
),
prof AS (
  SELECT user_id, {prof_cols}
  FROM cents GROUP BY user_id
),
pairs AS (
  SELECT q.user_id AS probe_user, p.user_id AS neighbor_user,
         CAST({dist} AS BIGINT) AS dist
  FROM prof q JOIN prof p ON p.user_id <> q.user_id
  WHERE q.user_id < {A63_PROBES}
),
ranked AS (
  SELECT probe_user, neighbor_user, dist,
         row_number() OVER (
           PARTITION BY probe_user
           ORDER BY dist ASC, neighbor_user ASC) AS rnk
  FROM pairs
)
SELECT probe_user, neighbor_user, dist, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {A63_K}
"""


# ---------------------------------------------------------------------------
# A64 — label-propagation COMMUNITY detection over the co-purchase
# graph (synchronous LPA, the classic near-linear community algorithm
# — Raghavan et al. 2007). Distinct from the min-label propagation the
# dedup operator uses for connected components: each round every node
# adopts the MODE of its neighbors' labels (tie -> smallest label), so
# dense cliques converge to one label while bridges don't bleed
# communities together the way min-label does. Determinism: synchronous
# rounds, fixed iteration count, total tie order — the oracle unrolls
# the identical rounds. Scale shape: per round ONE equi-join
# (bidirected edges x labels, both hash-partitioned on node) + ONE
# (node, label) count agg + ONE min_by top-1 agg — all with map-side
# partials, no windows, so no per-node neighbor list ever materializes
# in one task; rounds unroll lazily like pagerank (a41), whose
# measured persist-is-slower result applies unchanged at 3 rounds.
# ---------------------------------------------------------------------------

_A64_ITERS = 3


def _a64_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= _A44_MIN_QTY)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    und = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
    )
    return und.select("u", "v").unionAll(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )


def a64_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _a64_edges(spark, sf_dir)
    labels = edges.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(_A64_ITERS):
        nbr = edges.join(
            labels.withColumnRenamed("node", "u"), "u"
        ).select(F.col("v").alias("node"), "label")
        cnt = nbr.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("c")
        )
        labels = cnt.groupBy("node").agg(
            F.min_by(
                F.col("label"),
                F.struct((-F.col("c")).alias("nc"), F.col("label")),
            ).alias("label")
        )
    return (
        labels.groupBy("label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
        .select(F.col("label").cast("long").alias("community"), "n_members")
        .orderBy(F.desc("n_members"), F.asc("community"))
    )


def _a64_oracle() -> str:
    parts = [
        f"""und AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        WHERE l_quantity >= {_A44_MIN_QTY}) a
  JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        WHERE l_quantity >= {_A44_MIN_QTY}) b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS MATERIALIZED (
  SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und
),
l0 AS MATERIALIZED (
  SELECT DISTINCT u AS node, u AS label FROM edges
)"""
    ]
    for r in range(1, _A64_ITERS + 1):
        parts.append(f"""c{r} AS (
  SELECT e.v AS node, l.label, count(*) AS c
  FROM edges e JOIN l{r - 1} l ON e.u = l.node
  GROUP BY 1, 2
),
l{r} AS MATERIALIZED (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node
                              ORDER BY c DESC, label ASC) AS rk
    FROM c{r}
  ) WHERE rk = 1
)"""
        )
    body = ",\n".join(parts)
    return f"""
WITH {body}
SELECT CAST(label AS BIGINT) AS community,
       CAST(count(*) AS BIGINT) AS n_members
FROM l{_A64_ITERS} GROUP BY label
ORDER BY n_members DESC, community ASC
"""


# ---------------------------------------------------------------------------
# A65 — TPC-H Q10 analog (returned-item reporting): customers ranked
# by revenue LOST to returns — lineitems with l_returnflag = 'R'
# joined through orders to customer and nation, exact-DECIMAL revenue,
# top 20. Completes the classic reporting set (Q1/Q2/Q3-ish/Q8/Q11/
# Q13/Q15-Q22 analogs already present). Plan shape: fact-side scan
# with the returnflag PUSHED to parquet, broadcast dims, map-side
# partial sum, TakeOrdered top-k — zero novel machinery, which is the
# point of plan-shape coverage.
# ---------------------------------------------------------------------------
def a65_returned_item_reporting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(rev).cast("double").alias("lost_revenue"),
            F.count(F.lit(1)).cast("long").alias("n_returned_items"),
        )
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


A65_ORACLE = """
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2))
                   - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS lost_revenue,
       CAST(count(*) AS BIGINT) AS n_returned_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY lost_revenue DESC, c_custkey ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# A66 — local supplier volume (TPC-H Q5 analog): revenue from orders
# where the CUSTOMER and the SUPPLIER sit in the same nation of one
# region. What distinguishes Q5 from a plain star join (a2) is the
# c_nationkey = s_nationkey equality BETWEEN two dimension paths of
# the same fact row — the classic "local" constraint. Plan shape:
# one fact scan with the orderdate range pushed to parquet, all four
# dims broadcast, the nation equality applied as a post-join filter on
# broadcast columns (no extra shuffle), single hash-agg on n_name.
# ---------------------------------------------------------------------------

_A66_REGION = "ASIA"
_A66_START, _A66_END = "1995-01-01", "1997-01-01"


def a66_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_A66_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_A66_END).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == _A66_REGION
    )
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


A66_ORACLE = f"""
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2))
                   - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = '{_A66_REGION}'
  AND o_orderdate >= TIMESTAMP '{_A66_START}'
  AND o_orderdate < TIMESTAMP '{_A66_END}'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# ---------------------------------------------------------------------------
# A67 — volume shipping (TPC-H Q7 analog): bilateral trade between two
# nations — supplier in one, customer in the other, both directions,
# revenue split by shipment year. The disjunctive nation-pair
# predicate ((A,B) or (B,A)) runs on broadcast dimension columns after
# the fact join; years come from l_shipdate. One fact-side shuffle
# (the orders join), then a 4-group hash-agg — the nation filter
# prunes >99% of rows before the agg at any scale.
# ---------------------------------------------------------------------------

_A67_NATION1, _A67_NATION2 = "NATION_3", "NATION_7"
_A67_START, _A67_END = "1995-01-01", "1997-01-01"


def a67_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_A67_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_A67_END).cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("__sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("__cn_key"),
        F.col("n_name").alias("cust_nation"),
    )
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    pair = (
        (F.col("supp_nation") == _A67_NATION1)
        & (F.col("cust_nation") == _A67_NATION2)
    ) | (
        (F.col("supp_nation") == _A67_NATION2)
        & (F.col("cust_nation") == _A67_NATION1)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("__sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("__cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


A67_ORACLE = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2))
                   - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = '{_A67_NATION1}' AND n2.n_name = '{_A67_NATION2}')
       OR (n1.n_name = '{_A67_NATION2}' AND n2.n_name = '{_A67_NATION1}'))
  AND l_shipdate >= TIMESTAMP '{_A67_START}'
  AND l_shipdate < TIMESTAMP '{_A67_END}'
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# A68 — promotion effect (TPC-H Q14 analog): the share of one month's
# revenue that came from promotional parts, as a percentage. Both the
# numerator (conditional sum) and denominator are EXACT decimal sums;
# only the final ratio is floating — two deterministic doubles divided
# once, rounded to 9 places, so the value hash is engine-stable. Plan:
# one month of lineitem (pushed down) broadcast-joined to part, single
# ungrouped agg — a map-side-partial two-counter scan at any scale.
# ---------------------------------------------------------------------------

_A68_TYPE = "PROMO"
_A68_START, _A68_END = "1996-03-01", "1996-04-01"


def a68_promotion_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_A68_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_A68_END).cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == _A68_TYPE, rev)).alias("__p"),
            F.sum(rev).alias("__t"),
        )
        .select(
            F.round(
                F.lit(100.0)
                * F.coalesce(F.col("__p"), F.lit(0)).cast("double")
                / F.col("__t").cast("double"),
                9,
            ).alias("promo_revenue_pct"),
            F.col("__p").cast("double").alias("promo_revenue"),
            F.col("__t").cast("double").alias("total_revenue"),
        )
    )


A68_ORACLE = f"""
WITH agg AS (
  SELECT sum(CASE WHEN p_type = '{_A68_TYPE}'
                  THEN CAST(l_extendedprice AS DECIMAL(18,2))
                       * (CAST(1 AS DECIMAL(18,2))
                          - CAST(l_discount AS DECIMAL(18,2))) END) AS p,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2))
                - CAST(l_discount AS DECIMAL(18,2)))) AS t
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '{_A68_START}'
    AND l_shipdate < TIMESTAMP '{_A68_END}'
)
SELECT round(CAST(100 AS DOUBLE) * CAST(coalesce(p, 0) AS DOUBLE)
             / CAST(t AS DOUBLE), 9) AS promo_revenue_pct,
       CAST(p AS DOUBLE) AS promo_revenue,
       CAST(t AS DOUBLE) AS total_revenue
FROM agg
"""


# ---------------------------------------------------------------------------
# A69 — product-type profit (TPC-H Q9 analog): yearly gross profit per
# supplier nation on one part family. The fixture set has no partsupp,
# so cost is the part's retail price times quantity (the same
# join-shape: fact row -> part cost attribute), profit =
# disc_price - cost, all EXACT DECIMAL until the final cast. Plan:
# p_name LIKE filter broadcast into the fact scan, supplier+nation
# broadcast, one orders join for the year, hash-agg on
# (nation, year). LIKE on a broadcast dim prunes the fact early.
# ---------------------------------------------------------------------------

_A69_NAME_FRAG = "red"


def a69_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains(_A69_NAME_FRAG)
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    profit = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    ) - _dec("p_retailprice") * _dec("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


A69_ORACLE = f"""
SELECT n_name AS nation,
       CAST(year(l_shipdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2))
                   - CAST(l_discount AS DECIMAL(18,2)))
                - CAST(p_retailprice AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%{_A69_NAME_FRAG}%'
GROUP BY 1, 2
ORDER BY 1, 2 DESC
"""


# ---------------------------------------------------------------------------
# A70 — shipping priority (TPC-H Q3 analog): top-10 unshipped orders
# by outstanding revenue for one market segment as of a cutoff date.
# The two HALF-OPEN date predicates sit on DIFFERENT tables (order
# placed before the cutoff, lineitem shipped after it) and both push
# to their respective parquet scans; the revenue agg groups on
# (orderkey, orderdate) — fact-key grouping, map-side partials — and
# the top-10 is TakeOrderedAndProject, never a global sort.
# ---------------------------------------------------------------------------

_A70_SEGMENT = "BUILDING"
_A70_CUTOFF = "1996-06-01"


def a70_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == _A70_SEGMENT
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(_A70_CUTOFF).cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(_A70_CUTOFF).cast("timestamp")
    )
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


A70_ORACLE = f"""
SELECT l_orderkey, o_orderdate,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2))
                   - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{_A70_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{_A70_CUTOFF}'
  AND l_shipdate > TIMESTAMP '{_A70_CUTOFF}'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# A71 — order-priority checking (TPC-H Q4 analog): how many orders of
# each priority had at least one LATE line (shipped > 60 days after
# the order date; the fixture has no commit/receipt dates, so
# lateness is measured against o_orderdate). The EXISTS becomes a
# LEFT SEMI join with a composite equi + range condition — each
# order counted ONCE however many lines were late, which is exactly
# what distinguishes Q4's shape from a plain join-and-count.
# ---------------------------------------------------------------------------

_A71_START, _A71_END = "1996-01-01", "1996-07-01"
_A71_LATE_DAYS = 60


def a71_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_A71_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_A71_END).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = (F.col("l_shipdate") > F.col("o_orderdate")
            + F.expr(f"INTERVAL {_A71_LATE_DAYS} DAYS"))
    return (
        orders.join(
            li, (orders.o_orderkey == li.l_orderkey) & late, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


A71_ORACLE = f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '{_A71_START}'
  AND o_orderdate < TIMESTAMP '{_A71_END}'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL {_A71_LATE_DAYS} DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# A72 — forecasting revenue change (TPC-H Q6): the purest pushdown
# showcase — three range predicates, no join, one ungrouped sum.
# Discount bounds compare as exact DECIMALs (the fixture's discounts
# are hundredths, exact at scale 2), so the boundary rows are
# included identically in both engines; revenue is price*discount,
# exact DECIMAL until the final cast.
# ---------------------------------------------------------------------------

_A72_START, _A72_END = "1996-01-01", "1997-01-01"
_A72_DISC_LO, _A72_DISC_HI = "0.05", "0.07"
_A72_MAX_QTY = 24


def a72_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_A72_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_A72_END).cast("timestamp"))
        & (_dec("l_discount") >= F.lit(_A72_DISC_LO).cast("decimal(18,2)"))
        & (_dec("l_discount") <= F.lit(_A72_DISC_HI).cast("decimal(18,2)"))
        & (F.col("l_quantity") < _A72_MAX_QTY)
    )
    return li.agg(
        F.sum(_dec("l_extendedprice") * _dec("l_discount"))
        .cast("double")
        .alias("revenue"),
        F.count("*").cast("long").alias("n_lines"),
    )


A72_ORACLE = f"""
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{_A72_START}'
  AND l_shipdate < TIMESTAMP '{_A72_END}'
  AND CAST(l_discount AS DECIMAL(18,2)) >= CAST({_A72_DISC_LO} AS DECIMAL(18,2))
  AND CAST(l_discount AS DECIMAL(18,2)) <= CAST({_A72_DISC_HI} AS DECIMAL(18,2))
  AND l_quantity < {_A72_MAX_QTY}
"""


# ---------------------------------------------------------------------------
# A73 — shipping-delay distribution (TPC-H Q12 analog): for each
# delay bucket (on-time / 30 / 60 / 90+ days from order to ship —
# the fixture has no shipmode, so the bucket IS the shipping-quality
# dimension), how many lines belong to high-priority vs low-priority
# orders. Q12's signature is the CASE-aggregated priority split
# after a fact-fact join; the bucket expression is integer date
# arithmetic (datediff), engine-neutral.
# ---------------------------------------------------------------------------

_A73_HIGH = ("1-URGENT", "2-HIGH")


def a73_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay < 30, "00-29")
        .when(delay < 60, "30-59")
        .when(delay < 90, "60-89")
        .otherwise("90+")
    )
    is_high = F.col("o_orderpriority").isin(*_A73_HIGH)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1))
            .cast("long")
            .alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


A73_ORACLE = f"""
SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) < 30 THEN '00-29'
            WHEN datediff('day', o_orderdate, l_shipdate) < 60 THEN '30-59'
            WHEN datediff('day', o_orderdate, l_shipdate) < 90 THEN '60-89'
            ELSE '90+' END AS delay_bucket,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# A74 — audience overlap by SKETCH ALGEBRA: |A ∩ B| for two behavior
# cohorts (clickers vs purchasers) estimated from HLL registers via
# inclusion-exclusion — est_a + est_b - est_union, where the union
# estimate comes from MERGING the two cohorts' registers (per-bucket
# max), never from rescanning the fact table. This is the sketch-
# warehouse contract on top of a59's rollup: registers are the only
# state exchanged, so any number of cohort sketches built on separate
# days/clusters compose into pairwise overlaps at O(m) cost. The
# sketch is the repo's bit-exact integer HLL, so both engines derive
# IDENTICAL estimates; the exact overlap (distinct-user semi-join)
# rides along to show the error.
# ---------------------------------------------------------------------------

_A74_COHORT_A, _A74_COHORT_B = "click", "purchase"


def a74_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.operators.sketch import hll_estimate, hll_registers

    ev = load_table(spark, sf_dir, "events")

    def cohort(etype: str) -> DataFrame:
        return ev.filter(F.col("event_type") == etype).select("user_id")

    regs_a = hll_registers(cohort(_A74_COHORT_A), [], "user_id")
    regs_b = hll_registers(cohort(_A74_COHORT_B), [], "user_id")
    regs_u = (
        regs_a.unionByName(regs_b)
        .groupBy("bucket")
        .agg(F.max("m_j").alias("m_j"))
    )

    def est(regs: DataFrame, name: str) -> DataFrame:
        return hll_estimate(regs, []).select(
            F.col("est_distinct").alias(name)
        )

    exact = (
        cohort(_A74_COHORT_A)
        .distinct()
        .join(cohort(_A74_COHORT_B).distinct(), "user_id", "left_semi")
        .agg(F.count("*").cast("long").alias("exact_overlap"))
    )
    return (
        est(regs_a, "est_a")
        .crossJoin(est(regs_b, "est_b"))
        .crossJoin(est(regs_u, "est_union"))
        .crossJoin(exact)
        .select(
            F.round("est_a", 6).alias("est_a"),
            F.round("est_b", 6).alias("est_b"),
            F.round("est_union", 6).alias("est_union"),
            F.round(
                (F.col("est_a") + F.col("est_b")) - F.col("est_union"), 6
            ).alias("est_overlap"),
            "exact_overlap",
        )
    )


def _a74_oracle() -> str:
    from table_demo_spark.operators.sketch import (
        ALPHA_M2_SCALED,
        M_REGISTERS,
        RANK_CAP,
        VALUE_HEX,
    )

    full_rank = VALUE_HEX * 4 + 1

    def est(tag: str) -> str:
        return (
            f"CAST({ALPHA_M2_SCALED!r} AS DOUBLE) / (s_present_{tag} + "
            f"({M_REGISTERS} - n_registers_{tag}) * (1::BIGINT << {RANK_CAP}))"
        )

    return f"""
WITH ranks AS (
  SELECT event_type,
         CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 2) AS BIGINT) AS bucket,
         least(CASE WHEN CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 3, {VALUE_HEX}) AS BIGINT) > 0
                    THEN {full_rank} - length(bin(CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 3, {VALUE_HEX}) AS BIGINT)))
                    ELSE {RANK_CAP} END, {RANK_CAP}) AS rank
  FROM events
  WHERE event_type IN ('{_A74_COHORT_A}', '{_A74_COHORT_B}')
),
regs AS (
  SELECT event_type, bucket, max(rank) AS m_j FROM ranks GROUP BY 1, 2
),
regs_u AS (SELECT bucket, max(m_j) AS m_j FROM regs GROUP BY 1),
s_a AS (
  SELECT CAST(count(*) AS BIGINT) AS n_registers_a,
         CAST(sum(1::BIGINT << ({RANK_CAP} - m_j)) AS BIGINT) AS s_present_a
  FROM regs WHERE event_type = '{_A74_COHORT_A}'
),
s_b AS (
  SELECT CAST(count(*) AS BIGINT) AS n_registers_b,
         CAST(sum(1::BIGINT << ({RANK_CAP} - m_j)) AS BIGINT) AS s_present_b
  FROM regs WHERE event_type = '{_A74_COHORT_B}'
),
s_u AS (
  SELECT CAST(count(*) AS BIGINT) AS n_registers_u,
         CAST(sum(1::BIGINT << ({RANK_CAP} - m_j)) AS BIGINT) AS s_present_u
  FROM regs_u
),
exact AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_overlap FROM (
    SELECT DISTINCT user_id FROM events WHERE event_type = '{_A74_COHORT_A}'
    INTERSECT
    SELECT DISTINCT user_id FROM events WHERE event_type = '{_A74_COHORT_B}'
  )
)
SELECT round({est('a')}, 6) AS est_a,
       round({est('b')}, 6) AS est_b,
       round({est('u')}, 6) AS est_union,
       round(({est('a')} + {est('b')}) - {est('u')}, 6) AS est_overlap,
       exact_overlap
FROM s_a CROSS JOIN s_b CROSS JOIN s_u CROSS JOIN exact
"""


_A75_ROOTS = 8  # BOM roots: part keys 0..7
_A75_CATALOG = 1024  # BOM spans part keys < 1024 (depth <= 10 — the
#                      per-LEVEL sequential join is recursion's real
#                      cost; the catalog bound keeps it a benchable
#                      constant while the recursion stays data-driven)
_A75_DEPTH_CAP = 40  # recursion guard


def a75_recursive_bom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bill-of-materials rollup via Spark 4's NATIVE ``WITH
    RECURSIVE`` — the classic hierarchy recursion the engine
    previously had to unroll by hand (a37's date spine, a51's BFS,
    a61's Bellman-Ford are fixed-depth unrolls; this one's depth
    follows the DATA). The part table carries an implicit binary
    tree (part k contains parts 2k and 2k+1), so each of the 8
    roots rolls up the retail cents of its whole subtree — ~log2(|part|) recursion steps, fan-out bounded by the
    tree. Both engines run the IDENTICAL recursive SQL; DuckDB's
    inlining hazard does not arise (the recursive CTE is referenced
    once)."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_a75")
    return spark.sql(f"""
WITH RECURSIVE bom(root, pkey, cents, depth) AS (
  SELECT p_partkey, p_partkey,
         CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT), 0
  FROM part_a75 WHERE p_partkey < {_A75_ROOTS}
  UNION ALL
  SELECT b.root, p.p_partkey,
         CAST(CAST(p.p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT), b.depth + 1
  FROM bom b JOIN part_a75 p
    ON p.p_partkey IN (b.pkey * 2, b.pkey * 2 + 1)
  WHERE b.depth < {_A75_DEPTH_CAP} AND p.p_partkey < {_A75_CATALOG}
)
SELECT root,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(cents) AS BIGINT) AS subtree_cents,
       CAST(max(depth) AS BIGINT) AS depth
FROM bom GROUP BY root
""")


def _a75_oracle() -> str:
    return f"""
WITH RECURSIVE bom AS (
  SELECT p_partkey AS root, p_partkey AS pkey,
         CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents, 0 AS depth
  FROM part WHERE p_partkey < {_A75_ROOTS}
  UNION ALL
  SELECT b.root, p.p_partkey,
         CAST(CAST(p.p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT), b.depth + 1
  FROM bom b JOIN part p
    ON p.p_partkey IN (b.pkey * 2, b.pkey * 2 + 1)
  WHERE b.depth < {_A75_DEPTH_CAP} AND p.p_partkey < {_A75_CATALOG}
)
SELECT root,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(cents) AS BIGINT) AS subtree_cents,
       CAST(max(depth) AS BIGINT) AS depth
FROM bom GROUP BY root
"""


def a76_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured events via Spark 4's NATIVE VARIANT type: the
    props JSON is parsed ONCE into a binary variant column
    (parse_json) and fields come out typed through variant_get path
    extraction — the engine-native replacement for repeated
    get_json_object string re-parsing (a11's shape). Per event type:
    count, exact sum of the extracted int, and how many exceed the
    threshold; a parse that silently nulls a field or mistypes the
    extraction shifts the sums."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "events_a76"
    )
    return spark.sql("""
WITH v AS (
  SELECT event_type,
         variant_get(parse_json(props), '$.k', 'long') AS k
  FROM events_a76
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(k) AS BIGINT) AS k_sum,
       CAST(sum(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_hi
FROM v GROUP BY event_type
""")


A76_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(props::JSON->>'k' AS BIGINT)) AS BIGINT) AS k_sum,
       CAST(sum(CASE WHEN CAST(props::JSON->>'k' AS BIGINT) > 50
                THEN 1 ELSE 0 END) AS BIGINT) AS n_hi
FROM events GROUP BY event_type
"""



def a77_pipe_syntax_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1's pricing summary written in Spark 4's NATIVE SQL
    PIPE syntax (|> operators: WHERE -> AGGREGATE ... GROUP BY ->
    ORDER BY) — the engine's new composable query dialect, parsed
    and planned by Catalyst exactly like the classic form. Exact
    DECIMAL sums keep the cross-engine hash bit-stable; the oracle is
    the CLASSIC ANSI restatement, so the pipe parse itself sits on
    the value hash."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_a77"
    )
    return spark.sql("""
FROM lineitem_a77
|> WHERE l_shipdate <= DATE '1998-09-02'
|> AGGREGATE
     CAST(count(*) AS BIGINT) AS n_rows,
     CAST(sum(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT))
       AS BIGINT) AS qty_c,
     CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
       AS BIGINT)) AS BIGINT) AS price_c,
     CAST(sum(CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT))
       AS BIGINT) AS disc_c
   GROUP BY l_returnflag, l_linestatus
|> ORDER BY l_returnflag, l_linestatus
""")


A77_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT))
         AS BIGINT) AS qty_c,
       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
         AS BIGINT)) AS BIGINT) AS price_c,
       CAST(sum(CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT))
         AS BIGINT) AS disc_c
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def a78_collated_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 COLLATION-aware aggregation: market segments are
    case-mangled deterministically per customer (upper on even keys,
    lower on odd), then grouped under UTF8_LCASE collation — the
    engine's collation machinery, not an expression rewrite, merges
    the case variants. Output keys use binary min over the group's
    original strings (deterministic; a collation group's
    representative is not), so the hash pins BOTH that the collated
    grouping merged correctly and that the original casings
    survived. The oracle restates with lower()-keyed grouping.

    ASCII-only equivalence assumption: UTF8_LCASE groups by full
    Unicode case folding, lower() by simple case mapping — these
    coincide for ASCII keys (true for c_mktsegment) but diverge on
    e.g. Turkish dotless I or German sharp s. A non-ASCII fixture
    would need an ICU-folding oracle, not lower()."""
    c = load_table(spark, sf_dir, "customer")
    mangled = c.select(
        F.when(
            F.col("c_custkey") % 2 == 0, F.upper("c_mktsegment")
        ).otherwise(F.lower("c_mktsegment")).alias("seg"),
        "c_acctbal",
    )
    return (
        mangled.groupBy(F.expr("collate(seg, 'UTF8_LCASE')").alias("ck"))
        .agg(
            F.min("seg").alias("seg_min"),
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("c_acctbal").cast("decimal(12,2)") * 100)
                .cast("long")
            ).alias("bal_c"),
        )
        .select("seg_min", "n", "bal_c")
        .orderBy("seg_min")
    )


A78_ORACLE = """
SELECT min(seg) AS seg_min, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT))
         AS BIGINT) AS bal_c
FROM (
  SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
              ELSE lower(c_mktsegment) END AS seg,
         c_acctbal
  FROM customer
)
GROUP BY lower(seg)
ORDER BY seg_min
"""



def a79_listagg_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL-surface additions in one query: ``listagg(...)
    WITHIN GROUP (ORDER BY ...)`` (the ANSI ordered string
    aggregation — previously this engine hand-rolled it via
    array_sort + array_join in a33), ``GROUP BY ALL`` (grouping keys
    inferred from the non-aggregate select list) and ``ORDER BY
    ALL``. Per region: the ordered nation roster and member count.
    The oracle restates with DuckDB's string_agg(... ORDER BY) —
    deterministic because the WITHIN GROUP order is total."""
    load_table(spark, sf_dir, "region").createOrReplaceTempView("region_a79")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_a79")
    return spark.sql("""
SELECT r.r_name AS region,
       listagg(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name)
         AS nations_csv,
       CAST(count(*) AS BIGINT) AS n_nations
FROM region_a79 r JOIN nation_a79 n ON n.n_regionkey = r.r_regionkey
GROUP BY ALL
ORDER BY ALL
""")


A79_ORACLE = """
SELECT r.r_name AS region,
       string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations_csv,
       CAST(count(*) AS BIGINT) AS n_nations
FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
ORDER BY region, nations_csv, n_nations
"""



def a80_variant_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a76's VARIANT layer extended to ARRAY traversal: a
    data-dependent-length JSON array (k%4+1 squared-offset elements)
    is built per event, parsed ONCE into a variant, and walked with
    Spark 4's LATERAL ``variant_explode`` — the engine-native
    array-of-semi-structured flatten (positions + element variants,
    elements extracted typed). The position-weighted sum pins both
    the exploded ORDER and every element value; the oracle restates
    the arithmetic directly from k over a correlated unnest (no JSON
    at all), so a silently dropped/reordered element breaks the
    hash."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "events_a80"
    )
    return spark.sql("""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_elems,
       CAST(sum(pos * variant_get(value, '$', 'long')) AS BIGINT)
         AS wsum,
       CAST(sum(variant_get(value, '$', 'long')) AS BIGINT) AS esum
FROM (
  SELECT event_type,
         parse_json('[' || array_join(
             transform(sequence(0, CAST(k % 4 AS INT)),
                       x -> CAST((k + x) * (k + x) % 97 AS STRING)),
             ',') || ']') AS arr
  FROM (
    SELECT event_type,
           variant_get(parse_json(props), '$.k', 'long') AS k
    FROM events_a80
  )
), LATERAL variant_explode(arr)
GROUP BY event_type
""")


A80_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_elems,
       CAST(sum(i * val) AS BIGINT) AS wsum,
       CAST(sum(val) AS BIGINT) AS esum
FROM (
  SELECT event_type, u.i, ((k + u.i) * (k + u.i)) % 97 AS val
  FROM (SELECT event_type, CAST(props::JSON->>'k' AS BIGINT) AS k
        FROM events),
       LATERAL (SELECT unnest(range(0, k % 4 + 1)) AS i) u
) GROUP BY event_type
"""



def a81_measure_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT — the wide-to-long relational reshape (the inverse of
    a20's PIVOT, closing that pair): three integer-exact line-item
    measures (whole-unit quantity, price in cents, discount in basis
    points — cents/bps via half-up rounding, exact for 2/4-decimal
    doubles) unpivot into (measure, val) rows via the native
    DataFrame ``unpivot`` (Spark 3.4+ UNPIVOT/MELT, JVM-side — no
    Python in the plan), then aggregate per (returnflag, measure).
    The oracle is DuckDB's standard-form UNPIVOT; measure labels are
    the COLUMN NAMES on both engines, so a mislabeled or dropped
    measure column breaks the hash.  Scale shape: unpivot is a
    per-row flatMap (3x row multiplier, no shuffle) feeding one
    partial-then-final aggregation — corpus-linear."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        "l_returnflag",
        F.floor("l_quantity").cast("long").alias("qty_units"),
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("long").alias("price_cents"),
        F.round(F.col("l_discount") * 10000, 0)
        .cast("long").alias("disc_bps"),
    )
    up = base.unpivot(
        ["l_returnflag"],
        ["qty_units", "price_cents", "disc_bps"],
        "measure", "val",
    )
    return (
        up.groupBy("l_returnflag", "measure")
        .agg(
            F.sum("val").cast("long").alias("total"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        .orderBy("l_returnflag", "measure")
    )


A81_ORACLE = """
WITH base AS (
  SELECT l_returnflag,
         CAST(floor(l_quantity) AS BIGINT) AS qty_units,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
         CAST(round(l_discount * 10000) AS BIGINT) AS disc_bps
  FROM lineitem
)
SELECT l_returnflag, measure,
       CAST(sum(val) AS BIGINT) AS total,
       CAST(count(*) AS BIGINT) AS n_rows
FROM base
  UNPIVOT (val FOR measure IN (qty_units, price_cents, disc_bps))
GROUP BY l_returnflag, measure
ORDER BY l_returnflag, measure
"""


def a82_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT — the
    SQL-standard per-row dependent join (top-2 suppliers per nation
    by account balance).  The scale story is what Catalyst DOES with
    it: the lateral subquery is DECORRELATED into one window
    row_number over the inner table plus a broadcast hash join on the
    correlation key (plan-verified: no per-outer-row re-execution,
    no nested loop — at 100 TB the lateral syntax costs exactly one
    shuffle of the inner side).  Cents-exact money, suppkey
    tie-break, identical LATERAL SQL on the DuckDB side."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView(
        "nation_a82"
    )
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView(
        "supplier_a82"
    )
    return spark.sql("""
        SELECT n.n_name, t.s_name,
               CAST(round(t.s_acctbal * 100) AS BIGINT) AS acctbal_cents
        FROM nation_a82 n,
        LATERAL (
          SELECT s.s_name, s.s_acctbal
          FROM supplier_a82 s
          WHERE s.s_nationkey = n.n_nationkey
          ORDER BY s.s_acctbal DESC, s.s_suppkey
          LIMIT 2
        ) t
        ORDER BY n.n_name, acctbal_cents DESC, t.s_name
    """)


A82_ORACLE = """
SELECT n.n_name, t.s_name,
       CAST(round(t.s_acctbal * 100) AS BIGINT) AS acctbal_cents
FROM nation n,
LATERAL (
  SELECT s.s_name, s.s_acctbal
  FROM supplier s
  WHERE s.s_nationkey = n.n_nationkey
  ORDER BY s.s_acctbal DESC, s.s_suppkey
  LIMIT 2
) t
ORDER BY n.n_name, acctbal_cents DESC, t.s_name
"""

QUERIES: list[Query] = [
    Query("an_a1_pricing_summary", a1_pricing_summary, A1_ORACLE),
    Query("an_a2_revenue_by_nation", a2_revenue_by_nation, A2_ORACLE),
    Query("an_a3_top_customers", a3_top_customers, A3_ORACLE),
    Query("an_a4_rollup", a4_rollup, A4_ORACLE),
    Query("an_a5_semi_join", a5_semi_join, A5_ORACLE),
    Query("an_a6_set_ops", a6_set_ops, A6_ORACLE),
    Query("an_a7_window_rank", a7_window_rank, A7_ORACLE),
    Query("an_a8_distinct_agg", a8_distinct_agg, A8_ORACLE),
    Query("an_a9_interval_join", a9_interval_join, A9_ORACLE),
    Query("an_a10_sessionize", a10_sessionize, A10_ORACLE),
    Query("an_a11_json_extract", a11_json_extract, A11_ORACLE),
    Query("an_a12_asof_join", a12_asof_join, A12_ORACLE),
    Query("an_a13_salted_agg", a13_salted_agg, A13_ORACLE),
    Query("an_a14_cube", a14_cube, A14_ORACLE),
    Query("an_a15_sliding_window", a15_sliding_window, A15_ORACLE),
    Query("an_a16_part_filter", a16_part_filter, A16_ORACLE),
    Query("an_a17_anti_join", a17_anti_join, A17_ORACLE),
    Query("an_a18_full_outer", a18_full_outer, A18_ORACLE),
    Query("an_a19_percentiles", a19_percentiles, A19_ORACLE),
    Query("an_a20_pivot", a20_pivot, A20_ORACLE),
    Query("an_a21_correlated_subquery", a21_correlated_subquery, A21_ORACLE),
    Query("an_a22_lag_gaps", a22_lag_gaps, A22_ORACLE),
    Query("an_a23_market_share", a23_market_share, A23_ORACLE),
    Query("an_a24_grouping_sets", a24_grouping_sets, A24_ORACLE),
    Query("an_a25_min_cost_supplier", a25_min_cost_supplier, A25_ORACLE),
    Query("an_a26_conditional_agg", a26_conditional_agg, A26_ORACLE),
    Query("an_a27_distribution_windows", a27_distribution_windows, A27_ORACLE),
    Query("an_a28_unpivot", a28_unpivot, A28_ORACLE),
    Query("an_a29_bucketed_join", a29_bucketed_join, A29_ORACLE),
    Query("an_a30_array_agg", a30_array_agg, A30_ORACLE),
    Query("an_a31_merge_into", a31_merge_into, A31_ORACLE),
    Query("an_a32_cdc_materialize", a32_cdc_materialize, A32_ORACLE),
    Query("an_a33_histogram_quantiles", a33_histogram_quantiles, A33_ORACLE),
    Query("an_a34_zorder_skipping", a34_zorder_skipping, A34_ORACLE),
    Query("an_a35_funnel", a35_funnel, A35_ORACLE),
    Query("an_a36_scd2_history", a36_scd2_history, A36_ORACLE),
    Query("an_a37_date_spine", a37_date_spine, A37_ORACLE),
    Query("an_a38_multi_predicate", a38_multi_predicate, A38_ORACLE),
    Query("an_a39_time_travel_diff", a39_time_travel_diff, A39_ORACLE),
    Query("an_a40_cohort_retention", a40_cohort_retention, A40_ORACLE),
    Query("an_a41_pagerank", a41_pagerank, _a41_oracle()),
    Query("an_a42_spatial_join", a42_spatial_join, A42_ORACLE),
    Query("an_a43_skyline", a43_skyline, A43_ORACLE),
    Query("an_a44_triangle_count", a44_triangle_count, A44_ORACLE),
    Query("an_a45_waiting_suppliers", a45_waiting_suppliers, A45_ORACLE),
    Query("an_a46_mad_outliers", a46_mad_outliers, A46_ORACLE),
    Query("an_a47_incremental_mv", a47_incremental_mv, A47_ORACLE),
    Query("an_a48_max_concurrency", a48_max_concurrency, A48_ORACLE),
    Query("an_a49_custdist", a49_custdist, A49_ORACLE),
    Query("an_a50_hot_key_join", a50_hot_key_join, A50_ORACLE),
    Query("an_a51_bfs_reachability", a51_bfs_reachability, A51_ORACLE),
    Query("an_a52_important_parts", a52_important_parts, A52_ORACLE),
    Query("an_a53_top_supplier", a53_top_supplier, A53_ORACLE),
    Query("an_a54_supplier_relationship", a54_supplier_relationship, A54_ORACLE),
    Query("an_a55_small_qty_revenue", a55_small_qty_revenue, A55_ORACLE),
    Query("an_a56_large_volume_customers", a56_large_volume_customers, A56_ORACLE),
    Query("an_a57_excess_shipment_suppliers", a57_excess_shipment_suppliers, A57_ORACLE),
    Query("an_a58_global_sales_opportunity", a58_global_sales_opportunity, A58_ORACLE),
    Query("an_a59_hll_rollup", a59_hll_rollup, _a59_oracle()),
    Query("an_a60_event_paths", a60_event_paths, A60_ORACLE),
    Query("an_a61_shortest_path", a61_shortest_path, A61_ORACLE),
    Query("an_a62_validity_audit", a62_validity_audit, A62_ORACLE),
    Query("an_a63_profile_knn", a63_profile_knn, _a63_oracle()),
    Query("an_a64_label_propagation", a64_label_propagation, _a64_oracle()),
    Query("an_a65_returned_item_reporting", a65_returned_item_reporting, A65_ORACLE),
    Query("an_a66_local_supplier_volume", a66_local_supplier_volume, A66_ORACLE),
    Query("an_a67_volume_shipping", a67_volume_shipping, A67_ORACLE),
    Query("an_a68_promotion_effect", a68_promotion_effect, A68_ORACLE),
    Query("an_a69_product_profit", a69_product_profit, A69_ORACLE),
    Query("an_a70_shipping_priority", a70_shipping_priority, A70_ORACLE),
    Query("an_a71_order_priority", a71_order_priority, A71_ORACLE),
    Query("an_a72_revenue_forecast", a72_revenue_forecast, A72_ORACLE),
    Query("an_a73_shipping_delay", a73_shipping_delay, A73_ORACLE),
    Query("an_a74_audience_overlap", a74_audience_overlap, _a74_oracle()),
    Query("an_a75_recursive_bom", a75_recursive_bom, _a75_oracle()),
    Query("an_a76_variant_json", a76_variant_json, A76_ORACLE),
    Query("an_a77_pipe_syntax_pricing", a77_pipe_syntax_pricing, A77_ORACLE),
    Query("an_a78_collated_segments", a78_collated_segments, A78_ORACLE),
    Query("an_a79_listagg_group_by_all", a79_listagg_group_by_all, A79_ORACLE),
    Query("an_a80_variant_explode", a80_variant_explode, A80_ORACLE),
    Query("an_a81_measure_unpivot", a81_measure_unpivot, A81_ORACLE),
    Query("an_a82_lateral_topk", a82_lateral_topk, A82_ORACLE),
]
