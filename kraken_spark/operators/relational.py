"""Core relational operators over the TPC-H-ish testdata tables.

Implements the reference's implicit dataflow operators (SURVEY.md §2.8) as
genuine Spark relational plans: projection/filter (predicate pushdown),
broadcast + shuffle joins, grouped/rollup aggregation, windows (ranking,
running totals, sessionization), sorts/top-k, set ops, semi/anti joins,
string/date/conditional expressions. Every aggregate column is explicitly
aliased identically in the DataFrame plan and the DuckDB oracle SQL; money
sums are rounded to stabilize cross-engine float summation order.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------- TPC-H style
def q1_pricing_summary(spark, sf):
    l = t(spark, sf, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark, sf):
    c = t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf, "orders").filter(F.col("o_orderdate") < F.lit("1995-03-15"))
    l = t(spark, sf, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier_volume(spark, sf):
    r = t(spark, sf, "region")
    n = t(spark, sf, "nation")
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    l = t(spark, sf, "lineitem")
    s = t(spark, sf, "supplier")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .filter(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_SQL = """
SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q6_forecast_revenue(spark, sf):
    l = t(spark, sf, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01"))
            & (F.col("l_shipdate") < F.lit("1995-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


Q6_SQL = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01' AND l_shipdate < TIMESTAMP '1995-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def q10_returned_items(spark, sf):
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    l = t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --------------------------------------------------------------- primitives
def filter_project(spark, sf):
    l = t(spark, sf, "lineitem")
    return (
        l.filter((F.col("l_quantity") > 45) & (F.col("l_discount") < 0.02))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 2).alias("charged"),
            F.col("l_returnflag").alias("flag"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


FILTER_PROJECT_SQL = """
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 2) AS charged,
       l_returnflag AS flag
FROM lineitem
WHERE l_quantity > 45 AND l_discount < 0.02
ORDER BY l_orderkey, l_linenumber
"""


def join_broadcast_dims(spark, sf):
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region")
    c = t(spark, sf, "customer")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
        .orderBy("r_name")
    )


JOIN_BROADCAST_SQL = """
SELECT r_name, COUNT(*) AS n_customers, ROUND(SUM(c_acctbal), 2) AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


def agg_rollup(spark, sf):
    l = t(spark, sf, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first()
        )
    )


AGG_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def window_topk_per_group(spark, sf):
    o = t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("price"), "rk")
        .orderBy("o_custkey", "rk")
    )


WINDOW_TOPK_SQL = """
SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS price, rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders) s
WHERE rk <= 3
ORDER BY o_custkey, rk
"""


def window_running_sum(spark, sf):
    o = t(spark, sf, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("running", F.round(F.sum("o_totalprice").over(w), 2))
        .select("o_custkey", "o_orderkey", "running")
        .orderBy("o_custkey", "o_orderkey")
    )


WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS running
FROM orders
WHERE o_custkey < 100
ORDER BY o_custkey, o_orderkey
"""


def topk_orders(spark, sf):
    o = t(spark, sf, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("price"))
        .limit(25)
    )


TOPK_SQL = """
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS price
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
"""


def set_ops(spark, sf):
    c = t(spark, sf, "customer")
    big = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    build = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    auto = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    return (
        big.intersect(build)
        .union(big.intersect(auto))
        .exceptAll(c.filter(F.col("c_acctbal") > 9000).select("c_custkey"))
        .distinct()
        .orderBy("c_custkey")
    )


SET_OPS_SQL = """
SELECT DISTINCT c_custkey FROM (
  (SELECT c_custkey FROM customer WHERE c_acctbal > 5000
   INTERSECT SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
  UNION ALL
  (SELECT c_custkey FROM customer WHERE c_acctbal > 5000
   INTERSECT SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
  EXCEPT ALL
  SELECT c_custkey FROM customer WHERE c_acctbal > 9000
) s ORDER BY c_custkey
"""


def distinct_agg(spark, sf):
    l = t(spark, sf, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    ).orderBy("l_returnflag")


DISTINCT_AGG_SQL = """
SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def string_funcs(spark, sf):
    p = t(spark, sf, "part")
    return (
        p.select(
            "p_partkey",
            F.upper(F.col("p_brand")).alias("brand_u"),
            F.substring("p_name", 1, 5).alias("prefix"),
            F.length("p_name").alias("name_len"),
            F.regexp_replace("p_type", "[aeiou]", "").alias("type_novowel"),
        )
        .filter(F.col("name_len") > 10)
        .orderBy("p_partkey")
    )


STRING_FUNCS_SQL = """
SELECT p_partkey, UPPER(p_brand) AS brand_u, SUBSTR(p_name, 1, 5) AS prefix,
       LENGTH(p_name) AS name_len, REGEXP_REPLACE(p_type, '[aeiou]', '', 'g') AS type_novowel
FROM part WHERE LENGTH(p_name) > 10 ORDER BY p_partkey
"""


def date_funcs(spark, sf):
    o = t(spark, sf, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
        )
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("volume"))
        .orderBy("yr", "mo")
    )


DATE_FUNCS_SQL = """
SELECT EXTRACT(year FROM o_orderdate) AS yr, EXTRACT(month FROM o_orderdate) AS mo,
       COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS volume
FROM orders GROUP BY 1, 2 ORDER BY yr, mo
"""


def case_when_agg(spark, sf):
    o = t(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_open"),
        F.sum(F.when(~F.col("o_orderstatus").isin("F", "O"), 1).otherwise(0)).alias("n_other"),
    ).orderBy("o_orderpriority")


CASE_WHEN_SQL = """
SELECT o_orderpriority,
       SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS n_finished,
       SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS n_open,
       SUM(CASE WHEN o_orderstatus NOT IN ('F','O') THEN 1 ELSE 0 END) AS n_other
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def semi_join_customers(spark, sf):
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").filter(F.col("o_totalprice") > 30000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


SEMI_JOIN_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 30000)
ORDER BY c_custkey
"""


def anti_join_customers(spark, sf):
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


ANTI_JOIN_SQL = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


# --------------------------------------------------------------- events
def events_sessionize(spark, sf):
    """Gap-based sessionization (30-min inactivity) — lag + cumulative sum,
    the batch analog of streaming session windows."""
    e = t(spark, sf, "events").withColumn("ts_s", F.expr("to_unix_timestamp(ts)"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gapped = e.withColumn(
        "new_session",
        F.when(
            F.col("ts_s") - F.lag("ts_s").over(w) > 1800,
            1,
        ).otherwise(F.when(F.lag("ts").over(w).isNull(), 1).otherwise(0)),
    )
    sess = gapped.withColumn("session_id", F.sum("new_session").over(w))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
        .orderBy("user_id", "session_id")
    )


EVENTS_SESSION_SQL = """
WITH gapped AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > 1800 OR LAG(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
  FROM gapped)
SELECT user_id, session_id, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS session_value
FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id
"""


def events_tumbling_window(spark, sf):
    """Tumbling 1-hour windows per event type (batch form of the streaming
    windowed aggregation in kraken_spark.streaming)."""
    e = t(spark, sf, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").cast("string").alias("bucket"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 6).alias("avg_value"))
        .orderBy("bucket", "event_type")
    )


EVENTS_TUMBLING_SQL = """
SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS bucket, event_type,
       COUNT(*) AS n, ROUND(AVG(value), 6) AS avg_value
FROM events GROUP BY 1, 2 ORDER BY bucket, event_type
"""


def events_json_extract(spark, sf):
    e = t(spark, sf, "events")
    return (
        e.select(
            "event_id",
            F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("int").alias("k"),
        )
        .filter(F.col("k") > 90)
        .orderBy("event_id")
    )


EVENTS_JSON_SQL = """
SELECT event_id, CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT) AS k
FROM events
WHERE CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT) > 90
ORDER BY event_id
"""


def agg_cube(spark, sf):
    """CUBE aggregation + grouping_id (SURVEY.md §2.8 grouped aggregation;
    extends agg_rollup to the full lattice)."""
    l = t(spark, sf, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n"),
            F.sum("l_quantity").alias("sum_qty"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


AGG_CUBE_SQL = """
SELECT GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS gid,
       COUNT(*) AS n, SUM(l_quantity) AS sum_qty,
       l_returnflag, l_linestatus
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag, l_linestatus
"""


def range_theta_join(spark, sf):
    """Equi + range (theta) join: lineitems whose quantity falls within
    +-2 of their part's size — the relational form of the reference's
    midpoint-in-polygon spatial predicate (SURVEY.md §2.8 theta/spatial
    join, /root/reference/kraken/lib/segmentation.py:906-922)."""
    l = t(spark, sf, "lineitem")
    p = t(spark, sf, "part")
    joined = l.join(
        F.broadcast(p),
        (l.l_partkey == p.p_partkey)
        & (l.l_quantity >= p.p_size - 2)
        & (l.l_quantity <= p.p_size + 2),
    )
    return (
        joined.groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            # integer-cent quantization: cross-engine float-sum order safe
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "revenue_cents"
            ),
        )
        .orderBy("p_brand")
    )


RANGE_THETA_SQL = """
SELECT p_brand, COUNT(*) AS n,
       SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS revenue_cents
FROM lineitem JOIN part ON l_partkey = p_partkey
 AND l_quantity BETWEEN p_size - 2 AND p_size + 2
GROUP BY p_brand ORDER BY p_brand
"""


def pivot_event_types(spark, sf):
    """Pivot: per user-bucket event-type counts as columns (conditional
    aggregation in the oracle — semantically identical)."""
    e = t(spark, sf, "events")
    return (
        e.withColumn("bucket", F.pmod("user_id", F.lit(10)).cast("int"))
        .groupBy("bucket")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
        .orderBy("bucket")
    )


PIVOT_SQL = """
SELECT CAST(user_id % 10 AS INT) AS bucket,
       COUNT(*) FILTER (event_type = 'click')    AS click,
       COUNT(*) FILTER (event_type = 'error')    AS error,
       COUNT(*) FILTER (event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (event_type = 'signup')   AS signup,
       COUNT(*) FILTER (event_type = 'view')     AS view
FROM events GROUP BY bucket ORDER BY bucket
"""


def corr_stats(spark, sf):
    """Numeric aggregate battery: corr / stddev / variance per event type
    (rounded — cross-engine float reduction order differs)."""
    e = t(spark, sf, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.round(F.corr("value", F.col("user_id").cast("double")), 6).alias("corr_vu"),
            F.round(F.stddev_samp("value"), 6).alias("sd_value"),
            F.round(F.var_samp("value"), 6).alias("var_value"),
            F.round(F.avg("value"), 6).alias("mean_value"),
        )
        .orderBy("event_type")
    )


CORR_STATS_SQL = """
SELECT event_type,
       ROUND(CORR(value, CAST(user_id AS DOUBLE)), 6) AS corr_vu,
       ROUND(STDDEV_SAMP(value), 6) AS sd_value,
       ROUND(VAR_SAMP(value), 6) AS var_value,
       ROUND(AVG(value), 6) AS mean_value
FROM events GROUP BY event_type ORDER BY event_type
"""


def spearman_footrule(spark, sf):
    """Reading-order evaluation metric: mean |rank_by_ts - rank_by_value|
    per user (the Spearman footrule the reference tracks for neural RO,
    /root/reference/kraken/lib/ro/model.py:63-64) over the events table."""
    e = t(spark, sf, "events")
    w_ts = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_val = Window.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
    ranked = e.select(
        "user_id",
        F.row_number().over(w_ts).alias("r_ts"),
        F.row_number().over(w_val).alias("r_val"),
    )
    per_user = ranked.groupBy("user_id").agg(
        F.avg(F.abs(F.col("r_ts") - F.col("r_val"))).alias("footrule")
    )
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.round(F.avg("footrule"), 6).alias("mean_footrule"),
        F.round(F.max("footrule"), 6).alias("max_footrule"),
    )


FOOTRULE_SQL = """
WITH ranked AS (
  SELECT user_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS r_ts,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS r_val
  FROM events
), per_user AS (
  SELECT user_id, AVG(ABS(r_ts - r_val)) AS footrule FROM ranked GROUP BY user_id
)
SELECT COUNT(*) AS n_users, ROUND(AVG(footrule), 6) AS mean_footrule,
       ROUND(MAX(footrule), 6) AS max_footrule
FROM per_user
"""


def q18_large_volume_customers(spark, sf):
    """TPC-H Q18 shape: customers whose orders carry a large total
    quantity — an IN-subquery (left-semi join in Spark) over a grouped
    HAVING, then a three-way join + re-aggregation."""
    l = t(spark, sf, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    o = t(spark, sf, "orders").join(big, F.col("o_orderkey") == big.l_orderkey, "left_semi")
    c = t(spark, sf, "customer")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("total_price"),
            "sum_qty",
        )
        .orderBy(F.desc("total_price"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       ROUND(o_totalprice, 2) AS total_price,
       ROUND(SUM(l_quantity), 2) AS sum_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 150)
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY total_price DESC, o_orderdate, o_orderkey
LIMIT 100
"""


def window_lead_lag(spark, sf):
    """lead/lag over per-customer order history: days since the previous
    order and value delta to the next one (the §2.8 windowed-sequence
    shape — same plan as per-page line-to-line geometry deltas)."""
    o = t(spark, sf, "orders").filter(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("days_since_prev"),
            F.round(F.lead("o_totalprice").over(w) - F.col("o_totalprice"), 2).alias("next_price_delta"),
            F.row_number().over(w).alias("rn"),
        )
        .orderBy("o_custkey", "rn")
    )


WINDOW_LEAD_LAG_SQL = """
SELECT o_custkey, o_orderkey,
       DATE_DIFF('day',
                 LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                 o_orderdate) AS days_since_prev,
       ROUND(LEAD(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             - o_totalprice, 2) AS next_price_delta,
       ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
FROM orders
WHERE o_custkey < 200
ORDER BY o_custkey, rn
"""


QUERIES = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q18_large_volume_customers": (q18_large_volume_customers, Q18_SQL),
    "window_lead_lag": (window_lead_lag, WINDOW_LEAD_LAG_SQL),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q5_local_supplier_volume": (q5_local_supplier_volume, Q5_SQL),
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "q10_returned_items": (q10_returned_items, Q10_SQL),
    "filter_project": (filter_project, FILTER_PROJECT_SQL),
    "join_broadcast_dims": (join_broadcast_dims, JOIN_BROADCAST_SQL),
    "agg_rollup": (agg_rollup, AGG_ROLLUP_SQL),
    "window_topk_per_group": (window_topk_per_group, WINDOW_TOPK_SQL),
    "window_running_sum": (window_running_sum, WINDOW_RUNNING_SQL),
    "topk_orders": (topk_orders, TOPK_SQL),
    "set_ops": (set_ops, SET_OPS_SQL),
    "distinct_agg": (distinct_agg, DISTINCT_AGG_SQL),
    "string_funcs": (string_funcs, STRING_FUNCS_SQL),
    "date_funcs": (date_funcs, DATE_FUNCS_SQL),
    "case_when_agg": (case_when_agg, CASE_WHEN_SQL),
    "semi_join_customers": (semi_join_customers, SEMI_JOIN_SQL),
    "anti_join_customers": (anti_join_customers, ANTI_JOIN_SQL),
    "events_sessionize": (events_sessionize, EVENTS_SESSION_SQL),
    "events_tumbling_window": (events_tumbling_window, EVENTS_TUMBLING_SQL),
    "events_json_extract": (events_json_extract, EVENTS_JSON_SQL),
    "agg_cube": (agg_cube, AGG_CUBE_SQL),
    "range_theta_join": (range_theta_join, RANGE_THETA_SQL),
    "pivot_event_types": (pivot_event_types, PIVOT_SQL),
    "corr_stats": (corr_stats, CORR_STATS_SQL),
    "spearman_footrule": (spearman_footrule, FOOTRULE_SQL),
}
