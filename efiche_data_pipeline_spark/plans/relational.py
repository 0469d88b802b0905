"""Relational operator parity: the reference's 12-query analytics corpus
(reference: sql/analytics_queries.sql:1-205, src/run_analytics.py:25-173)
and its warehouse materialized views (sql/03_warehouse.sql:112-156),
re-expressed Spark-first on the driver's TPC-H-ish fixture tables.

Every query is a pure function ``(spark, sf_dir) -> DataFrame`` with a
paired ANSI-SQL oracle (DuckDB dialect) in ``ORACLES``. Conventions
that make the DuckDB comparison exact:

- money aggregates go through DECIMAL(38,6) and surface as DOUBLE
  (see functions.numeric) — associative, so parallel partials match
  a single-threaded oracle bit-for-bit;
- every computed column is aliased identically on both sides;
- counts are BIGINT on both sides (DuckDB's HUGEINT sums are cast);
- ORDER BY ... LIMIT always carries a unique tie-break key;
- no raw timestamps in outputs (dates or formatted strings instead).

Scale posture (100 TB): dims (region/nation/customer/part/supplier at
warehouse ratios) broadcast; fact-side aggregations are partial
(map-side combine) before the shuffle; per-group top-K uses window +
filter (no global sort); global top-K uses TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.dates import date_parts
from ..functions.numeric import (
    money_avg,
    money_sum,
    oracle_money_avg,
    oracle_money_sum,
)
from ..sources.catalog import load_table

ORACLES: dict[str, str] = {}


# ---------------------------------------------------------------------------
# Q1 — pricing summary: multi-agg GROUP BY with filter pushdown.
# Operators: A1/A3/A4/A5 (+F1 round); reference run_analytics.py:85-92
# global-stats query generalized to TPC-H Q1 shape.
# ---------------------------------------------------------------------------
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity").alias("sum_qty"),
            money_sum("l_extendedprice").alias("sum_base_price"),
            money_sum(disc_price).alias("sum_disc_price"),
            money_sum(charge).alias("sum_charge"),
            money_avg("l_quantity", scale=4).alias("avg_qty"),
            money_avg("l_extendedprice", scale=4).alias("avg_price"),
            money_avg("l_discount", scale=4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLES["q01_pricing_summary"] = f"""
SELECT l_returnflag, l_linestatus,
       {oracle_money_sum('l_quantity')} AS sum_qty,
       {oracle_money_sum('l_extendedprice')} AS sum_base_price,
       {oracle_money_sum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {oracle_money_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {oracle_money_avg('l_quantity', scale=4)} AS avg_qty,
       {oracle_money_avg('l_extendedprice', scale=4)} AS avg_price,
       {oracle_money_avg('l_discount', scale=4)} AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Q2 — monthly rollup: the mv_monthly_encounters analogue.
# Operators: M1, A2/A3/A5, P4; reference sql/03_warehouse.sql:112-124.
# ---------------------------------------------------------------------------
def q02_monthly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").alias("o_year"),
            F.month("o_orderdate").alias("o_month"),
            F.date_format("o_orderdate", "MMMM").alias("month_name"),
            "o_custkey",
            "o_totalprice",
        )
        .groupBy("o_year", "o_month", "month_name")
        .agg(
            F.count(F.lit(1)).alias("total_orders"),
            F.countDistinct("o_custkey").alias("unique_customers"),
            money_sum("o_totalprice").alias("total_revenue"),
            money_avg("o_totalprice").alias("avg_revenue"),
        )
    )


ORACLES["q02_monthly_orders"] = f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(month(o_orderdate) AS INTEGER) AS o_month,
       monthname(o_orderdate) AS month_name,
       CAST(COUNT(*) AS BIGINT) AS total_orders,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS unique_customers,
       {oracle_money_sum('o_totalprice')} AS total_revenue,
       {oracle_money_avg('o_totalprice')} AS avg_revenue
FROM orders
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Q3 — per-group top-K via row_number window.
# Operators: W1 (reference sql/analytics_queries.sql:23-41 'top 5
# diagnoses per age group'; segment ≈ age_group, spend ≈ diagnosis count).
# ---------------------------------------------------------------------------
def q03_top_customers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    spend = (
        o.groupBy("o_custkey")
        .agg(
            money_sum("o_totalprice").alias("total_spent"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
    )
    w = W.partitionBy("c_mktsegment").orderBy(
        F.desc("total_spent"), F.asc("c_custkey")
    )
    return (
        spend.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("c_mktsegment", "c_custkey", "c_name", "total_spent", "n_orders", "rank")
    )


ORACLES["q03_top_customers_per_segment"] = f"""
SELECT c_mktsegment, c_custkey, c_name, total_spent, n_orders,
       CAST(row_number() OVER (PARTITION BY c_mktsegment
                               ORDER BY total_spent DESC, c_custkey) AS INTEGER) AS rank
FROM (
    SELECT c_mktsegment, c_custkey, c_name,
           {oracle_money_sum('o_totalprice')} AS total_spent,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1, 2, 3
)
QUALIFY rank <= 5
"""


# ---------------------------------------------------------------------------
# Q4 — quarter-over-quarter growth: LAG over an aggregate + NULLIF guard.
# Operators: W2 (reference sql/analytics_queries.sql:152-172).
# ---------------------------------------------------------------------------
def q04_qoq_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    per_q = o.groupBy(
        F.year("o_orderdate").alias("o_year"),
        F.quarter("o_orderdate").alias("o_quarter"),
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    w = W.orderBy("o_year", "o_quarter")
    prev = F.lag("n_orders").over(w)
    return per_q.select(
        "o_year",
        "o_quarter",
        "n_orders",
        prev.alias("prev_orders"),
        F.round(
            (F.col("n_orders") - prev) * F.lit(100.0) / F.nullif(prev, F.lit(0)), 2
        ).alias("growth_pct"),
    )


ORACLES["q04_qoq_growth"] = """
SELECT o_year, o_quarter, n_orders,
       lag(n_orders) OVER w AS prev_orders,
       ROUND((n_orders - lag(n_orders) OVER w) * 100.0
             / NULLIF(lag(n_orders) OVER w, 0), 2) AS growth_pct
FROM (
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(quarter(o_orderdate) AS INTEGER) AS o_quarter,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY 1, 2
)
WINDOW w AS (ORDER BY o_year, o_quarter)
"""


# ---------------------------------------------------------------------------
# Q5 — percent of total: unpartitioned window over an aggregate.
# Operators: W3 (reference sql/analytics_queries.sql:85-95 'encounter
# type distribution'; priority ≈ encounter_type).
# ---------------------------------------------------------------------------
def q05_pct_of_total_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))
    total = F.sum("n_orders").over(W.partitionBy())
    return agg.select(
        "o_orderpriority",
        "n_orders",
        F.round(F.col("n_orders") * F.lit(100.0) / total, 2).alias("pct_of_total"),
    )


ORACLES["q05_pct_of_total_by_priority"] = """
SELECT o_orderpriority, n_orders,
       ROUND(n_orders * 100.0 / SUM(n_orders) OVER (), 2) AS pct_of_total
FROM (
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY 1
)
"""


# ---------------------------------------------------------------------------
# Q6 — conditional aggregates per nation.
# Operators: A7 (reference sql/analytics_queries.sql:122,181,202:
# SUM(CASE WHEN ...), COUNT(DISTINCT CASE WHEN ...)).
# ---------------------------------------------------------------------------
def q06_conditional_agg_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias(
            "fulfilled_orders"
        ),
        F.countDistinct(
            F.when(F.col("o_totalprice") > 400000, F.col("o_custkey"))
        ).alias("big_spenders"),
    )


ORACLES["q06_conditional_agg_by_nation"] = """
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
           AS fulfilled_orders,
       CAST(COUNT(DISTINCT CASE WHEN o_totalprice > 400000 THEN o_custkey END)
           AS BIGINT) AS big_spenders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# Q7 — FLAGSHIP: 4-way star join + multi-distinct aggregate.
# Operators: J1-J4, A2, A5 (reference sql/analytics_queries.sql:100-110
# 'facility utilization'; region/nation ≈ facility rollup).
# ---------------------------------------------------------------------------
def q07_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy("r_name", "n_name").agg(
        F.countDistinct("c_custkey").alias("unique_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        money_sum("o_totalprice").alias("total_revenue"),
        money_avg("o_totalprice").alias("avg_order_value"),
    )


ORACLES["q07_star_join_revenue"] = f"""
SELECT r_name, n_name,
       CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS unique_customers,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {oracle_money_sum('o_totalprice')} AS total_revenue,
       {oracle_money_avg('o_totalprice')} AS avg_order_value
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# ---------------------------------------------------------------------------
# Q8 — HAVING post-aggregation filter.
# Operators: A6 (reference sql/analytics_queries.sql:113-128 'high
# utilization patients', HAVING COUNT(DISTINCT ...) >= 5).
# ---------------------------------------------------------------------------
def q08_loyal_customers_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum("o_totalprice").alias("total_spent"),
        )
        .filter(F.col("n_orders") >= 15)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .select("c_custkey", "c_name", "n_orders", "total_spent")
    )


ORACLES["q08_loyal_customers_having"] = f"""
SELECT c_custkey, c_name,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {oracle_money_sum('o_totalprice')} AS total_spent
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
HAVING COUNT(*) >= 15
"""


# ---------------------------------------------------------------------------
# Q9 — theta self-join: co-occurrence pairs within an order.
# Operators: J6 (reference sql/analytics_queries.sql:131-149 'diagnosis
# co-occurrence': equi on encounter + residual key inequality). Output is
# the co-occurrence histogram so the result stays small at any scale.
# ---------------------------------------------------------------------------
def q09_copurchase_pairs_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same result as the naive self-join (a ⋈ b ON ok AND pa < pb) the
    # oracle runs, but with the q26 in-row lever: group lines per
    # order (bounded fan-in — parts per order), generate the strict
    # value-pair combinations inside the row with higher-order
    # functions, and only then shuffle the pairs. One lineitem
    # exchange instead of two plus a join; pair multiplicity is
    # preserved (duplicate parts in an order contribute one pair per
    # occurrence combination, equal-value pairs are excluded — exactly
    # the `pa < pb` semantics).
    from ..operators.dedup import _pair_combinations

    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_partkey")).alias("parts")
    )
    pairs = per_order.select(
        F.explode(
            F.filter(_pair_combinations(F.col("parts")), lambda p: p.a != p.b)
        ).alias("p")
    )
    per_pair = pairs.groupBy(
        F.col("p.a").alias("part_a"), F.col("p.b").alias("part_b")
    ).agg(F.count(F.lit(1)).alias("n_cooccur"))
    return per_pair.groupBy("n_cooccur").agg(F.count(F.lit(1)).alias("n_pairs"))


ORACLES["q09_copurchase_pairs_theta"] = """
SELECT n_cooccur, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM (
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(COUNT(*) AS BIGINT) AS n_cooccur
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
)
GROUP BY n_cooccur
"""


# ---------------------------------------------------------------------------
# Q10 — left-semi join (EXISTS).
# Operators: J8 (reference populate_warehouse.py:178-185 has_report EXISTS).
# ---------------------------------------------------------------------------
def q10_urgent_customers_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(
        urgent, c.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


ORACLES["q10_urgent_customers_semi_join"] = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
"""


# ---------------------------------------------------------------------------
# Q11 — left-anti join (NOT EXISTS / dedup-before-insert shape).
# Operators: J9/K1 (reference etl_pipeline.py:97 ON CONFLICT DO NOTHING
# ≡ anti-join against existing keys).
# ---------------------------------------------------------------------------
def q11_no_urgent_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(
        urgent, c.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")


ORACLES["q11_no_urgent_anti_join"] = """
SELECT c_custkey, c_name, c_mktsegment, c_acctbal
FROM customer c
WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
"""


# ---------------------------------------------------------------------------
# Q12 — child-count denormalization: left join + COALESCE(count, 0).
# Operators: J5/J7 (reference populate_warehouse.py:158-175 correlated
# 'SET num_procedures = (SELECT COUNT(*) ...)' → groupBy + left join).
# ---------------------------------------------------------------------------
def q12_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("cnt"),
        money_sum("o_totalprice").alias("spent"),
    )
    return c.join(counts, c.c_custkey == counts.o_custkey, "left").select(
        "c_custkey",
        "c_name",
        F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("n_orders"),
        F.coalesce(F.col("spent"), F.lit(0.0)).alias("total_spent"),
    )


ORACLES["q12_orders_per_customer"] = f"""
SELECT c_custkey, c_name,
       COALESCE(cnt, 0) AS n_orders,
       COALESCE(spent, CAST(0.0 AS DOUBLE)) AS total_spent
FROM customer
LEFT JOIN (
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt,
           {oracle_money_sum('o_totalprice')} AS spent
    FROM orders GROUP BY 1
) ON c_custkey = o_custkey
"""


# ---------------------------------------------------------------------------
# Q13 — incremental staging scan: filter + ORDER BY DESC NULLS LAST + LIMIT.
# Operators: S5/O2/P7 (reference etl_pipeline.py:125-132: WHERE processed
# = FALSE ORDER BY study_date DESC NULLS LAST LIMIT 5000). The unique
# event_id tie-break makes the LIMIT cut deterministic.
# ---------------------------------------------------------------------------
def q13_incremental_scan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type") != "error")
        .orderBy(F.col("ts").desc_nulls_last(), F.col("event_id").desc())
        .limit(5000)
        .select("event_id", "user_id", "event_type", "value")
    )


ORACLES["q13_incremental_scan_events"] = """
SELECT event_id, user_id, event_type, value
FROM events
WHERE event_type <> 'error'
ORDER BY ts DESC NULLS LAST, event_id DESC
LIMIT 5000
"""


# ---------------------------------------------------------------------------
# Q14 — dim_time derivation: every date-part attribute from a date column.
# Operators: P4/P5 (reference populate_warehouse.py:28-37, dim_time DDL
# sql/03_warehouse.sql:57-70).
# ---------------------------------------------------------------------------
def q14_dim_time_from_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    dates = o.select(F.col("o_orderdate").cast("date").alias("d")).distinct()
    parts = date_parts(F.col("d"))
    return dates.select(*[expr.alias(name) for name, expr in parts.items()])


ORACLES["q14_dim_time_from_orders"] = """
SELECT CAST(strftime(d, '%Y%m%d') AS INTEGER) AS date_key,
       d AS full_date,
       CAST(year(d) AS INTEGER) AS year,
       CAST(quarter(d) AS INTEGER) AS quarter,
       CAST(month(d) AS INTEGER) AS month,
       monthname(d) AS month_name,
       CAST(weekofyear(d) AS INTEGER) AS week,
       CAST(day(d) AS INTEGER) AS day_of_month,
       CAST(isodow(d) AS INTEGER) AS day_of_week,
       dayname(d) AS day_name,
       isodow(d) >= 6 AS is_weekend
FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)
"""


# ---------------------------------------------------------------------------
# Q15 — JSON extraction + aggregate.
# Operators: F10 (reference JSONB audit columns sql/01_schema.sql:129-130;
# live here on events.props).
# ---------------------------------------------------------------------------
def q15_json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            F.get_json_object("props", "$.k").cast("int").alias("k_value"),
            "value",
        )
        .groupBy("k_value")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value").alias("total_value"),
            money_avg("value").alias("avg_value"),
        )
    )


ORACLES["q15_json_extract_events"] = f"""
SELECT CAST(props->>'$.k' AS INTEGER) AS k_value,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {oracle_money_sum('value')} AS total_value,
       {oracle_money_avg('value')} AS avg_value
FROM events
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q16 — split + explode: string-array fan-out.
# Operators: F11 (reference comma-separated labels sql/01_schema.sql:112 →
# real arrays + explode).
# ---------------------------------------------------------------------------
def q16_explode_part_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_name", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


ORACLES["q16_explode_part_tokens"] = """
SELECT token, CAST(COUNT(*) AS BIGINT) AS n_parts
FROM (SELECT unnest(string_split(p_name, ' ')) AS token FROM part)
GROUP BY token
"""


# ---------------------------------------------------------------------------
# Q17 — UNION ALL record-count verification.
# Operators: U1/A9 (reference README.md:358-363 record-count check).
# ---------------------------------------------------------------------------
_COUNT_TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")


def q17_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = [
        load_table(spark, sf_dir, t)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(F.lit(t).alias("table_name"), "n_rows")
        for t in _COUNT_TABLES
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


ORACLES["q17_union_all_counts"] = "\nUNION ALL\n".join(
    f"SELECT '{t}' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows FROM {t}"
    for t in _COUNT_TABLES
)


# ---------------------------------------------------------------------------
# Q18 — global top-K: ORDER BY DESC LIMIT (TakeOrderedAndProject).
# Operators: O1 (reference sql/analytics_queries.sql:16-17,127-128).
# ---------------------------------------------------------------------------
def q18_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    )


ORACLES["q18_topk_orders"] = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Q19 — global multi-distinct aggregate + ratio-of-aggregates.
# Operators: A4/A8/A2 (reference sql/analytics_queries.sql:57-66
# 'encounters per patient' global stats).
# ---------------------------------------------------------------------------
def q19_global_ratio_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_orderkey").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.round(
            F.countDistinct("o_orderkey").cast("double")
            / F.countDistinct("o_custkey"),
            2,
        ).alias("orders_per_customer"),
    )


ORACLES["q19_global_ratio_agg"] = """
SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       ROUND(CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE)
             / COUNT(DISTINCT o_custkey), 2) AS orders_per_customer
FROM orders
"""


# ---------------------------------------------------------------------------
# Q20 — CASE bucketing (the age_group pattern).
# Operators: P3 (reference populate_warehouse.py:68-74 age buckets).
# ---------------------------------------------------------------------------
def q20_acctbal_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    bucket = (
        F.when(bal < 0, "negative")
        .when(bal < 2500, "0-2500")
        .when(bal < 7500, "2500-7500")
        .otherwise("7500+")
    )
    return (
        c.select(bucket.alias("balance_bucket"), "c_acctbal")
        .groupBy("balance_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            money_sum("c_acctbal").alias("total_balance"),
            money_avg("c_acctbal").alias("avg_balance"),
        )
    )


ORACLES["q20_acctbal_buckets"] = f"""
SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 2500 THEN '0-2500'
            WHEN c_acctbal < 7500 THEN '2500-7500'
            ELSE '7500+' END AS balance_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       {oracle_money_sum('c_acctbal')} AS total_balance,
       {oracle_money_avg('c_acctbal')} AS avg_balance
FROM customer
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q21 — boolean → label CASE + weekend/weekday split.
# Operators: P6 (reference sql/analytics_queries.sql:69-82 weekend
# pattern query).
# ---------------------------------------------------------------------------
def q21_weekend_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    day_type = F.when(F.weekday("o_orderdate") >= 5, "Weekend").otherwise("Weekday")
    return (
        o.select(day_type.alias("day_type"), "o_orderkey", "o_custkey", "o_totalprice")
        .groupBy("day_type")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("unique_customers"),
            money_sum("o_totalprice").alias("total_revenue"),
        )
    )


ORACLES["q21_weekend_orders"] = f"""
SELECT CASE WHEN isodow(o_orderdate) >= 6 THEN 'Weekend' ELSE 'Weekday' END
           AS day_type,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS unique_customers,
       {oracle_money_sum('o_totalprice')} AS total_revenue
FROM orders
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q22 — mv_procedure_volume analogue: bridge-style join + multi-distinct.
# Operators: M3 (reference sql/03_warehouse.sql:146-156).
# ---------------------------------------------------------------------------
def q22_brand_volume_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.countDistinct("l_partkey").alias("unique_parts"),
            F.countDistinct("l_suppkey").alias("unique_suppliers"),
        )
    )


ORACLES["q22_brand_volume_mv"] = """
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS unique_parts,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS unique_suppliers
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY p_brand
"""


# ---------------------------------------------------------------------------
# Q23 — mv_diagnosis_by_age_group analogue: two-dim grouped rollup.
# Operators: M2 (reference sql/03_warehouse.sql:129-141).
# ---------------------------------------------------------------------------
def q23_segment_priority_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("unique_customers"),
        )
    )


ORACLES["q23_segment_priority_mv"] = """
SELECT c_mktsegment, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS unique_customers
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2
"""


QUERIES = {
    name: fn
    for name, fn in sorted(globals().items())
    if name.startswith("q") and name[1:3].isdigit() and callable(fn)
}
