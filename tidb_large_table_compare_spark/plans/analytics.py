"""DataFrame-native TPC-H-shaped analytics (SURVEY.md §2.C).

These queries were originally registered as shared ANSI SQL (Spark executed
the oracle's identical string — legitimate for a SQL-surface capability, but
it verifies Spark's SQL engine, not engine code). Re-expressed here with the
DataFrame API as genuinely different formulations: window-min instead of a
correlated subquery (q2), join-graph composition instead of FROM-lists,
`when/otherwise` instead of CASE. The DuckDB oracle still runs the original
ANSI string, so the cross-engine value check now exercises two independent
constructions.

Numeric discipline matches the registry-wide contract (PERFORMANCE.md
"Cross-engine exactness"): interior arithmetic in exact DECIMAL — the same
precision/scale promotions the SQL string produces, so Catalyst builds the
same expression tree — with DOUBLE casts only in final projections.

Scale notes: every join here is a key equi-join Catalyst plans freely (the
dimension sides — nation, supplier, part — broadcast under AQE); aggregations
are partial-aggregate shuffles on the group keys; the two LIMIT queries sort
only their aggregated output, never base rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tidb_large_table_compare_spark.sources.tables import load_table

__all__ = [
    "q1_pricing_summary",
    "q2_cheapest_part_per_brand",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "q7_nation_pair_volume",
    "q8_brand_share_by_year",
    "q9_profit_by_nation_year",
    "q10_top_return_customers",
    "q12_priority_line_counts",
    "q13_order_count_distribution",
    "q14_promo_revenue_share",
    "top3_customers_per_nation",
]


def _dec(col: Column | str, precision: int = 12, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def _one() -> Column:
    return F.lit(1).cast("decimal(3,2)")


def _disc_price(prefix: str = "l_") -> Column:
    """extendedprice × (1 − discount), exact decimal — the revenue kernel
    shared by q3/q5/q7/q9/q10 (and the oracle strings verbatim)."""
    return _dec(f"{prefix}extendedprice") * (_one() - _dec(f"{prefix}discount", 3, 2))


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    disc = _one() - _dec("l_discount", 3, 2)
    return (
        l.filter(F.col("l_shipdate") <= F.expr("TIMESTAMP '1998-09-02 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_dec("l_extendedprice") * disc).cast("double").alias("sum_disc_price"),
            F.sum(
                _dec("l_extendedprice") * disc * (_one() + _dec("l_tax", 3, 2))
            ).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias(
                "avg_price"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q2_cheapest_part_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-min formulation of the oracle's correlated MIN subquery."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand")
    return (
        p.withColumn("__min_price", F.min("p_retailprice").over(w))
        .filter(F.col("p_retailprice") == F.col("__min_price"))
        .select("p_brand", "p_partkey", "p_retailprice")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    cutoff = F.expr("TIMESTAMP '1998-03-15 00:00:00'")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o.filter(F.col("o_orderdate") < cutoff), c.c_custkey == o.o_custkey)
        .join(l.filter(F.col("l_shipdate") > cutoff), l.l_orderkey == o.o_orderkey)
        .groupBy(l.l_orderkey.alias("o_orderkey"), "o_orderdate")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(_disc_price()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q7_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(cn, c.c_nationkey == F.col("cn_key"))
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(sn, s.s_nationkey == F.col("sn_key"))
        .filter(
            (F.col("cn_key") != F.col("sn_key"))
            & (F.col("cn_key") < 4)
            & (F.col("sn_key") < 4)
        )
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(F.sum(_disc_price()).cast("double").alias("volume"))
    )


def q8_brand_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    per_item = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(p, l.l_partkey == p.p_partkey)
        .select(
            F.year("o_orderdate").alias("order_year"),
            "p_brand",
            _disc_price().cast("double").alias("volume"),
        )
    )
    return per_item.groupBy("order_year").agg(
        (
            F.sum(
                F.when(F.col("p_brand") == "Brand#12", F.col("volume")).otherwise(
                    F.lit(0.0)
                )
            ).cast("double")
            / F.sum("volume")
        ).alias("brand12_share"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit = _disc_price() - _dec("p_retailprice") * _dec("l_quantity") * F.lit(
        0.1
    ).cast("decimal(3,2)")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("n_name", F.year("o_orderdate").alias("order_year"))
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


def q10_top_return_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l.filter(F.col("l_returnflag") == "R"), l.l_orderkey == o.o_orderkey)
        .filter(
            (F.col("o_orderdate") >= F.expr("TIMESTAMP '1997-01-01 00:00:00'"))
            & (F.col("o_orderdate") < F.expr("TIMESTAMP '1998-01-01 00:00:00'"))
        )
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def q12_priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .filter(
            (F.col("l_shipdate") >= F.expr("TIMESTAMP '1997-01-01 00:00:00'"))
            & (F.col("l_shipdate") < F.expr("TIMESTAMP '1998-01-01 00:00:00'"))
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
    )


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).alias("c_count"))  # counts non-null only
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = _disc_price()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            (
                # 100.0 parses as DECIMAL(4,1) in SQL — keep the same
                # decimal-times-decimal tree, double cast only at the end
                (F.expr("CAST(100.0 AS DECIMAL(4,1))") * F.sum(promo)).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_share_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def top3_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("n_name", "c_name", "c_acctbal", "rnk")
    )
