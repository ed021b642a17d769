"""Core analytics workload: scans, filters, joins, aggregations, set ops.

Each query cites the SURVEY.md §2 operator rows it re-expresses (reference
file:line lives in SURVEY.md). Plans are declared via the DataFrame API so
Catalyst applies pushdown/pruning; join strategy notes are in docstrings —
small dims are broadcast explicitly, big-side joins rely on AQE.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register, t

# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.5 A1-A7) — TPC-H-Q1-shaped pricing summary.
# Scale: single shuffle on 2 low-cardinality keys; partial aggregation
# (map-side combine) does almost all the work, perfectly scalable.
# ---------------------------------------------------------------------------

@register(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 6)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey_ref="A1,A2,A7,P6",
)
def q01_pricing_summary(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("2000-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q02_min_cost_supplier",
    """
    WITH ranked AS (
      SELECT p.p_partkey, p.p_name, s.s_name, s.s_acctbal,
             row_number() OVER (PARTITION BY p.p_partkey
                                ORDER BY s.s_acctbal DESC, s.s_suppkey) AS rn
      FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
                  JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE p.p_size <= 15
    )
    SELECT p_partkey, p_name, s_name, round(s_acctbal, 2) AS s_acctbal
    FROM ranked WHERE rn = 1
    """,
    survey_ref="J1,W3",
)
def q02_min_cost_supplier(spark, sf_dir):
    """TPC-H-Q2-shaped argmax join: best supplier per part (W3 top-1 per
    group). part/supplier are broadcast-size dims at any SF vs lineitem."""
    from pyspark.sql import Window
    part = t(spark, sf_dir, "part").filter(F.col("p_size") <= 15)
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    sup = t(spark, sf_dir, "supplier")
    w = Window.partitionBy("p_partkey").orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "s_suppkey")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_partkey", "p_name", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )


@register(
    "q03_shipping_priority",
    """
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d')                   AS o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND CAST(o.o_orderdate AS DATE) < DATE '1997-01-01'
      AND CAST(l.l_shipdate  AS DATE) > DATE '1997-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    survey_ref="J1,J2,A1,O1,O2",
)
def q03_shipping_priority(spark, sf_dir):
    """TPC-H-Q3: filter-pushdown + two shuffled joins + top-k. The limit's
    ORDER BY carries a unique tiebreak (l_orderkey) so the selected set is
    deterministic across engines."""
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") < F.lit("1997-01-01").cast("date"))
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") > F.lit("1997-01-01").cast("date"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
                "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q04_order_priority_semi",
    """
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
    """,
    survey_ref="J5,O10,A2",
)
def q04_order_priority_semi(spark, sf_dir):
    """Left-semi join (EXISTS) then count — SURVEY J5/O10 key-set semantics."""
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q05_revenue_by_nation",
    """
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
      AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o.o_orderdate AS DATE) <  DATE '1998-01-01'
    GROUP BY n.n_name
    """,
    survey_ref="J1,A5",
)
def q05_revenue_by_nation(spark, sf_dir):
    """Star join: fact → filtered dims. nation/region broadcast explicitly
    (bounded lookup tables); customer join left to AQE (broadcasts at small
    SF, sort-merge at 100 TB where customer is fact-sized)."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1998-01-01").cast("date"))
    ).select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "q06_revenue_forecast",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) <  DATE '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.08
      AND l_quantity < 24
    """,
    survey_ref="P6,A7",
)
def q06_revenue_forecast(spark, sf_dir):
    """TPC-H-Q6: pure scan+filter+agg — the predicate-pushdown showcase; all
    four predicates reach the parquet reader (check PushedFilters)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
            & (F.col("l_discount") >= 0.04) & (F.col("l_discount") <= 0.08)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@register(
    "q07_anti_join_segments",
    """
    SELECT c.c_mktsegment, count(*) AS lapsed_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND CAST(o.o_orderdate AS DATE) >= DATE '2000-01-01')
    GROUP BY c.c_mktsegment
    """,
    survey_ref="J4,Q3",
)
def q07_anti_join_segments(spark, sf_dir):
    """Left-anti join (reference J4 orphan detection / Q3 FK integrity):
    customers with no order since 2000, per segment. The anti-join's filter
    is pushed below the join so only recent orders shuffle."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") >= F.lit("2000-01-01").cast("date")
    ).select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("lapsed_customers"))
    )


@register(
    "q08_pivot_status_by_year",
    """
    SELECT CAST(year(o_orderdate) AS INTEGER)          AS order_year,
           count(*) FILTER (o_orderstatus = 'O')       AS status_o,
           count(*) FILTER (o_orderstatus = 'F')       AS status_f,
           count(*) FILTER (o_orderstatus = 'P')       AS status_p
    FROM orders
    GROUP BY 1
    """,
    survey_ref="A3",
)
def q08_pivot_status_by_year(spark, sf_dir):
    """Pivot/crosstab (reference A3 vote-kind crosstab) with explicit value
    list — explicit values keep the plan a single pass (no distinct scan)."""
    orders = t(spark, sf_dir, "orders")
    out = (
        orders.withColumn("order_year", F.year("o_orderdate").cast("int"))
        .groupBy("order_year")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
    )
    return out.select(
        "order_year",
        F.coalesce("O", F.lit(0)).alias("status_o"),
        F.coalesce("F", F.lit(0)).alias("status_f"),
        F.coalesce("P", F.lit(0)).alias("status_p"),
    )


@register(
    "q09_distinct_counts_by_year",
    """
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           count(*)                           AS order_count,
           count(DISTINCT o_custkey)          AS active_customers,
           round(sum(o_totalprice), 2)        AS total_value
    FROM orders
    GROUP BY 1
    """,
    survey_ref="A4,A5",
)
def q09_distinct_counts_by_year(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    return (
        orders.withColumn("order_year", F.year("o_orderdate").cast("int"))
        .groupBy("order_year")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.countDistinct("o_custkey").alias("active_customers"),
            F.round(F.sum("o_totalprice"), 2).alias("total_value"),
        )
    )


@register(
    "q10_string_agg_regions",
    """
    SELECT r.r_name,
           string_agg(DISTINCT n.n_name, '; ' ORDER BY n.n_name) AS nations,
           count(DISTINCT n.n_nationkey)                         AS nation_count
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    survey_ref="A8,J1",
)
def q10_string_agg_regions(spark, sf_dir):
    """String aggregation (reference A8 office-name agg): sorted distinct
    values joined with '; ' — array_sort(collect_set()) keeps it deterministic."""
    reg = t(spark, sf_dir, "region")
    nat = t(spark, sf_dir, "nation")
    return (
        reg.join(nat, nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_set("n_name")), "; ").alias("nations"),
            F.countDistinct("n_nationkey").alias("nation_count"),
        )
    )


@register(
    "q11_rollup_returns",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           round(sum(l_quantity), 2)     AS sum_qty,
           count(*)                      AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    survey_ref="A1 (+beyond-ref rollup)",
)
def q11_rollup_returns(spark, sf_dir):
    """ROLLUP grouping sets — beyond-reference surface the engine gets free
    from Catalyst (SURVEY §2.5 note). NULL grouping keys are labeled 'ALL'
    to avoid null-vs-'NULL' hashing ambiguity in the oracle compare."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
             F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty", "n_rows",
        )
    )


@register(
    "q12_cross_grid_zero_filled",
    """
    WITH years AS (SELECT DISTINCT CAST(year(o_orderdate) AS INTEGER) AS order_year FROM orders),
         counts AS (
           SELECT c.c_nationkey, CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
                  count(*) AS order_count
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
           GROUP BY 1, 2
         )
    SELECT n.n_name, y.order_year,
           CAST(coalesce(cnt.order_count, 0) AS BIGINT) AS order_count
    FROM nation n
    CROSS JOIN years y
    LEFT JOIN counts cnt ON cnt.c_nationkey = n.n_nationkey AND cnt.order_year = y.order_year
    """,
    survey_ref="J6,J2,A5",
)
def q12_cross_grid_zero_filled(spark, sf_dir):
    """Dimension-grid cross join (reference J6 member×year grid) so
    zero-activity pairs exist. Grid sides are tiny dims (nations × years);
    the cross join is bounded and broadcast — the aggregate side scales."""
    orders = t(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate").cast("int"))
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    years = orders.select("order_year").distinct()
    counts = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "order_year")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )
    grid = nat.crossJoin(F.broadcast(years))
    return (
        grid.join(counts,
                  (grid.n_nationkey == counts.c_nationkey)
                  & (grid.order_year == counts.order_year), "left")
        .select(grid.n_name, grid.order_year,
                F.coalesce(counts.order_count, F.lit(0)).cast("long").alias("order_count"))
    )


@register(
    "q42_cube_status_year",
    """
    WITH src AS (
      SELECT o_orderstatus, CAST(year(o_orderdate) AS INTEGER) AS order_year,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
      FROM orders
    )
    SELECT coalesce(o_orderstatus, 'ALL')                 AS orderstatus,
           coalesce(CAST(order_year AS VARCHAR), 'ALL')   AS order_year,
           count(*)                                       AS n_orders,
           CAST(sum(price_cents) AS VARCHAR)              AS total_cents
    FROM src
    GROUP BY CUBE (o_orderstatus, order_year)
    """,
    survey_ref="A1 (+beyond-ref cube)",
)
def q42_cube_status_year(spark, sf_dir):
    """CUBE grouping sets — the other grouping-set shape (q11 is ROLLUP).
    Money is summed as integer cents so every engine agrees bit-for-bit
    regardless of summation order; at scale this is one shuffle with
    partial aggregation per grouping set."""
    orders = t(spark, sf_dir, "orders")
    src = orders.select(
        "o_orderstatus",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    return (
        src.cube("o_orderstatus", "order_year")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.sum("price_cents").cast("string").alias("total_cents"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce(F.col("order_year").cast("string"), F.lit("ALL"))
            .alias("order_year"),
            "n_orders", "total_cents",
        )
    )


@register(
    "q43_approx_aggregates",
    """
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS exact_custs,
           'ok' AS acd_within_5pct,
           'ok' AS apxmed_within_p40_p60
    FROM orders
    GROUP BY o_orderpriority
    """,
    survey_ref="A4 (+beyond-ref approx aggregates)",
)
def q43_approx_aggregates(spark, sf_dir):
    """Approximate aggregates (SURVEY §2.5 note): HLL++ distinct counts and
    quantile sketches are the 100 TB path where exact countDistinct would
    shuffle every key. The oracle pins the sketches to their error
    contract: approx_count_distinct (rsd=0.01) must land within 5% of the
    exact count, percentile_approx must land inside the exact p40..p60
    band — the sketch answers are checked, not trusted.

    Two aggs, not one: mixing countDistinct (Expand rewrite) with
    percentile (TypedImperativeAggregate) in a single agg made Janino
    compile a ~19s monster (measured; it was 29% of the r1 bench, and the
    first guess — the HLL rsd — only added on top: rsd=0.01 costs +15s of
    register-unroll compile by itself, so it is 0.02 now, still 2.5 sigma
    inside the 5% contract). Split, each agg compiles in ~1s, and the
    5-row x 5-row rejoin is a broadcast no-op. Same plan shape scales: two
    scans is fine at 100 TB (or cheaper than one pathological codegen)."""
    orders = t(spark, sf_dir, "orders")
    exact = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact_custs"))
    sketch = orders.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("apx_custs"),
        F.expr("percentile(o_totalprice, 0.4)").alias("p40"),
        F.expr("percentile(o_totalprice, 0.6)").alias("p60"),
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10000))
        .alias("apx_med"),
    )
    g = exact.join(F.broadcast(sketch), "o_orderpriority")
    within = (F.abs(F.col("apx_custs").cast("double") /
                    F.col("exact_custs") - 1) <= 0.05)
    med_ok = F.col("apx_med").between(F.col("p40"), F.col("p60"))
    return g.select(
        "o_orderpriority", "exact_custs",
        F.when(within, F.lit("ok")).otherwise(F.lit("off"))
        .alias("acd_within_5pct"),
        F.when(med_ok, F.lit("ok")).otherwise(F.lit("off"))
        .alias("apxmed_within_p40_p60"),
    )
