"""Data-quality / validation workload (SURVEY.md §2.9) + scalar-function
parity queries (§2.8) + semi-structured extraction (§2.3 analog).

The reference treats DQ as first-class production code (every build embeds a
check suite). Here each suite compiles to ONE aggregation pass over the table
— no per-check scans — which is how it stays cheap at 100 TB. The reusable
compiler lives in plans/quality.py; these queries pin its semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import scalar as sc
from ..functions import urls as ur
from .registry import register, scan_partitions, t


@register(
    "q31_dq_summary_lineitem",
    """
    SELECT count(*)                                        AS row_count,
           count(DISTINCT l_orderkey * 100 + l_linenumber) AS distinct_pk,
           CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_pk,
           CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)    AS nonpositive_qty,
           CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS bad_discount,
           strftime(min(l_shipdate), '%Y-%m-%d')           AS min_shipdate,
           strftime(max(l_shipdate), '%Y-%m-%d')           AS max_shipdate
    FROM lineitem
    """,
    survey_ref="Q1,Q2,O11",
)
def q31_dq_summary_lineitem(spark, sf_dir):
    """Q1 per-table DQ suite compiled to a single aggregation pass:
    row count, PK uniqueness, null PK, domain checks, freshness bounds."""
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("row_count"),
        F.countDistinct(F.col("l_orderkey") * 100 + F.col("l_linenumber")).alias("distinct_pk"),
        F.sum(F.when(F.col("l_orderkey").isNull(), 1).otherwise(0)).cast("long").alias("null_pk"),
        F.sum(F.when(F.col("l_quantity") <= 0, 1).otherwise(0)).cast("long").alias("nonpositive_qty"),
        F.sum(F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1).otherwise(0))
        .cast("long").alias("bad_discount"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("min_shipdate"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("max_shipdate"),
    )


@register(
    "q32_integrity_checks",
    """
    SELECT
      (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        AS lineitem_orphans,
      (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        AS order_orphans,
      (SELECT count(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
        AS customer_orphans,
      (SELECT CAST(sum(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END) AS BIGINT)
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        AS shipped_before_order,
      (SELECT count(*) FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        AS joined_rows
    """,
    survey_ref="Q2,Q3,J4",
)
def q32_integrity_checks(spark, sf_dir):
    """Q3 FK-integrity sweep + Q2 temporal integrity as ONE check report:
    a left-anti count per declared FK edge, plus the valid_from ≤ valid_to
    analog (ship date must not precede order date).

    All edges live in ONE plan (1-row aggregates cross-joined), so a single
    action runs them — independent subtrees schedule concurrently instead
    of sequential driver-side jobs, and nothing materializes on the driver."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey",
                                               "o_orderdate")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = t(spark, sf_dir, "nation").select("n_nationkey")
    a = (li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
         .agg(F.count(F.lit(1)).alias("lineitem_orphans")))
    b = (orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti")
         .agg(F.count(F.lit(1)).alias("order_orphans")))
    c = (cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey, "left_anti")
         .agg(F.count(F.lit(1)).alias("customer_orphans")))
    d = (li.join(orders, li.l_orderkey == orders.o_orderkey)
         .agg(F.sum(F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1)
                    .otherwise(0)).cast("long").alias("shipped_before_order"),
              F.count(F.lit(1)).alias("joined_rows")))
    return a.crossJoin(b).crossJoin(c).crossJoin(d)


@register(
    "q34_scalar_function_parity",
    r"""
    SELECT c_custkey,
           substr(sha256(lower(concat_ws('|', c_name, CAST(c_custkey AS VARCHAR)))), 1, 16)
             AS cust_hash,
           regexp_replace(regexp_replace(lower(trim(c_name)), '[^a-z0-9]+', '-', 'g'),
                          '^-+|-+$', '', 'g')  AS cust_slug,
           -- snake_case ascii-folds BEFORE the underscore pass (reference
           -- NFKD): translate covers the precomposed Latin-1 set, the
           -- combining-mark strip covers NFD input — identity on this
           -- ASCII fixture, but the oracle must pin the fold semantics
           regexp_replace(regexp_replace(
             regexp_replace(translate(lower(trim(c_name)),
               'áàâäãéèêëíìîïóòôöõúùûüýçñ', 'aaaaaeeeeiiiiooooouuuuycn'),
               '[\x{0300}-\x{036f}]', '', 'g'),
             '[^a-z0-9]+', '_', 'g'),
             '^_+|_+$', '', 'g')  AS cust_snake,
           CASE WHEN trim(coalesce(c_mktsegment, '')) <> '' THEN trim(c_mktsegment)
                ELSE trim(c_name) END          AS segment_or_name,
           CASE WHEN round(c_acctbal, 2) = floor(round(c_acctbal, 2))
                THEN CAST(CAST(round(c_acctbal, 2) AS BIGINT) AS VARCHAR)
                ELSE CAST(round(c_acctbal, 2) AS VARCHAR) END AS bal_headline,
           CASE WHEN (c_custkey % 113) <= 0 THEN 'N/A'
                WHEN (c_custkey % 113) % 100 BETWEEN 10 AND 20
                  THEN CAST(c_custkey % 113 AS VARCHAR) || 'th'
                WHEN (c_custkey % 113) % 10 = 1
                  THEN CAST(c_custkey % 113 AS VARCHAR) || 'st'
                WHEN (c_custkey % 113) % 10 = 2
                  THEN CAST(c_custkey % 113 AS VARCHAR) || 'nd'
                WHEN (c_custkey % 113) % 10 = 3
                  THEN CAST(c_custkey % 113 AS VARCHAR) || 'rd'
                ELSE CAST(c_custkey % 113 AS VARCHAR) || 'th' END AS rank_ordinal,
           CASE WHEN CAST(c_custkey % 200 AS DOUBLE) / 2
                     = floor(CAST(c_custkey % 200 AS DOUBLE) / 2)
                THEN CAST(CAST(CAST(c_custkey % 200 AS DOUBLE) / 2 AS BIGINT) AS VARCHAR) || '%'
                ELSE CAST(CAST(c_custkey % 200 AS DOUBLE) / 2 AS VARCHAR) || '%' END
             AS participation_pct,
           -- URL-curation parity (functions/urls.py): the oracle derives the
           -- expected canonical form INDEPENDENTLY from the generation
           -- recipe below (scheme lowered, www./:443/userinfo/fragment/
           -- trailing slash gone, tracking params dropped, survivors
           -- sorted: a=1 < b=N), so the canonicalizer is checked against
           -- ground truth, not a transliterated copy of its own regexes.
           (CASE WHEN c_custkey % 2 = 0 THEN 'https' ELSE 'http' END)
             || '://site' || CAST(c_custkey % 50 AS VARCHAR)
             || (CASE WHEN c_custkey % 3 = 0 THEN '.example.co.uk'
                      ELSE '.example.com' END)
             -- %5=0 synthesizes an explicit :443, which is only the
             -- DEFAULT port for the https rows (even keys) — on http rows
             -- it is a real non-default port and must survive
             || (CASE WHEN c_custkey % 5 = 1 THEN ':8080'
                      WHEN c_custkey % 5 = 0 AND c_custkey % 2 = 1 THEN ':443'
                      ELSE '' END)
             || '/Path/' || CAST(c_custkey AS VARCHAR)
             || '?a=1&b=' || CAST(c_custkey % 7 AS VARCHAR) AS url_canonical,
           'site' || CAST(c_custkey % 50 AS VARCHAR)
             || (CASE WHEN c_custkey % 3 = 0 THEN '.example.co.uk'
                      ELSE '.example.com' END) AS url_host_out,
           CASE WHEN c_custkey % 3 = 0 THEN 'example.co.uk'
                ELSE 'example.com' END AS url_domain
    FROM customer
    """,
    survey_ref="X1,X2,X6,X13,X14,X16,X17 (+urls)",
)
def q34_scalar_function_parity(spark, sf_dir):
    """Pins the exact-parity scalar recipes (SURVEY §7 hard-part #1): the
    stable_hash surrogate-ID, slug/snake normalizers, blank-aware coalesce —
    plus the X13/X16 headline-formatting family (int-or-2dp metric strings,
    ordinal ranks with the 11th/21st quirks, percent strings). All pure
    column expressions over one customer scan: zero shuffles.

    The projection is STAGED (synthetic URL materialized once, then the
    URL functions, then registered_domain off the extracted host) rather
    than one flat select: the non-cheap intermediate columns are each
    consumed more than once, so Catalyst's CollapseProject keeps the
    Projects separate — the synth-URL concat runs 1× per row instead of
    3×, url_host 1× instead of 2×, and each generated consume() method
    stays under the JVM JIT's ~8 KB bailout threshold (the flat form
    produced a 14.9 KB method that ran interpreted — the r4 q34 8×
    regression).

    Fixture parallelism: the test fixture is ONE single-row-group parquet
    file, so this zero-shuffle projection would otherwise run as one
    serial task — an artifact of the fixture, not the plan (at 100 TB the
    scan has thousands of splits and parallelizes for free). Mirroring the
    documented `_base_log` pattern (workload/marts.py), a single-split
    input is fanned out to a handful of tasks sized so the ~70 µs/row
    expression work (~150 ms per 2k-row slice) dominates per-task
    scheduling overhead; with multiple real splits the repartition is
    skipped and the plan stays exchange-free."""
    cust = t(spark, sf_dir, "customer")
    if scan_partitions(cust) < 2:
        cust = cust.repartition(
            max(2, min(spark.sparkContext.defaultParallelism, 8)))
    staged = cust.select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal",
        _synth_url().alias("_u"),
    ).select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal",
        ur.canonical_url(F.col("_u")).alias("url_canonical"),
        ur.url_host(F.col("_u")).alias("url_host_out"),
    )
    return staged.select(
        "c_custkey",
        sc.stable_hash(F.col("c_name"), F.col("c_custkey").cast("string")).alias("cust_hash"),
        sc.slugify("c_name").alias("cust_slug"),
        sc.snake_case("c_name").alias("cust_snake"),
        sc.coalesce_nonblank("c_mktsegment", "c_name").alias("segment_or_name"),
        sc.int_or_2dp("c_acctbal").alias("bal_headline"),
        sc.ordinal_rank(F.col("c_custkey") % 113).alias("rank_ordinal"),
        sc.percent_string((F.col("c_custkey") % 200).cast("double") / 2)
        .alias("participation_pct"),
        "url_canonical",
        "url_host_out",
        ur.registered_domain(F.col("url_host_out")).alias("url_domain"),
    )


def _synth_url() -> F.Column:
    """Deterministic messy URL per customer row — uppercase scheme on odd
    keys, www. prefix, userinfo on %11, explicit :443 default port on %5==0
    and a real :8080 on %5==1, optional trailing slash, tracking params
    around the real ones, fragment on %6==0. q34's oracle states what the
    canonicalizer must produce for this recipe."""
    k = F.col("c_custkey")
    return F.concat(
        F.when(k % 2 == 0, "https").otherwise("HTTP"),
        F.lit("://"),
        F.when(k % 11 == 0, "user:pw@").otherwise(""),
        F.lit("www.site"), (k % 50).cast("string"),
        F.when(k % 3 == 0, ".example.co.uk").otherwise(".example.com"),
        F.when(k % 5 == 0, ":443").when(k % 5 == 1, ":8080").otherwise(""),
        F.lit("/Path/"), k.cast("string"),
        F.when(k % 4 == 0, "/").otherwise(""),
        F.lit("?utm_source=x&b="), (k % 7).cast("string"),
        F.lit("&a=1&gclid=zz"),
        F.when(k % 6 == 0, "#frag").otherwise(""),
    )


@register(
    "q35_json_props_extract",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
           event_type
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 90
    """,
    survey_ref="F1-analog: semi-structured JSON extraction",
)
def q35_json_props_extract(spark, sf_dir):
    """Semi-structured extraction (reference §2.3): JSON payload column →
    typed field + predicate. get_json_object is JVM-side."""
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_id", k.alias("prop_k"), "event_type")
        .filter(F.col("prop_k") > 90)
    )


@register(
    "q36_parse_iso_date_parity",
    """
    WITH raw AS (
      SELECT o_orderkey, strftime(o_orderdate, '%d/%m/%Y') AS messy_date
      FROM orders WHERE o_orderkey % 97 = 0
    )
    SELECT o_orderkey, messy_date,
           strftime(strptime(messy_date, '%d/%m/%Y'), '%Y-%m-%d') AS parsed_date
    FROM raw
    """,
    survey_ref="X4",
)
def q36_parse_iso_date_parity(spark, sf_dir):
    """X4 multi-format date parsing: round-trip a dd/MM/yyyy rendering
    through parse_iso_date's fallback chain."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 0)
    raw = orders.select(
        "o_orderkey", F.date_format("o_orderdate", "dd/MM/yyyy").alias("messy_date"))
    return raw.select(
        "o_orderkey", "messy_date",
        F.date_format(sc.parse_iso_date("messy_date"), "yyyy-MM-dd").alias("parsed_date"))


@register(
    "q41_compat_projection",
    """
    SELECT CAST(o_custkey AS VARCHAR) AS memberCode,
           o_orderstatus              AS member_name,
           CASE WHEN o_orderkey % 3 = 0 THEN 'vote:' || CAST(o_orderkey AS VARCHAR)
                ELSE 'div:' || CAST(o_orderkey AS VARCHAR) END AS unique_vote_id,
           strftime(o_orderdate, '%Y-%m-%d') AS "date",
           o_orderpriority            AS vote,
           ''                         AS party,
           ''                         AS constituency,
           'oireachtas_unified'       AS source,
           ''                         AS snapshot_date
    FROM orders
    WHERE o_orderkey % 17 = 0
    """,
    survey_ref="Q5/§3.2 compat adapters",
)
def q41_compat_projection(spark, sf_dir):
    """Downstream compat adapter driven through the oracle gate: the
    member-votes projection's blank-aware ID fallback plus missing-column
    backfill (party/constituency absent from the source → blank strings)."""
    from ..tables.compat import member_votes_compat

    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 17 == 0)
    votes_shaped = orders.select(
        F.col("o_custkey").cast("string").alias("member_code"),
        F.col("o_orderstatus").alias("member_name"),
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("div:"),
                            F.col("o_orderkey").cast("string")))
        .alias("division_id"),
        F.concat(F.lit("vote:"), F.col("o_orderkey").cast("string"))
        .alias("vote_id"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("division_date"),
        F.col("o_orderpriority").alias("vote_label"),
    )
    return member_votes_compat(votes_shaped)
