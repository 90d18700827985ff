"""Part B extension — relational operators beyond the first declared set:
multidimensional aggregation (cube / grouping sets), temporal joins
(range, as-of), subquery shapes (scalar), pivot, ordered string
aggregation, percentile/ntile analytics, null-semantics scalars, and two
TPC-H-shaped multi-join benchmarks (Q3/Q5 analogs).

The reference has none of these (SURVEY.md §2.2); they complete the
"what a query engine user would run" surface. Scale notes inline per
query; the shared discipline (decimal money sums, unique tie-breaks,
round-to-6) comes from plans/_util.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import table
from ..operators.scale import fill_cluster
from ._util import as_double6, dec
from .registry import register

# ------------------------------------------------- multidimensional aggs


@register(
    "q_cube",
    """
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 6)
             AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE over two dims + grouping id: 4 grouping sets in one "
        "partial-aggregated pass (Expand + hash agg; no repeated scans). "
        "r15: the cube runs over a pre-aggregate keyed by the two dims — "
        "Expand multiplies its INPUT rows by the grouping-set count "
        "BEFORE partial aggregation, so cubing the raw scan pays 4× the "
        "fact-table rows in hash-agg updates while cubing the ≤|dims| "
        "pre-aggregate pays 4×|groups|. count/sum re-aggregate exactly "
        "(decimal sums associative, counts sum), so the output is "
        "bit-identical (A/B verified row-set equal; 0.82 → 0.35 s).",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    pre = (li.groupBy("l_returnflag", "l_linestatus")
           .agg(F.count(F.lit(1)).alias("_n"),
                F.sum(dec("l_quantity")).alias("_sq")))
    return (
        pre.cube("l_returnflag", "l_linestatus")
        .agg(F.grouping_id().alias("gid"),
             F.sum("_n").alias("n"),
             as_double6(F.sum("_sq")).alias("sum_qty"))
        .select("l_returnflag", "l_linestatus", "gid", "n", "sum_qty")
    )


@register(
    "q_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 6)
             AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="Explicit GROUPING SETS (status totals, priority totals, grand "
        "total) — one Expand pass instead of three scans + union. "
        "r15: the grouping sets run over a pre-aggregate keyed by "
        "(status, priority) — same Expand-before-partial-agg argument as "
        "q_cube/q_rollup; counts/decimal sums re-aggregate exactly.",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql("""
        WITH pre AS (
          SELECT o_orderstatus, o_orderpriority, COUNT(*) AS _n,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS _sp
          FROM orders_gs GROUP BY o_orderstatus, o_orderpriority
        )
        SELECT o_orderstatus, o_orderpriority, SUM(_n) AS n,
               ROUND(CAST(SUM(_sp) AS DOUBLE), 6) AS sum_price
        FROM pre
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


# ------------------------------------------------------- temporal joins


@register(
    "q_join_range",
    """
    SELECT o_orderpriority, COUNT(*) AS n_late,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 6)
             AS late_value
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
      AND l_shipdate <  o_orderdate + INTERVAL 90 DAY
    GROUP BY o_orderpriority
    """,
    doc="Range join: equi key + interval band predicate. The equi half "
        "drives the physical join (hash/sort-merge on orderkey); the band "
        "is a cheap post-join filter — never a cross product. Pure-range "
        "joins (no equi key) get bucketed by coarse time bucket first.",
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    cond = (
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate >= F.expr("o_orderdate + INTERVAL 60 DAY"))
        & (li.l_shipdate < F.expr("o_orderdate + INTERVAL 90 DAY"))
    )
    return (
        orders.join(li, cond)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late"),
             as_double6(F.sum(dec("l_extendedprice"))).alias("late_value"))
    )


@register(
    "q_join_asof",
    """
    SELECT event_id, user_id, o_orderkey, o_orderdate FROM (
      SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC)
               AS rn
      FROM events e LEFT JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) t
    WHERE rn = 1
    """,
    doc="As-of join: each event matched to its user's most recent order "
        "at event time (backward inexact match, ties to highest key; "
        "events without prior orders keep NULLs). Shape: equi join on the "
        "entity key + time inequality, then keep-latest per left row. At "
        "100 TB: partition both sides by key, sort by time — the window "
        "collapses to a per-partition merge; or run merge-asof inside "
        "applyInPandas over cogrouped key buckets. r15: keep-latest is a "
        "max(struct(date, key, user)) aggregate keyed by event_id ALONE "
        "(the spec's window partition), not a row_number sort-window — "
        "struct max IS the (date DESC, key DESC) top-1 (lexical field "
        "order, o_orderkey unique so no ties; a NULL-padded row's "
        "(NULL, NULL, user) struct sorts below every real match, "
        "mirroring DESC-nulls-last), and user_id rides the struct so "
        "the emitted row is the winning JOINED row even if an event_id "
        "ever repeated across users. Plans as a SortAggregate (struct "
        "buffers aren't hash-aggregable) but still partial-aggregates "
        "map-side above the join instead of sorting the multiplied "
        "join output, and its sort is by the group key only. A/B "
        "row-set equal over all 100k events; 0.56 → 0.48 s at sf0.1.",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate")
    return (
        ev.join(orders, (orders.o_custkey == ev.user_id)
                & (orders.o_orderdate <= ev.ts), "left")
        .groupBy("event_id")
        .agg(F.max(F.struct("o_orderdate", "o_orderkey", "user_id"))
             .alias("_m"))
        .select("event_id", F.col("_m.user_id").alias("user_id"),
                F.col("_m.o_orderkey").alias("o_orderkey"),
                F.col("_m.o_orderdate").alias("o_orderdate"))
    )


# ------------------------------------------------------------- subqueries


@register(
    "q_scalar_subquery",
    """
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_retailprice > 0.9 * (SELECT MAX(p_retailprice) FROM part)
    """,
    doc="Uncorrelated scalar subquery: one-row aggregate computed once, "
        "folded into the scan filter (MAX is order-exact on doubles).",
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "part").createOrReplaceTempView("part_sq")
    return spark.sql("""
        SELECT p_partkey, p_name, p_retailprice
        FROM part_sq
        WHERE p_retailprice > 0.9 * (SELECT MAX(p_retailprice) FROM part_sq)
    """)


# ------------------------------------------------------ pivot / string agg


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@register(
    "q_pivot",
    """
    SELECT o_orderstatus,
           COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent,
           COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS high,
           COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS medium,
           COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED')
             AS not_specified,
           COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS low
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Pivot (long→wide): explicit value list so the plan is static — "
        "no extra distinct-values pass, single partial-agg stage.",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    out_names = ["urgent", "high", "medium", "not_specified", "low"]
    piv = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .count()
    )
    renamed = piv.select(
        "o_orderstatus",
        *[F.coalesce(F.col(f"`{v}`"), F.lit(0)).alias(n)
          for v, n in zip(_PRIORITIES, out_names)])
    return renamed


@register(
    "q_string_agg",
    """
    SELECT n_nationkey, string_agg(c_name, ',' ORDER BY c_name) AS members
    FROM nation JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_nationkey
    """,
    doc="Ordered string aggregation: collect_list → array_sort → join. "
        "The sort is per-group post-shuffle (values are unique names), so "
        "results are deterministic despite parallel accumulation.",
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    return (
        nation.join(cust, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_nationkey")
        .agg(F.array_join(F.array_sort(F.collect_list("c_name")), ",")
             .alias("members"))
    )


# ------------------------------------------------------------- analytics


@register(
    "q_percentile",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
           ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact interpolated percentiles per group (sort-based agg). At "
        "100 TB swap to approx_percentile(...) — t-digest sketch, no "
        "per-group sort — when 1e-3 relative error is acceptable.",
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.5)"), 6)
            .alias("median_qty"),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6)
            .alias("p90_price"),
        )
    )


@register(
    "q_window_ntile",
    """
    SELECT c_custkey, c_mktsegment,
           NTILE(4) OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal DESC, c_custkey) AS balance_quartile
    FROM customer
    """,
    doc="NTILE bucketing per segment (unique tie-break key → stable).",
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment",
                F.ntile(4).over(w).alias("balance_quartile"))
    )


@register(
    "q_window_firstlast",
    """
    SELECT o_orderkey, o_custkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER w AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="first/last/nth_value over an unbounded frame — per-customer "
        "order history framing (NULL when the frame has no 2nd row).",
)
def q_window_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    price = F.col("o_totalprice")
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey",
                F.first(price).over(w).alias("first_price"),
                F.last(price).over(w).alias("last_price"),
                F.nth_value(price, 2).over(w).alias("second_price"))
    )


# ----------------------------------------------------------- null scalars


@register(
    "q_null_scalars",
    """
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'O') AS status_or_null,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_filled,
           (NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM NULL) AS is_open
    FROM orders
    """,
    doc="NULL-semantics scalars: NULLIF / COALESCE / null-safe equality "
        "(Spark <=> ≡ IS NOT DISTINCT FROM).",
)
def q_null_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return (
        table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            status_or_null.alias("status_or_null"),
            F.coalesce(status_or_null, F.lit("OPEN")).alias("status_filled"),
            status_or_null.eqNullSafe(F.lit(None).cast("string"))
            .alias("is_open"),
        )
    )


# ----------------------------------------------------- TPC-H-shaped joins


@register(
    "q_tpch_q3",
    """
    SELECT o_orderkey,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6)
             AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape (shipping priority): selective dim filter → "
        "broadcast customer → fact-fact join on orderkey → top-10 by "
        "revenue (TakeOrdered, no global sort).",
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(as_double6(F.sum(revenue)).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


@register(
    "q_tpch_q5",
    """
    SELECT n_name,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6)
             AS revenue
    FROM region
      JOIN nation   ON n_regionkey = r_regionkey
      JOIN customer ON c_nationkey = n_nationkey
      JOIN orders   ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape (local supplier volume): 6-table join — Catalyst "
        "reorders so region/nation/supplier broadcast and only the "
        "orders⋈lineitem exchange shuffles; the s_nationkey = c_nationkey "
        "residual makes the supplier join a non-trivial two-key match.",
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(cust, cust.c_nationkey == nation.n_nationkey)
        .join(orders, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), (supp.s_suppkey == li.l_suppkey)
              & (supp.s_nationkey == cust.c_nationkey))
        .groupBy("n_name")
        .agg(as_double6(F.sum(revenue)).alias("revenue"))
    )


@register(
    "q_window_cume",
    """
    SELECT o_orderkey, o_orderpriority,
           cume_dist() OVER w AS cd,
           percent_rank() OVER w AS pr
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
    doc="Distribution window functions (cume_dist / percent_rank) with "
        "a unique tie-break so ranks are stable.",
)
def q_window_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey")
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority",
                F.cume_dist().over(w).alias("cd"),
                F.percent_rank().over(w).alias("pr"))
    )


@register(
    "q_regex_extract",
    r"""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           regexp_matches(p_name, '[0-9]') AS has_digit,
           CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS INTEGER)
             AS vowel_runs
    FROM part
    """,
    doc="Regex scalar surface: extract group, boolean match, match count "
        "(patterns restricted to the POSIX-compatible common subset both "
        "engines implement identically).",
)
def q_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = F.col("p_name")
    return (
        table(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.regexp_extract(name, "([a-z]+)", 1).alias("first_word"),
            name.rlike("[0-9]").alias("has_digit"),
            F.size(F.regexp_extract_all(name, F.lit("[aeiou]+"), 0))
            .cast("int").alias("vowel_runs"),
        )
    )


@register(
    "q_array_explode",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id, CAST(u.i - 1 AS INTEGER) AS pos, toks[u.i] AS tok
    FROM t, LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i) u
    """,
    doc="Lateral array expansion with ordinality (posexplode ≙ unnest "
        "WITH ORDINALITY) — the generator/flatten operator.",
)
def q_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ", -1)).alias("pos", "tok"),
    ).select("doc_id", "pos", "tok")


@register(
    "q_scalar_array",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents WHERE doc_id < 100)
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_toks,
           list_contains(toks, 'the') AS has_the,
           list_sort(toks)[1] AS first_tok,
           array_to_string(list_slice(toks, 1, 3), ' ') AS head3
    FROM t
    """,
    doc="Array scalar surface: size/contains/sort/slice on a split "
        "column — the list-manipulation toolkit (DuckDB list_* twins).",
)
def q_scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = F.split(F.col("text"), " ", -1)
    return docs.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_toks"),
        F.array_contains(toks, "the").alias("has_the"),
        F.element_at(F.array_sort(toks), 1).alias("first_tok"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("head3"),
    )


@register(
    "q_udf_grouped_range",
    """
    SELECT l_returnflag,
           MAX(l_extendedprice) - MIN(l_extendedprice) AS price_range
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Grouped-aggregate Pandas UDF (Arrow-batched, numpy inside) — "
        "the UDAF extension point. max-min is order-independent and "
        "IEEE-exact, so the custom aggregate stays oracle-checkable. "
        "At scale: grouped-agg UDFs skip partial aggregation (full "
        "shuffle of raw rows) — prefer built-ins unless the aggregate "
        "genuinely needs custom code.",
)
def q_udf_grouped_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def price_range(v: pd.Series) -> float:
        return float(v.max() - v.min())

    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(price_range("l_extendedprice").alias("price_range"))
    )


@register(
    "q_approx_distinct",
    """
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_uniq_cust,
           TRUE AS within_bounds
    FROM orders GROUP BY o_orderpriority
    """,
    doc="approx_count_distinct (HyperLogLog++): the 100 TB path for "
        "distinct counts — constant memory per group vs the exact "
        "expand+two-phase plan q_agg_distinct pays. rsd=0.02: the "
        "sketch is ~16x smaller than rsd=0.01 for an error budget "
        "that still clears the 5% test bound — measured 0.42 s vs "
        "0.14 s steady-state at sf0.1. Oracle contract: sketches are "
        "engine-specific, so the checked output is the EXACT count "
        "plus a Spark-computed within_bounds flag (|approx−exact| ≤ "
        "5·rsd·exact, a ≥5σ envelope); the oracle re-derives the "
        "exact count and literal TRUE — a green row certifies the "
        "sketch's error bound, not merely that rows came back.",
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Certification plan: distinct (group, key) pairs first — partial-
    # aggregable, ONE scan — then count pairs per group (the exact
    # answer) and sketch the deduped keys in the same aggregate. HLL is
    # duplicate-insensitive, so sketching after dedup estimates the
    # same cardinality while avoiding the Expand-doubled plan that
    # mixing countDistinct with a non-distinct aggregate forces
    # (measured 2.8 s → this shape at sf0.1). Production uses the
    # sketch alone (no distinct pre-pass) — this query exists to
    # certify its bound, which requires the exact count anyway.
    pairs = (
        table(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_custkey")
        .distinct()
    )
    return (
        pairs.groupBy("o_orderpriority")
        # count(col), not count(*): a NULL key survives distinct() as
        # its own pair row, but COUNT(DISTINCT) and the HLL sketch
        # both ignore NULLs — count(*) would run one high on any
        # group containing a NULL o_custkey.
        .agg(F.count("o_custkey").cast("bigint").alias("exact_uniq_cust"),
             F.approx_count_distinct("o_custkey", rsd=0.02).alias("_approx"))
        .select(
            "o_orderpriority", "exact_uniq_cust",
            (F.abs(F.col("_approx") - F.col("exact_uniq_cust"))
             <= 5 * 0.02 * F.col("exact_uniq_cust")).alias("within_bounds"),
        )
    )


@register(
    "q_tpch_q1",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 6)
             AS sum_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 6)
             AS sum_base_price,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6)
             AS sum_disc_price,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))
                          * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE), 6)
             AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 (pricing summary): the canonical scan-heavy partial "
        "aggregation — filter pushed to the parquet scan, 6 grouped "
        "rows out of the whole fact table, everything map-side "
        "combined. Averages derived from the exact decimal sums "
        "(sum/count in double on both engines) rather than a separate "
        "avg() whose accumulation order could differ.",
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
    # The sf-scale lineitem file is ONE parquet row group, so the scan —
    # and with it the 8-lane decimal partial aggregate — runs as a
    # single task. Rebalance the filtered, pruned rows first (guide
    # §2.5 "unsplittable input"; fill_cluster no-ops whenever the scan
    # already has ≥ cores splits, i.e. at any real scale). Filter stays
    # pushed below the exchange; measured 0.68 → 0.54 s at sf0.1 (r16).
    li = fill_cluster(li.select("l_returnflag", "l_linestatus",
                                "l_quantity", "l_extendedprice",
                                "l_discount", "l_tax"))
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    charge = disc_price * (F.lit(1) + dec("l_tax"))
    cnt = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            as_double6(F.sum(dec("l_quantity"))).alias("sum_qty"),
            as_double6(F.sum(dec("l_extendedprice"))).alias("sum_base_price"),
            as_double6(F.sum(disc_price)).alias("sum_disc_price"),
            as_double6(F.sum(charge)).alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / cnt)
            .alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / cnt)
            .alias("avg_price"),
            (F.sum(dec("l_discount")).cast("double") / cnt)
            .alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q_tpch_q10",
    """
    SELECT c_custkey, c_name,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6)
             AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape (returned-item revenue, columns adapted to the "
        "substrate customer schema): date-windowed orders join the "
        "returned lineitems on the shuffled orderkey, tiny nation "
        "broadcasts, top-20 customers by lost revenue via TakeOrdered "
        "(no global sort).",
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp")
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = table(spark, sf_dir, "nation")
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(as_double6(F.sum(revenue)).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q_tpch_q6",
    """
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                           * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE), 6)
             AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 (forecasting revenue change): the canonical "
        "full-pushdown query — every predicate reaches the parquet "
        "scan (date window + discount band + quantity cap), one "
        "global decimal sum, no grouping. The plan is scan → partial "
        "sum → single-row exchange; at 100 TB the only moving data "
        "is one decimal per input split.",
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24))
    return li.agg(
        as_double6(F.sum(dec("l_extendedprice") * dec("l_discount")))
        .alias("revenue"))


@register(
    "q_tpch_q14",
    """
    SELECT 100.00 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
          THEN CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))
          ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'
    """,
    doc="TPC-H Q14 (promotion effect): date-pruned fact scan joined to "
        "the part dimension (broadcast — parts is a dim table), one "
        "conditional/unconditional decimal sum pair, ratio taken in "
        "double on both engines after exact decimal accumulation.",
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01 00:00:00").cast("timestamp")))
    part = table(spark, sf_dir, "part")
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), disc_price) \
        .otherwise(F.lit(0).cast("decimal(18,2)"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg((F.lit(100.0) * F.sum(promo).cast("double")
              / F.sum(disc_price).cast("double")).alias("promo_revenue"))
    )


@register(
    "q_tpch_q18",
    """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 6)
             AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 (large-volume customers): SINGLE-scan formulation — "
        "the textbook plan aggregates lineitem for the HAVING filter "
        "and then scans+joins+re-aggregates the fact table a second "
        "time for the output sum, but o_orderkey is unique per order, "
        "so the per-order sum the filter already computed IS the "
        "output column. One fact scan, one partial-aggregable shuffle, "
        "then the ~1% oversized sliver joins orders/customer (AQE "
        "broadcasts the sliver at runtime — its size is data-dependent, "
        "so the plan leaves the strategy to the optimizer instead of "
        "pinning a broadcast that a 100 TB run could not hold). "
        "Top-100 via TakeOrdered with the unique orderkey tie-break.",
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("_q"))
        .filter(F.col("_q") > 250)
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", as_double6(F.col("_q")).alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )
