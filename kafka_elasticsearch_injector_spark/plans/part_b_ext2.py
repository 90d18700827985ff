"""Part B extension, second slice — remaining relational-surface families:
correlated/uncorrelated subqueries, unpivot (wide→long), min_by/max_by
argument aggregates, date interval arithmetic, conditional scalars,
sliding event-time windows, statistical (moment) aggregates, and the
semi-structured VARIANT path.

The reference has none of these (SURVEY.md §2.2); together with part_b /
part_b_ext they complete the "what a query engine user would run"
surface. Determinism discipline per plans/_util.py: decimal money sums,
round-to-6 floats, unique tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import table
from ..operators.scale import fill_cluster
from .registry import register

# ----------------------------------------------------------- subqueries


@register(
    "q_exists_subquery",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT'
                    AND o.o_totalprice > c.c_acctbal)
    """,
    doc="Correlated EXISTS with a non-key correlated predicate "
        "(o_totalprice > c_acctbal). Catalyst rewrites to a left-semi "
        "join with the extra conjunct as the join condition — no "
        "per-row re-execution, unlike a naive nested-loop subquery. "
        "At scale the rewrite shuffles both sides on custkey once.",
)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer_ex")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_ex")
    return spark.sql("""
        SELECT c_custkey, c_name
        FROM customer_ex c
        WHERE EXISTS (SELECT 1 FROM orders_ex o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT'
                        AND o.o_totalprice > c.c_acctbal)
    """)


@register(
    "q_in_subquery",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING')
      AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem
                             WHERE l_quantity > 49)
    """,
    doc="IN + NOT IN subqueries. IN → left-semi join; NOT IN → "
        "null-aware left-anti join (Catalyst must prove the subquery "
        "column non-null or keep the null-aware variant, which cannot "
        "broadcast-skip nulls). l_orderkey is non-nullable here so the "
        "plan degenerates to a plain anti join — the cheap path.",
)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_in")
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer_in")
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_in")
    return spark.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders_in
        WHERE o_custkey IN (SELECT c_custkey FROM customer_in
                            WHERE c_mktsegment = 'BUILDING')
          AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem_in
                                 WHERE l_quantity > 49)
    """)


# -------------------------------------------------------------- unpivot


@register(
    "q_unpivot",
    """
    SELECT l_orderkey, l_linenumber, metric, val
    FROM (SELECT l_orderkey, l_linenumber,
                 l_quantity, l_extendedprice, l_discount, l_tax
          FROM lineitem)
    UNPIVOT (val FOR metric IN
             (l_quantity, l_extendedprice, l_discount, l_tax))
    """,
    doc="Wide→long unpivot (inverse of q_pivot): 4 measure columns → "
        "(metric, val) rows. Spark Expand node — one scan, 4× output, "
        "no shuffle; raw-double passthrough is hash-safe (no "
        "arithmetic). DuckDB twin is SQL-standard UNPIVOT.",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "lineitem").unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "val",
    )


# ----------------------------------------------------- argument aggregates


@register(
    "q_minmax_by",
    """
    SELECT c_nationkey,
           max_by(c_name, c_acctbal * 1000000 + c_custkey) AS top_cust,
           min_by(c_name, c_acctbal * 1000000 + c_custkey) AS bottom_cust,
           ROUND(MAX(c_acctbal), 6) AS max_bal
    FROM customer GROUP BY c_nationkey
    """,
    doc="max_by/min_by argument aggregates (DuckDB arg_max/arg_min "
        "aliases). Ordering key is acctbal*1e6 + custkey: custkey is "
        "unique and dominates the double's ulp at this magnitude, so "
        "the winner is deterministic even when acctbal ties — max_by "
        "with a non-unique key is nondeterministic in BOTH engines. "
        "Partial-aggregable: one shuffle of one row per group.",
)
def q_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = F.col("c_acctbal") * 1000000 + F.col("c_custkey")
    return (
        table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.max_by("c_name", key).alias("top_cust"),
            F.min_by("c_name", key).alias("bottom_cust"),
            F.round(F.max("c_acctbal"), 6).alias("max_bal"),
        )
    )


# ------------------------------------------------------- interval arithmetic


@register(
    "q_interval_arith",
    """
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) + 90 AS DATE) AS due_date,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
             AS plus3mo,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end
    FROM orders
    """,
    doc="Date interval arithmetic: +N days, +N months (end-of-month "
        "clamping semantics agree across engines), last_day. All "
        "narrow projections — whole-stage codegen, no shuffle.",
)
def q_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.col("o_orderdate").cast("date")
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_add(d, 90).alias("due_date"),
        F.add_months(d, 3).alias("plus3mo"),
        F.last_day(d).alias("month_end"),
    )


# -------------------------------------------------------- conditional scalars


@register(
    "q_scalar_cond",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity < 30 THEN 'mid'
                ELSE 'high' END AS qty_band,
           ROUND(LEAST(l_discount, l_tax), 6) AS min_rate,
           ROUND(GREATEST(l_discount, l_tax), 6) AS max_rate,
           CASE l_linestatus WHEN 'F' THEN 1 ELSE 0 END AS is_f
    FROM lineitem
    """,
    doc="Conditional scalar surface: searched CASE, simple CASE, "
        "LEAST/GREATEST. Pure codegen projections.",
)
def q_scalar_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber",
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") < 30, "mid")
        .otherwise("high").alias("qty_band"),
        F.round(F.least("l_discount", "l_tax"), 6).alias("min_rate"),
        F.round(F.greatest("l_discount", "l_tax"), 6).alias("max_rate"),
        F.when(F.col("l_linestatus") == "F", 1).otherwise(0).alias("is_f"),
    )


# --------------------------------------------------------- sliding windows


@register(
    "q_window_slide",
    """
    SELECT win_start, COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS uniq_users
    FROM (
      SELECT time_bucket(INTERVAL 30 MINUTES, ts) AS win_start, user_id
      FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL 30 MINUTES, ts) - INTERVAL 30 MINUTES,
             user_id
      FROM events
    ) GROUP BY win_start
    """,
    doc="Sliding event-time window (1 h window, 30 min slide) — batch "
        "analog of streaming groupBy(window(ts, '1 hour', '30 "
        "minutes')). Spark's window() expands each event into "
        "window/slide = 2 rows before the agg (the oracle makes the "
        "expansion explicit as a two-bucket UNION ALL); both are "
        "epoch-aligned in UTC. At scale the 2× expansion happens "
        "map-side and partial aggregation collapses it pre-shuffle.",
)
def q_window_slide(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("uniq_users"),
        )
        .select(F.col("win.start").alias("win_start"),
                "n_events", "uniq_users")
    )


# ------------------------------------------------------ moment aggregates


@register(
    "q_stats_agg",
    """
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 6) + 0.0 AS qty_price_corr,
           ROUND(stddev_samp(l_quantity), 6) AS qty_sd,
           ROUND(var_pop(l_discount), 6) AS disc_var,
           ROUND(covar_samp(l_discount, l_tax), 6) + 0.0 AS disc_tax_cov
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Statistical moment aggregates: corr, stddev, variance, "
        "covariance. Both engines use single-pass co-moment updates "
        "(Welford/Chan merge), so results agree far inside the 1e-6 "
        "rounding at these magnitudes (quantity ≤ 50, rates ≤ 0.1; "
        "corr is scale-free). The sign-capable moments (corr, covar) "
        "carry the oracle-side `+ 0.0` IEEE normalization: a tiny "
        "negative covariance ROUNDs to -0.0 in DuckDB (IEEE sign "
        "preserved) but +0.0 in Spark (BigDecimal has no signed "
        "zero), and the driver's typed hash distinguishes them — the "
        "round-3 q_stats_agg red row. Partial-aggregable: each "
        "partition ships one (n, mean, M2, co-moment) tuple per group.",
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6)
            .alias("qty_price_corr"),
            F.round(F.stddev_samp("l_quantity"), 6).alias("qty_sd"),
            F.round(F.var_pop("l_discount"), 6).alias("disc_var"),
            F.round(F.covar_samp("l_discount", "l_tax"), 6)
            .alias("disc_tax_cov"),
        )
    )


# ------------------------------------------------------------- VARIANT


@register(
    "q_variant_json",
    """
    SELECT event_id,
           CASE WHEN try_cast(props AS JSON) IS NOT NULL
                THEN CAST(json_extract_string(props, '$.k') AS INTEGER)
           END AS k
    FROM events
    """,
    doc="Semi-structured VARIANT path (Spark 4): try_parse_json → "
        "binary variant → typed try_variant_get extraction. Malformed "
        "and NULL payloads yield NULL instead of failing the batch — "
        "the reference's decode-error side-drop semantic "
        "(consumer.go:154-159) as a total function. VARIANT keeps a "
        "parsed binary form, so repeated path extraction avoids "
        "re-tokenizing the JSON text (vs get_json_object per path).",
)
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    # try_parse_json over every payload runs on the single-row-group
    # scan's one task at bench scale — rebalance the two needed columns
    # first; no-op at real scale (fill_cluster guard). Measured
    # 0.32 → 0.19 s at sf0.1 (r16).
    v = F.try_parse_json(F.col("props"))
    return fill_cluster(
        table(spark, sf_dir, "events").select("event_id", "props")
    ).select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k"),
    )


# ------------------------------------------------------------ map scalars


@register(
    "q_map_scalars",
    """
    SELECT p_partkey,
           map_extract(map(['brand','type'], [p_brand, p_type]),
                       'brand')[1] AS brand,
           CAST(cardinality(map(['brand','type'], [p_brand, p_type]))
                AS INTEGER) AS n_keys,
           array_to_string(map_keys(map(['brand','type'], [p_brand, p_type])),
                           ',') AS ks
    FROM part
    """,
    doc="Map scalar surface: construction, key extraction, cardinality, "
        "key listing. DuckDB's map_extract returns a list (unwrapped "
        "with [1]); Spark's element_at returns the scalar directly. "
        "Construction order is preserved by both engines, so map_keys "
        "compares deterministically. The key list is serialized with "
        "array_join/array_to_string on BOTH sides: the driver's value "
        "hasher cannot factorize array-typed cells (round-3 "
        "`unhashable type: 'list'` crash), so no declared query may "
        "emit an Array/Map column (lint: test_registry_priority.py).",
)
def q_map_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = F.create_map(F.lit("brand"), F.col("p_brand"),
                     F.lit("type"), F.col("p_type"))
    return table(spark, sf_dir, "part").select(
        "p_partkey",
        F.element_at(m, "brand").alias("brand"),
        F.size(m).cast("int").alias("n_keys"),
        F.array_join(F.map_keys(m), ",").alias("ks"),
    )


# ---------------------------------------------------------- bitwise aggs


@register(
    "q_bit_agg",
    """
    SELECT l_returnflag,
           bit_and(l_linenumber) AS ln_and,
           bit_or(l_linenumber) AS ln_or,
           bit_xor(l_linenumber) AS ln_xor
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Bitwise aggregates — commutative/associative, so fully "
        "partial-aggregable: each partition ships three ints per group.",
)
def q_bit_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.bit_and("l_linenumber").alias("ln_and"),
            F.bit_or("l_linenumber").alias("ln_or"),
            F.bit_xor("l_linenumber").alias("ln_xor"),
        )
    )


# ---------------------------------------------------------- lateral join


@register(
    "q_lateral_topk",
    """
    SELECT n_name, c_name, c_acctbal
    FROM nation, LATERAL (
      SELECT c_name, c_acctbal FROM customer
      WHERE c_nationkey = n_nationkey
      ORDER BY c_acctbal DESC, c_custkey LIMIT 3)
    """,
    doc="Correlated LATERAL subquery: top-3 customers per nation. "
        "Catalyst decorrelates to a join + per-key window rather than "
        "re-running the subquery per outer row; ties broken by the "
        "unique custkey for determinism.",
)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "nation").createOrReplaceTempView("nation_lt")
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer_lt")
    return spark.sql("""
        SELECT n_name, c_name, c_acctbal
        FROM nation_lt, LATERAL (
          SELECT c_name, c_acctbal FROM customer_lt
          WHERE c_nationkey = n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 3)
    """)


# ------------------------------------------------------- try-arithmetic


@register(
    "q_try_arith",
    """
    SELECT o_orderkey,
           o_totalprice / (day(CAST(o_orderdate AS DATE)) - 15)
             AS per_day_off,
           try_cast(o_orderpriority AS INTEGER) AS prio_bad,
           try_cast(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_num
    FROM orders
    """,
    doc="Total (never-failing) arithmetic under ANSI mode: try_divide "
        "yields NULL on the day-15 zero divisor (DuckDB's plain / "
        "already returns NULL on zero — same totalization), and "
        "try_cast absorbs unparseable strings. The ANSI-mode engine "
        "keeps strict errors by default; try_* is the explicit opt-out "
        "per expression, not a global setting flip.",
)
def q_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    # try_cast string→int goes through the ANSI cast, which THROWS and
    # catches a JVM exception per unparseable row — on a column where
    # most rows don't parse (this one: '1-URGENT'…) that's ~50× slower
    # than the parse itself, and at 100 TB an exception storm. The rlike
    # guard short-circuits non-candidates to NULL without entering the
    # throwing path; CaseWhen evaluates the cast branch lazily, and the
    # guard accepts exactly the trimmed [+-]?digits forms the Spark cast
    # does (ASCII \d, no decimals/exponents — verified against plain
    # try_cast on edge cases), so results are identical.
    maybe_int = F.col("o_orderpriority").rlike(r"^\s*[+-]?\d+\s*$")
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.try_divide(
            F.col("o_totalprice"),
            F.dayofmonth(F.col("o_orderdate").cast("date")) - 15)
        .alias("per_day_off"),
        F.when(maybe_int, F.col("o_orderpriority").try_cast("int"))
        .alias("prio_bad"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("prio_num"),
    )


# ----------------------------------------------------- remaining joins/sorts


@register(
    "q_join_full",
    """
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM (SELECT * FROM customer WHERE c_mktsegment = 'AUTOMOBILE') c
    FULL OUTER JOIN (SELECT * FROM orders
                     WHERE o_orderpriority = '1-URGENT') o
      ON c.c_custkey = o.o_custkey
    """,
    doc="FULL OUTER join: rows survive from BOTH unmatched sides. "
        "Cannot broadcast (either side may need to emit unmatched rows) "
        "— always a shuffle sort-merge join; plan accordingly at scale: "
        "full-outer on a skewed key is AQE-split like any other shuffle "
        "join, but there is no broadcast escape hatch.",
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer") \
        .filter(F.col("c_mktsegment") == "AUTOMOBILE")
    orders = table(spark, sf_dir, "orders") \
        .filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "full") \
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@register(
    "q_select_distinct",
    """
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
    doc="SELECT DISTINCT — rewrites to a group-by with partial "
        "aggregation: each partition dedups map-side, the shuffle "
        "carries unique (status, priority) combinations only.",
)
def q_select_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "orders") \
        .select("o_orderstatus", "o_orderpriority").distinct()


@register(
    "q_order_nulls",
    """
    SELECT event_id, props
    FROM events
    ORDER BY props NULLS FIRST, event_id
    LIMIT 50
    """,
    doc="Explicit NULLS FIRST ordering (Spark's default for ASC is "
        "nulls-first, DuckDB's is nulls-last — the explicit modifier "
        "is what makes the two engines agree). Unique event_id "
        "tie-break keeps the prefix deterministic.",
)
def q_order_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .select("event_id", "props")
        .orderBy(F.col("props").asc_nulls_first(), "event_id")
        .limit(50)
    )


@register(
    "q_limit_offset",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10 OFFSET 20
    """,
    doc="Pagination: ORDER BY + LIMIT/OFFSET. Spark executes as a "
        "global top-(offset+limit) then drops the prefix — fine for "
        "page 3, quadratic-ish for page 10000 (keyset pagination, "
        "WHERE key > last_seen, is the scale answer).",
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(20).limit(10)
    )


@register(
    "q_window_range_frame",
    """
    SELECT o_orderkey, o_custkey,
           COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY epoch_ms(o_orderdate)
             RANGE BETWEEN 2592000000 PRECEDING AND CURRENT ROW)
             AS n_orders_30d
    FROM orders
    """,
    doc="RANGE frame over a physical quantity (trailing 30 days in "
        "epoch-millis): peers are value-distance, not row-distance — "
        "the moving-window-by-time aggregate ROWS frames can't express. "
        "One shuffle on custkey; the frame scan is a per-partition "
        "two-pointer sweep.",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        # NTZ→LTZ cast is value-preserving in the UTC session and is
        # what DuckDB's epoch_ms does implicitly.
        .orderBy(F.unix_millis(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-2592000000, Window.currentRow)
    )
    return table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
    )


# ------------------------------------------------------------ merge/upsert


@register(
    "q_merge_upsert",
    """
    WITH updates AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2))
                        * CAST(1.1 AS DECIMAL(18,2)), 2) AS DOUBLE)
               AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 10 = 0
    )
    SELECT o_orderkey, o_orderstatus,
           ROUND(o_totalprice, 6) AS o_totalprice
    FROM (
      SELECT * FROM orders WHERE o_orderkey NOT IN
        (SELECT o_orderkey FROM updates)
      UNION ALL
      SELECT * FROM updates
    )
    """,
    doc="MERGE INTO emulation on a plain table (operators/etl.py "
        "merge_upsert): WHEN MATCHED THEN UPDATE + WHEN NOT MATCHED "
        "THEN INSERT as anti-join + union — the no-Delta CDC-apply "
        "pattern. The updates side broadcasts (a CDC batch vs the "
        "whole table), so the target is scanned once, never shuffled.",
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.etl import merge_upsert
    from ._util import dec

    orders = table(spark, sf_dir, "orders")
    updates = orders.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice",
        F.round(dec("o_totalprice") * dec(F.lit(1.1)), 2).cast("double"))
    return merge_upsert(orders, updates, ["o_orderkey"]).select(
        "o_orderkey", "o_orderstatus",
        F.round(F.col("o_totalprice"), 6).alias("o_totalprice"),
    )


@register(
    "q_scd2_apply",
    """
    WITH dim AS (
      SELECT c_custkey, c_name,
             TIMESTAMP '1995-01-01' AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to,
             TRUE AS is_current
      FROM customer
    ), changes AS (
      SELECT c_custkey, 'UPD-' || c_name AS c_name,
             TIMESTAMP '1996-06-01' AS ts
      FROM customer WHERE c_custkey % 20 = 0
    )
    SELECT c_custkey, c_name, valid_from, valid_to, is_current FROM (
      SELECT d.c_custkey, d.c_name, d.valid_from,
             CASE WHEN ch.c_custkey IS NOT NULL
                  THEN ch.ts ELSE d.valid_to END AS valid_to,
             ch.c_custkey IS NULL AS is_current
      FROM dim d LEFT JOIN changes ch ON d.c_custkey = ch.c_custkey
      UNION ALL
      SELECT c_custkey, c_name, ts, CAST(NULL AS TIMESTAMP), TRUE
      FROM changes
    )
    """,
    doc="SCD2 history application (operators/etl.py scd2_apply) as an "
        "oracle-checked query: every 20th customer gets a name change; "
        "the old row closes at the change timestamp, the new row "
        "becomes current. The oracle spells out the same close+append "
        "as LEFT JOIN + UNION ALL.",
)
def q_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.etl import scd2_apply

    cust = table(spark, sf_dir, "customer")
    dim = cust.select(
        "c_custkey", "c_name",
        F.lit("1995-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    changes = cust.filter(F.col("c_custkey") % 20 == 0).select(
        "c_custkey",
        F.concat(F.lit("UPD-"), F.col("c_name")).alias("c_name"),
        F.lit("1996-06-01").cast("timestamp").alias("ts"),
    )
    return scd2_apply(dim, changes, ["c_custkey"], "ts").select(
        "c_custkey", "c_name", "valid_from", "valid_to", "is_current")


@register(
    "q_approx_percentile",
    """
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS p50_within, TRUE AS p90_within, TRUE AS p99_within
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="approx_percentile (GK quantile-summary sketch): the 100 TB "
        "path for quantiles — fixed-size sketch per group, partial-"
        "aggregable, vs the full per-group sort the exact percentile "
        "pays. accuracy=10000 ≈ 1e-4 rank error. Oracle contract: "
        "quantile sketches are engine-specific, so the checked output "
        "is the group count plus Spark-computed rank-envelope flags — "
        "each approx quantile's EXACT rank span [count(<v), count(≤v)] "
        "must intersect [q−0.01, q+0.01]·n (100× the sketch's "
        "guaranteed rank error); the oracle re-derives the count and "
        "literal TRUE. A green row certifies the sketch's rank bound "
        "against exact rank counts, not merely that rows came back. "
        "(Scalar flags, not the percentile array: array outputs crash "
        "the driver's hasher — see q_map_scalars.)",
)
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    qs = [0.5, 0.9, 0.99]
    li = table(spark, sf_dir, "lineitem")
    sketch = (
        li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"),
             F.percentile_approx("l_extendedprice", qs, 10000).alias("_a"))
        .select("l_returnflag", "n",
                *[F.element_at("_a", i + 1).alias(f"_a{i}")
                  for i in range(len(qs))])
    )
    # Rank-counting certification: the returned quantile's TRUE rank
    # span is [count(x < v), count(x <= v)] (tie-safe); the sketch's
    # rank-error guarantee (1e-4) holds iff that span intersects
    # [q-0.01, q+0.01]·n (100× slack). This is one O(N) conditional
    # aggregation under a broadcast of the 3-row sketch result — fully
    # parallel, unlike an exact per-group percentile whose sort
    # parallelism is capped at the group count (3 here; measured
    # 1.65 s → this shape at sf0.1) and whose per-group value buffer
    # is the exact thing a 100 TB pipeline cannot hold.
    j = li.select("l_returnflag", "l_extendedprice").join(
        F.broadcast(sketch), "l_returnflag")
    cnt = j.groupBy("l_returnflag").agg(
        F.first("n").alias("n"),
        *[agg for i in range(len(qs)) for agg in (
            F.sum((F.col("l_extendedprice") < F.col(f"_a{i}"))
                  .cast("long")).alias(f"_lo{i}"),
            F.sum((F.col("l_extendedprice") <= F.col(f"_a{i}"))
                  .cast("long")).alias(f"_hi{i}"),
        )])

    def within(i: int):
        n = F.col("n").cast("double")
        return ((F.col(f"_lo{i}") / n <= qs[i] + 0.01)
                & (F.col(f"_hi{i}") / n >= qs[i] - 0.01))

    return cnt.select(
        "l_returnflag", "n",
        within(0).alias("p50_within"),
        within(1).alias("p90_within"),
        within(2).alias("p99_within"),
    )


@register(
    "q_salted_distinct",
    """
    SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n_distinct
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact distinct count through the SKEW-SALTED topology "
        "(operators/scale.py): phase 1 dedups (group, salt(value), "
        "value) so a hot group's distinct values spread over 16 "
        "reducers instead of funneling through one; per-salt counts sum "
        "to the exact answer because a value always hashes to the same "
        "salt. Oracle is the plain COUNT(DISTINCT) — results must be "
        "identical, only the physical plan differs.",
)
def q_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scale import salted_distinct_count

    return salted_distinct_count(
        table(spark, sf_dir, "lineitem"), "l_returnflag", "l_orderkey")


@register(
    "q_profile_columns",
    """
    WITH m AS (
      SELECT COUNT(*) AS n,
             COUNT(event_id) AS nn_eid, COUNT(DISTINCT event_id) AS nd_eid,
             CAST(MIN(event_id) AS VARCHAR) AS mn_eid,
             CAST(MAX(event_id) AS VARCHAR) AS mx_eid,
             COUNT(user_id) AS nn_uid, COUNT(DISTINCT user_id) AS nd_uid,
             CAST(MIN(user_id) AS VARCHAR) AS mn_uid,
             CAST(MAX(user_id) AS VARCHAR) AS mx_uid,
             COUNT(event_type) AS nn_et, COUNT(DISTINCT event_type) AS nd_et,
             MIN(event_type) AS mn_et, MAX(event_type) AS mx_et
      FROM events
    )
    SELECT 'event_id' AS column, n AS n_rows, n - nn_eid AS n_nulls,
           nd_eid AS n_distinct, mn_eid AS min_value, mx_eid AS max_value
    FROM m
    UNION ALL
    SELECT 'user_id', n, n - nn_uid, nd_uid, mn_uid, mx_uid FROM m
    UNION ALL
    SELECT 'event_type', n, n - nn_et, nd_et, mn_et, mx_et FROM m
    """,
    doc="Deequ-style data profile (operators/etl.py profile): per-column "
        "row/null/exact-distinct counts and typed min/max, all metrics "
        "in ONE aggregation pass (multi-distinct expand, one shuffle); "
        "the per-column pivot happens on the single result row. "
        "Profiled columns are the cast-format-stable ones (bigint, "
        "string) so the oracle hash is byte-identical; doubles and "
        "timestamps go through the same operator in unit tests.",
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.etl import profile

    return profile(table(spark, sf_dir, "events"),
                   ["event_id", "user_id", "event_type"])
