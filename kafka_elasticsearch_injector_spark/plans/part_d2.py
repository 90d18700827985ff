"""Part D2 — the remaining TPC-H shapes expressible on the generated
schema (Q7 two-nation volume, Q8 market share, Q9 profit analog, Q13
order-count distribution, Q15 top supplier, Q17 small-quantity revenue,
Q22 inactive-customer balances, and the completions Q2 min-cost
supplier, Q11 important stock, Q16 parts/supplier counts, Q20 potential
promotion, Q21 waiting-order suppliers — with these, all 22 TPC-H query
shapes are declared), plus the duplicated-span census from the
substring-dedup literature.

Cross-engine determinism notes specific to this file:
- EXTRACT(year ...) is BIGINT in DuckDB but INT in Spark — every year
  column is CAST to INT on the oracle side.
- Ratio outputs (Q8 market share) cast both decimal sums to DOUBLE
  BEFORE dividing: decimal-division scale rules differ between engines,
  IEEE double division does not.
- Q22's average-balance threshold is spelled CAST(SUM(dec) AS DOUBLE)
  / COUNT on both sides — never AVG(double), whose accumulation order
  is engine-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ._util import as_double6, dec
from .registry import register

# ------------------------------------------------- TPC-H completions II


@register(
    "q_tpch_q7",
    """
    SELECT supp_nation, cust_nation, l_year,
           ROUND(CAST(SUM(volume) AS DOUBLE), 6) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 (volume shipping between two nations). The nation "
        "pair predicate reaches the supplier/customer sides through "
        "the broadcast dimension joins, so the only big shuffle is "
        "orders-to-lineitem; supplier (100 rows), customer, and both "
        "nation aliases broadcast. Year extraction is cast to INT on "
        "the oracle side (DuckDB EXTRACT is BIGINT).",
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_name").alias("supp_nation"))
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("cust_nation"))
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("l_suppkey", "l_orderkey", "l_shipdate",
             (dec("l_extendedprice") * (1 - dec("l_discount"))).alias("volume"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(as_double6(F.sum("volume")).alias("revenue"))
    )


@register(
    "q_tpch_q8",
    """
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_2' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE'
        AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        AND p_type LIKE 'PROMO%'
    ) all_nations
    GROUP BY o_year
    """,
    doc="TPC-H Q8 (national market share): the NATION_2 share of PROMO "
        "part revenue sold into EUROPE customers, per order year. Five "
        "broadcast dimensions (part-filtered part, supplier, customer, "
        "nation x2, region) around the single orders-lineitem shuffle. "
        "The share ratio casts both decimal sums to DOUBLE before "
        "dividing — decimal division scale rules differ across "
        "engines, IEEE doubles do not.",
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part").filter(
        F.col("p_type").like("PROMO%")).select("p_partkey")
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation"))
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_regionkey").alias("n1_region"))
    region = table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE").select("r_regionkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey",
        (dec("l_extendedprice") * (1 - dec("l_discount"))).alias("volume"))
    nat2_vol = F.when(F.col("nation") == "NATION_2", F.col("volume")) \
        .otherwise(F.lit(0).cast("decimal(18,2)"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(nat2_vol).cast("double")
              / F.sum("volume").cast("double")).alias("mkt_share"))
    )


@register(
    "q_tpch_q9",
    """
    SELECT nation, o_year, ROUND(CAST(SUM(amount) AS DOUBLE), 6) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))
               - CAST(p_retailprice AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(0.1 AS DECIMAL(3,1)) AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%3%'
    ) profit
    GROUP BY nation, o_year
    """,
    doc="TPC-H Q9 (product-type profit) adapted: the generated schema "
        "has no partsupp, so supply cost is modeled as 10% of "
        "p_retailprice x quantity — the join topology (part filter -> "
        "5-way join -> nation/year rollup) is what the benchmark "
        "exercises and is preserved. part/supplier/nation broadcast; "
        "orders-lineitem is the one shuffle. All money terms are "
        "exact decimals until the final double cast.",
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%3%")).select("p_partkey", "p_retailprice")
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation"))
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_quantity",
        "l_extendedprice", "l_discount")
    amount = (
        dec("l_extendedprice") * (1 - dec("l_discount"))
        - dec("p_retailprice") * dec("l_quantity")
        * F.lit(0.1).cast("decimal(3,1)"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(as_double6(F.sum(amount)).alias("sum_profit"))
    )


@register(
    "q_tpch_q13",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    doc="TPC-H Q13 (customer order-count distribution): LEFT join keeps "
        "zero-order customers, COUNT(o_orderkey) ignores the null "
        "probe rows, then the distribution re-aggregates the per- "
        "customer counts. Two shuffles by construction (custkey, then "
        "c_count — the second is over ≤ max-orders-per-customer "
        "distinct values, KB-sized at any corpus scale).",
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist"))


@register(
    "q_tpch_q15",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           ROUND(CAST(total_revenue AS DOUBLE), 6) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15 (top supplier): quarter-windowed per-supplier "
        "revenue, then the max-revenue supplier(s) via a scalar "
        "subquery — the equality compares EXACT decimals, so the "
        "cross-engine tie semantics are well-defined (a double "
        "comparison here would be flaky). The revenue CTE is computed "
        "once and reused for both the max and the join in both "
        "engines; supplier broadcasts.",
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate")
             >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate")
               < F.lit("1996-04-01 00:00:00").cast("timestamp")))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))
             .alias("total_revenue"))
    )
    top = rev.agg(F.max("total_revenue").alias("_max"))
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(top),
                 rev.total_revenue == F.col("_max"))
        .join(F.broadcast(sup), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name",
                as_double6(F.col("total_revenue")).alias("total_revenue"))
    )


@register(
    "q_tpch_q17",
    """
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / 7.0, 6) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
      AND l_quantity < (
        SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey)
    """,
    doc="TPC-H Q17 (small-quantity-order revenue) adapted to brand+size "
        "(no p_container). The correlated scalar AVG decorrelates to a "
        "per-partkey aggregate joined back — Spark spells that "
        "explicitly, both engines compute AVG over integral-valued "
        "doubles (exact at any accumulation order below 2^53). The "
        "brand/size sliver broadcasts twice: once to prune lineitem "
        "before its per-part AVG, once for the final probe.",
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
    ).select("p_partkey")
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice")
    # Per-part average over ONLY the parts that can qualify — the
    # broadcast prune keeps the aggregate input at sliver scale.
    avg_qty = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey")
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_cap"))
    )
    return (
        li.join(F.broadcast(avg_qty.withColumnRenamed("l_partkey", "_pk")),
                li.l_partkey == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(F.round(
            F.sum(dec("l_extendedprice")).cast("double") / 7.0, 6)
            .alias("avg_yearly"))
    )


@register(
    "q_tpch_q22",
    """
    WITH thresh AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS cap
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
           ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 6)
             AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT cap FROM thresh)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
    doc="TPC-H Q22 (global sales opportunity) adapted: nationkey stands "
        "in for the phone country code. The average-balance threshold "
        "is spelled CAST(SUM(decimal) AS DOUBLE)/COUNT on BOTH sides — "
        "never AVG(double), whose accumulation order is engine- "
        "dependent. NOT EXISTS compiles to LEFT ANTI shipping only "
        "custkeys; the scalar threshold broadcasts.",
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal")
    thresh = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg((F.sum(dec("c_acctbal")).cast("double")
              / F.count(F.lit(1))).alias("cap"))
    )
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"))
    return (
        cust.join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("cap"))
        .join(orders, "c_custkey", "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(F.count(F.lit(1)).alias("numcust"),
             as_double6(F.sum(dec("c_acctbal"))).alias("totacctbal"))
    )


# ------------------------------------------------- duplicated-span census


@register(
    "q_dup_spans",
    """
    WITH sized AS (
      SELECT doc_id, text, GREATEST(LENGTH(text) - 32, 0) AS extra
      FROM documents
    ), grams AS (
      SELECT doc_id,
             MD5(SUBSTRING(text, CAST(1 + 16 * i AS INT), 32)) AS gram_md5
      FROM sized, UNNEST(range(0, 1 + (extra + 15) // 16)) AS t(i)
      WHERE LENGTH(SUBSTRING(text, CAST(1 + 16 * i AS INT), 32)) = 32
    )
    SELECT gram_md5,
           COUNT(*) AS n_occ,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM grams
    GROUP BY gram_md5
    HAVING COUNT(DISTINCT doc_id) > 1
    """,
    doc="Duplicated-span census — the scalable approximation of exact "
        "substring dedup (Lee et al., 'Deduplicating Training Data "
        "Makes Language Models Better'): aligned 32-char windows at "
        "stride 16 are fingerprinted (any duplicated substring ≥ 47 "
        "chars must contain one aligned window on both sides), and "
        "spans seen in more than one document surface. The shuffle "
        "carries 16-byte digests at 2 rows per 32 input chars; the "
        "cross-doc distinct is the standard two-phase expand. At "
        "100 TB this is the pre-filter that bounds the suffix-array "
        "work to colliding spans only.",
)
def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    n_grams = 1 + F.floor(
        (F.greatest(F.length("text") - 32, F.lit(0)) + 15) / 16)
    grams = (
        docs.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), (n_grams - 1).cast("int")))
            .alias("_i"),
            "text")
        .select(
            "doc_id",
            F.substring(F.col("text"),
                        (F.lit(1) + 16 * F.col("_i")).cast("int"), 32)
            .alias("span"))
        .filter(F.length("span") == 32)
        # Shuffle the 16-byte BINARY digest; re-hex only for the
        # declared hex output column after aggregation.
        .select("doc_id", F.unhex(F.md5("span")).alias("g"))
    )
    return (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_occ"),
             F.count_distinct(F.col("doc_id")).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
        .select(F.lower(F.hex("g")).alias("gram_md5"), "n_occ", "n_docs")
    )


# --------------------------------------------- TPC-H completions III
# The last five TPC-H shapes (Q2, Q11, Q16, Q20, Q21). The generated
# schema has no partsupp, commit/receipt dates, or comment columns, so
# each is the standard analog on the available columns — the shape
# (correlated min, scalar-subquery HAVING, NOT-IN + COUNT DISTINCT,
# nested-IN with HAVING, double EXISTS/NOT-EXISTS) is preserved; only
# the driving predicate is adapted, and the adaptation is named in each
# docstring. With these, all 22 TPC-H query shapes are declared.


@register(
    "q_tpch_q2",
    """
    WITH supply AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(l_extendedprice / l_quantity) AS ps_supplycost
      FROM lineitem GROUP BY 1, 2
    )
    SELECT s_acctbal, s_name, n_name, p_partkey,
           ps_supplycost AS supplycost
    FROM part
    JOIN supply   ON p_partkey = ps_partkey
    JOIN supplier ON s_suppkey = ps_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE p_size = 15 AND r_name = 'ASIA'
      AND ps_supplycost = (
        SELECT MIN(ps2.ps_supplycost)
        FROM supply ps2
        JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
        JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
        WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'ASIA')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 (minimum-cost supplier), adapted: no partsupp table, "
        "so supply cost is derived as each (part, supplier)'s minimum "
        "observed unit price MIN(l_extendedprice / l_quantity) — IEEE "
        "double division of identical operands, bit-equal across "
        "engines, so the correlated-min equality join is exact. The "
        "correlated subquery is decorrelated the classic way: one "
        "regional-min aggregate per part, equi-joined back (Catalyst "
        "cannot unnest an arbitrary correlated scalar subquery over a "
        "CTE, so the plan states the decorrelation directly). The "
        "output supply cost is that same bit-exact double, emitted "
        "UNROUNDED: both engines hold the identical IEEE value, while "
        "a ROUND(..., 6) would re-introduce a hazard (Spark's "
        "BigDecimal HALF_UP vs DuckDB's binary round can disagree on "
        "quotients that straddle a half-way boundary — the repo's "
        "round-to-6 discipline is for aggregates that accumulate "
        "differently, not needed for bit-equal values). supplier/"
        "nation/region broadcast everywhere; the only shuffles are the "
        "two part-keyed aggregates of the derived supply table. "
        "Ordering carries the full tie-break chain (acctbal DESC, "
        "nation, supplier, part) so the LIMIT 100 set is total-order "
        "deterministic.",
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    supply = (
        li.groupBy(F.col("l_partkey").alias("ps_partkey"),
                   F.col("l_suppkey").alias("ps_suppkey"))
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
             .alias("ps_supplycost"))
    )
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = table(spark, sf_dir, "part").filter(
        F.col("p_size") == 15).select("p_partkey")
    # Supply rows whose supplier sits in the target region.
    regional = (
        supply
        .join(F.broadcast(sup), supply.ps_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    min_cost = (
        regional.groupBy("ps_partkey")
        .agg(F.min("ps_supplycost").alias("min_cost"))
        .withColumnRenamed("ps_partkey", "mc_partkey")
    )
    return (
        regional
        .join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .join(min_cost, (F.col("ps_partkey") == F.col("mc_partkey"))
              & (F.col("ps_supplycost") == F.col("min_cost")))
        .select("s_acctbal", "s_name", "n_name", "p_partkey",
                F.col("ps_supplycost").alias("supplycost"))
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q_tpch_q11",
    """
    SELECT l_partkey AS part_key,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                 AS DOUBLE), 6) AS part_value
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_1'
    GROUP BY l_partkey
    HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           > (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                     AS DOUBLE) * 0.001
              FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation   ON s_nationkey = n_nationkey
              WHERE n_name = 'NATION_1')
    """,
    doc="TPC-H Q11 (important stock identification), adapted: no "
        "partsupp, so a part's held value for one nation's suppliers "
        "is the exact decimal sum of that nation's line revenue per "
        "part, and the scalar-subquery threshold is 0.1% of the same "
        "filtered total. The grand total re-aggregates the same "
        "per-part sums the output uses, so at runtime AQE stage reuse "
        "dedupes the shared shuffle and the FINAL plan reads lineitem "
        "exactly once (CI asserts this on the executed plan); the "
        "1-row total then broadcasts into the HAVING filter. The "
        "threshold compare is double > double*0.001 — "
        "IEEE-identical across engines because the decimal sums "
        "beneath are exact.",
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_1").select("n_nationkey")
    per_part = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", dec("l_extendedprice").alias("val"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum("val").alias("val_sum"))
    )
    total = per_part.agg(
        F.sum("val_sum").cast("double").alias("_tot"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("val_sum").cast("double") > F.col("_tot") * 0.001)
        .select(F.col("l_partkey").alias("part_key"),
                as_double6(F.col("val_sum")).alias("part_value"))
    )


@register(
    "q_tpch_q16",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 (parts/supplier relationship), adapted: the "
        "part-supplier relation comes from observed lineitem pairs "
        "(no partsupp), and the excluded-supplier set is the low-"
        "balance tier (no s_comment complaints column). Shape intact: "
        "NOT IN anti-membership + triple-attribute grouping + "
        "COUNT(DISTINCT supplier). Spark states NOT IN as LEFT ANTI "
        "against the broadcast exclusion sliver (s_suppkey is "
        "non-null, so NOT IN and ANTI agree); part is broadcast with "
        "its three predicates pushed to the scan; the only wide "
        "exchange is the distinct-expand on (brand, type, size, "
        "suppkey), which is the standard two-phase COUNT DISTINCT.",
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13") & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    excluded = table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 1000).select("s_suppkey")
    return (
        table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
        .join(F.broadcast(excluded),
              F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@register(
    "q_tpch_q20",
    """
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN
              (SELECT p_partkey FROM part WHERE p_name LIKE 'large%')
          AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 40)
    """,
    doc="TPC-H Q20 (potential part promotion), adapted: availability "
        "is observed shipped volume (no partsupp.ps_availqty), so a "
        "supplier qualifies when it moved more than 40 units of any "
        "name-matched part inside the year window. The nested-IN "
        "chain is stated as the join cascade Catalyst would unnest it "
        "to: name-filtered part sliver broadcast-SEMI-prunes the "
        "date-pruned lineitem scan, the (supplier, part) decimal "
        "volume agg applies the HAVING, and the surviving supplier "
        "keys SEMI-filter the nation-filtered supplier dim. Quantity "
        "sums go through DECIMAL(18,2) so the >40 threshold compare "
        "is exact on both engines. At 100 TB only the (suppkey, "
        "partkey) agg shuffles, and only for the date+part-pruned "
        "sliver.",
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    part_ids = table(spark, sf_dir, "part").filter(
        F.col("p_name").like("large%")).select("p_partkey")
    qualified = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate")
             >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate")
               < F.lit("1996-01-01 00:00:00").cast("timestamp")))
        .join(F.broadcast(part_ids),
              F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(dec("l_quantity")).alias("qty"))
        .filter(F.col("qty") > 40)
        .select("l_suppkey")
    )
    nat = table(spark, sf_dir, "nation").select("n_nationkey",
                                                 "n_regionkey")
    reg = table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA").select("r_regionkey")
    return (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(qualified, F.col("s_suppkey") == F.col("l_suppkey"),
              "left_semi")
        .select("s_name", "s_acctbal")
    )


@register(
    "q_tpch_q21",
    """
    WITH pairs AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    ), late AS (
      SELECT DISTINCT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM late l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND EXISTS (SELECT 1 FROM pairs l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
    doc="TPC-H Q21 (suppliers who kept orders waiting), adapted: "
        "lateness is shipping >60 days after the order date (no "
        "commit/receipt dates). The correlated EXISTS / NOT-EXISTS "
        "pair decorrelates to order-level counts — 'another supplier "
        "exists on the order' is a SEMI join against orders with ≥2 "
        "distinct suppliers, and 'no OTHER supplier was late' is a "
        "SEMI join against orders with exactly one late supplier "
        "(l1 itself is late, so sole-blame ⇔ late-count = 1). Both "
        "order profiles are KB-per-group aggregates over the distinct "
        "(order, supplier) pairs; supplier and nation broadcast; "
        "ORDER BY numwait DESC, s_name is total (names unique), so "
        "LIMIT 10 is deterministic.",
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate")
                > F.expr("o_orderdate + INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey").distinct()
    )
    multi_sup = (
        pairs.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_sup"))
        .filter(F.col("n_sup") >= 2).select("l_orderkey")
    )
    solo_late = (
        late.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_late"))
        .filter(F.col("n_late") == 1).select("l_orderkey")
    )
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name",
                                                  "s_nationkey")
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    reg = table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA").select("r_regionkey")
    return (
        late
        .join(multi_sup, "l_orderkey", "left_semi")
        .join(solo_late, "l_orderkey", "left_semi")
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )
