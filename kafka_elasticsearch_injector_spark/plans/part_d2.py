"""Part D2 — the remaining TPC-H shapes expressible on the generated
schema (Q7 two-nation volume, Q8 market share, Q9 profit analog, Q13
order-count distribution, Q15 top supplier, Q17 small-quantity revenue,
Q22 inactive-customer balances), plus the duplicated-span census from
the substring-dedup literature.

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
           ROUND(CAST(SUM(CASE WHEN nation = 'NATION_2' THEN volume
                               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
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
        .agg(F.round(
            F.sum(nat2_vol).cast("double") / F.sum("volume").cast("double"),
            6).alias("mkt_share"))
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
        .select("doc_id", F.md5("span").alias("gram_md5"))
    )
    return (
        grams.groupBy("gram_md5")
        .agg(F.count(F.lit(1)).alias("n_occ"),
             F.count_distinct(F.col("doc_id")).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )
