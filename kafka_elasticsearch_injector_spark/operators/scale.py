"""Scale techniques as first-class operators: skew-salted joins and
aggregations, and bucketed (co-located, shuffle-free) fact-fact joins.

None of this exists in the reference — its only parallelism is a worker
pool over one Kafka consumer (src/kafka/consumer.go:83-85) and its only
"join" surface is none at all. These are the techniques a 100 TB Spark
deployment reaches for when the defaults stop being enough:

- First line of defense is AQE (`spark.sql.adaptive.enabled` +
  `skewJoin.enabled`, on in session.py): it splits oversized shuffle
  partitions at runtime with zero user code. Use THESE operators when
  AQE can't see the skew: a skewed exact-distinct aggregation (one
  reducer owns the hot key), a stream-static join (no AQE in
  micro-batches), or a hot key so large even a split partition spills.
- Bucketing removes the shuffle entirely rather than balancing it:
  both fact tables pre-hashed into the same bucket layout on the join
  key at WRITE time, so every later join/aggregation on that key is
  map-side. One shuffle paid once, amortized over every downstream
  query — the right trade for an orderkey-grained star schema.
"""

from __future__ import annotations

import weakref

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# fill_cluster memo: DataFrame objects already probed (or produced by a
# probe). A WeakSet so the memo never extends object lifetimes and never
# mutates caller-owned objects.
_FILL_CLUSTER_SEEN: "weakref.WeakSet[DataFrame]" = weakref.WeakSet()

# Subset of _FILL_CLUSTER_SEEN: outputs that sit DIRECTLY on the
# explicit repartition fill_cluster inserted (as opposed to inputs the
# probe left untouched). Queried via fill_cluster_rebalanced() by
# callers that must know whether a further exchange guard is needed —
# previously inferred at the call site from object identity
# (`filled is df`), which mis-fires when a prior fill_cluster OUTPUT is
# routed back in and returns via the memo (ADVICE r15).
_FILL_CLUSTER_REBALANCED: "weakref.WeakSet[DataFrame]" = weakref.WeakSet()


def fill_cluster(df: DataFrame) -> DataFrame:
    """Rebalance a narrow scan across the cluster before a compute-heavy
    kernel (n-gram shingling, minhash, vector math).

    Parquet parallelism comes from file byte-range splits; a corpus
    packed into few files/row groups yields fewer scan partitions than
    cores, so a CPU-bound kernel downstream runs on a sliver of the
    cluster while the rest idles. When — and only when — the input has
    fewer partitions than `defaultParallelism`, shuffle it out. The
    guard makes this free at scale: a 100 TB table scans as tens of
    thousands of splits, the condition is false, and no exchange is
    added. When the condition IS true, the data at that point is by
    definition small (few splits), so the round-robin shuffle costs
    less than the idle cores it reclaims.

    The partition probe (`df.rdd.getNumPartitions()`) converts the plan
    driver-side — no Spark job, no data read — but it DOES force full
    physical planning of the pre-AQE plan, and when that plan already
    contains an exchange it reports the static shuffle-partition count,
    not parquet scan splits. Two consequences, both handled here:

    - Nested operators (ivf_topk → label_centroids, curation stages)
      route the same DataFrame through fill_cluster repeatedly; the
      probe's planning cost would be paid each time. The returned
      DataFrame OBJECT is therefore MARKED, and a marked input is
      returned untouched. The memo is per Python object, not per
      lineage: any intervening transformation (.select, .filter)
      returns a fresh unmarked object and the next call re-probes —
      acceptable, because the probe is driver-side planning only, but
      operators that nest should pass the SAME object through when
      they want the memo to hit.
    - The probe reflects the pre-AQE plan: downstream of an exchange
      the decision is "is the static shuffle width ≥ cores", which is
      the right question for the CPU-kernel placement this guards, but
      callers should know AQE may still coalesce those partitions at
      runtime.
    """
    if df in _FILL_CLUSTER_SEEN:
        return df
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        out = df.repartition(target)
        _FILL_CLUSTER_REBALANCED.add(out)
    else:
        out = df
    _FILL_CLUSTER_SEEN.add(out)
    return out


def fill_cluster_rebalanced(df: DataFrame) -> bool:
    """True iff `df` is a fill_cluster output sitting directly on the
    explicit (AQE-coalescing-exempt) repartition fill_cluster inserted.
    False for outputs the probe left untouched — whose own partitioning
    may descend from an AQE-coalescible upstream exchange — and for
    anything fill_cluster never returned. Callers use this (not object
    identity against their input) to decide whether a downstream
    exchange guard is still required."""
    return df in _FILL_CLUSTER_REBALANCED


def no_pushdown(col: Column) -> Column:
    """Pin a computed column's evaluation ABOVE the operator that
    produces it by adding a nondeterministic zero
    (monotonically_increasing_id() * 0 — value unchanged, type
    preserved).

    Why: Catalyst splits conjunctive filters and pushes each
    deterministic conjunct as deep as it can — including below a
    fill_cluster rebalance and into the parquet scan's DataFilters.
    For a CHEAP prunable predicate that is exactly right; for an
    expensive derived signal (an interpreted-HOF quality score) it
    re-serializes the work onto the narrow pre-rebalance scan, undoing
    the rebalance. A predicate referencing a nondeterministic input
    cannot be pushed through the projection that computes it, so the
    filter evaluates post-exchange, in parallel. At scale (rebalance
    is a no-op, no exchange) filter placement is intra-stage and this
    wrapper costs one fused add-zero.
    """
    return col + F.monotonically_increasing_id() * F.lit(0)


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join where `big.key` is skewed and `small` is too large to
    broadcast: salt the big side (deterministic pmod of the row hash),
    replicate the small side n_salts ways, join on (key, salt). The hot
    key's rows now land on n_salts reducers instead of one.

    Cost model: small side is shuffled n_salts× — pick n_salts ≈ the
    skew factor of the hottest key, not "as big as possible". Result
    column set matches a plain `big.join(small, key, how)`.

    Only join types where the SMALL side never emits unmatched rows are
    valid: inner/left/semi/anti. A right or full join would emit each
    unmatched small row once per salt replica.
    """
    if how not in ("inner", "left", "left_outer", "leftouter",
                   "left_semi", "leftsemi", "semi",
                   "left_anti", "leftanti", "anti"):
        raise ValueError(
            f"salted_join cannot express {how!r}: the replicated small "
            "side would emit unmatched rows once per salt")
    salt = F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return b.join(s, [key, "_salt"], how).drop("_salt")


def salted_distinct_count(df: DataFrame, group_col: str, distinct_col: str,
                          n_salts: int = 16,
                          out_col: str = "n_distinct") -> DataFrame:
    """Exact distinct count per group when one group dominates.

    A plain countDistinct expands to a two-phase plan keyed by
    (group, value) then (group) — the final phase still funnels every
    distinct value of the hot group through one reducer. Salting the
    first phase by a hash of the VALUE splits that funnel: phase 1
    dedups (group, salt, value), phase 2 counts per (group, salt),
    phase 3 sums the per-salt counts. Exact, because a given value
    always hashes to the same salt — no double counting across salts.
    """
    salt = F.pmod(F.hash(F.col(distinct_col)), F.lit(n_salts))
    return (
        df.select(F.col(group_col), F.col(distinct_col).alias("_v"),
                  salt.alias("_salt"))
        .distinct()
        .groupBy(group_col, "_salt").agg(F.count("_v").alias("_c"))
        .groupBy(group_col).agg(F.sum("_c").cast("bigint").alias(out_col))
    )


def write_bucketed(df: DataFrame, table_name: str, path: str,
                   bucket_cols: list[str], n_buckets: int = 32,
                   sort_cols: list[str] | None = None) -> None:
    """Persist `df` hash-bucketed on `bucket_cols` (external parquet
    table at `path`). Two tables bucketed with the SAME columns and
    bucket count join/aggregate on those columns with NO exchange —
    the bucketing metadata proves co-location to the planner.

    sort_cols additionally orders within buckets (sort-merge join
    without the sort). The bucket count is a write-time commitment:
    pick it for the TARGET scale (total size / ~128 MB), not the
    current one.
    """
    w = df.write.mode("overwrite").format("parquet").option("path", path) \
        .bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata comes from the
    catalog — reading the parquet path directly would lose it)."""
    return spark.table(table_name)
