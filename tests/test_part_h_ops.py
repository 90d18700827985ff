"""Part H operator units: document-frequency spectrum, vocabulary
overlap matrix, n-gram novelty, value-grid median, prefix-dup
families, shard token skew, duplicate provenance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.usefixtures("spark")


def test_doc_freq_spectrum_known_values(spark):
    from kafka_elasticsearch_injector_spark.operators.curation import (
        doc_freq_spectrum,
    )

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a c"), (3, "a a")],   # dfs: a=3, b=1, c=1
        "doc_id long, text string")
    got = {r.doc_freq: (r.n_tokens, r.token_share)
           for r in doc_freq_spectrum(docs).collect()}
    assert got == {1: (2, 2 / 3), 3: (1, 1 / 3)}


def test_vocab_overlap_matrix_known_values(spark):
    """s1={a,b}, s2={b,c,d}, s3={x}: only (s1,s2) overlaps —
    jac = 1/(2+3-1); zero-overlap pairs are omitted."""
    from kafka_elasticsearch_injector_spark.operators.curation import (
        vocab_overlap_matrix,
    )

    docs = spark.createDataFrame(
        [(1, "a b", "s1"), (2, "b c d", "s2"), (3, "x", "s3"),
         (4, "b a", "s1")],                     # dup tokens dedupe
        "doc_id long, text string, source string")
    rows = vocab_overlap_matrix(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.src_a, r.src_b, r.n_shared) == ("s1", "s2", 1)
    assert r.jaccard == 1 / 4


def test_ngram_novelty_known_values(spark):
    """2 tranches of 2 docs: tranche 1 grams {a b, b c} (all new);
    tranche 2 grams {b c, c d} — only `c d` is new → novelty 0.5."""
    from kafka_elasticsearch_injector_spark.operators.curation import (
        ngram_novelty,
    )

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b"), (3, "b c d"), (4, "c d")],
        "doc_id long, text string")
    got = {r.bucket: (r.n_present, r.n_new, r.novelty)
           for r in ngram_novelty(docs, buckets=2).collect()}
    assert got == {1: (2, 2, 1.0), 2: (2, 1, 0.5)}


def test_group_median_grid_lower_median(spark):
    """Odd group → the middle value; even group → the LOWER median
    ((n+1) DIV 2), interpolation-free; duplicate values counted via
    the grid."""
    from kafka_elasticsearch_injector_spark.operators.curation import (
        group_median_grid,
    )

    rows = [("s1", v) for v in (1, 3, 5)] \
        + [("s2", v) for v in (2, 4)] \
        + [("s3", v) for v in (7, 7, 9, 11)]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    got = {r.source: (r.n_docs, r.median)
           for r in group_median_grid(df).collect()}
    assert got == {"s1": (3, 3), "s2": (2, 2), "s3": (4, 7)}


def test_prefix_dup_clusters_families(spark):
    """Docs 1 and 2 share their first 8 tokens (differ after);
    doc 3 differs within the prefix — exactly one family of 2."""
    from kafka_elasticsearch_injector_spark.operators.curation import (
        prefix_dup_clusters,
    )

    pre = "t1 t2 t3 t4 t5 t6 t7 t8"
    docs = spark.createDataFrame(
        [(1, pre + " tail one"), (2, pre + " other ending"),
         (3, "u1 t2 t3 t4 t5 t6 t7 t8 tail one")],
        "doc_id long, text string")
    rows = prefix_dup_clusters(docs, n_prefix=8).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_docs, r.min_doc_id) == (2, 1)
    assert r.total_chars == len(pre + " tail one") \
        + len(pre + " other ending")


def test_shard_token_skew_known_values(spark):
    """shards (id %% 2): shard0 = ids 0,2 → 3+1=4 tokens; shard1 =
    ids 1,3 → 1+1=2 tokens → skew = 4·2/6."""
    from kafka_elasticsearch_injector_spark.operators.curation import (
        shard_token_skew,
    )

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "d"), (2, "e"), (3, "f")],
        "doc_id long, text string")
    r = shard_token_skew(docs, n_shards=2).collect()[0]
    assert (r.n_shards_used, r.min_tokens, r.max_tokens,
            r.total_tokens) == (2, 2, 4, 6)
    assert r.skew == 8 / 6

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert shard_token_skew(empty).count() == 0


def test_dup_provenance_rollup(spark):
    """Cluster 1 spans s1+s2 (cross), cluster 5 stays within s3;
    singleton 4 is excluded → 2 dup clusters, 1 cross, share 0.5."""
    from kafka_elasticsearch_injector_spark.operators.dedup import (
        dup_provenance,
    )

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)],
        "doc_id long, cluster_id long")
    docs = spark.createDataFrame(
        [(1, "s1"), (2, "s1"), (3, "s2"), (4, "s9"), (5, "s3"),
         (6, "s3")],
        "doc_id long, source string")
    r = dup_provenance(clusters, docs).collect()[0]
    assert (r.n_dup_clusters, r.n_cross_source) == (2, 1)
    assert r.cross_share == 0.5

    # all-singleton input → zero rows (matches the oracle's HAVING)
    singles = spark.createDataFrame([(1, 1), (2, 2)],
                                    "doc_id long, cluster_id long")
    assert dup_provenance(singles, docs).count() == 0


def test_ngram_novelty_no_global_id_window(spark, sf_dir):
    """q_ngram_novelty rides ntile_by_id — same gate as
    q_vocab_growth: no ntile, no window ordering raw ids without the
    coarse-group partition key."""
    import re

    from kafka_elasticsearch_injector_spark.plans import queries

    df = queries()["q_ngram_novelty"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ntile" not in plan, plan
    for spec in re.findall(r"windowspecdefinition\(([^)]*)", plan):
        if "_id#" in spec:
            assert spec.lstrip().startswith("_c#"), spec
    # single-pass gate: the gram explode must be derived ONCE — the
    # two-branch present/first formulation re-scans text per consumer
    # (4 corpus scans); the collect_set shape has exactly one. The
    # AQE toString appends an "== Initial Plan ==" duplicate — gate
    # the executed (final) section only.
    final = plan.split("== Initial Plan ==")[0]
    text_scans = [m for m in re.findall(r"FileScan parquet \[([^\]]*)\]",
                                        final) if "text" in m]
    assert len(text_scans) == 1, text_scans


# ----------------------------------------------- Part H plan gates


def _final_plan(df):
    df.collect()
    return (df._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0])


def test_vocab_overlap_broadcasts_and_reuses(spark, sf_dir):
    """The claim in the registered doc: per-source sizes BROADCAST
    onto the pair rows (no sort-merge anywhere), and the deduped
    (source, token) exchange is REUSED across the self-join sides —
    the corpus relation is derived once."""
    from kafka_elasticsearch_injector_spark.plans import queries

    plan = _final_plan(queries()["q_vocab_overlap_matrix"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "SortMergeJoin" not in plan, plan
    assert "ReusedExchange" in plan, plan


def test_prefix_dup_shuffles_digest_only(spark, sf_dir):
    """The claim: only the 32-hex digest (plus the partial-agg lanes)
    shuffles — the text column must not appear in any exchange's
    input projection (it dies in the map stage)."""
    import re

    from kafka_elasticsearch_injector_spark.plans import queries

    plan = _final_plan(queries()["q_prefix_dup_clusters"](spark, sf_dir))
    ex = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert len(ex) == 1 and "prefix_hash" in ex[0], ex
    # the partial aggregate feeding the exchange outputs only the
    # digest + aggregation lanes — never the raw text column (text is
    # consumed in the map stage below it)
    feed = plan.split("Exchange hashpartitioning", 1)[1]
    out = (feed.split("HashAggregate", 2)[1]
           .split("output=[", 1)[1].split("]", 1)[0])
    assert "text#" not in out and "prefix_hash" in out, out


def test_shard_token_skew_single_scan_partial_agg(spark, sf_dir):
    """The claim: one partial-aggregated rollup — a single scan, a
    single hash exchange (per-shard rows), no joins."""
    from kafka_elasticsearch_injector_spark.plans import queries

    plan = _final_plan(queries()["q_shard_token_skew"](spark, sf_dir))
    assert plan.count("FileScan parquet") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan
