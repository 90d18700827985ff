"""Physical-plan assertions: the scale properties every query relies on
must actually appear in the optimized plan — filters reaching the
parquet scan, column pruning, dimension-table broadcasts, whole-stage
codegen — so a regression that silently de-optimizes a plan (e.g. a UDF
blocking pushdown, a lost broadcast hint) fails CI, not a 100 TB run.
"""

from __future__ import annotations

import os
import re

import pytest

from kafka_elasticsearch_injector_spark import plans


_EXPLAIN_CACHE: dict[tuple[str, str], str] = {}


def _explain(spark, sf_dir, name: str) -> str:
    # Memoized per (sf_dir, query): several gates inspect the same
    # query's plan, and the formatted explain pays full physical
    # planning each call — the cache cuts the module's wall-clock
    # without weakening any assertion (plans are deterministic for a
    # fixed session config; tests that mutate session conf must bypass
    # this by building the DataFrame directly).
    key = (sf_dir, name)
    if key not in _EXPLAIN_CACHE:
        df = plans.queries()[name](spark, sf_dir)
        _EXPLAIN_CACHE[key] = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
    return _EXPLAIN_CACHE[key]


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _explain(spark, sf_dir, "q_filter_pred")
    pushed = re.search(r"PushedFilters: \[(.*?)\]", plan)
    assert pushed, plan
    assert "l_quantity" in pushed.group(1)      # < 24 pushed to parquet
    assert "l_discount" in pushed.group(1)      # BETWEEN pushed


def test_column_pruning_on_projection(spark, sf_dir):
    plan = _explain(spark, sf_dir, "q_filter_pred")
    read_schema = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert read_schema, plan
    cols = {c.split(":")[0] for c in read_schema.group(1).split(",") if c}
    # 4 projected + 3 filter columns; NOT the full 11-column lineitem
    assert "l_comment" not in cols and "l_partkey" not in cols
    assert len(cols) <= 7, cols


def test_dimension_joins_broadcast(spark, sf_dir):
    for q in ("q_join_inner", "q_tpch_q3", "q_tpch_q5"):
        plan = _explain(spark, sf_dir, q)
        assert "BroadcastHashJoin" in plan, f"{q} lost its broadcast:\n{plan}"


@pytest.fixture(scope="module")
def all_executed_plans(spark, sf_dir):
    # One physical-planning pass over the whole declared inventory,
    # shared by every whole-inventory gate below — each executedPlan()
    # costs full analysis+optimization, so planning 168 queries once
    # instead of once per gate cuts ~half a minute off the module.
    return {name: fn(spark, sf_dir)._jdf.queryExecution()
            .executedPlan().toString()
            for name, fn in plans.queries().items()}


def test_no_cartesian_products_anywhere(all_executed_plans):
    # A CartesianProduct in any declared plan means an equi-key was lost
    # (broadcast nested loop is fine for tiny probe/marker tables).
    for name, plan in all_executed_plans.items():
        assert "CartesianProduct" not in plan, name


def test_no_collapsed_transform_under_slice_anywhere(all_executed_plans):
    """Inventory-wide gate for the round-7 O(n_grams²) class:
    CollapseProject inlining a transform(...) producer UNDER a
    slice(...) consumer re-evaluates the whole array per element of
    the outer lambda. `slice(transform(` in any executed plan is that
    collapse in the flesh (the winnowing-specific gate in
    test_part_e_ops pins the fixed shape; this sweeps every declared
    query so the class can't ship again under a new name)."""
    for name, plan in all_executed_plans.items():
        assert "slice(transform(" not in plan, name


def test_no_single_partition_exchange_over_row_data(all_executed_plans):
    """Inventory-wide gate for the r8 q_vocab_growth class: an
    Exchange SinglePartition whose subtree reaches a scan with no
    intervening Aggregate funnels per-ROW data through ONE task — the
    global-sort/window shape that dies at 10^9 rows. Single-partition
    exchanges are legal only above aggregates (KB-sized rollups).
    Textual walk: from each SinglePartition line, the first
    Aggregate-or-Scan encountered below must be an Aggregate."""
    for name, plan in all_executed_plans.items():
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if "Exchange SinglePartition" not in ln:
                continue
            for j in range(i + 1, len(lines)):
                nxt = lines[j]
                if "Aggregate" in nxt or "AQEShuffleRead" in nxt:
                    break
                if "FileScan" in nxt or "LocalTableScan" in nxt:
                    raise AssertionError(
                        f"{name}: {ln.strip()[:70]} feeds "
                        f"{nxt.strip()[:70]}")


def test_whole_stage_codegen_on_hot_path(spark, sf_dir):
    # The injector projection chain (decode/enrich/route) must fuse into
    # whole-stage codegen — zero Python, zero interpreted expressions.
    for q in ("q_index_day", "q_doc_id", "q_timestamp_millis", "q_agg_hash"):
        df = plans.queries()[q](spark, sf_dir)
        df.collect()  # finalize AQE so codegen annotations materialize
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        # formatted mode marks codegen'd operators with '* ' / codegen id
        assert "codegen id" in plan or "* Project" in plan, (q, plan)


def test_minhash_join_has_no_pair_shuffle(spark, sf_dir):
    # The LSH candidate join must broadcast the exploded band side: the
    # N-pair join OUTPUT must never hit an exchange. Shuffles upstream of
    # the join inputs (tiny) are fine; an Exchange ABOVE the join is not.
    plan = _explain(spark, sf_dir, "q_dedup_minhash")
    tree = plan.split("\n\n", 1)[0]  # the operator tree section
    assert "BroadcastHashJoin" in tree, tree
    above_join = tree.split("BroadcastHashJoin", 1)[0]
    assert "Exchange" not in above_join, tree


def test_exists_rewrites_to_semi_join(spark, sf_dir):
    # Correlated EXISTS must become a semi join carrying the non-key
    # conjunct as the join condition — not a per-row subquery.
    plan = _explain(spark, sf_dir, "q_exists_subquery")
    assert "LeftSemi" in plan, plan
    assert "o_totalprice" in plan.split("LeftSemi", 1)[0].rsplit("\n", 1)[-1] \
        or "o_totalprice" in plan  # conjunct survives into the join


def test_not_in_degenerates_to_plain_anti(spark, sf_dir):
    # Non-nullable subquery column: NOT IN must take the cheap anti-join
    # path; IN stays a semi join. Both sides broadcast at this dim size.
    plan = _explain(spark, sf_dir, "q_in_subquery")
    assert "LeftAnti" in plan and "LeftSemi" in plan, plan


def test_unpivot_is_shuffle_free_expand(spark, sf_dir):
    # Wide→long must be a single Expand over one scan — no exchange.
    plan = _explain(spark, sf_dir, "q_unpivot")
    assert "Expand" in plan, plan
    assert "Exchange" not in plan, plan


def test_sliding_window_partially_aggregates(spark, sf_dir):
    # The 2× slide expansion must collapse map-side (partial_count before
    # the exchange) so the shuffle carries one row per (window, user).
    plan = _explain(spark, sf_dir, "q_window_slide")
    assert "Expand" in plan, plan
    assert "partial_count" in plan, plan


def test_minmax_by_partially_aggregates(spark, sf_dir):
    # max_by/min_by ship one candidate per group per partition, not rows.
    plan = _explain(spark, sf_dir, "q_minmax_by")
    assert "partial_max_by" in plan and "partial_min_by" in plan, plan


def test_relational_surface_stays_jvm_side(all_executed_plans):
    # No Python evaluation nodes anywhere in the declared relational
    # surface — the only sanctioned Python is the UDAF extension point
    # and the Part C Arrow kernels.
    allowed_python = {
        "q_udf_grouped_range", "q_dedup_ngram", "q_dedup_embcos",
        "q_dedup_cluster", "q_media_meta", "q_containment_pairs",
        "q_udtf_expand",
    }
    for name, plan in all_executed_plans.items():
        if name in allowed_python:
            continue
        assert "EvalPython" not in plan, name


@pytest.fixture(scope="module")
def sf_dir():
    import os

    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_token_freq_partial_topk(spark, sf_dir):
    # Global top-20 must be a map-side partial count + TakeOrdered, never
    # a full sort of the aggregated vocabulary.
    plan = _explain(spark, sf_dir, "q_token_freq")
    assert "partial_count" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_tfidf_windowed_topk_prunes_map_side(spark, sf_dir):
    # WindowGroupLimit (Partial before the exchange) caps each map task's
    # output at k rows per doc; the df join must broadcast; both aggs
    # must be partial-aggregable.
    plan = _explain(spark, sf_dir, "q_tfidf_topterms")
    assert "WindowGroupLimit" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "partial_count" in plan, plan


def test_pii_scrub_is_narrow_codegen(spark, sf_dir):
    # A redaction pass is a projection: no exchange anywhere, fused into
    # whole-stage codegen.
    plan = _explain(spark, sf_dir, "q_pii_scrub")
    tree = plan.split("\n\n", 1)[0]
    assert "Exchange" not in tree, tree
    assert "codegen id" in plan or "* Project" in plan, plan


def test_tpch_q1_scan_side_reduction(spark, sf_dir):
    # The pricing summary must reduce at the scan side: date filter
    # pushed into parquet, partial HashAggregate before any exchange.
    plan = _explain(spark, sf_dir, "q_tpch_q1")
    pushed = re.search(r"PushedFilters: \[(.*?)\]", plan)
    assert pushed and "l_shipdate" in pushed.group(1), plan
    assert plan.count("HashAggregate") >= 2, plan  # partial + final


def test_tpch_q10_broadcasts_nation(spark, sf_dir):
    plan = _explain(spark, sf_dir, "q_tpch_q10")
    assert "BroadcastHashJoin" in plan, plan
    pushed = re.findall(r"PushedFilters: \[(.*?)\]", plan)
    flat = " ".join(pushed)
    assert "o_orderdate" in flat and "l_returnflag" in flat, pushed


def test_pack_sequences_single_shard_shuffle(spark, sf_dir):
    # Packing's only wide op is the per-shard window partition; a second
    # hash exchange would mean the cumsum stopped reusing it.
    plan = _explain(spark, sf_dir, "q_pack_sequences")
    assert "Window" in plan, plan
    assert plan.count("Exchange") <= 2, plan  # shard hash (+ AQE wrapper)


def test_mixture_sample_is_narrow(spark, sf_dir):
    # A sampling filter that shuffles would be a scale bug.
    plan = _explain(spark, sf_dir, "q_mixture_sample")
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_decontaminate_broadcasts_eval_grams(spark, sf_dir):
    # The eval n-gram set must broadcast — shuffling the corpus's
    # exploded n-grams is exactly what the operator exists to avoid.
    plan = _explain(spark, sf_dir, "q_decontaminate")
    assert "BroadcastHashJoin" in plan, plan


def test_tpch_q6_full_pushdown_single_row(spark, sf_dir):
    # Q6 is the canonical full-pushdown query: date window, discount
    # band, and quantity cap ALL reach the parquet scan, and the only
    # aggregation is partial -> final over one global group.
    plan = _explain(spark, sf_dir, "q_tpch_q6")
    pushed = re.search(r"PushedFilters: \[(.*?)\]", plan)
    assert pushed, plan
    flat = pushed.group(1)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in flat, (col, flat)
    assert plan.count("HashAggregate") >= 2, plan


def test_tpch_q14_broadcasts_part_dim(spark, sf_dir):
    plan = _explain(spark, sf_dir, "q_tpch_q14")
    assert "BroadcastHashJoin" in plan, plan
    pushed = " ".join(re.findall(r"PushedFilters: \[(.*?)\]", plan))
    assert "l_shipdate" in pushed, pushed


def test_tpch_q18_single_fact_scan(spark, sf_dir):
    # Single-scan formulation: the per-order HAVING aggregate IS the
    # output sum (o_orderkey is unique per order), so lineitem must be
    # scanned exactly once and there is no second aggregation after
    # the joins.
    plan = _explain(spark, sf_dir, "q_tpch_q18")
    assert plan.count("lineitem.parquet") == 1, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_curation_pipeline_signals_stay_post_exchange(spark, sf_dir):
    # The quality/repetition threshold filters must NOT be pushed into
    # the parquet scan (no_pushdown guard) — the interpreted signal
    # work belongs above the fill_cluster rebalance.
    plan = _explain(spark, sf_dir, "q_curation_pipeline")
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan):
        assert "least" not in m.group(1), m.group(1)


def test_curation_pipeline_dedup_is_hash_agg_without_text(spark, sf_dir):
    # Exact dedup inside the pipeline is a min_by HASH aggregate on the
    # md5 digest — a row_number sort-window (and the sort it forces)
    # must not reappear, and no exchange may repartition on document
    # text: the digest/token-count are projected in the signal pass so
    # only narrow rows shuffle.
    plan = _explain(spark, sf_dir, "q_curation_pipeline")
    assert "Window" not in plan, plan
    assert "min_by" in plan, plan
    for m in re.finditer(r"hashpartitioning\(([^)]*)\)", plan):
        assert not re.search(r"\btext#", m.group(1)), m.group(0)


@pytest.mark.parametrize("name", ["q_dedup_exact", "q_dedup_normalized"])
def test_standalone_dedup_is_hash_agg_without_text(spark, sf_dir, name):
    # Same contract as the curation pipeline's internal dedup: keep-min
    # representative is a min_by HASH aggregate on the binary digest —
    # no row_number sort-window (and the full per-partition sort it
    # forces), and no exchange repartitioning on document text (only
    # the 16/32-byte digest plus the narrow payload may shuffle).
    plan = _explain(spark, sf_dir, name)
    assert "Window" not in plan, plan
    assert "min_by" in plan, plan
    for m in re.finditer(r"hashpartitioning\(([^)]*)\)", plan):
        assert not re.search(r"\btext#", m.group(1)), m.group(0)


def test_embed_quantize_is_projection(spark, sf_dir):
    plan = _explain(spark, sf_dir, "q_embed_quantize")
    assert "Exchange" not in plan, plan


@pytest.mark.parametrize("name", [
    "q_unpivot", "q_interval_arith", "q_pii_scrub", "q_mixture_sample",
    "q_doc_chunks", "q_udtf_expand", "q_token_count", "q_lang_id",
    "q_embed_norm",
])
def test_projection_only_queries_have_no_exchange(spark, sf_dir, name):
    # Every query whose docstring promises a pure projection must stay
    # exchange-free — a regression (lost pushdown, an accidental
    # repartition, a HOF rewritten through an aggregate) fails here,
    # not in a 100 TB run.
    plan = _explain(spark, sf_dir, name)
    assert "Exchange" not in plan, plan


def test_profile_is_one_expand_aggregate(spark, sf_dir):
    plan = _explain(spark, sf_dir, "q_profile_columns")
    assert "Expand" in plan, plan   # multi-distinct in one pass
    # ONE scan feeding the multi-distinct aggregation tree, not a scan
    # per profiled column (formatted explain lists each node twice:
    # once in the tree, once in the details section).
    assert plan.count("Scan parquet") <= 2, plan

def test_offset_gaps_reuses_one_exchange(spark, sf_dir):
    # The lag window and the aggregation share the event_type key: the
    # plan must contain exactly ONE hashpartitioning exchange on it.
    plan = _explain(spark, sf_dir, "q_offset_gaps")
    n_exchanges = plan.count("hashpartitioning(")
    assert n_exchanges == 1, plan
    assert "partial_count" in plan or "partial_max" in plan, plan


def test_embed_outliers_broadcasts_centroids(spark, sf_dir):
    # nlist centroid rows join a corpus-sized table: the centroid side
    # must broadcast; losing it means shuffling the corpus by label.
    plan = _explain(spark, sf_dir, "q_embed_outliers")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_quality_buckets_single_shuffle_on_lang(spark, sf_dir):
    # NTILE partitions by lang and the tier profile groups by
    # (lang, bucket): the window exchange must be the only shuffle
    # below the final aggregate (partial agg rides the window's
    # partitioning only if keys align — here they don't fully, so we
    # assert the window shuffle exists and aggregation partials do).
    plan = _explain(spark, sf_dir, "q_quality_buckets")
    assert "ntile" in plan.lower(), plan
    assert "partial_count" in plan, plan


def test_dedup_source_stats_is_two_phase_distinct(spark, sf_dir):
    # COUNT(DISTINCT md5(text)) must expand to the standard partial
    # aggregation pair — the digest is the shuffle key, never raw text.
    plan = _explain(spark, sf_dir, "q_dedup_source_stats")
    assert "partial_count" in plan, plan
    assert re.search(r"hashpartitioning\((?!text)", plan), plan


def test_train_order_sorts_per_shard_not_globally(spark, sf_dir):
    # The position window partitions by shard: the plan must show a
    # PARTITIONED sort under the window, not a global (singleton) sort.
    plan = _explain(spark, sf_dir, "q_train_order")
    assert "Window" in plan, plan
    assert re.search(r"hashpartitioning\(shard", plan), plan
    assert "SinglePartition" not in plan, plan


# ------------------------------------------------- part D (round 3)


def test_q19_broadcasts_part_and_never_shuffles_lineitem(spark, sf_dir):
    # OR-of-ANDs join: part (KB) must build a broadcast; the lineitem
    # side must flow scan -> join -> partial agg with no Exchange below
    # the join (the pre-applied quantity hull keeps the probe narrow).
    plan = _explain(spark, sf_dir, "q_tpch_q19")
    tree = plan.split("\n\n", 1)[0]
    assert "BroadcastHashJoin" in tree, tree
    shuffles = re.findall(r"\bExchange \(", tree)
    assert len(shuffles) == 1, tree  # only the single-row final agg


def test_salted_join_takes_the_shuffle_path(spark, sf_dir):
    # The whole point of the salt demo is a shuffle join: a broadcast
    # would collapse the skew problem the salt solves. The hint must
    # survive optimization.
    plan = _explain(spark, sf_dir, "q_skew_salted_join")
    tree = plan.split("\n\n", 1)[0]
    assert "ShuffledHashJoin" in tree or "SortMergeJoin" in tree, tree
    assert "BroadcastHashJoin" not in tree, tree


def test_doc_chunks_is_shuffle_free_codegen(spark, sf_dir):
    # Chunking is a narrow per-row explode: any Exchange in this plan
    # means a regression added a repartition/agg that 100 TB cannot pay.
    plan = _explain(spark, sf_dir, "q_doc_chunks")
    tree = plan.split("\n\n", 1)[0]
    assert "Exchange" not in tree, tree
    assert "Generate" in tree, tree
    assert "codegen id" in plan or "* Generate" in plan, plan


def test_ngram_topk_partial_aggregates_before_shuffle(spark, sf_dir):
    # The gram census must combine map-side: the Exchange carries one
    # row per distinct gram per task, not one per occurrence; top-k is
    # TakeOrdered, never a global sort of the whole vocabulary.
    plan = _explain(spark, sf_dir, "q_ngram_topk")
    assert "partial_count" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert not re.search(r"\n\s*\+?- Sort ", plan), plan


def test_q4_exists_is_a_semi_join(spark, sf_dir):
    # EXISTS must compile to LeftSemi (ships keys, never payloads) with
    # the date window pushed to the orders scan.
    plan = _explain(spark, sf_dir, "q_tpch_q4")
    assert "LeftSemi" in plan, plan
    pushed = re.findall(r"PushedFilters: \[(.*?)\]", plan)
    assert any("o_orderdate" in p for p in pushed), plan


def test_q12_prunes_shipdate_at_scan(spark, sf_dir):
    # The year window is the 85% row-killer; it must reach the parquet
    # scan, and the CASE counts must partial-aggregate before the final
    # exchange.
    plan = _explain(spark, sf_dir, "q_tpch_q12")
    pushed = re.findall(r"PushedFilters: \[(.*?)\]", plan)
    assert any("l_shipdate" in p for p in pushed), plan
    assert "partial_sum" in plan, plan


def test_filter_funnel_is_single_scan(spark, sf_dir):
    # One pass over documents: exactly one parquet scan in the plan, all
    # stage counters as conditional partial sums.
    plan = _explain(spark, sf_dir, "q_filter_funnel")
    tree = plan.split("\n\n", 1)[0]
    assert tree.count("Scan parquet") == 1, tree
    assert "partial_sum" in plan, plan


# ------------------------------------------------- part D2 (round 3)


def test_q7_q8_q9_broadcast_all_dimensions(spark, sf_dir):
    # The multi-join TPC-H shapes must broadcast every dimension side;
    # the only shuffle joins allowed are fact-to-fact (orders⋈lineitem).
    for q, min_bcast in (("q_tpch_q7", 4), ("q_tpch_q8", 5),
                         ("q_tpch_q9", 3)):
        plan = _explain(spark, sf_dir, q)
        tree = plan.split("\n\n", 1)[0]
        n_bcast = tree.count("BroadcastHashJoin")
        assert n_bcast >= min_bcast, (q, tree)
        assert "CartesianProduct" not in tree, (q, tree)


def test_q13_left_join_preserves_every_customer(spark, sf_dir):
    # The left join must keep zero-order customers: the distribution's
    # total mass equals the customer count exactly (an inner join would
    # silently drop the c_count = 0 bucket).
    import pyspark.sql.functions as F
    from kafka_elasticsearch_injector_spark import plans
    from kafka_elasticsearch_injector_spark.io import table
    df = plans.queries()["q_tpch_q13"](spark, sf_dir)
    total = df.agg(F.sum("custdist").alias("t")).collect()[0].t
    assert total == table(spark, sf_dir, "customer").count()


def test_q22_not_exists_is_anti_join(spark, sf_dir):
    plan = _explain(spark, sf_dir, "q_tpch_q22")
    assert "LeftAnti" in plan, plan


def test_q17_decorrelated_avg_broadcasts_the_sliver(spark, sf_dir):
    # Both the per-part average and the final probe must be broadcast
    # joins — lineitem never shuffles in this plan.
    plan = _explain(spark, sf_dir, "q_tpch_q17")
    tree = plan.split("\n\n", 1)[0]
    assert tree.count("BroadcastHashJoin") >= 2, tree
    # Allowed exchanges: the per-part agg over the broadcast-pruned
    # sliver (keyed on l_partkey) and the final single-row agg — never
    # a full-lineitem repartition.
    import re as _re
    assert len(_re.findall(r"\bExchange \(", tree)) <= 2, tree
    assert _re.search(r"hashpartitioning\(l_partkey", plan), plan


def test_dup_spans_shuffles_digests_not_text(spark, sf_dir):
    # The census groups by the 16-byte BINARY md5 digest (`g`,
    # re-hexed only in the output projection): the exchange key is the
    # digest and the distinct-doc count expands BEFORE the shuffle
    # (partial). No exchange may carry span/text.
    plan = _explain(spark, sf_dir, "q_dup_spans")
    assert "partial_count" in plan, plan
    assert re.search(r"hashpartitioning\(g#", plan), plan
    for m in re.finditer(r"hashpartitioning\(([^)]*)\)", plan):
        assert not re.search(r"\b(span|text)#", m.group(1)), m.group(0)


# ------------------------------------------------- part D3 (round 3)


def test_gapfill_join_is_user_keyed(spark, sf_dir):
    # The calendar fill must join on (user_id, day) — a global calendar
    # cross join would explode at scale.
    plan = _explain(spark, sf_dir, "q_gapfill_daily")
    tree = plan.split("\n\n", 1)[0]
    assert "CartesianProduct" not in tree and "NestedLoop" not in tree, tree
    assert re.search(r"hashpartitioning\(user_id", plan), plan


def test_ohlc_partially_aggregates(spark, sf_dir):
    # One shuffle of one candle per (user, day) per task: partial
    # min_by/max_by must appear before the exchange.
    plan = _explain(spark, sf_dir, "q_resample_ohlc")
    assert "partial_min_by" in plan and "partial_max_by" in plan, plan


def test_knn_vote_sees_only_probe_label_pairs(spark, sf_dir):
    # The vote aggregates (probe, label) — its exchange must be keyed on
    # probe_id, never on vectors; probes broadcast into the scoring join.
    plan = _explain(spark, sf_dir, "q_knn_classify")
    tree = plan.split("\n\n", 1)[0]
    assert "BroadcastNestedLoopJoin" in tree or "BroadcastHashJoin" in tree, tree
    assert re.search(r"hashpartitioning\(probe_id", plan), plan


def test_fuzzy_levenshtein_blocks_before_verifying(spark, sf_dir):
    # The candidate join must be an equi-join on the blocking key —
    # all-pairs edit distance is the failure mode this op exists to
    # avoid.
    plan = _explain(spark, sf_dir, "q_fuzzy_levenshtein")
    tree = plan.split("\n\n", 1)[0]
    assert "CartesianProduct" not in tree, tree
    assert re.search(r"hashpartitioning\(lang|BroadcastHashJoin", tree), tree


def test_bm25_filters_terms_before_aggregating(spark, sf_dir):
    # r9 rewrite: per-term tf and dl are ROW-LOCAL array lanes — no
    # explode (no Generate), no per-(doc,term) shuffle, no dfreq/dl
    # equi-joins; the 1-row stats aggregate broadcasts; top-10 is
    # TakeOrdered. (The executed two-scan count is gated in
    # test_part_e_ops.test_bm25_two_scans_no_joins.)
    plan = _explain(spark, sf_dir, "q_bm25")
    tree = plan.split("\n\n", 1)[0]
    assert "TakeOrderedAndProject" in tree, tree
    assert "Generate" not in tree, tree
    assert "SortMergeJoin" not in tree and "BroadcastHashJoin" not in tree
    assert "BroadcastNestedLoopJoin" in tree, tree   # 1-row stats


def test_cumulative_users_windows_only_the_daily_series(spark, sf_dir):
    # The running sum must run AFTER the per-day collapse: the window's
    # input is one row per day (SinglePartition over a KB series is the
    # documented trade), never the raw event stream.
    plan = _explain(spark, sf_dir, "q_cumulative_users")
    assert "Window" in plan, plan
    # both aggregations appear below the window
    head = plan.split("Window", 1)[1]
    assert "HashAggregate" in head, plan


def test_anomaly_stats_join_after_same_key_aggs(spark, sf_dir):
    # daily and stats group on the same leading key: the per-user stats
    # join must not introduce a cartesian or nested-loop path.
    plan = _explain(spark, sf_dir, "q_anomaly_days")
    tree = plan.split("\n\n", 1)[0]
    assert "CartesianProduct" not in tree, tree
    assert "NestedLoop" not in tree, tree


def test_containment_uses_the_tile_kernel(spark, sf_dir):
    # Containment runs the blocked tile topology (one sgemm tile per
    # (_k1,_k2) group): the replicate join must broadcast the block-id
    # range (never a cartesian over data), and the kernel is the one
    # sanctioned Arrow group-map.
    plan = _explain(spark, sf_dir, "q_containment_pairs")
    tree = plan.split("\n\n", 1)[0]
    assert "CartesianProduct" not in tree, tree
    assert "FlatMapGroupsInPandas" in tree, tree
    assert re.search(r"hashpartitioning\(_k1", plan), plan


def test_multi_topic_union_collapses_to_one_scan(spark, sf_dir):
    # The per-topic filters union over the SAME source: Catalyst must
    # merge them into a single scan (an IN/OR filter), not scan the
    # table once per topic.
    plan = _explain(spark, sf_dir, "q_multi_topic_merge")
    tree = plan.split("\n\n", 1)[0]
    assert tree.count("Scan parquet") <= 2, tree  # union may keep 2 legs
    # the real gate: pushed filter on event_type on every leg
    pushed = re.findall(r"PushedFilters: \[(.*?)\]", plan)
    assert pushed and all("event_type" in p for p in pushed), plan


def test_approx_distinct_has_no_expand(spark, sf_dir):
    # The certification plan computes exact + HLL over pre-deduped
    # (group, key) pairs; mixing countDistinct with a non-distinct
    # aggregate instead forces an Expand that doubles every input row
    # (measured 4x at sf0.1). Lock the Expand out.
    plan = _explain(spark, sf_dir, "q_approx_distinct")
    assert "Expand" not in plan, plan
    assert "partial_count" in plan or "HashAggregate" in plan, plan


def test_approx_percentile_certifies_by_rank_counts(spark, sf_dir):
    # Rank-count certification must stay O(N)-parallel: the sketch
    # result broadcasts back over the fact scan, and no exact
    # percentile sort (per-group value buffer) appears anywhere.
    plan = _explain(spark, sf_dir, "q_approx_percentile")
    assert "BroadcastHashJoin" in plan, plan
    assert "percentile(" not in plan, plan          # only approx_percentile
    assert "Sort" not in plan.split("\n\n", 1)[0], plan


def test_q2_broadcasts_dims_and_shuffles_only_supply_aggs(spark, sf_dir):
    # Q2's correlated min is decorrelated to two part-keyed aggregates
    # of the derived supply table; supplier/nation/region/part all
    # broadcast, so those aggregates are the only exchanges.
    plan = _explain(spark, sf_dir, "q_tpch_q2")
    tree = plan.split("\n\n", 1)[0]
    assert tree.count("BroadcastHashJoin") >= 4, tree
    assert "CartesianProduct" not in tree, tree


def test_q16_not_in_is_anti_join_with_pruned_scan(spark, sf_dir):
    # NOT IN over the non-null supplier key must become LEFT ANTI, and
    # lineitem must be pruned to its two join columns at the scan.
    plan = _explain(spark, sf_dir, "q_tpch_q16")
    assert "LeftAnti" in plan, plan
    m = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    li_schemas = [s for s in m if "l_partkey" in s]
    assert li_schemas and all(len(s.split(",")) == 2 for s in li_schemas), m


def test_q20_nested_in_is_semi_join_cascade(spark, sf_dir):
    # Both IN subqueries must lower to SEMI joins (part sliver prunes
    # lineitem; qualified suppliers prune the supplier dim) with the
    # ship-window predicate pushed to the lineitem scan.
    plan = _explain(spark, sf_dir, "q_tpch_q20")
    tree = plan.split("\n\n", 1)[0]
    assert tree.count("LeftSemi") >= 2, tree
    assert re.search(r"PushedFilters: \[[^\]]*l_shipdate", plan), plan


def test_q21_exists_pair_is_semi_joins_over_pair_aggs(spark, sf_dir):
    # The EXISTS/NOT-EXISTS pair decorrelates to two order-profile
    # aggregates consumed through SEMI joins; supplier/nation/region
    # broadcast.
    plan = _explain(spark, sf_dir, "q_tpch_q21")
    tree = plan.split("\n\n", 1)[0]
    assert tree.count("LeftSemi") >= 2, tree
    assert tree.count("BroadcastHashJoin") >= 3, tree


def test_q11_grand_total_scans_lineitem_once(spark, sf_dir):
    # The grand-total branch re-aggregates the SAME per-part sums the
    # output uses; at runtime AQE stage reuse dedupes the shared
    # shuffle, so the FINAL executed plan reads lineitem exactly once
    # (the static plan prints both branches — only the executed plan
    # proves the reuse).
    # Pinned to sf0.01 (not the sf_dir fixture): at sf0.001 the HAVING
    # threshold leaves zero rows, AQE's empty-relation propagation
    # eliminates the scan entirely, and a scan-count bound passes
    # vacuously without proving the stage reuse this test documents.
    # Derived as the sf0.01 sibling of the configured testdata root so
    # SPARK_GRAFT_TEST_SF_DIR relocation keeps this gate running.
    # A missing sibling FAILS on the canonical /root/testdata layout —
    # there, silently skipping the one executed-plan reuse proof would
    # be worse than failing loudly — and SKIPS on a genuinely
    # relocated checkout (different testdata root), where an
    # sf0.001-only environment is a legitimate constraint, not a rot
    # signal. SPARK_GRAFT_STRICT_TESTDATA=1/0 overrides the layout
    # heuristic in either direction.
    root = os.path.dirname(sf_dir.rstrip("/"))
    strict_env = os.environ.get("SPARK_GRAFT_STRICT_TESTDATA")
    strict = (strict_env == "1" if strict_env in ("0", "1")
              else root == "/root/testdata")
    sf_dir = os.path.join(root, "sf0.01")
    if not os.path.isdir(sf_dir):  # pragma: no cover
        msg = (f"sf0.01 testdata not found at {sf_dir} — the q11 "
               "scan-reuse gate needs the sf0.01 sibling of "
               "SPARK_GRAFT_TEST_SF_DIR")
        if strict:
            pytest.fail(msg)
        pytest.skip(msg)
    df = plans.queries()["q_tpch_q11"](spark, sf_dir)
    rows = df.collect()
    assert rows, "q_tpch_q11 empty at sf0.01 — scan-count check is vacuous"
    final = (df._jdf.queryExecution().executedPlan().toString()
             .split("== Initial Plan ==")[0])
    assert final.count("lineitem.parquet") == 1, final


def test_minhash_calibration_carries_sigs_through_candidate_join(
        spark, sf_dir):
    """q_minhash_calibration's est_jac rides the candidate join
    (carry_sigs, r15) instead of two signature joins back onto the
    ~10M-pair stream: the executed plan must contain exactly ONE join
    family (the candidate equi-join) and no doc_a/doc_b sig join —
    and the carried-signature formulation must agree pairwise with an
    independently joined signature table."""
    import pyspark.sql.functions as F

    from kafka_elasticsearch_injector_spark.io import table as _table
    from kafka_elasticsearch_injector_spark.operators.dedup import (
        minhash_signature, tokens)

    q = plans.queries()["q_minhash_calibration"]
    df = q(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]  # AQE appends a copy
    # One candidate join; the two sig join-backs are gone.
    assert plan.count("BroadcastHashJoin") == 1, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan

    # Independent re-derivation: join per-doc signatures onto the pairs
    # and recompute est; must match row-for-row.
    docs = _table(spark, sf_dir, "documents")
    sigs = docs.select(
        "doc_id", *minhash_signature(
            F.array_distinct(tokens("text")), 8)).collect()
    by_id = {r["doc_id"]: [r[f"sig_{i}"] for i in range(8)] for r in sigs}
    got = df.collect()
    assert got
    for r in got:
        sa, sb = by_id[r["doc_a"]], by_id[r["doc_b"]]
        est = sum(1 for i in range(8) if sa[i] == sb[i]) / 8
        assert r["est_jac"] == est, (r, est)
