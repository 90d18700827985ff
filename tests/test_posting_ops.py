"""Inverted-index pair discovery (operators/posting.py): exact-mode
equivalence with the dense tile kernels — same pairs, bit-identical
ratios — plus the df-ceiling recall trade and the plan shape."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_elasticsearch_injector_spark.io import table
from kafka_elasticsearch_injector_spark.operators.blocked import (
    containment_pairs_blocked,
    jaccard_pairs_blocked,
)
from kafka_elasticsearch_injector_spark.operators.dedup import (
    tokens,
    word_ngrams,
)
from kafka_elasticsearch_injector_spark.operators.posting import (
    containment_pairs_posting,
    jaccard_pairs_posting,
)


@pytest.fixture(scope="module")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR",
                          "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def grams(spark, sf_dir):
    return (
        table(spark, sf_dir, "documents")
        .select("doc_id",
                F.array_distinct(word_ngrams(tokens("text"), 2)).alias("g"))
    )


def _pairs(df, val):
    return {(r.doc_a, r.doc_b): getattr(r, val) for r in df.collect()}


def test_jaccard_posting_equals_blocked_bitwise(spark, grams):
    post = _pairs(jaccard_pairs_posting(grams, threshold=0.08), "jac")
    tile = _pairs(jaccard_pairs_blocked(grams, threshold=0.08), "jac")
    # same pair set AND bit-identical unrounded ratios (both are one
    # IEEE division on exact integer counts — ROUNDING.md)
    assert post == tile
    assert post


def test_containment_posting_equals_blocked_bitwise(spark, grams):
    post = _pairs(containment_pairs_posting(grams, threshold=0.3),
                  "containment")
    tile = _pairs(containment_pairs_blocked(grams, threshold=0.3),
                  "containment")
    assert post == tile
    assert post


def test_df_ceiling_subset_with_exact_values(spark, grams):
    # A ceiling drops candidates discovered only via ultra-common
    # grams, but every SURVIVING pair's jaccard is still the exact
    # full-set value.
    exact = _pairs(jaccard_pairs_posting(grams, threshold=0.08), "jac")
    capped = _pairs(jaccard_pairs_posting(grams, threshold=0.08,
                                          df_ceiling=20), "jac")
    assert set(capped) <= set(exact)
    for pair, jac in capped.items():
        assert jac == exact[pair]


def test_df_ceiling_cuts_candidate_volume(spark, grams):
    # The quadratic head of the df distribution dominates candidate
    # generation; a ceiling must shrink the discovered-pair superset
    # on this deliberately-common-vocabulary corpus.
    exact_n = jaccard_pairs_posting(grams, threshold=0.0).count()
    capped_n = jaccard_pairs_posting(grams, threshold=0.0,
                                     df_ceiling=20).count()
    assert capped_n < exact_n


def test_postings_hint_sizes_broadcast_off_dropped_gram_bound(spark, grams):
    """The dropped-gram anti-join force-broadcasts only while the
    n_postings/ceiling bound stays driver-safe: a postings_hint that
    puts the estimate over DROPPED_GRAMS_BROADCAST_CAP takes the hint
    OFF even for a large ceiling (the r12 heuristic would have forced
    a driver OOM there), and results are hint-independent."""
    from kafka_elasticsearch_injector_spark.operators.posting import (
        DROPPED_GRAMS_BROADCAST_CAP,
        _postings,
    )

    def hinted(posts_hint):
        return (_postings(grams, "doc_id", "g", 128, posts_hint)
                ._jdf.queryExecution().optimizedPlan().toString())

    # tiny corpus estimate → forced broadcast survives optimization
    small = hinted(1000)
    assert "ResolvedHint" in small or "broadcast" in small.lower()
    # estimate over the cap → no forced-broadcast hint in the plan
    over = (DROPPED_GRAMS_BROADCAST_CAP + 1) * 128
    assert "broadcast" not in hinted(over).lower()
    # correctness is hint-independent: same surviving pairs and values
    base = _pairs(jaccard_pairs_posting(grams, threshold=0.08,
                                        df_ceiling=20), "jac")
    capped = _pairs(jaccard_pairs_posting(grams, threshold=0.08,
                                          df_ceiling=20,
                                          postings_hint=over), "jac")
    assert base == capped
    # the hint threads through the auto router's posting branch too —
    # the 1e9-posting caller reaches the guard without bypassing auto
    from kafka_elasticsearch_injector_spark.operators.posting import (
        jaccard_pairs_auto,
    )

    routed = _pairs(jaccard_pairs_auto(grams, threshold=0.08,
                                       path="posting", df_ceiling=20,
                                       postings_hint=over), "jac")
    assert routed == base
    # df_ceiling=0 would silently drop every gram (and zero-divide the
    # hint estimate): rejected at plan time
    with pytest.raises(ValueError, match="df_ceiling"):
        jaccard_pairs_posting(grams, df_ceiling=0, postings_hint=100)
    # a zero hint (stats lookup defaulted to 0 instead of None) would
    # estimate 0 dropped grams and force the broadcast — rejected too
    with pytest.raises(ValueError, match="postings_hint"):
        jaccard_pairs_posting(grams, df_ceiling=128, postings_hint=0)


def test_posting_plan_is_equi_join_with_partial_agg(spark, grams):
    plan = (jaccard_pairs_posting(grams, threshold=0.08)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    # pair counting must combine map-side before the pair shuffle
    assert "partial_count" in plan, plan


def test_auto_chooser_picks_by_vocabulary_regime(spark, grams, sf_dir):
    from kafka_elasticsearch_injector_spark.io import parquet_row_count
    from kafka_elasticsearch_injector_spark.operators.posting import (
        choose_pair_path,
        jaccard_pairs_auto,
    )

    hint = parquet_row_count(sf_dir, "documents")
    # small shared vocabulary (this corpus: <1k grams) → dense tile
    assert choose_pair_path(grams, size_hint=hint) == "tile"
    # wide flat vocabulary: each doc carries hundreds of unique grams
    # over a huge space → the dense tile (rows_per_tile × tile-local
    # vocab × 4 B × 2 sides) would not fit → posting
    wide = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(400)),
            lambda i: F.concat(F.md5(F.concat(F.col("id"), F.lit(":"), i)),
                               F.lit("-g"))).alias("g"))
    assert choose_pair_path(wide, size_hint=3000) == "posting"
    # the dispatcher's output contract matches the direct kernel
    auto = _pairs(jaccard_pairs_auto(grams, threshold=0.08,
                                     size_hint=hint), "jac")
    tile = _pairs(jaccard_pairs_blocked(grams, threshold=0.08), "jac")
    assert auto == tile


def test_containment_directed_both_ways(spark):
    # a ⊂ b: containment(a→b)=1.0, containment(b→a)=2/3 — both
    # directions from ONE candidate aggregation.
    df = spark.createDataFrame(
        [(1, ["x", "y"]), (2, ["x", "y", "z"])],
        "doc_id long, g array<string>")
    got = _pairs(containment_pairs_posting(df, threshold=0.0),
                 "containment")
    assert got == {(1, 2): 1.0, (2, 1): 2 / 3}


def test_auto_router_end_to_end_flat_regime_cross_path_parity(spark):
    """Round-6 follow-up: the router exercised END TO END on a
    flat-vocabulary corpus — the regime where it must pick postings —
    with the chosen path's output proven identical (pairs AND
    bit-exact ratios) to the dense tile kernel forced over the same
    corpus, and to the analytically known truth. Together with
    test_auto_chooser_picks_by_vocabulary_regime (small shared
    vocabulary → tile, output == tile kernel), this certifies the
    routing decision AND cross-path parity at both regimes on real
    tables, not just the synthetic property inputs."""
    from kafka_elasticsearch_injector_spark.operators.posting import (
        choose_pair_path,
        jaccard_pairs_auto,
    )

    # 1500 disjoint doc pairs; partners share 300 pair-salted grams,
    # each doc adds 100 doc-salted grams → every partner pair has
    # jac = 300/(400+400-300) = 0.6 exactly; all other pairs share
    # nothing. Vocabulary ~750k distinct grams over 3000 docs — far
    # past any tile's dense budget.
    docs = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.transform(
                F.sequence(F.lit(1), F.lit(100)),
                lambda i: F.concat(F.md5(F.concat(F.col("id"), F.lit("u"),
                                                  i)), F.lit("-u"))),
            F.transform(
                F.sequence(F.lit(1), F.lit(300)),
                lambda i: F.concat(
                    F.md5(F.concat((F.col("id") / 2).cast("long"),
                                   F.lit("p"), i)),
                    F.lit("-p")))).alias("g"))

    assert choose_pair_path(docs, size_hint=3000) == "posting"

    auto = _pairs(jaccard_pairs_auto(docs, threshold=0.5,
                                     size_hint=3000), "jac")
    expected = {(2 * k, 2 * k + 1): 0.6 for k in range(1500)}
    assert auto == expected
    # the OTHER path, forced over the same flat corpus (n_blocks=32
    # keeps each dense tile small enough to materialize in a test)
    tile = _pairs(jaccard_pairs_blocked(docs, threshold=0.5,
                                        n_blocks=32), "jac")
    assert auto == tile


def test_auto_path_override_skips_estimation_and_stays_lazy(spark,
                                                            monkeypatch):
    """`path=...` must bypass the eager regime estimation entirely
    (the documented lazy-composition escape hatch): with estimation
    sabotaged, explicit overrides still build plans; only the default
    routes through it. Per the docstring, path='posting' is fully
    lazy, while path='tile' needs size_hint too for a job-free plan —
    both are asserted by ALSO sabotaging DataFrame.count."""
    from pyspark.sql import DataFrame as SparkDataFrame

    from kafka_elasticsearch_injector_spark.operators import posting

    df = spark.createDataFrame([(1, ["a", "b"]), (2, ["b", "c"])],
                               "doc_id long, g array<string>")

    def boom(*a, **k):
        raise AssertionError("plan-time job ran")

    monkeypatch.setattr(posting, "estimate_tile_vocab", boom)
    monkeypatch.setattr(SparkDataFrame, "count", boom)
    for kwargs in ({"path": "posting"},
                   {"path": "tile", "size_hint": 2}):
        out = posting.jaccard_pairs_auto(df, threshold=0.0, **kwargs)
        assert set(out.columns) >= {"doc_a", "doc_b", "jac"}
    with pytest.raises(AssertionError, match="plan-time job ran"):
        posting.jaccard_pairs_auto(df, threshold=0.0)
    with pytest.raises(ValueError, match="path must be"):
        posting.jaccard_pairs_auto(df, threshold=0.0, path="dense")
