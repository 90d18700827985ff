"""Inverted-index (posting-list) pair discovery for set similarity.

The complement of operators/blocked.py's dense tile kernels, covering
the OTHER corpus regime (the trade both docstrings describe):

- **tile kernel** (blocked.py): per-task cost is insensitive to gram
  frequency SKEW but scales with tile-local vocabulary SIZE — right
  when the vocabulary is small/shared (this repo's synthetic corpus).
- **posting join** (this module): cost is Σ_g df(g)² join rows —
  degenerate when every gram is common, but the standard shape for
  REAL text, where vocabularies are huge and flat and each doc touches
  a few hundred grams. With a stop-gram df-ceiling the quadratic head
  of the df distribution is cut entirely.

Spark-first shape: explode to a (gram, doc) posting table, self
equi-join on the gram (never a cartesian), count shared grams per pair
with a map-side-combinable aggregation, then one join back to the
per-doc set sizes for the exact ratio. Text never shuffles — postings
carry (gram, id), the pair aggregation carries (id, id, count).

At 100 TB: bucket the posting table by gram so the self-join is
co-located; the df-ceiling bounds any single gram's join fan-out to
ceiling², so AQE skew handling is a belt, not the plan.

Exactness contract: with ``df_ceiling=None`` results are EXACT —
bit-identical jaccard/containment to the tile kernels (same
integer-count IEEE division, ROUNDING.md). With a ceiling, grams whose
document frequency exceeds it are dropped from CANDIDATE DISCOVERY
only; surviving pairs are re-verified on their full gram sets, so
emitted values are still exact — but a pair sharing ONLY ultra-common
grams is never discovered (the standard stop-gram recall trade; pick
the ceiling so threshold · |smallest interesting set| sub-ceiling
grams remain).

One contract difference from the tile kernels: an inverted index can
only discover pairs sharing ≥1 gram, so at ``threshold=0.0`` the
zero-intersection pairs the dense kernels would emit (ratio 0.0) never
appear here. Any positive threshold gives strict parity.

Measured on THIS repo's synthetic corpus (sf0.1 documents, 2-gram
jaccard ≥0.08, local[32]) — the regime where the docstrings predict
the posting join loses: tile kernel 7.5 s, posting exact 37.5 s,
posting+ceiling 47 s (the ceiling pays full-array re-verification
while the df head here is too shallow to cut candidates). The numbers
flip on real text, where per-tile vocabularies blow the dense matrices
past memory and Σ df(g)² stays near-linear: pick by corpus, as
blocked.py says.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import jaccard

# ceiling on the estimated dense-matrix footprint of one tile before
# the auto-chooser routes to the posting join instead (both tile sides
# counted; float32 cells)
TILE_BUDGET_BYTES = 256 << 20


def _rows_per_tile(df: DataFrame, n: int) -> int:
    """The row count of one ACTUAL tile side for this corpus —
    choose_blocks' floor of ≥4 blocks means small corpora tile into
    pieces well under TARGET_TILE_ROWS, and sizing the estimate to
    TARGET would overstate the dense footprint ~4× there."""
    from .blocked import choose_blocks

    blocks = choose_blocks(
        n, df.sparkSession.sparkContext.defaultParallelism)
    return max(1, -(-n // blocks))


def estimate_tile_vocab(df: DataFrame, id_col: str, set_col: str,
                        size_hint: int | None = None) -> tuple[int, int]:
    """Estimate (rows_per_tile, tile-local distinct-element count) the
    dense kernels would see: hash-sample one tile's worth of rows
    (deterministic pmod(xxhash64) — no RNG state, re-runs agree) and
    count the sample's distinct elements. A tile is rows_per_tile
    random rows, so a same-sized random sample measures exactly the
    quantity that sizes the kernel's dense matrices. One narrow scan +
    approx-distinct; pass `size_hint` (parquet footer / catalog stats)
    to avoid a plan-time count at scale."""
    n = size_hint if size_hint is not None else df.count()
    tile_rows = _rows_per_tile(df, n)
    mod = max(1, n // tile_rows)
    probe = df.filter(F.pmod(F.xxhash64(F.col(id_col)), mod) == 0)
    row = (probe.select(F.explode(set_col).alias("_g"))
           .agg(F.approx_count_distinct("_g").alias("v"))
           .first())
    return tile_rows, int(row["v"] or 0)


def _pair_path_stats(df: DataFrame, id_col: str, set_col: str,
                     size_hint: int | None,
                     tile_budget_bytes: int) -> tuple[str, int]:
    """(path, measured_row_count) — the row count is surfaced so the
    auto router can reuse it as the tile branch's size_hint instead of
    paying a second full-scan count at plan time."""
    n = size_hint if size_hint is not None else df.count()
    tile_rows, v_tile = estimate_tile_vocab(df, id_col, set_col, n)
    dense_bytes = 2 * tile_rows * max(v_tile, 1) * 4
    return ("tile" if dense_bytes <= tile_budget_bytes else "posting"), n


def choose_pair_path(df: DataFrame, id_col: str = "doc_id",
                     set_col: str = "g",
                     size_hint: int | None = None,
                     tile_budget_bytes: int = TILE_BUDGET_BYTES) -> str:
    """'tile' or 'posting' — operationalizes the regime trade the
    module docstring describes. Tile footprint ≈ 2 sides ×
    rows_per_tile × tile-local vocabulary × 4 bytes; small shared
    vocabularies fit (→ dense kernel, skew-immune), large flat ones
    route to the inverted index.

    Since r12 the tile kernels carry a sparse regime
    (blocked.SPARSE_TILE_VOCAB), so exceeding this budget no longer
    means the tile path would OOM — it switches encodings and stays
    memory-bounded (and on mid-size mixed-vocabulary corpora it
    measured ~2× faster than the ceilinged posting join at 10×,
    SCALE_REHEARSAL). The budget still routes large-flat to posting
    because the decisive cost at corpus scale is SHUFFLE, not tile
    memory: the tile topology replicates every row to B block-pairs
    (B grows with N), i.e. ~N²/TARGET_TILE_ROWS shuffled rows, while
    the posting join ships each posting once. Callers who know their
    corpus is verify-scale (post-LSH) can pass path='tile' to take the
    faster kernel above the budget."""
    return _pair_path_stats(
        df, id_col, set_col, size_hint, tile_budget_bytes)[0]


def jaccard_pairs_auto(
    df: DataFrame,
    id_col: str = "doc_id",
    set_col: str = "g",
    threshold: float = 0.08,
    size_hint: int | None = None,
    df_ceiling: int | None = None,
    path: str | None = None,
    postings_hint: int | None = None,
) -> DataFrame:
    """Exact jaccard pairs via whichever discovery path fits the
    corpus (choose_pair_path); both paths share the output contract —
    (doc_a bigint, doc_b bigint, jac double) for integral ids — so
    callers never see which ran. `df_ceiling` and `postings_hint`
    apply only when the posting path is chosen: the hint (total
    element count across `set_col`, e.g. docs × mean set size from
    catalog stats) sizes the dropped-gram broadcast decision off its
    actual n_postings/ceiling bound instead of the fallback heuristic
    — at 1e9-posting scale, pass it whenever a ceiling is in play.

    Non-integral id columns (string doc ids) route to the posting path
    unconditionally: the tile kernels require integral ids
    (blocked.replicate_block_pairs rejects anything else at plan
    time), and there the ids keep their own type in the output. An
    EXPLICIT path='tile' with string ids still raises — hash the ids
    first, per the blocked-module guidance.

    EAGER PLANNING COST: unlike every other operator in this package,
    the default (``path=None``) runs up to two small Spark jobs AT
    PLAN-CONSTRUCTION time — a count plus a sampled
    approx-distinct over `df` (estimate_tile_vocab) — to measure the
    corpus regime before a path can be chosen. Callers composing lazy
    plans who must not trigger jobs before action (or who already know
    their corpus) should pass ``path='tile'`` or ``path='posting'``
    explicitly, which skips the regime estimation entirely. Note
    ``path='posting'`` is then fully lazy, but ``path='tile'`` still
    needs a row count to size its tiles (blocked.choose_blocks) and
    will run a plan-time ``df.count()`` unless ``size_hint`` is also
    given — pass both for a job-free tile plan."""
    from .blocked import _INTEGRAL_TYPES

    integral_id = dict(df.dtypes).get(id_col) in _INTEGRAL_TYPES
    if path is None:
        if not integral_id:
            path = "posting"  # tile kernels need integral ids
        else:
            path, measured_n = _pair_path_stats(
                df, id_col, set_col, size_hint, TILE_BUDGET_BYTES)
            if size_hint is None:
                size_hint = measured_n  # no second plan-time count
    elif path not in ("tile", "posting"):
        raise ValueError(f"path must be 'tile', 'posting' or None, "
                         f"got {path!r}")
    if path == "tile":
        from .blocked import jaccard_pairs_blocked

        return jaccard_pairs_blocked(
            df, id_col=id_col, set_col=set_col, threshold=threshold,
            size_hint=size_hint)
    out = jaccard_pairs_posting(
        df, id_col=id_col, set_col=set_col, threshold=threshold,
        df_ceiling=df_ceiling, postings_hint=postings_hint)
    if integral_id:
        # schema contract alignment with the tile branch, which emits
        # bigint ids from its Arrow kernel regardless of input width
        out = out.withColumn("doc_a", F.col("doc_a").cast("bigint")) \
                 .withColumn("doc_b", F.col("doc_b").cast("bigint"))
    return out


def posting_jaccard_ratio(shared: Column, sza: Column,
                          szb: Column) -> Column:
    """The exact-mode jaccard emission: ONE double division of exact
    integer counts, |A∩B| / (|A|+|B|-|A∩B|) — the integer-count-ratio
    shape ROUNDING.md's decision rule certifies
    (tests/test_bitwise_parity.py certifies THIS function directly on
    adversarial counts, not via the tile-equivalence property)."""
    return shared.cast("double") / (sza + szb - shared)


def posting_containment_ratio(shared: Column, sza: Column) -> Column:
    """The exact-mode containment emission |A∩B| / |A| — same
    integer-count-ratio certification as posting_jaccard_ratio."""
    return shared.cast("double") / sza


# Force-broadcast the dropped-gram anti-join side only while its
# estimated cardinality stays under this many grams. Sized in HASH-
# RELATION bytes, not raw string bytes: a broadcast side materializes
# UnsafeRows + relation overhead (~150 B per short-string entry) on
# the driver and every executor, so 500k entries ≈ 75 MB — inside a
# modest driver, and still 7× above AQE's 10 MB auto-broadcast
# threshold, so the forced hint only covers the window where plan-time
# stats mislead AQE. Above the cap the hint comes off and AQE decides
# from the measured size.
DROPPED_GRAMS_BROADCAST_CAP = 500_000


def _postings(df: DataFrame, id_col: str, set_col: str,
              df_ceiling: int | None,
              postings_hint: int | None = None) -> DataFrame:
    if df_ceiling is not None and df_ceiling < 1:
        # 0 would silently drop EVERY gram (filter _df > 0) and return
        # an empty pair set; negative is nonsense. Fail at plan time —
        # and before the hint division below can hit a zero divisor.
        raise ValueError(f"df_ceiling must be >= 1, got {df_ceiling}")
    if postings_hint is not None and postings_hint < 1:
        # A zero/negative hint (a catalog-stats lookup that defaulted
        # to 0 instead of None) would estimate 0 dropped grams and
        # FORCE the broadcast — the exact driver OOM the cap prevents.
        raise ValueError(
            f"postings_hint must be >= 1 (pass None when the posting "
            f"count is unknown), got {postings_hint}")
    posts = df.select(F.col(id_col).alias("_id"),
                      F.explode(set_col).alias("_g"))
    if df_ceiling is not None:
        # Broadcast the DROPPED grams, not the survivors: at real-text
        # scale the surviving vocabulary is ~the whole vocabulary
        # (only the head is cut) — far past broadcast size — while the
        # over-ceiling head is by construction tiny (≤ corpus_size /
        # ceiling distinct grams). The frequency agg is map-side
        # combinable; the anti-join stays hash-only, no sort.
        drop = (posts.groupBy("_g")
                .agg(F.count(F.lit(1)).alias("_df"))
                .filter(F.col("_df") > df_ceiling)
                .select("_g"))
        # The ≤ n_postings/ceiling bound only keeps the dropped set
        # broadcast-sized for reasonable ceilings; a tiny ceiling (say
        # 10 on 1e9 postings) permits 1e8 dropped grams, and forcing
        # that through the driver is an OOM. With `postings_hint`
        # (total |set_col| elements, e.g. from catalog stats) the
        # decision sizes off that actual bound; without it, fall back
        # to the ceiling constant — a heuristic, not a bound, so it
        # stays conservative (≥ 64) and AQE owns the rest.
        if postings_hint is not None:
            force = postings_hint // df_ceiling <= DROPPED_GRAMS_BROADCAST_CAP
        else:
            force = df_ceiling >= 64
        anti = F.broadcast(drop) if force else drop
        posts = posts.join(anti, "_g", "left_anti")
    return posts


def _candidate_counts(posts: DataFrame) -> DataFrame:
    """(doc_a < doc_b, shared) — shared = number of co-occurring grams
    that survived the ceiling. One shuffle on the gram, one partial-agg
    shuffle on the pair."""
    a = posts.select(F.col("_id").alias("doc_a"), "_g")
    b = posts.select(F.col("_id").alias("doc_b"), "_g")
    return (
        a.join(b, "_g")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("_shared"))
    )


def jaccard_pairs_posting(
    df: DataFrame,
    id_col: str = "doc_id",
    set_col: str = "g",
    threshold: float = 0.08,
    df_ceiling: int | None = None,
    postings_hint: int | None = None,
) -> DataFrame:
    """Exact set-Jaccard pairs (doc_a < doc_b, jac ≥ threshold) via the
    inverted index. `set_col` must hold distinct-element arrays.

    Same output contract as blocked.jaccard_pairs_blocked (unrounded
    exact-integer-ratio `jac`); choose by corpus regime (module
    docstring). With `df_ceiling`, candidate discovery ignores grams
    above the ceiling but the emitted jaccard is computed on the FULL
    sets of each surviving pair. `postings_hint` (total element count
    across `set_col`, e.g. from catalog stats) sizes the dropped-gram
    broadcast decision off its actual n_postings/ceiling bound.
    """
    sizes = df.select(F.col(id_col), F.size(set_col).alias("_sz"),
                      F.col(set_col).alias("_set"))
    cand = _candidate_counts(
        _postings(df, id_col, set_col, df_ceiling, postings_hint))
    sa = sizes.select(F.col(id_col).alias("doc_a"),
                      F.col("_sz").alias("_sza"), F.col("_set").alias("_seta"))
    sb = sizes.select(F.col(id_col).alias("doc_b"),
                      F.col("_sz").alias("_szb"), F.col("_set").alias("_setb"))
    joined = cand.join(sa, "doc_a").join(sb, "doc_b")
    if df_ceiling is None:
        # _shared IS the exact intersection — no re-verify needed.
        jac: Column = posting_jaccard_ratio(
            F.col("_shared"), F.col("_sza"), F.col("_szb"))
    else:
        jac = jaccard(F.col("_seta"), F.col("_setb"))
    return (joined.select("doc_a", "doc_b", jac.alias("jac"))
            .filter(F.col("jac") >= threshold))


def containment_pairs_posting(
    df: DataFrame,
    id_col: str = "doc_id",
    set_col: str = "g",
    threshold: float = 0.3,
    df_ceiling: int | None = None,
    postings_hint: int | None = None,
) -> DataFrame:
    """Exact set-containment |A∩B| / |A| for every ORDERED pair
    (doc_a ≠ doc_b, containment ≥ threshold) via the inverted index —
    the posting-join counterpart of blocked.containment_pairs_blocked,
    same output contract (unrounded exact ratio, both directions
    emitted). Empty sets emit nothing (containment undefined).
    `postings_hint` as in jaccard_pairs_posting."""
    sizes = df.select(F.col(id_col), F.size(set_col).alias("_sz"),
                      F.col(set_col).alias("_set"))
    cand = _candidate_counts(
        _postings(df, id_col, set_col, df_ceiling, postings_hint))
    # Each unordered candidate expands to both directions before the
    # size join, so one aggregation serves both A-in-B and B-in-A.
    both = cand.unionByName(
        cand.select(F.col("doc_b").alias("doc_a"),
                    F.col("doc_a").alias("doc_b"), "_shared"))
    sa = sizes.select(F.col(id_col).alias("doc_a"),
                      F.col("_sz").alias("_sza"), F.col("_set").alias("_seta"))
    sb = sizes.select(F.col(id_col).alias("doc_b"),
                      F.col("_set").alias("_setb"))
    joined = both.join(sa, "doc_a").join(sb, "doc_b") \
        .filter(F.col("_sza") > 0)
    if df_ceiling is None:
        cont: Column = posting_containment_ratio(
            F.col("_shared"), F.col("_sza"))
    else:
        inter = F.size(F.array_intersect(F.col("_seta"), F.col("_setb")))
        cont = inter.cast("double") / F.col("_sza")
    return (joined.select("doc_a", "doc_b", cont.alias("containment"))
            .filter(F.col("containment") >= threshold))
