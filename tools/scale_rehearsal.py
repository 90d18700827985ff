#!/usr/bin/env python
"""Scale rehearsal: measure how the most expensive bench queries scale
from sf0.1 to ~sf0.3 and ~sf1, and compare each query's measured
scaling exponent against its documented contract (round-11 verdict
item: "a table showing each heavy query scales at/below its documented
contract").

Corpus construction (factor f, from /root/testdata/sf0.1):

- every fact table is replicated f times with per-copy KEY REMAPPING
  (new_key = key + copy * 1e9) so each copy is a self-contained shard
  with the original's join fan-outs and distributions; nation/region
  stay fixed (TPC-H dims);
- documents.text goes through a per-copy Caesar rotation of letters
  (F.translate — JVM-side, length-preserving, so n_chars/length-band
  structure is exact) which makes copy vocabularies DISJOINT: near-dup
  structure is preserved within a copy and absent across copies, so
  pair outputs scale by design like the within-shard structure (×f),
  not by degenerate cross-copy duplication (×f²);
- embeddings get a per-copy cyclic DIMENSION rotation (norms exact,
  per-dim distribution preserved, cross-copy cosine ≈ noise) — same
  rationale;
- all three measured points (f=1, 3, 10) are written by THE SAME
  generator with the same partitioning rule, so file layout and
  decode regimes are construction-consistent (the pristine sf0.1
  single-file tables would otherwise scan serially and the ≤64-token
  vocabulary would take the bitmask fast path only at f=1, skewing
  exponents).

Measured exponent = log(t_f10 / t_f3) / log(10/3) — computed between
the two GENERATED points, never from the f=1 point: the synthetic
corpus's ≤64-token per-copy vocabulary takes the bitmask fast path in
minhash_lsh_pairs only while the merged vocabulary stays under the
probe limit, so f=1 and f≥3 run different (both correct) decode
regimes and an f1-based exponent would conflate the regime change
with scaling. f=1 times are reported as context. A query whose f=3
time predicts an f=10 run beyond the (generous) budget even at the
worst observed exponent is skipped and reported on the f1→f3 basis
with that caveat.

Output: SCALE_REHEARSAL.json at the repo root (the BASELINE.md table
is derived from it). Scaled corpora land under /tmp (ephemeral —
rerun this script to regenerate).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scale")
STRIDE = 1_000_000_000
F10_BUDGET_S = 400.0  # skip f=10 when t_f3 predicts a blowout
PREDICT_EXP = 2.3     # worst plausible exponent for the f=10 budget check

#: The 20 most expensive bench queries (BENCH_DETAIL.json, r10) with
#: their documented scaling contracts: max tolerated exponent and the
#: contract's source. 2.0 = by-design quadratic at verify scale (the
#: docstring's 100 TB shape runs it post-blocking / within clusters);
#: 1.5 = banded/blocked candidate discovery (linear in candidates with
#: bucket-size slack); 1.15 = scan-shaped (linear, slack for shuffle
#: fan-in growth).
CONTRACTS: dict[str, tuple[float, str]] = {
    "q_dedup_simhash_pairs": (2.0, "output-bound at the 16-bit oracle "
                              "width (random-collision floor); the 64-bit "
                              "production width is the linear path"),
    "q_containment_pairs": (2.0, "blocked tile kernel, by-design O(N²/B²) "
                            "per task; contract: runs post-LSH at 100 TB"),
    "q_fuzzy_levenshtein": (2.0, "(lang, length-band) blocked DP — "
                            "quadratic within blocks by design"),
    "q_minhash_calibration": (1.5, "banded candidates + signature joins"),
    "q_semdedup_prune": (2.0, "SemDeDup Σ|cluster|² with fixed k"),
    "q_candidate_jac_histogram": (1.5, "banded candidates + histogram agg"),
    "q_curation_pipeline": (1.15, "scan-shaped curation chain"),
    "q_dedup_recall": (2.0, "the exact-truth side IS the blocked tile "
                       "kernel (quadratic verify baseline by its own "
                       "declaration); the LSH side is linear"),
    "q_dedup_minhash": (1.5, "banded equi-join candidates"),
    "q_lsh_band_tuning": (1.5, "banded candidates across band grids"),
    "q_dedup_recall_sampled": (2.0, "hash-sampled truth, same blocked "
                               "exact side until the sample filter "
                               "applies at pair formation"),
    "q_ann_recall": (2.0, "brute-force exact side is N_q×N when the "
                     "query sample scales with the corpus"),
    "q_dsir_weights": (1.15, "hashed features + broadcast profiles"),
    "q_ngram_novelty": (1.15, "gram explode + first-seen agg"),
    "q_percentile": (1.15, "partial-aggregable sketch"),
    "q_ann_ivf": (1.5, "k-means build linear; probe reads pruned cells"),
    "q_crosslingual_dups": (1.5, "blocked cross-lang candidates"),
    "q_dedup_ngram": (2.0, "its own docstring: 'quadratic verify "
                      "baseline; at scale runs only after LSH blocking'"),
    "q_decontaminate": (1.15, "broadcast-probe against eval grams"),
    "q_dedup_embcos": (2.0, "blocked cosine tile kernel, post-LSH at scale"),
    # r12: the router's OTHER branch, measured on this corpus (whose
    # per-copy Caesar vocabularies make it exactly the large-flat-vocab
    # regime the posting join is for). Cost model Σ_g df(g)² under the
    # stop-gram ceiling: disjoint shard vocabularies keep per-gram df
    # constant while gram count grows ∝ N → linear, slack to 1.5 for
    # the candidate-join shuffle fan-in.
    "q_posting_branch": (1.5, "posting join Σ df(g)² with stop-gram "
                         "df-ceiling; disjoint-shard vocab → df constant, "
                         "gram count ∝ N"),
}


def _posting_branch(spark, sf_dir: str):
    """jaccard_pairs_auto forced onto its posting branch (the tile
    branch is what the named bench queries measure) — same gram prep
    as q_containment_pairs, production stop-gram ceiling."""
    from pyspark.sql import functions as F

    from kafka_elasticsearch_injector_spark.io import table
    from kafka_elasticsearch_injector_spark.operators.dedup import (
        tokens, word_ngrams,
    )
    from kafka_elasticsearch_injector_spark.operators.posting import (
        jaccard_pairs_auto,
    )

    docs = table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        F.array_distinct(word_ngrams(tokens("text"), 2)).alias("g"))
    return jaccard_pairs_auto(grams, threshold=0.08, path="posting",
                              df_ceiling=256)


#: Measurables that are not declared bench queries (they measure an
#: internal branch the named queries don't reach on this corpus).
EXTRA_QUERIES = {"q_posting_branch": _posting_branch}


def _rot(k: int) -> tuple[str, str]:
    a = "abcdefghijklmnopqrstuvwxyz"
    return a, a[k % 26:] + a[:k % 26]


def build_scaled(spark, src: str, dst: str, factor: int) -> None:
    """Write the f-times-scaled corpus under `dst` (idempotent: skips
    when the marker file says this factor is already built)."""
    from pyspark.sql import functions as F

    from kafka_elasticsearch_injector_spark.io import TABLES, table

    marker = os.path.join(dst, "_SCALE_OK")
    if os.path.exists(marker):
        return
    os.makedirs(dst, exist_ok=True)
    for name in TABLES:
        base = table(spark, src, name)
        if name in ("region", "nation"):
            out = base
        else:
            copies = []
            for k in range(factor):
                c = base
                for col, dt in c.dtypes:
                    if col.endswith(("key", "_id")) and dt == "bigint":
                        c = c.withColumn(col, F.col(col) + F.lit(k * STRIDE))
                if name == "documents" and k:
                    src_a, dst_a = _rot(k)
                    c = c.withColumn(
                        "text", F.translate("text", src_a, dst_a))
                if name == "embeddings" and k:
                    d = 64  # testdata embedding dim
                    rot = k % d or 1
                    c = c.withColumn(
                        "embedding",
                        F.concat(F.slice("embedding", rot + 1, d - rot),
                                 F.slice("embedding", 1, rot)))
                copies.append(c)
            out = copies[0]
            for c in copies[1:]:
                out = out.unionByName(c)
        rows = out.count()
        n_files = max(4, rows // 250_000)
        (out.repartition(n_files)
            .write.mode("overwrite")
            .parquet(os.path.join(dst, f"{name}.parquet")))
    open(marker, "w").write(str(factor))


def measure(spark, sf_dir: str, names: list[str],
            runs: int = 2) -> dict[str, float]:
    """Warm (plan compile) + min of `runs` timed executions per query.
    runs=1 for the long f=10 points: the ~1 s compile noise is
    negligible against 30-300 s runs and a second execution would
    double the rehearsal's wall-clock for nothing."""
    from kafka_elasticsearch_injector_spark import plans

    inventory = {**plans.queries(), **EXTRA_QUERIES}
    out: dict[str, float] = {}
    for n in names:
        df = inventory[n](spark, sf_dir)
        if runs > 1:
            df.write.format("noop").mode("overwrite").save()  # plan compile
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        out[n] = round(min(ts), 3)
        print(f"  {n}: {out[n]:.3f}s", file=sys.stderr)
    return out


def main() -> None:
    import argparse

    from kafka_elasticsearch_injector_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--only", default=None,
        help="comma-separated query names: measure only these and MERGE "
             "their rows into the existing SCALE_REHEARSAL.json (other "
             "rows kept) instead of rewriting the whole file")
    args = ap.parse_args()

    spark = get_spark("scale-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    names = list(CONTRACTS)
    if args.only:
        only = [n.strip() for n in args.only.split(",") if n.strip()]
        unknown = [n for n in only if n not in CONTRACTS]
        if unknown:
            raise SystemExit(f"no contract declared for: {unknown}")
        names = only

    dirs = {}
    for f in (1, 3, 10):
        d = os.path.join(WORK, f"f{f}")
        print(f"building f={f} corpus at {d} ...", file=sys.stderr)
        build_scaled(spark, SRC, d, f)
        dirs[f] = d

    t = {}
    for f in (1, 3):
        print(f"measuring at f={f} ...", file=sys.stderr)
        t[f] = measure(spark, dirs[f], names)

    results = []
    for n in names:
        cap, why = CONTRACTS[n]
        t1, t3 = t[1][n], t[3][n]
        # skip f=10 only when even the worst observed exponent predicts
        # a blowout past the (generous) budget
        predicted = t3 * (10 / 3) ** PREDICT_EXP
        t10 = None
        if predicted <= F10_BUDGET_S:
            print(f"measuring {n} at f=10 ...", file=sys.stderr)
            t10 = measure(spark, dirs[10], [n], runs=1)[n]
        if t10 is not None:
            exponent = math.log(t10 / t3) / math.log(10 / 3)
            basis = "f3→f10"
        else:
            exponent = math.log(t3 / t1) / math.log(3)
            basis = ("f1→f3 (f10 over budget; regime caveat: f1 runs "
                     "the small-vocab bitmask path)")
        results.append({
            "query": n, "t_f1": t1, "t_f3": t3, "t_f10": t10,
            "exponent": round(exponent, 2), "basis": basis,
            "contract_exponent": cap, "contract": why,
            "within_contract": exponent <= cap + 0.25,
        })
        print(f"{n}: exp={exponent:.2f} (cap {cap}) "
              f"{'OK' if exponent <= cap + 0.25 else 'OVER'}",
              file=sys.stderr)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "SCALE_REHEARSAL.json")
    if args.only and os.path.exists(path):
        with open(path) as fp:
            out = json.load(fp)
        merged = {r["query"]: r for r in out.get("results", [])}
        for r in results:
            merged[r["query"]] = r
        ordered = [merged.pop(q) for q in list(CONTRACTS) if q in merged]
        out["results"] = ordered + list(merged.values())  # keep unknowns
    else:
        out = {
            "source_sf": SRC,
            "construction": "see tools/scale_rehearsal.py",
            "results": results,
        }
    with open(path, "w") as fp:
        json.dump(out, fp, indent=1)
    print(json.dumps({"over_contract": [r["query"] for r in results
                                        if not r["within_contract"]]}))


if __name__ == "__main__":
    main()
