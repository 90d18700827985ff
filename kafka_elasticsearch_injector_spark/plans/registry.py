"""Declared query inventory: the t2 contract.

Every operator claimed in SURVEY.md §2 is declared here as a `QueryDef`:
a PySpark plan builder plus (when SQL-expressible) the equivalent DuckDB
oracle SQL. The driver runs both sides at sf0.01 and hash-compares.

Determinism discipline (BASELINE.md):
- float outputs rounded to 6 decimals on BOTH sides;
- money sums routed through DECIMAL(18,2) so the aggregate is exact and
  the final double cast is bit-identical across engines;
- every sort/top-k carries a unique tie-break key;
- column names alias-matched between Spark and oracle.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    """One declared query: Spark plan + DuckDB oracle (None → rows-only check)."""

    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


QUERIES: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a (spark_fn, oracle_sql) pair to the inventory."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QueryDef(spark=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def _load_all() -> None:
    # Import for side effects: each module registers its queries.
    from . import part_a, part_b, part_b_ext, part_b_ext2, part_c  # noqa: F401


# Consumers (correctness drivers, demo runs) may verify a PREFIX of the
# inventory; order it so a truncated pass still covers every operator
# family — all reference-semantics queries (Part A), the whole
# LLM-pipeline layer (Part C), then a representative relational spread
# (joins, aggs, windows, OLAP, ETL, variant), then the remaining
# relational surface. Pure presentation order: names and definitions
# are unchanged.
_PRIORITY = [
    # Part A — reference semantics (events table)
    "q_scan_events", "q_null_filter", "q_json_decode", "q_corrupt_drop",
    "q_timestamp_millis", "q_key_embed", "q_blacklist_project",
    "q_field_cast", "q_doc_id", "q_doc_id_column", "q_index_day",
    "q_index_hour", "q_index_column", "q_dedup_docid", "q_offset_lag",
    # Part C — LLM-pipeline layer
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_simhash",
    "q_dedup_simhash_pairs", "q_dedup_ngram", "q_dedup_cluster",
    "q_dedup_embcos", "q_cosine_topk", "q_ann_ivf", "q_ann_lsh",
    "q_ann_recall",
    "q_embed_norm", "q_embed_quantize", "q_lang_id", "q_lang_dist",
    "q_quality_score",
    "q_quality_repetition", "q_token_count", "q_doc_fingerprint", "q_text_stats", "q_media_meta",
    "q_token_freq", "q_tfidf_topterms", "q_pii_scrub",
    "q_doc_len_histogram", "q_sample_stratified", "q_dedup_minhash_cluster",
    "q_dedup_cluster_sizes",
    "q_dedup_embcos_lsh", "q_pack_sequences", "q_mixture_sample",
    "q_decontaminate", "q_curation_pipeline", "q_profile_columns",
    # Part B — representative relational spread. (q_agg_hash, q_cube and
    # q_percentile yielded their prefix slots to the three curation
    # queries above: they already carry round-1 driver-green evidence,
    # so a truncated pass re-checking them proves less than first
    # evidence for the new operators.)
    # (q_tpch_q3/q5 likewise ceded their slots to the round-new Q1/Q10.)
    "q_tpch_q1", "q_tpch_q10", "q_tpch_q6", "q_tpch_q14", "q_tpch_q18",
    "q_join_asof", "q_join_range",
    "q_window_tumble", "q_window_session_analog", "q_salted_distinct",
]


def _ordered() -> dict[str, QueryDef]:
    out = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    out.update((n, qd) for n, qd in QUERIES.items() if n not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: qd.spark for name, qd in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: qd.oracle for name, qd in _ordered().items()
            if qd.oracle is not None}
