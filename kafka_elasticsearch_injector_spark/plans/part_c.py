"""Part C — LLM-data-pipeline extension (SURVEY.md §2.3) on
`documents` / `embeddings`.

These are the operators a 100 TB training-data pipeline needs that the
reference (a row-at-a-time ETL injector) never had: dedup families,
similarity search, text analysis, multimodal plumbing. Implementations
live in operators/{dedup,similarity,text,multimodal}.py; this module
declares the oracle-checkable query surface over them.

Determinism: every hash used by dedup/fingerprint queries is md5 (present
in both Spark and DuckDB with identical hex output), so oracles replicate
the exact hash pipeline rather than trusting engine-specific hash fns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import vectors as V
from ..io import table
from .registry import register

# ------------------------------------------------------------------ dedup


@register(
    "q_dedup_exact",
    """
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      FROM documents) t
    WHERE rn = 1
    """,
    doc="Exact dedup: hash-groupBy on sha2(text), first doc_id wins. "
        "At 100 TB we shuffle the 32-byte digest, never the document text; "
        "oracle partitions by text (equivalent modulo sha collisions).",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
    return (
        docs.select("doc_id", "lang", "source", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ------------------------------------------------------------ text analysis


@register(
    "q_text_stats",
    """
    SELECT lang,
           COUNT(*) AS n_docs,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars,
           ROUND(CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*), 6)
             AS avg_words,
           SUM(n_chars) AS total_chars
    FROM documents GROUP BY lang
    """,
    doc="Text-analysis profile per language: doc counts, char/word averages.",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    n = F.count(F.lit(1))
    words = F.size(F.split(F.col("text"), " ", -1))
    return docs.groupBy("lang").agg(
        n.alias("n_docs"),
        F.round(F.sum("n_chars").cast("double") / n, 6).alias("avg_chars"),
        F.round(F.sum(words.cast("bigint")).cast("double") / n, 6).alias("avg_words"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "q_lang_dist",
    """
    SELECT lang, source, COUNT(*) AS n_docs FROM documents
    GROUP BY lang, source
    """,
    doc="Corpus profiling: language × source distribution.",
)
def q_lang_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ------------------------------------------------------------- vector math

# DuckDB fragment: explicitly sequential double-precision reductions so the
# oracle walks the same IEEE ops as functions/vectors.py (F.aggregate).
_DD_SQNORM = ("list_reduce(list_prepend(0.0, "
              "list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), "
              "(acc, x) -> acc + x)")


@register(
    "q_embed_norm",
    f"""
    SELECT vec_id, label,
           ROUND(SQRT({_DD_SQNORM.format(v='embedding')}), 6) AS l2_norm
    FROM embeddings
    """,
    doc="L2 norm over array<float> via higher-order fns (JVM-side, no UDF).",
)
def q_embed_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", "label",
        F.round(V.l2_norm(V.to_double(F.col("embedding"))), 6).alias("l2_norm"),
    )


_DD_DOT = ("list_reduce(list_prepend(0.0, "
           "list_transform(range(1, 65), "
           "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), "
           "(acc, x) -> acc + x)")


@register(
    "q_cosine_topk",
    f"""
    SELECT probe_id, vec_id, cos_sim, rn FROM (
      SELECT a.vec_id AS probe_id, b.vec_id AS vec_id,
             ROUND({_DD_DOT}
                   / (SQRT({_DD_SQNORM.format(v='a.embedding')})
                      * SQRT({_DD_SQNORM.format(v='b.embedding')})), 6) AS cos_sim,
             ROW_NUMBER() OVER (
               PARTITION BY a.vec_id
               ORDER BY {_DD_DOT}
                        / (SQRT({_DD_SQNORM.format(v='a.embedding')})
                           * SQRT({_DD_SQNORM.format(v='b.embedding')})) DESC,
                        b.vec_id) AS rn
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
      WHERE a.vec_id < 5) t
    WHERE rn <= 5
    """,
    doc="Brute-force cosine top-k: probes (vec_id<5) × corpus, "
        "zip_with/aggregate dot product, row_number top-5 per probe. "
        "Probes broadcast; scale path = IVF/LSH (operators/similarity.py).",
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    probes = (
        emb.filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("probe_id"),
                V.to_double(F.col("embedding")).alias("probe_vec"))
    )
    corpus = emb.select("vec_id", V.to_double(F.col("embedding")).alias("vec"))
    cos = V.cosine(F.col("probe_vec"), F.col("vec"))
    w = Window.partitionBy("probe_id").orderBy(F.col("_cos").desc(), F.col("vec_id"))
    return (
        F.broadcast(probes)
        .join(corpus, F.col("probe_id") != F.col("vec_id"))
        .select("probe_id", "vec_id", cos.alias("_cos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("probe_id", "vec_id", F.round(F.col("_cos"), 6).alias("cos_sim"), "rn")
    )
