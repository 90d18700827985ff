"""Batch file-format sources: CSV, JSON-lines, and parquet readers with
one shared contract.

The reference reads only Kafka (src/kafka/consumer.go:73-135); file
scans are part of the widened engine surface (SURVEY.md §2.2 row 1).
Every reader here keeps the reference's malformed-record semantics
(decode error → side-drop, never fail the batch; consumer.go:154-159):
CSV/JSON parse in PERMISSIVE mode with a `_corrupt_record` column, and
`drop_malformed` strips the failures.

Scale notes (100 TB):
- Text formats cannot push filters or prune columns — a CSV scan reads
  and tokenizes every byte regardless of the projection. These readers
  are for INGEST; convert to parquet (or write bucketed) immediately,
  then query the parquet. `csv_to_parquet` / `json_to_parquet` do the
  one-pass conversion.
- An explicit schema is REQUIRED: schema inference triggers an extra
  full scan of the input before the real job, which at 100 TB doubles
  the ingest cost. (Pass a sample-derived schema if it isn't known.)
- maxPartitionBytes governs split sizing for splittable inputs; gzip'd
  text is NOT splittable (one task per file) — prefer uncompressed,
  bzip2, or many small-ish gzip files on ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt_field(schema: T.StructType | str) -> T.StructType:
    s = (T._parse_datatype_string(schema)
         if isinstance(schema, str) else schema)
    if CORRUPT_COL not in s.fieldNames():
        s = s.add(T.StructField(CORRUPT_COL, T.StringType(), True))
    return s


def read_csv(spark: SparkSession, path: str, schema: T.StructType | str,
             header: bool = True, sep: str = ",", **options) -> DataFrame:
    """CSV scan, PERMISSIVE: rows that fail the schema land whole in
    `_corrupt_record` instead of failing the job."""
    return (
        spark.read.options(header=header, sep=sep, mode="PERMISSIVE",
                           columnNameOfCorruptRecord=CORRUPT_COL, **options)
        .schema(_with_corrupt_field(schema))
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: T.StructType | str,
              **options) -> DataFrame:
    """JSON-lines scan, PERMISSIVE, with the corrupt-record side channel."""
    return (
        spark.read.options(mode="PERMISSIVE",
                           columnNameOfCorruptRecord=CORRUPT_COL, **options)
        .schema(_with_corrupt_field(schema))
        .json(path)
    )


def read_json_schemaless(spark: SparkSession, path: str,
                         **options) -> DataFrame:
    """JSON-lines scan with NO declared schema and NO inference pass.

    The file twin of the Kafka pipeline's schemaless mode
    (operators/injector.decode_json_schemaless): each line decodes to
    ``doc map<string,variant>`` — field types survive faithfully
    (numbers/bools/nested/arrays/JSON-null) — plus the raw line in
    ``_corrupt_record`` when it is not a JSON object, the same
    PERMISSIVE side channel the typed readers expose (works with
    drop_malformed / split_malformed / malformed_only).

    Why not ``spark.read.json`` inference: at 100 TB inference is a
    FULL extra scan before the real one, and the inferred struct
    freezes whichever fields the sampled files happened to carry. This
    is ONE scan of `text` + a from_json per line, whole-stage codegen,
    schema-drift-proof.
    """
    from pyspark.sql import functions as F

    raw = spark.read.options(**options).text(path)
    doc = F.from_json(F.col("value"), "map<string,variant>")
    return raw.select(
        doc.alias("doc"),
        F.when(doc.isNull() & F.col("value").isNotNull(),
               F.col("value")).alias(CORRUPT_COL))


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan — the only format here that serves pushdown/pruning;
    the query substrate (io.table adds the nanos-timestamp shim)."""
    return spark.read.parquet(path)


def drop_malformed(df: DataFrame) -> DataFrame:
    """Malformed-record side-drop (reference consumer.go:154-159): keep
    rows that parsed clean, remove the corrupt-record channel.

    Zero-cost: pure filter, no materialization. One caveat inherited
    from Spark: a query that references NO data column (a bare
    `.count()`) prunes the scan down to `_corrupt_record` alone, which
    Spark disallows on raw text scans — use `split_malformed` (which
    materializes once) when you need standalone counts of a raw read.
    Note DROPMALFORMED mode is NOT the answer: with an empty required
    schema the CSV parser skips validation entirely and counts
    malformed lines as rows."""
    if CORRUPT_COL not in df.columns:
        return df
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def split_malformed(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, dead_letter) split of a PERMISSIVE read.

    Spark disallows queries whose only referenced column from a raw
    text scan is `_corrupt_record`, so the parsed batch is cached
    once — the documented pattern, and the right one anyway when both
    sides of the split are consumed. At 100 TB prefer the one-pass
    converters (`csv_to_parquet`) or persist(DISK_ONLY) over a full
    memory cache."""
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    dead = df.filter(F.col(CORRUPT_COL).isNotNull()) \
             .select(F.col(CORRUPT_COL).alias("raw"))
    return clean, dead


def malformed_only(df: DataFrame) -> DataFrame:
    """The dead-letter side of the split, for quarantine sinks."""
    return split_malformed(df)[1]


def csv_to_parquet(spark: SparkSession, src: str, dest: str,
                   schema: T.StructType | str, partition_by: list[str]
                   | None = None, **options) -> None:
    """One-pass ingest: CSV → clean parquet (malformed rows dropped).
    At 100 TB this runs once so every later query scans parquet."""
    df = drop_malformed(read_csv(spark, src, schema, **options))
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(dest)


def json_to_parquet(spark: SparkSession, src: str, dest: str,
                    schema: T.StructType | str, partition_by: list[str]
                    | None = None, **options) -> None:
    """One-pass ingest: JSON-lines → clean parquet."""
    df = drop_malformed(read_json(spark, src, schema, **options))
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(dest)
