"""Training-shard export: layout, determinism, manifest totals, and
partition pruning on read-back."""

from __future__ import annotations

import glob
import math
import os

from pyspark.sql import functions as F

from kafka_elasticsearch_injector_spark.io import table
from kafka_elasticsearch_injector_spark.sinks import dataset as DS

SF_DIR = "/root/testdata/sf0.001"


def test_export_layout_and_roundtrip(spark, tmp_path):
    docs = table(spark, SF_DIR, "documents")
    out = str(tmp_path / "ds")
    DS.write_training_shards(docs, out, n_shards=4)

    shard_dirs = sorted(os.path.basename(p)
                        for p in glob.glob(os.path.join(out, "shard=*")))
    assert shard_dirs == ["shard=0", "shard=1", "shard=2", "shard=3"]

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # Every row landed in its deterministic shard.
    assert back.filter(back.shard != back.doc_id % 4).count() == 0


def test_export_is_deterministic(spark, tmp_path):
    docs = table(spark, SF_DIR, "documents")
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    DS.write_training_shards(docs, a, n_shards=4)
    DS.write_training_shards(docs, b, n_shards=4)

    def shard_bytes(root):
        # Part-file NAMES embed a random task UUID; the determinism
        # contract is about contents — per shard, the multiset of file
        # bytes must be identical run to run.
        out = {}
        for d in glob.glob(os.path.join(root, "shard=*")):
            out[os.path.basename(d)] = sorted(
                open(p, "rb").read()
                for p in glob.glob(os.path.join(d, "*.parquet")))
        return out

    assert shard_bytes(a) == shard_bytes(b)


def test_manifest_totals_match_input(spark, tmp_path):
    docs = table(spark, SF_DIR, "documents")
    out = str(tmp_path / "ds")
    DS.write_training_shards(docs, out, n_shards=4)
    man = DS.shard_manifest(spark, out).collect()

    assert [r.shard for r in man] == [0, 1, 2, 3]
    assert sum(r.n_rows for r in man) == docs.count()
    want_tokens = docs.select(
        F.sum(F.size(F.split("text", " ", -1)))).first()[0]
    assert sum(r.n_tokens for r in man) == want_tokens
    want_chars = docs.select(F.sum(F.length("text"))).first()[0]
    assert sum(r.n_chars for r in man) == want_chars
    for r in man:
        assert r.id_lo % 4 == r.shard and r.id_hi % 4 == r.shard


def test_shard_filter_is_partition_pruned(spark, tmp_path):
    docs = table(spark, SF_DIR, "documents")
    out = str(tmp_path / "ds")
    DS.write_training_shards(docs, out, n_shards=4)
    df = spark.read.parquet(out).filter(F.col("shard") == 2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # The shard predicate must prune directories, not filter rows.
    assert "PartitionFilters: [isnotnull(shard" in plan \
        or "PartitionFilters: [(shard" in plan, plan
    assert df.count() == docs.filter(F.col("doc_id") % 4 == 2).count()


def test_skewed_shard_splits_files(spark, tmp_path):
    # One shard, tiny per-file cap: the writer must emit multiple
    # bounded files rather than one oversized one.
    docs = table(spark, SF_DIR, "documents")
    out = str(tmp_path / "ds")
    DS.write_training_shards(docs, out, n_shards=1,
                             max_records_per_file=20)
    files = glob.glob(os.path.join(out, "shard=0", "*.parquet"))
    assert len(files) >= 2


# ------------------------------------------------- webdataset tar export


def test_webdataset_roundtrip_and_byte_stability(spark, sf_dir, tmp_path):
    import tarfile

    from kafka_elasticsearch_injector_spark.io import table
    from kafka_elasticsearch_injector_spark.sinks.webdataset import (
        read_webdataset_keys,
        write_webdataset,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    out1 = str(tmp_path / "wds1")
    m1 = {r.shard: (r.n_members, r.sha256)
          for r in write_webdataset(
              docs, out1, 4, members={"txt": "text", "lang": "lang"})
          .collect()}

    n_docs = docs.count()
    # every row contributes one member per mapping
    assert sum(n for n, _ in m1.values()) == 2 * n_docs
    # members are present, keyed and suffixed as the convention demands
    names = list(read_webdataset_keys(out1))
    assert len(names) == 2 * n_docs
    some_doc = docs.limit(1).collect()[0]
    key = f"{some_doc.doc_id:012d}"
    member_names = {n for _, n in names}
    assert f"{key}.txt" in member_names and f"{key}.lang" in member_names
    # member CONTENT round-trips
    shard_of_key = next(s for s, n in names if n == f"{key}.txt")
    with tarfile.open(str(tmp_path / "wds1" / f"shard-{shard_of_key:05d}.tar")) as tar:
        got = tar.extractfile(f"{key}.txt").read().decode()
    assert got == some_doc.text

    # byte stability: a re-run of the same input produces identical
    # sha256 per shard (sorted members, pinned tar metadata)
    out2 = str(tmp_path / "wds2")
    m2 = {r.shard: (r.n_members, r.sha256)
          for r in write_webdataset(
              docs, out2, 4, members={"txt": "text", "lang": "lang"})
          .collect()}
    assert m1 == m2


def test_webdataset_shard_assignment_is_id_pure(spark, sf_dir, tmp_path):
    # Shuffling input order / partitioning must not move any member to
    # a different shard: assignment depends on the id alone.
    from kafka_elasticsearch_injector_spark.io import table
    from kafka_elasticsearch_injector_spark.sinks.webdataset import (
        read_webdataset_keys,
        write_webdataset,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    write_webdataset(docs, a, 3).collect()
    write_webdataset(docs.repartition(7).sortWithinPartitions(
        F.col("text")), b, 3).collect()
    assert sorted(read_webdataset_keys(a)) == sorted(read_webdataset_keys(b))


def test_webdataset_id_member_and_stale_shard_cleanup(spark, sf_dir, tmp_path):
    # A members mapping may export the key column itself, and a
    # re-export with fewer shards must not leave stale tars behind.
    from kafka_elasticsearch_injector_spark.io import table
    from kafka_elasticsearch_injector_spark.sinks.webdataset import (
        read_webdataset_keys,
        write_webdataset,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    out = str(tmp_path / "wds")
    write_webdataset(docs, out, 8,
                     members={"txt": "text", "id": "doc_id"}).collect()
    shards_8 = {s for s, _ in read_webdataset_keys(out)}
    assert max(shards_8) >= 4  # 8-way spread
    write_webdataset(docs, out, 2).collect()
    shards_2 = {s for s, _ in read_webdataset_keys(out)}
    assert shards_2 <= {0, 1}, "stale shard tars survived the re-export"


def test_webdataset_failed_export_preserves_previous(spark, sf_dir, tmp_path):
    # The export must be transactional at the directory level: a job
    # that fails mid-export (here: non-numeric id column crashes the
    # shard task) leaves the previous export's tars byte-intact and no
    # staging litter behind.
    import pytest

    from kafka_elasticsearch_injector_spark.io import table
    from kafka_elasticsearch_injector_spark.sinks.webdataset import (
        read_webdataset_keys,
        write_webdataset,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    out = str(tmp_path / "wds")
    write_webdataset(docs, out, 3).collect()
    before = sorted(read_webdataset_keys(out))
    assert before

    with pytest.raises(Exception):
        write_webdataset(docs, out, 3, id_col="text")  # int(text) raises

    assert sorted(read_webdataset_keys(out)) == before
    assert not [f for f in os.listdir(out) if f.startswith(".staging-")]


def test_webdataset_export_runs_without_collect(spark, sf_dir, tmp_path):
    # write_webdataset materializes the export itself — a caller that
    # drops the returned manifest still gets the tars on disk.
    from kafka_elasticsearch_injector_spark.io import table
    from kafka_elasticsearch_injector_spark.sinks.webdataset import (
        read_webdataset_keys,
        write_webdataset,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    out = str(tmp_path / "wds")
    manifest = write_webdataset(docs, out, 2)  # never .collect()ed below
    names = list(read_webdataset_keys(out))
    assert len(names) == docs.count()
    # the returned manifest is already materialized and agrees
    assert sum(r.n_members for r in manifest.collect()) == len(names)


def test_webdataset_distributed_reader_roundtrips(spark, sf_dir, tmp_path):
    """read_webdataset (the distributed inverse): write shards, read
    them back through binaryFile + mapInPandas, and the sample set —
    keys, per-member payload bytes, shard assignment — must round-trip
    exactly. Unrequested member suffixes are skipped."""
    from kafka_elasticsearch_injector_spark.sinks.webdataset import (
        read_webdataset,
        write_webdataset,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    out = str(tmp_path / "wds")
    write_webdataset(docs, out, 4, members={"txt": "text", "lang": "lang"})

    back = read_webdataset(spark, out,
                           members={"txt": "text", "lang": "lang"})
    rows = {r.key: (bytes(r.text), bytes(r.lang), r.shard)
            for r in back.collect()}
    src = docs.collect()
    assert len(rows) == len(src)
    for s in src:
        key = f"{s.doc_id:012d}"
        text_b, lang_b, shard = rows[key]
        assert text_b == s.text.encode() and lang_b == s.lang.encode()
        assert shard.startswith("shard-") and shard.endswith(".tar")
    # one shard file per task; all four shards represented
    assert len({v[2] for v in rows.values()}) == 4

    # requesting a subset of members skips the rest without error
    only_txt = read_webdataset(spark, out, members={"txt": "text"})
    assert only_txt.columns == ["shard", "key", "text"]
    assert only_txt.count() == len(src)


def test_read_webdataset_foreign_tar_layout(spark, tmp_path):
    """Interop: a hand-built tar in the layout REAL WebDataset corpora
    ship — multi-member samples (jpg+cls+json per key), directory
    prefixes (with dots), dotted suffixes (`key.aug.txt` → suffix
    `aug.txt`, requested verbatim), and extensionless members."""
    import io
    import tarfile as _tf

    from kafka_elasticsearch_injector_spark.sinks.webdataset import (
        read_webdataset,
    )

    out = tmp_path / "foreign"
    out.mkdir()

    def add(tar, name, data: bytes):
        info = _tf.TarInfo(name)
        info.size = len(data)
        tar.addfile(info, io.BytesIO(data))

    with _tf.open(out / "shard-00000.tar", "w") as tar:
        # grouped multi-member sample under a dotted directory
        add(tar, "v1.0/000123.jpg", b"\xff\xd8jpegbytes")
        add(tar, "v1.0/000123.cls", b"7")
        add(tar, "v1.0/000123.json", b'{"a":1}')
        # second sample, same dir; missing .cls -> null column
        add(tar, "v1.0/000124.jpg", b"\xff\xd8other")
        # dotted suffix: key 000124, suffix aug.txt
        add(tar, "v1.0/000124.aug.txt", b"augmented")
        # extensionless member: skipped (no suffix)
        add(tar, "v1.0/README", b"ignore me")

    back = read_webdataset(
        spark, str(out),
        members={"jpg": "image", "cls": "label", "aug.txt": "aug"})
    rows = {r.key: r for r in back.collect()}
    assert set(rows) == {"v1.0/000123", "v1.0/000124"}
    r1, r2 = rows["v1.0/000123"], rows["v1.0/000124"]
    assert bytes(r1.image) == b"\xff\xd8jpegbytes"
    assert bytes(r1.label) == b"7"
    assert r1.aug is None
    assert bytes(r2.image) == b"\xff\xd8other"
    assert r2.label is None
    assert bytes(r2.aug) == b"augmented"
    # a plain-"txt" request must NOT match the aug.txt member
    none_txt = read_webdataset(spark, str(out), members={"txt": "text"})
    assert none_txt.count() == 0


def test_jsonl_shards_roundtrip_native_read(spark, sf_dir, tmp_path):
    """JSONL.gz export: rows round-trip through Spark's NATIVE json
    reader (no custom read code — the point of the format), shard
    assignment is id-pure, and the manifest matches the written files."""
    import hashlib as _hl

    from kafka_elasticsearch_injector_spark.sinks.jsonl import (
        write_jsonl_shards,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars")
    out = str(tmp_path / "jsonl")
    manifest = {r.shard: (r.n_rows, r.sha256)
                for r in write_jsonl_shards(docs, out, 4).collect()}

    back = spark.read.schema(
        "doc_id LONG, text STRING, lang STRING, n_chars INT").json(out)
    src = {r.doc_id: r for r in docs.collect()}
    got = {r.doc_id: r for r in back.collect()}
    assert len(got) == len(src) == sum(n for n, _ in manifest.values())
    for k, s in src.items():
        assert got[k].text == s.text and got[k].lang == s.lang
        assert got[k].n_chars == s.n_chars
    # manifest sha256 matches the bytes actually on disk
    for shard, (_, sha) in manifest.items():
        with open(os.path.join(out, f"shard-{shard:05d}.jsonl.gz"),
                  "rb") as f:
            assert _hl.sha256(f.read()).hexdigest() == sha


def test_jsonl_shards_byte_deterministic_rerun(spark, sf_dir, tmp_path):
    """Re-running the identical export reproduces identical per-shard
    sha256 — sorted rows, sorted keys, gzip mtime pinned."""
    from kafka_elasticsearch_injector_spark.sinks.jsonl import (
        write_jsonl_shards,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    m1 = {r.shard: r.sha256 for r in write_jsonl_shards(
        docs, str(tmp_path / "a"), 3).collect()}
    m2 = {r.shard: r.sha256 for r in write_jsonl_shards(
        docs, str(tmp_path / "b"), 3).collect()}
    assert m1 == m2 and len(m1) == 3


def test_jsonl_shards_all_numeric_preserves_int_dtype(spark, tmp_path):
    """Regression (round-5 ADVICE): an all-numeric frame with any float
    column must NOT coerce integer ids to float — iterrows() did, so
    doc_id=5 serialized as 5.0 and a LONG-schema read-back nulled it."""
    import gzip as _gz

    from kafka_elasticsearch_injector_spark.sinks.jsonl import (
        write_jsonl_shards,
    )

    df = spark.createDataFrame(
        [(5, 0.5), (6, 1.25), (7, None)],
        "doc_id long, score double")
    out = str(tmp_path / "num")
    write_jsonl_shards(df, out, 2)

    # raw bytes: integer ids serialize as JSON integers, nulls as null
    lines = []
    for name in sorted(os.listdir(out)):
        if name.endswith(".jsonl.gz"):
            with _gz.open(os.path.join(out, name), "rt") as f:
                lines += [ln.strip() for ln in f if ln.strip()]
    assert any('"doc_id":5,' in ln for ln in lines)
    assert not any("5.0" in ln.split('"score"')[0] for ln in lines)
    assert any('"score":null' in ln for ln in lines)

    # typed native read-back: no nulled-out ids
    back = spark.read.schema("doc_id long, score double").json(out)
    got = {r.doc_id: r.score for r in back.collect()}
    assert got == {5: 0.5, 6: 1.25, 7: None}


def test_jsonl_and_tar_nullable_int_columns_stay_integral(spark, tmp_path):
    """Regression (round-6 review): a NULLABLE integer column reaches
    the shard task as NaN-backed float64 (Arrow→pandas), which the
    per-column dtype fix alone can't see — the Spark schema must drive
    the re-coercion, in both writers."""
    import gzip as _gz

    from kafka_elasticsearch_injector_spark.sinks.jsonl import (
        write_jsonl_shards,
    )
    from kafka_elasticsearch_injector_spark.sinks.webdataset import (
        read_webdataset,
        write_webdataset,
    )

    df = spark.createDataFrame(
        [(1, 7, "a"), (2, None, "b"), (3, 9, "c")],
        "doc_id long, ref long, t string")

    out = str(tmp_path / "nullable")
    write_jsonl_shards(df, out, 1)
    lines = []
    for name in sorted(os.listdir(out)):
        if name.endswith(".jsonl.gz"):
            with _gz.open(os.path.join(out, name), "rt") as f:
                lines += [ln.strip() for ln in f if ln.strip()]
    assert any('"ref":7,' in ln for ln in lines), lines
    assert any('"ref":null' in ln for ln in lines)
    assert not any("7.0" in ln for ln in lines)
    back = spark.read.schema("doc_id long, ref long, t string").json(out)
    assert {r.doc_id: r.ref for r in back.collect()} == {1: 7, 2: None, 3: 9}

    # tar: the null row keeps the whole pandas column float64-coerced;
    # integral members must still write b"7"/b"9", and the null member
    # is SKIPPED so it reads back as None (not b"None"/b"nan")
    tar_out = str(tmp_path / "nullable_tar")
    write_webdataset(df, tar_out, 1, members={"ref": "ref", "txt": "t"})
    got = {r.key: (None if r.ref is None else bytes(r.ref))
           for r in read_webdataset(
               spark, tar_out, members={"ref": "ref", "txt": "t"})
           .collect()}
    assert got == {f"{1:012d}": b"7", f"{2:012d}": None, f"{3:012d}": b"9"}


def test_webdataset_null_timestamp_member_skipped_not_nat(spark, tmp_path):
    """Regression (round-6 review): a NULL timestamp member value
    reaches the tar task as pd.NaT, which the old None/NaN-only skip
    test let fall through to str(val) — writing literal b"NaT" bytes
    instead of omitting the member like every other null."""
    import datetime as dt

    from kafka_elasticsearch_injector_spark.sinks.webdataset import (
        read_webdataset,
        write_webdataset,
    )

    df = spark.createDataFrame(
        [(1, dt.datetime(2021, 6, 1, 12, 0, 0), "a"),
         (2, None, "b")],
        "doc_id long, ts timestamp, t string")
    out = str(tmp_path / "nat_tar")
    write_webdataset(df, out, 1, members={"ts": "ts", "txt": "t"})
    got = {r.key: (None if r.ts is None else bytes(r.ts))
           for r in read_webdataset(
               spark, out, members={"ts": "ts", "txt": "t"}).collect()}
    assert got[f"{2:012d}"] is None, "NaT must skip the member"
    assert got[f"{1:012d}"] is not None
    assert b"NaT" not in got[f"{1:012d}"]


def test_webdataset_all_numeric_members_preserve_int_dtype(spark, tmp_path):
    """Regression (same class as the JSONL iterrows bug): an all-numeric
    frame must not stringify integer tar members as '7.0'."""
    from kafka_elasticsearch_injector_spark.sinks.webdataset import (
        read_webdataset,
        write_webdataset,
    )

    df = spark.createDataFrame(
        [(5, 7, 0.5), (6, 8, 1.25)], "doc_id long, label int, score double")
    out = str(tmp_path / "numtar")
    write_webdataset(df, out, 1, members={"cls": "label", "scr": "score"})
    back = {r.key: (bytes(r.label), bytes(r.score))
            for r in read_webdataset(
                spark, out, members={"cls": "label", "scr": "score"})
            .collect()}
    assert back[f"{5:012d}"] == (b"7", b"0.5")
    assert back[f"{6:012d}"] == (b"8", b"1.25")


def test_staged_publish_refuses_empty_over_prior_export(spark, tmp_path):
    """Regression (round-5 ADVICE): an export that produces ZERO shard
    files must not silently destroy a prior export — it refuses unless
    allow_empty=True."""
    import pytest as _pt

    from kafka_elasticsearch_injector_spark.sinks.jsonl import (
        write_jsonl_shards,
    )

    out = str(tmp_path / "exp")
    full = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, t string")
    write_jsonl_shards(full, out, 2)
    prior = sorted(f for f in os.listdir(out) if f.endswith(".jsonl.gz"))
    assert prior

    empty = full.where("doc_id < 0")
    with _pt.raises(ValueError, match="EMPTY export"):
        write_jsonl_shards(empty, out, 2)
    # the prior export is intact, no staging litter left behind
    assert sorted(f for f in os.listdir(out)
                  if f.endswith(".jsonl.gz")) == prior
    assert not [f for f in os.listdir(out) if f.startswith(".staging-")]

    # explicit opt-in publishes the empty result (prior files removed)
    write_jsonl_shards(empty, out, 2, allow_empty=True)
    assert not [f for f in os.listdir(out) if f.endswith(".jsonl.gz")]


def test_jsonl_typed_columns_round_trip(spark, tmp_path):
    """Schema-driven conversion (round-6): embeddings, token lists,
    timestamps, dates, string-keyed maps, and structs — the column
    types a real corpus export carries — must round-trip exactly
    through `spark.read.schema(ddl).json`. `pd.isna` on an ndarray
    used to crash the writer before the value path was schema-driven."""
    import datetime as dt

    from kafka_elasticsearch_injector_spark.sinks.jsonl import (
        write_jsonl_shards,
    )

    ddl = ("doc_id long, emb array<double>, toks array<string>, "
           "ts timestamp, d date, m map<string,int>, "
           "s struct<p:int,q:string>, counts array<int>")
    rows = [
        (1, [0.5, -1.25], ["a", "éǃ"],
         dt.datetime(2018, 3, 10, 14, 30, 0, 123456), dt.date(2020, 1, 2),
         {"k": 7}, (5, "x"), [1, None, 3]),
        (2, None, [], None, None, None, None, None),
        (3, [float("nan")], ["line\nbreak"],
         dt.datetime(1999, 12, 31, 23, 59, 59), dt.date(1970, 1, 1),
         {}, (None, None), []),
    ]
    df = spark.createDataFrame(rows, ddl)
    out = str(tmp_path / "typed")
    write_jsonl_shards(df, out, 2)

    back = spark.read.schema(ddl).json(out)
    got = {r.doc_id: r for r in back.collect()}
    assert got[1].emb == [0.5, -1.25]
    assert got[1].toks == ["a", "éǃ"]
    assert got[1].ts == dt.datetime(2018, 3, 10, 14, 30, 0, 123456)
    assert got[1].d == dt.date(2020, 1, 2)
    assert got[1].m == {"k": 7}
    assert got[1].s.p == 5 and got[1].s.q == "x"
    # nullable-int ARRAY ELEMENTS float-coerce via Arrow; the declared
    # element type must restore them (None stays None)
    assert list(got[1].counts) == [1, None, 3]
    assert got[2].emb is None and got[2].ts is None and got[2].s is None
    # the writer emits the faithful NaN token for double ARRAY
    # elements (NaN is a value there, not a null hole — that's the
    # nullable-int coercion's job), and Spark's reader
    # (allowNonNumericNumbers, verified on 4.1.2) parses the token
    # back to NaN at every nesting level — pin both directions so a
    # converter refactor or Spark behavior change surfaces here
    import gzip as _gz
    raw = b"".join(
        _gz.open(os.path.join(out, f), "rb").read()
        for f in sorted(os.listdir(out)) if f.endswith(".jsonl.gz"))
    assert b'"emb":[NaN]' in raw
    assert len(got[3].emb) == 1 and math.isnan(got[3].emb[0])
    assert got[3].toks == ["line\nbreak"]

    # byte determinism holds for the richer types too
    import hashlib as _h
    h1 = {f: _h.sha256(open(os.path.join(out, f), "rb").read()).hexdigest()
          for f in os.listdir(out) if f.endswith(".jsonl.gz")}
    out2 = str(tmp_path / "typed2")
    write_jsonl_shards(df, out2, 2)
    h2 = {f: _h.sha256(open(os.path.join(out2, f), "rb").read()).hexdigest()
          for f in os.listdir(out2) if f.endswith(".jsonl.gz")}
    assert h1 == h2


def test_jsonl_nonfinite_contract_exhaustive(spark, tmp_path):
    """The complete non-finite serialization contract, byte-pinned at
    every nesting level so a converter refactor can't half-break it
    again (a round-6 rewrite nulled NaN array elements while the
    docstring promised the token):

    - NaN and ±Infinity are VALUES of a declared float/double lane →
      faithful NaN/Infinity/-Infinity tokens in the bytes at EVERY
      level including top-level scalars, parsed back to the same IEEE
      values by spark.read.json (allowNonNumericNumbers). The Arrow
      writer kernel sees validity bitmaps, so a null is never confused
      with a NaN anywhere — the old pandas-era "top-level NaN folds to
      null" lossy lane is gone.
    - Nullable-INT array elements stay exact next to their nulls (the
      Arrow path never floats the lane).
    """
    from kafka_elasticsearch_injector_spark.sinks.jsonl import (
        write_jsonl_shards,
    )

    nan, inf = float("nan"), float("inf")
    ddl = ("doc_id long, x double, a array<double>, "
           "m map<string,double>, s struct<p:double,q:double>, "
           "counts array<int>, ma map<string,array<float>>, "
           "sa struct<r:array<double>>")
    rows = [
        (1, inf, [nan, None, inf, -inf, 2.5], {"n": nan, "i": -inf,
                                               "z": None},
         (nan, inf), [7, None], {"k": [1.5, None, nan]},
         ([None, nan, 3.5],)),
        (2, nan, None, None, None, None, None, None),
    ]
    df = spark.createDataFrame(rows, ddl)
    out = str(tmp_path / "nonfinite")
    write_jsonl_shards(df, out, 1)

    import gzip as _gz
    raw = b"".join(
        _gz.open(os.path.join(out, f), "rb").read()
        for f in sorted(os.listdir(out)) if f.endswith(".jsonl.gz"))
    # byte-level: faithful tokens at every level (top-level NaN
    # included) — and a NULL float-array element stays null, never an
    # invented NaN
    assert b'"a":[NaN,null,Infinity,-Infinity,2.5]' in raw
    assert b'"i":-Infinity' in raw and b'"n":NaN' in raw
    assert b'"z":null' in raw
    assert b'"p":NaN' in raw and b'"q":Infinity' in raw
    assert b'"x":Infinity' in raw
    assert b'"x":NaN' in raw
    assert b'"counts":[7,null]' in raw
    # null-vs-NaN stays exact inside maps and structs too
    assert b'"k":[1.5,null,NaN]' in raw
    assert b'"r":[null,NaN,3.5]' in raw

    # read-back: every token parses to its IEEE value at every level,
    # and the restored nulls stay null
    back = {r.doc_id: r
            for r in spark.read.schema(ddl).json(out).collect()}
    r1 = back[1]
    assert r1.x == inf
    assert (math.isnan(r1.a[0]) and r1.a[1] is None and r1.a[2] == inf
            and r1.a[3] == -inf and r1.a[4] == 2.5)
    assert math.isnan(r1.m["n"]) and r1.m["i"] == -inf
    assert r1.m["z"] is None
    assert math.isnan(r1.s.p) and r1.s.q == inf
    assert list(r1.counts) == [7, None]
    ka = list(r1.ma["k"])
    assert ka[0] == 1.5 and ka[1] is None and math.isnan(ka[2])
    ra = list(r1.sa.r)
    assert ra[0] is None and math.isnan(ra[1]) and ra[2] == 3.5
    assert math.isnan(back[2].x) and back[2].a is None


def test_jsonl_rejects_unrepresentable_types_at_plan_time(spark, tmp_path):
    """Binary / decimal / non-string map keys fail in the DRIVER with a
    clear TypeError before any task runs — not per-executor."""
    import pytest as _pt

    from kafka_elasticsearch_injector_spark.sinks.jsonl import (
        write_jsonl_shards,
    )

    for ddl, bad in [("doc_id long, b binary", (1, b"x")),
                     ("doc_id long, dec decimal(10,2)", None),
                     ("doc_id long, m map<int,string>", None)]:
        df = (spark.createDataFrame([bad], ddl) if bad is not None
              else spark.range(1).selectExpr(
                  "id AS doc_id",
                  "CAST(1.5 AS DECIMAL(10,2)) AS dec" if "dec" in ddl
                  else "map(1, 'v') AS m"))
        with _pt.raises(TypeError, match="JSONL export cannot represent"):
            write_jsonl_shards(df, str(tmp_path / "never"), 1)
    assert not os.path.exists(str(tmp_path / "never"))


# ---------------------------------------------------------------------------
# Generative round-trip: the three converter regressions this file
# pins (iterrows dtype coercion, NaN-in-array nulling, null-adjacent
# bigint rounding) were all introduced by refactors that kept every
# existing example green. This property test generates random schemas
# (scalars, arrays, string-keyed maps, structs, one level of container
# nesting) and random values including None/NaN/±Infinity at every
# level, and checks the full documented contract:
# write_jsonl_shards → spark.read.schema(...).json is the IDENTITY
# (the Arrow writer kernel has no lossy lanes).
# ---------------------------------------------------------------------------

def _jsonl_scalar_strategies():
    import datetime as dt

    from hypothesis import strategies as st
    from pyspark.sql import types as T

    return [
        (T.LongType(), st.none() | st.integers(-2**62, 2**62)),
        (T.IntegerType(), st.none() | st.integers(-2**31, 2**31 - 1)),
        (T.DoubleType(), st.none() | st.floats(allow_nan=True,
                                               allow_infinity=True,
                                               width=64)),
        (T.BooleanType(), st.none() | st.booleans()),
        (T.StringType(), st.none() | st.text(max_size=12)),
        (T.DateType(), st.none() | st.dates(dt.date(1900, 1, 1),
                                            dt.date(2100, 1, 1))),
        (T.TimestampType(),
         st.none() | st.datetimes(dt.datetime(1900, 1, 1),
                                  dt.datetime(2100, 1, 1))),
    ]


def _jsonl_column_strategy(nested: bool):
    """(DataType, value-strategy) for one column; `nested` allows one
    level of scalar-element containers inside the container."""
    from hypothesis import strategies as st
    from pyspark.sql import types as T

    scalars = _jsonl_scalar_strategies()
    leaves = list(scalars)
    if nested:
        leaves += [(T.ArrayType(d), st.none() | st.lists(s, max_size=3))
                   for d, s in scalars]

    def containers(leaf):
        d, s = leaf
        return st.one_of(
            st.just((T.ArrayType(d), st.none() | st.lists(s, max_size=4))),
            st.just((T.MapType(T.StringType(), d),
                     st.none() | st.dictionaries(st.text(max_size=6), s,
                                                 max_size=4))),
            st.just((T.StructType([T.StructField("p", d),
                                   T.StructField("q", d)]),
                     st.none() | st.tuples(s, s))),
        )

    return st.one_of(st.sampled_from(scalars),
                     st.sampled_from(leaves).flatmap(containers))


def _jsonl_expected(v, dtype, top: bool):
    """The documented read-back value for input `v` of declared type
    `dtype`: the identity — the Arrow writer has no lossy lanes."""
    from pyspark.sql import types as T

    if v is None:
        return None
    if isinstance(dtype, T.DoubleType):
        return float(v)
    if isinstance(dtype, T.ArrayType):
        return [_jsonl_expected(x, dtype.elementType, False) for x in v]
    if isinstance(dtype, T.MapType):
        return {k: _jsonl_expected(x, dtype.valueType, False)
                for k, x in v.items()}
    if isinstance(dtype, T.StructType):
        vals = v if isinstance(v, (tuple, list)) else tuple(v)
        return {f.name: _jsonl_expected(x, f.dataType, False)
                for f, x in zip(dtype.fields, vals)}
    return v


def _jsonl_eq(want, got) -> bool:
    import datetime as dt
    import math as m

    if want is None or got is None:
        return want is None and got is None
    if isinstance(want, float):
        return repr(float(got)) == repr(want)  # bit-exact, NaN-aware
    if isinstance(want, list):
        return (len(want) == len(got)
                and all(_jsonl_eq(w, g) for w, g in zip(want, got)))
    if isinstance(want, dict):
        if hasattr(got, "asDict"):
            got = got.asDict()
        return (set(want) == set(got)
                and all(_jsonl_eq(want[k], got[k]) for k in want))
    if isinstance(want, dt.datetime):
        return got == want
    return got == want


def test_jsonl_roundtrip_property(spark, tmp_path):
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import types as T

    from kafka_elasticsearch_injector_spark.sinks.jsonl import (
        write_jsonl_shards,
    )

    cols = st.lists(_jsonl_column_strategy(nested=True),
                    min_size=1, max_size=3)
    counter = iter(range(10**6))

    @settings(max_examples=5, deadline=None)
    @given(cols=cols, data=st.data())
    def run(cols, data):
        schema = T.StructType(
            [T.StructField("doc_id", T.LongType(), False)]
            + [T.StructField(f"c{i}", d) for i, (d, _) in enumerate(cols)])
        n_rows = data.draw(st.integers(1, 4))
        rows = [tuple([rid] + [data.draw(s) for _, s in cols])
                for rid in range(n_rows)]
        df = spark.createDataFrame(rows, schema)
        out = str(tmp_path / f"prop{next(counter)}")
        write_jsonl_shards(df, out, 2)
        back = {r["doc_id"]: r for r in
                spark.read.schema(schema).json(out).collect()}
        assert set(back) == set(range(n_rows))
        for rid, row in enumerate(rows):
            got = back[rid]
            for i, (d, _) in enumerate(cols):
                want = _jsonl_expected(row[1 + i], d, top=True)
                assert _jsonl_eq(want, got[f"c{i}"]), (
                    f"col c{i} {d.simpleString()}: want {want!r} "
                    f"got {got[f'c{i}']!r}")

    run()


# ------------------------------------------------ manifest + integrity


def test_manifest_persisted_deterministic_and_invisible(spark, tmp_path):
    """Both shard writers persist `_manifest.json` (atomic, sorted,
    byte-deterministic across re-runs, equal to the returned manifest
    DataFrame), and Spark's file index filters it — a native read of
    the JSONL export must see only shard files."""
    from kafka_elasticsearch_injector_spark.sinks.integrity import (
        read_manifest,
    )
    from kafka_elasticsearch_injector_spark.sinks.jsonl import (
        write_jsonl_shards,
    )
    from kafka_elasticsearch_injector_spark.sinks.webdataset import (
        write_webdataset,
    )

    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(20)], "doc_id long, t string")

    out = str(tmp_path / "j")
    ret = {r.shard: (r.n_rows, r.n_bytes, r.sha256)
           for r in write_jsonl_shards(df, out, 3).collect()}
    man = {d["shard"]: (d["n_rows"], d["n_bytes"], d["sha256"])
           for d in read_manifest(out)}
    assert man == ret
    bytes1 = open(os.path.join(out, "_manifest.json"), "rb").read()
    out2 = str(tmp_path / "j2")
    write_jsonl_shards(df, out2, 3)
    assert open(os.path.join(out2, "_manifest.json"), "rb").read() == bytes1

    # native read ignores the manifest file
    back = spark.read.schema("doc_id long, t string").json(out)
    assert back.count() == 20

    tout = str(tmp_path / "t")
    tret = {r.shard for r in
            write_webdataset(df, tout, 2, members={"txt": "t"}).collect()}
    assert {d["shard"] for d in read_manifest(tout)} == tret


def test_verify_shard_export_statuses(spark, tmp_path):
    """The distributed verifier reconciles disk against the manifest:
    intact export → all ok; then one corrupted byte → hash_mismatch,
    a truncated shard → size_mismatch, a deleted shard → missing, and
    a foreign shard file → extra."""
    from kafka_elasticsearch_injector_spark.sinks.integrity import (
        verify_shard_export,
    )
    from kafka_elasticsearch_injector_spark.sinks.jsonl import (
        write_jsonl_shards,
    )

    df = spark.createDataFrame(
        [(i, f"payload {i}") for i in range(40)], "doc_id long, t string")
    out = str(tmp_path / "v")
    write_jsonl_shards(df, out, 4)

    ok = verify_shard_export(spark, out, ".jsonl.gz").collect()
    assert len(ok) == 4 and all(r.status == "ok" for r in ok)

    shards = sorted(f for f in os.listdir(out) if f.endswith(".jsonl.gz"))
    # corrupt one byte, same length
    p0 = os.path.join(out, shards[0])
    b = bytearray(open(p0, "rb").read())
    b[-1] ^= 0xFF
    open(p0, "wb").write(bytes(b))
    # truncate another
    p1 = os.path.join(out, shards[1])
    os.truncate(p1, os.path.getsize(p1) - 2)
    # delete a third
    os.remove(os.path.join(out, shards[2]))
    # plant a foreign shard-file a reader's glob would pick up
    open(os.path.join(out, "shard-99999.jsonl.gz"), "wb").write(b"junk")

    got = {r.file: r.status
           for r in verify_shard_export(spark, out, ".jsonl.gz").collect()}
    assert got[shards[0]] == "hash_mismatch"
    assert got[shards[1]] == "size_mismatch"
    assert got[shards[2]] == "missing"
    assert got["shard-99999.jsonl.gz"] == "extra"
    assert got[shards[3]] == "ok"


def test_verify_without_manifest_reports_all_extra(spark, tmp_path):
    """A directory with shards but no `_manifest.json` (crash inside
    the swap's final rename, or a foreign directory) must ALERT —
    every file reports ``extra`` — not raise FileNotFoundError out of
    the monitoring path."""
    from kafka_elasticsearch_injector_spark.sinks.integrity import (
        verify_shard_export,
    )
    from kafka_elasticsearch_injector_spark.sinks.jsonl import (
        write_jsonl_shards,
    )

    df = spark.createDataFrame(
        [(i, f"t {i}") for i in range(10)], "doc_id long, t string")
    out = str(tmp_path / "nm")
    write_jsonl_shards(df, out, 2)
    os.remove(os.path.join(out, "_manifest.json"))

    rows = verify_shard_export(spark, out, ".jsonl.gz").collect()
    assert len(rows) == 2 and all(r.status == "extra" for r in rows)


def test_verify_glob_metachar_path(spark, tmp_path):
    """The writers use plain os IO, so an export can land at a path
    containing Hadoop glob metacharacters; the verifier must escape
    them rather than let Spark expand `[1]` as a character class."""
    from kafka_elasticsearch_injector_spark.sinks.integrity import (
        verify_shard_export,
    )
    from kafka_elasticsearch_injector_spark.sinks.jsonl import (
        write_jsonl_shards,
    )

    df = spark.createDataFrame(
        [(i, f"t {i}") for i in range(10)], "doc_id long, t string")
    out = str(tmp_path / "run[1]" / "out")
    write_jsonl_shards(df, out, 2)

    rows = verify_shard_export(spark, out, ".jsonl.gz").collect()
    assert len(rows) == 2 and all(r.status == "ok" for r in rows)


def test_failed_export_keeps_prior_manifest(spark, tmp_path):
    """The manifest is published inside the staged swap: a job that
    fails after a successful first export must leave BOTH the prior
    shards and the prior manifest byte-intact (no stale-manifest
    window opened by a failed re-run)."""
    import pytest

    from kafka_elasticsearch_injector_spark.sinks.jsonl import (
        write_jsonl_shards,
    )

    df = spark.createDataFrame(
        [(i, f"t {i}") for i in range(10)], "doc_id long, t string")
    out = str(tmp_path / "pk")
    write_jsonl_shards(df, out, 2)
    man_path = os.path.join(out, "_manifest.json")
    before = open(man_path, "rb").read()

    # Second export dies mid-job (unserializable plan-time failure:
    # binary column is rejected by the converter builder — before any
    # staging damage; use a job-time failure instead to exercise the
    # swap path: an id column that doesn't exist fails in the Spark job)
    with pytest.raises(Exception):
        write_jsonl_shards(df.withColumnRenamed("doc_id", "other"),
                           out, 2)

    assert open(man_path, "rb").read() == before
    assert sorted(f for f in os.listdir(out)
                  if f.endswith(".jsonl.gz")) == [
        "shard-00000.jsonl.gz", "shard-00001.jsonl.gz"]


def test_jsonl_bigint_exact_next_to_nulls(spark, tmp_path):
    """Deterministic repro of the round-7 corruption: an integer lane
    (scalar OR array element) whose column/array also carries a null
    must serialize >2⁵³ values digit-exactly. The pandas writer path
    floated those lanes (9007199254740993 → ...992 before int() ever
    ran); the Arrow kernel sees validity bitmaps and exact int64."""
    from kafka_elasticsearch_injector_spark.sinks.jsonl import (
        write_jsonl_shards,
    )

    big = 9007199254740993          # 2**53 + 1, unrepresentable in f64
    df = spark.createDataFrame(
        [(1, big, [big, None, -big]), (2, None, None)],
        "doc_id long, x long, a array<long>")
    out = str(tmp_path / "bigint")
    write_jsonl_shards(df, out, 1)

    import gzip as _gz
    raw = b"".join(
        _gz.open(os.path.join(out, f), "rb").read()
        for f in sorted(os.listdir(out)) if f.endswith(".jsonl.gz"))
    assert b'"x":9007199254740993' in raw
    assert b'"a":[9007199254740993,null,-9007199254740993]' in raw
    back = {r.doc_id: r for r in
            spark.read.schema(df.schema).json(out).collect()}
    assert back[1].x == big and list(back[1].a) == [big, None, -big]
    assert back[2].x is None and back[2].a is None


def test_read_webdataset_on_corrupt(spark, tmp_path):
    """Helper-reader twin of the registered source's onCorrupt: fail
    loudly by default, drop the whole corrupt shard under 'skip'."""
    import os

    import pytest

    from kafka_elasticsearch_injector_spark.sinks.webdataset import (
        read_webdataset, write_webdataset,
    )

    docs = spark.createDataFrame([(i, f"t{i}") for i in range(12)],
                                 "doc_id long, text string")
    out = str(tmp_path / "wds")
    write_webdataset(docs, out, 3).collect()
    with open(os.path.join(out, "shard-00001.5.tar"), "wb") as f:
        f.write(b"garbage not tar")

    with pytest.raises(Exception, match="corrupt webdataset shard"):
        read_webdataset(spark, out).count()
    assert read_webdataset(spark, out, on_corrupt="skip").count() == 12
    with pytest.raises(ValueError, match="'fail' or 'skip'"):
        read_webdataset(spark, out, on_corrupt="maybe")

    # the drop is auditable: on_corrupt_log_dir leaves one durable
    # `<shard>.skipped` marker per dropped shard (shared _record_skip
    # with the registered source — same contract, same marker shape)
    skiplog = str(tmp_path / "skiplog")
    assert read_webdataset(spark, out, on_corrupt="skip",
                           on_corrupt_log_dir=skiplog).count() == 12
    marks = sorted(os.listdir(skiplog))
    assert len(marks) == 1
    assert marks[0].startswith("shard-00001.5.tar.")
    assert marks[0].endswith(".skipped")
    assert "shard-00001.5.tar" in open(
        os.path.join(skiplog, marks[0])).read()
