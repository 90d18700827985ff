"""The registered `format("webdataset")` Python data source (Spark 4
DataSource API): planning one partition per shard, Arrow-batch reads,
and row-for-row agreement with the binaryFile-based helper reader."""

from __future__ import annotations

import json

import pytest


@pytest.fixture()
def tar_export(spark, tmp_path):
    from kafka_elasticsearch_injector_spark.sinks.webdataset import (
        write_webdataset,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}", f"lang{i % 3}") for i in range(30)],
        "doc_id long, text string, lang string")
    out = str(tmp_path / "wds")
    write_webdataset(docs, out, 4,
                     members={"txt": "text", "lang": "lang"}).collect()
    return out


def _register(spark):
    from kafka_elasticsearch_injector_spark.sources.webdataset_source import (
        register_webdataset_source,
    )

    register_webdataset_source(spark)


def test_source_matches_helper_reader(spark, tar_export):
    from kafka_elasticsearch_injector_spark.sinks.webdataset import (
        read_webdataset,
    )

    _register(spark)
    members = {"txt": "text", "lang": "lang"}
    via_source = (spark.read.format("webdataset")
                  .option("members", json.dumps(members))
                  .load(tar_export))
    via_helper = read_webdataset(spark, tar_export, members=members)
    assert via_source.schema == via_helper.schema
    a = sorted(map(tuple, via_source.collect()))
    b = sorted(map(tuple, via_helper.collect()))
    assert a == b and len(a) == 30


def test_source_plans_one_partition_per_shard(spark, tar_export):
    _register(spark)
    df = spark.read.format("webdataset").load(tar_export)
    # 4 shards were written; planning must yield exactly 4 partitions.
    assert df.rdd.getNumPartitions() == 4
    # default members = {"txt": "text"}
    assert df.columns == ["shard", "key", "text"]
    assert df.count() == 30


def test_source_option_validation(spark, tar_export):
    _register(spark)
    with pytest.raises(Exception, match="members"):
        (spark.read.format("webdataset")
         .option("members", '"not-an-object"').load(tar_export).collect())
    with pytest.raises(Exception, match="no \\*\\.tar shards"):
        (spark.read.format("webdataset")
         .load(tar_export + "/empty-subdir").collect())


def test_source_column_pruning_still_returns_requested(spark, tar_export):
    """select() over the source (projection happens above the Python
    reader) — values must survive the Arrow handoff byte-exactly."""
    _register(spark)
    df = (spark.read.format("webdataset")
          .option("members", json.dumps({"txt": "text"}))
          .load(tar_export))
    got = {r.key: bytes(r.text) for r in df.select("key", "text").collect()}
    assert got[f"{7:012d}"] == b"text 7"
    assert len(got) == 30


def test_stream_reader_picks_up_new_shards(spark, tar_export, tmp_path):
    """readStream over the tar directory: batch 1 sees the initial
    export; a shard file appearing later (atomic rename, name above
    the watermark) arrives in a later batch exactly once."""
    import os
    import shutil
    import tarfile
    import time

    _register(spark)
    stream_dir = str(tmp_path / "stream")
    os.makedirs(stream_dir)
    for f in sorted(os.listdir(tar_export)):
        if f.endswith(".tar"):
            shutil.copy(os.path.join(tar_export, f),
                        os.path.join(stream_dir, f))

    seen: dict[int, list] = {}

    def sink(df, epoch_id):
        rows = df.collect()
        if rows:
            seen[epoch_id] = rows

    q = (spark.readStream.format("webdataset").load(stream_dir)
         .writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(processingTime="1 second").start())
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if sum(len(v) for v in seen.values()) >= 30:
                break
            time.sleep(0.5)
        assert sum(len(v) for v in seen.values()) == 30

        # publish one more shard ABOVE the watermark (atomic rename)
        extra_tmp = os.path.join(stream_dir, ".extra.tmp")
        with tarfile.open(extra_tmp, "w",
                          format=tarfile.USTAR_FORMAT) as tar:
            data = b"late sample"
            info = tarfile.TarInfo(name="999999999999.txt")
            info.size = len(data)
            import io as _io
            tar.addfile(info, _io.BytesIO(data))
        os.replace(extra_tmp, os.path.join(stream_dir, "shard-99999.tar"))

        deadline = time.time() + 60
        while time.time() < deadline:
            if sum(len(v) for v in seen.values()) >= 31:
                break
            time.sleep(0.5)
        total = [r for v in seen.values() for r in v]
        assert len(total) == 31
        late = [r for r in total if r.shard == "shard-99999.tar"]
        assert len(late) == 1 and bytes(late[0].text) == b"late sample"
    finally:
        q.stop()


def _publish_shard(stream_dir, name, key, payload):
    """Append-only atomic publish of a one-sample tar shard."""
    import io as _io
    import os
    import tarfile

    tmp = os.path.join(stream_dir, f".{name}.tmp")
    with tarfile.open(tmp, "w", format=tarfile.USTAR_FORMAT) as tar:
        info = tarfile.TarInfo(name=f"{key}.txt")
        info.size = len(payload)
        tar.addfile(info, _io.BytesIO(payload))
    os.replace(tmp, os.path.join(stream_dir, name))


def test_stream_reader_crash_recovery_no_reread(spark, tar_export,
                                                tmp_path):
    """r8 verdict item #3 — the tar analog of the injector pipeline's
    offset-commit e2e: stop the query after its offsets are committed,
    publish more shards while it is DOWN, restart from the SAME
    checkpoint. The restarted query must read exactly the shards
    published during the outage — every old shard skipped (watermark
    restored from the offset log, nothing re-read), none missed."""
    import os
    import shutil

    _register(spark)
    stream_dir = str(tmp_path / "stream")
    os.makedirs(stream_dir)
    for f in sorted(os.listdir(tar_export)):
        if f.endswith(".tar"):
            shutil.copy(os.path.join(tar_export, f),
                        os.path.join(stream_dir, f))
    ckpt = str(tmp_path / "ckpt")

    run1: list = []

    def sink1(df, epoch_id):
        run1.extend(df.collect())

    q1 = (spark.readStream.format("webdataset").load(stream_dir)
          .writeStream.foreachBatch(sink1)
          .option("checkpointLocation", ckpt).start())
    try:
        q1.processAllAvailable()       # drain AND commit the offsets
    finally:
        q1.stop()
    q1.awaitTermination(30)
    assert len(run1) == 30             # the initial 4-shard export

    # published while the query is down — two shards above, one BELOW
    # the committed watermark (the late-file case the producer
    # contract excludes: it must stay invisible, not resurrect)
    _publish_shard(stream_dir, "shard-90000.tar", "900000000000",
                   b"during outage A")
    _publish_shard(stream_dir, "shard-90001.tar", "900000000001",
                   b"during outage B")
    _publish_shard(stream_dir, "shard-00000.0.tar", "000000000099",
                   b"late below watermark")

    run2: list = []

    def sink2(df, epoch_id):
        run2.extend(df.collect())

    q2 = (spark.readStream.format("webdataset").load(stream_dir)
          .writeStream.foreachBatch(sink2)
          .option("checkpointLocation", ckpt).start())
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    q2.awaitTermination(30)

    got = sorted((r.shard, r.key, bytes(r.text)) for r in run2)
    assert got == [
        ("shard-90000.tar", "900000000000", b"during outage A"),
        ("shard-90001.tar", "900000000001", b"during outage B"),
    ], got                              # old shards NOT re-read
    # exactly-once across the restart: union of both runs covers every
    # contract-conforming sample exactly once
    all_keys = [r.key for r in run1] + [r[1] for r in got]
    assert len(all_keys) == len(set(all_keys)) == 32


def test_stream_max_shards_per_trigger(spark, tar_export, tmp_path):
    """Backpressure: shards published while the query runs must drain
    one per micro-batch under maxShardsPerTrigger=1 — each a separate
    epoch, every sample exactly once. (Each run's FIRST batch is
    unbounded — the Python stream API gives latestOffset no view of
    the committed start; documented on WebDatasetStreamReader.)"""
    import os
    import shutil

    _register(spark)
    stream_dir = str(tmp_path / "stream")
    os.makedirs(stream_dir)
    first = sorted(f for f in os.listdir(tar_export)
                   if f.endswith(".tar"))[0]
    shutil.copy(os.path.join(tar_export, first),
                os.path.join(stream_dir, first))

    batches: list[set] = []

    def sink(df, epoch_id):
        shards = {r.shard for r in df.collect()}
        if shards:
            batches.append(shards)

    q = (spark.readStream.format("webdataset")
         .option("maxShardsPerTrigger", "1").load(stream_dir)
         .writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    try:
        q.processAllAvailable()                    # drain the 1-shard start
        for i in range(4):                         # burst while running
            _publish_shard(stream_dir, f"shard-9000{i}.tar",
                           f"90000000000{i}", b"burst")
        q.processAllAvailable()
    finally:
        q.stop()
    q.awaitTermination(30)

    assert len(batches) >= 5, batches              # 1 + one per burst shard
    assert all(len(s) == 1 for s in batches), batches
    seen = [s for b in batches for s in b]
    assert len(seen) == len(set(seen)) == 5        # exactly once

    from kafka_elasticsearch_injector_spark.sources.webdataset_source import (
        WebDatasetStreamReader,
    )

    with __import__("pytest").raises(ValueError,
                                     match="maxShardsPerTrigger"):
        WebDatasetStreamReader({"path": stream_dir,
                                "maxshardspertrigger": "0"})


def test_on_corrupt_fail_and_skip(spark, tar_export, tmp_path):
    """A garbage .tar must fail the batch read loudly by default and
    be dropped whole under onCorrupt=skip (healthy shards unaffected);
    a stream with onCorrupt=skip advances past the poison shard."""
    import os
    import shutil

    _register(spark)
    d = str(tmp_path / "mix")
    os.makedirs(d)
    for f in sorted(os.listdir(tar_export)):
        if f.endswith(".tar"):
            shutil.copy(os.path.join(tar_export, f), os.path.join(d, f))
    with open(os.path.join(d, "shard-00002.5.tar"), "wb") as f:
        f.write(b"this is not a tar archive at all")

    with pytest.raises(Exception, match="corrupt webdataset shard"):
        spark.read.format("webdataset").load(d).count()

    # skip must be AUDITABLE: onCorruptLogDir collects one durable
    # `<shard>.skipped` marker per dropped shard (the side-manifest
    # analog of the reference's malformed side-drop metric,
    # src/kafka/consumer.go:154-159) — count markers = count of drops
    skiplog = str(tmp_path / "skiplog")
    ok = (spark.read.format("webdataset")
          .option("onCorrupt", "skip")
          .option("onCorruptLogDir", skiplog).load(d))
    assert ok.count() == 30                       # 4 healthy shards
    marks = sorted(os.listdir(skiplog))
    assert len(marks) == 1 and marks[0].endswith(".skipped")
    # <basename>.<hash8 of full path>.skipped — same-named shards from
    # different corpora sharing a log dir cannot collide
    assert marks[0].startswith("shard-00002.5.tar.")
    body = open(os.path.join(skiplog, marks[0])).read()
    assert "shard-00002.5.tar" in body and "\t" in body

    with pytest.raises(Exception, match="'fail' or 'skip'"):
        (spark.read.format("webdataset")
         .option("onCorrupt", "maybe").load(d).count())

    # stream: the poison shard must not wedge the watermark, and the
    # drop must leave the same durable marker
    streamlog = str(tmp_path / "streamlog")
    got: list = []
    q = (spark.readStream.format("webdataset")
         .option("onCorrupt", "skip")
         .option("onCorruptLogDir", streamlog).load(d)
         .writeStream.foreachBatch(lambda df, _: got.extend(df.collect()))
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    q.awaitTermination(30)
    assert len(got) == 30
    smarks = sorted(os.listdir(streamlog))
    assert len(smarks) == 1
    assert smarks[0].startswith("shard-00002.5.tar.")
    assert smarks[0].endswith(".skipped")


def test_record_skip_markers_collide_free_and_retry_idempotent(tmp_path):
    """Pure-unit contract of the skip audit: (a) same-named shards from
    DIFFERENT corpora sharing one log dir leave DISTINCT markers (the
    audit is len(*.skipped) — an overwrite would undercount); (b) a
    task retry of the SAME shard rewrites its marker, never adds a
    second (no double-count); (c) marker body carries path + error."""
    import os

    from kafka_elasticsearch_injector_spark.sources.webdataset_source import (
        _record_skip,
    )

    log = str(tmp_path / "log")
    err = ValueError("truncated header")
    _record_skip("/corpus_a/shard-00002.tar", err, log)
    _record_skip("/corpus_b/shard-00002.tar", err, log)      # same basename
    _record_skip("/corpus_a/shard-00002.tar", err, log)      # retry
    marks = sorted(os.listdir(log))
    assert len(marks) == 2, marks
    assert all(m.startswith("shard-00002.tar.") and m.endswith(".skipped")
               for m in marks)
    bodies = [open(os.path.join(log, m)).read() for m in marks]
    assert {b.split("\t")[0] for b in bodies} == {
        "/corpus_a/shard-00002.tar", "/corpus_b/shard-00002.tar"}
    assert all("truncated header" in b for b in bodies)
    # log_dir=None: logging-only path, nothing written anywhere
    _record_skip("/corpus_a/shard-00003.tar", err, None)
    assert sorted(os.listdir(log)) == marks


def test_appended_shards_offset_model_property(tmp_path):
    """Pure-unit generative guard on the shared stream base
    (sources/appended_shards.AppendedShardStreamReader): under random
    interleavings of publishes and latestOffset polls with a random
    maxShardsPerTrigger, (a) the returned watermark is monotone, (b)
    planning partitions() over consecutive offset pairs yields every
    published shard EXACTLY once, (c) the first poll answers unbounded
    (the restart-safety invariant), (d) once a batch has been planned,
    batches never exceed the cap, and (e) REPEATED polls with no batch
    planned in between are idempotent — the floor advances in
    partitions()/commit(), not per latestOffset answer, so a
    multi-poll engine cannot widen one batch by a cap-width per poll
    (the r10 ADVICE over-delivery hazard)."""
    import os
    import random

    from kafka_elasticsearch_injector_spark.sources.appended_shards import (
        AppendedShardStreamReader,
    )

    class _R(AppendedShardStreamReader):
        format_name = "probe"
        shard_glob = "*.bin"

    rng = random.Random(20260815)
    for trial in range(25):
        d = str(tmp_path / f"t{trial}")
        os.makedirs(d)
        cap = rng.choice([None, 1, 2, 3])
        opts = {"path": d}
        if cap:
            opts["maxshardspertrigger"] = str(cap)
        r = _R(opts)
        published: list[str] = []
        seen: list[str] = []
        last = r.initialOffset()
        planned_once = False

        def plan(lo, hi):
            return [os.path.basename(p.path)
                    for p in r.partitions(lo, hi) if p.path]

        for step in range(rng.randint(3, 12)):
            for _ in range(rng.randint(0, 4)):       # append-only burst
                name = f"shard-{len(published):05d}.bin"
                open(os.path.join(d, name), "wb").write(b"x")
                published.append(name)
            off = r.latestOffset()
            assert off["last"] >= last["last"]            # (a) monotone
            # (e) idempotent until a batch is planned: extra engine
            # polls must not widen the upcoming batch
            for _ in range(rng.randint(0, 2)):
                assert r.latestOffset() == off
            if not planned_once:
                # (c) unbounded until this run plans a batch: an
                # empty-directory poll must not establish the floor
                # (doing so could answer below a restart's committed
                # start — the documented watermark-regression hazard)
                if published:
                    assert off["last"] == published[-1]
            elif cap:
                batch = [n for n in published
                         if last["last"] < n <= off["last"]]
                pending = [n for n in published if n > last["last"]]
                if pending:                      # (d) steady-state cap
                    assert len(batch) <= cap
            seen.extend(plan(last, off))
            planned_once = planned_once or bool(published)
            if rng.random() < 0.5:
                r.commit(off)                    # commit also advances
            last = off
        # drain any capped backlog to the end
        for _ in range(len(published) + 1):
            off = r.latestOffset()
            seen.extend(plan(last, off))
            last = off
            if off["last"] == (published[-1] if published else ""):
                break
        assert seen == published, (trial, seen, published)   # (b)
