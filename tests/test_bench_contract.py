"""The bench stdout contract: ONE compact JSON line a tail-truncating
capture (~2 KB, truncating from the front) can always parse. The full
per-query dict broke this two rounds running — gate it permanently.
"""

from __future__ import annotations

import json

import pytest

import bench


def _fake_timings(n: int) -> dict[str, float]:
    return {f"q_generated_name_{i:04d}": round(0.1 + i * 0.01, 4)
            for i in range(n)}


def test_summary_is_one_parseable_compact_line():
    timings = _fake_timings(500)  # far beyond any real inventory size
    line = bench.build_summary(timings, 0.1)
    assert "\n" not in line
    assert len(line.encode()) <= bench.MAX_SUMMARY_BYTES, len(line)
    parsed = json.loads(line)
    assert parsed["metric"] == "declared_inventory_wall_clock"
    assert parsed["unit"] == "sec"
    assert parsed["n_queries"] == 500
    assert parsed["value"] == round(sum(timings.values()), 4)
    # per-query detail must NOT ride the stdout line
    assert len(parsed.get("queries", {})) <= len(bench.HEADLINE)


def test_summary_carries_headline_timings():
    timings = _fake_timings(10)
    timings.update({q: 1.5 for q in bench.HEADLINE})
    parsed = json.loads(bench.build_summary(timings, 0.01))
    assert parsed["queries"] == {q: 1.5 for q in bench.HEADLINE}
    assert parsed["sf"] == 0.01


def test_spread_flags_catch_one_off_stalls():
    runs = {
        "q_steady": [0.5, 0.52],          # normal jitter
        "q_stalled": [0.8, 7.9],          # the round-2 GC-stall shape
        "q_fast_both": [0.05, 0.12],      # small absolute spread — fine
        "q_single": [1.0],                # one run → nothing to compare
    }
    assert bench.spread_flags(runs) == ["q_stalled"]

def test_session_pins_throughput_gc():
    # -XX:+UseParallelGC on driver AND executors: under the JVM-default
    # G1 the full inventory benches ~18% slower and HOF-heavy plans
    # intermittently spike 2-4x from mixed collections (measured r4,
    # Java 17, sf0.1). The live session proves the flag survived
    # whatever builder refactor happened since.
    from kafka_elasticsearch_injector_spark.session import get_spark

    conf = get_spark("gc-contract").sparkContext.getConf()
    for key in ("spark.driver.extraJavaOptions",
                "spark.executor.extraJavaOptions"):
        assert "-XX:+UseParallelGC" in (conf.get(key, "") or ""), key


def _streaming_history() -> dict:
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_STREAMING.json")
    assert os.path.exists(path), (
        "BENCH_STREAMING.json is the committed streaming-throughput "
        "history + floor (r9 verdict: the streaming path was the only "
        "live surface without a durable regression gate) — run "
        "bench_streaming.py and commit the number each round")
    with open(path) as f:
        return json.load(f)


def test_streaming_bench_history_shape_and_floor():
    """The streaming analog of the batch bench gate: a committed
    per-round history must exist, every recorded round must clear the
    documented floor, and the floor itself must be a real number with
    a written rationale (not a placeholder)."""
    doc = _streaming_history()
    assert doc["metric"] == "injector_throughput"
    assert doc["unit"] == "records/sec"
    floor = doc["floor_records_per_sec"]
    assert isinstance(floor, (int, float)) and floor > 0
    assert len(doc.get("floor_rationale", "")) > 50
    hist = doc["history"]
    assert hist, "history must record at least one round"
    rounds = [h["round"] for h in hist]
    assert rounds == sorted(rounds) and len(set(rounds)) == len(rounds)
    for h in hist:
        assert h["records_per_sec"] >= floor, (
            f"round {h['round']} recorded {h['records_per_sec']} rec/s "
            f"below the committed floor {floor} — a regression was "
            "committed instead of investigated")
    # the floor must sit BELOW the record (it absorbs host scatter,
    # it doesn't chase the best run)
    assert floor <= max(h["records_per_sec"] for h in hist) * 0.75


def test_stream_throughput_smoke_floor(spark):
    """LIVE floor: run the real injector pipeline (bench_streaming.run)
    at reduced rows and require a very conservative throughput. The
    committed-history gate above only fires when someone remembers to
    re-measure; this one fails CI the day a per-row Python hot path or
    driver-side loop slips into the injector pipeline. Margins, from
    measurement (NOT the full-rows 150k number): at reduced rows the
    run is startup/trigger-dominated — ~23k rec/s at 100k rows, ~40k
    at 200k — so the floor sits at 8k: ~5x below the expected reduced-
    rows rate (host scatter on this box is ~2-3x, never 5x), while a
    real per-row regression lands 10-100x down at 0.4-4k and still
    trips it."""
    import bench_streaming

    res = bench_streaming.run(200_000)
    assert res["delivered"] == 200_000
    assert res["value"] >= 8_000, res


def test_gc_is_gated_on_workload_mode():
    # The throughput-GC pin is a BATCH choice; a streaming session must
    # not inherit it (ParallelGC full collections land as multi-second
    # micro-batch latency spikes on 8g+ heaps). Tested at the helper
    # level: getOrCreate() reuses the live JVM, so only the builder
    # inputs are observable per-mode.
    from kafka_elasticsearch_injector_spark.session import gc_java_options

    assert gc_java_options("batch") == "-XX:+UseParallelGC"
    assert gc_java_options("streaming") == ""
    with pytest.raises(ValueError):
        gc_java_options("interactive")


def test_bench_control_tail_percentiles_are_symmetric():
    """p10 must not degenerate to the minimum for small n, and the two
    tails must use the same estimator (r14 ADVICE: the old k//10-1
    index returned p0 for k<=19 and sat one rank low generally)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_control",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "bench_control.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    def runs(vals):
        return [{"queries": {f"q{i}": v for i, v in enumerate(vals)}}]

    control = runs([1.0] * 19)
    head = runs([0.5] + [1.0] * 17 + [2.0])
    out = mod.per_query_ratios(head, control)
    assert out["n_common"] == 19
    # exclusive-deciles estimator: both tails pull toward the extremes
    # symmetrically, and p10 > min (the old code returned exactly 0.5)
    assert out["p10"] > 0.5
    assert out["p90"] < 2.0
    assert abs((1.0 - out["p10"]) - (out["p90"] - 1.0)) < 1e-9
    # single-query edge: both tails defined, equal to the one ratio
    one = mod.per_query_ratios(runs([3.0]), runs([2.0]))
    assert one["p10"] == one["p90"] == 1.5
