"""Similarity-search operator unit tests (operators/similarity.py).

The oracle queries pin ivf/lsh at fixed parameters; these tests cover
the parts the oracles can't: the nprobe recall dial and exactness at
full cell coverage.
"""

from __future__ import annotations

import math

import pytest

from kafka_elasticsearch_injector_spark.operators import similarity as S

DIM = 4
N_CELLS = 4


def _corpus(spark):
    rows = []
    for i in range(60):
        vec = [math.sin(i * 1.7 + d) for d in range(DIM)]
        rows.append((i, vec, i % N_CELLS))
    return rows, spark.createDataFrame(
        rows, f"vec_id int, embedding array<float>, label int")


def _brute_topk(rows, probe_ids, k):
    import numpy as np

    vecs = {i: np.array(v, dtype=np.float32).astype(np.float64)
            for i, v, _ in rows}

    def cos(a, b):
        return float(vecs[a] @ vecs[b]
                     / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b])))

    out = {}
    for p in probe_ids:
        scored = sorted(
            ((cos(p, o), o) for o in vecs if o != p),
            key=lambda t: (-t[0], t[1]))
        out[p] = [o for _, o in scored[:k]]
    return out


def test_ivf_nprobe_full_coverage_is_exact(spark):
    rows, df = _corpus(spark)
    got = S.ivf_topk(df, probe_ids=[0, 1, 2], k=3, nprobe=N_CELLS, dim=DIM)
    by_probe: dict[int, list[int]] = {}
    for r in sorted(got.collect(), key=lambda r: (r.probe_id, r.rn)):
        by_probe.setdefault(r.probe_id, []).append(r.vec_id)
    assert by_probe == _brute_topk(rows, [0, 1, 2], 3)


def test_ivf_nprobe_recall_monotone(spark):
    _, df = _corpus(spark)

    def best(nprobe):
        return {
            r.probe_id: r.cos_sim
            for r in S.ivf_topk(df, probe_ids=[0, 1, 2], k=1,
                                nprobe=nprobe, dim=DIM).collect()
            if r.rn == 1
        }

    b1, b2, b4 = best(1), best(2), best(N_CELLS)
    for p in b1:
        assert b1[p] <= b2[p] <= b4[p]  # wider scan never worsens recall
