"""MMR diversification (stages/similarity.py::mmr_diversify) — greedy
selection cross-validated against an independent scalar transcription of
the Carbonell & Goldstein rule, plus a hand-built redundancy scenario."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from nadry_search_engine_be_ray.stages.similarity import mmr_diversify


def _emb_ds(vecs: np.ndarray):
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs],
                    pa.list_(pa.float32()),
                ),
            }
        )
    )


def _scalar_mmr(q, vecs, k, n_cand, lam):
    def cos(a, b):
        return round(
            float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))), 6
        )

    rel = [(cos(q, v), i) for i, v in enumerate(vecs)]
    cands = sorted(rel, key=lambda t: (-t[0], t[1]))[:n_cand]
    sel = []
    out = []
    for rank in range(1, min(k, len(cands)) + 1):
        best = None
        for c, i in cands:
            if i in sel:
                continue
            red = max((cos(vecs[i], vecs[j]) for j in sel), default=0.0)
            mmr = round(lam * c - (1 - lam) * red, 6)
            key = (-mmr, i)
            if best is None or key < best[0]:
                best = (key, i, mmr)
        sel.append(best[1])
        out.append((rank, best[1], best[2]))
    return out


def test_mmr_prefers_diversity(ray_session):
    q = np.array([1.0, 0.0, 0.0])
    vecs = np.array(
        [
            [0.9, 0.1, 0.0],   # 0: most relevant
            [0.9, 0.11, 0.0],  # 1: nearly identical to 0 -> redundant
            [0.8, 0.0, 0.6],   # 2: slightly less relevant but diverse
        ]
    )
    out = mmr_diversify(_emb_ds(vecs), q, k=2, n_candidates=3, lam=0.5)
    assert out["vec_id"].tolist() == [0, 2]  # diversity beats redundancy


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mmr_matches_scalar(ray_session, seed):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(40, 8))
    q = rng.normal(size=8)
    out = mmr_diversify(_emb_ds(vecs), q, k=5, n_candidates=12, lam=0.5)
    exp = _scalar_mmr(q, vecs, k=5, n_cand=12, lam=0.5)
    got = list(zip(out["rank"], out["vec_id"], out["mmr_score"]))
    for (r1, v1, s1), (r2, v2, s2) in zip(got, exp):
        assert (r1, v1) == (r2, v2), (got, exp)
        assert abs(s1 - s2) < 2e-6


def test_mmr_k_capped_by_candidates(ray_session):
    rng = np.random.default_rng(9)
    vecs = rng.normal(size=(4, 4))
    out = mmr_diversify(_emb_ds(vecs), rng.normal(size=4), k=10,
                        n_candidates=4)
    assert len(out) == 4
    assert out["rank"].tolist() == [1, 2, 3, 4]
