"""Recall contracts for the approximate-nearest-neighbor family.

The sketch queries pin their estimate-mode error bounds; these pin the
ANN analog. Recall against a UNIFORM RANDOM corpus is meaningless (no
true neighbors exist — cosine concentrates near 0 and LSH rightly finds
little), so the primary contract uses PLANTED ground truth: each probe
vector gets TOP_K near-duplicates (cosine ≈ 0.99) seeded into the
corpus, and the approximate indexes must retrieve them. Everything is
deterministic (seeded data, md5-derived hyperplanes/codebooks), so the
thresholds are stable, not flaky."""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pytest

from data_pipeline_with_big_data_stack_spark.queries import QUERIES
from data_pipeline_with_big_data_stack_spark.queries.vector import N_QUERY_VECS, TOP_K


@pytest.fixture(scope="module")
def planted_sf_dir(tmp_path_factory):
    """2000 random 64-dim vectors; for each probe (vec_id < N_QUERY_VECS)
    TOP_K planted near-duplicates (probe + small noise) at known ids."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(2024)
    n, dim = 2000, 64
    vecs = rng.randn(n, dim).astype(np.float32)
    planted: dict[int, set[int]] = {}
    for q in range(N_QUERY_VECS):
        ids = set()
        for j in range(TOP_K):
            pid = 100 + q * TOP_K + j  # well away from the probe ids
            vecs[pid] = vecs[q] + rng.randn(dim).astype(np.float32) * 0.05
            ids.add(pid)
        planted[q] = ids
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(rng.randint(0, 10, n), pa.int32()),
        }
    )
    d = tmp_path_factory.mktemp("planted_emb")
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    return str(d), planted


def _tops(spark, name, sf):
    by_q = defaultdict(set)
    for r in QUERIES[name](spark, sf).collect():
        by_q[r.q_id].add(r.vec_id)
    return by_q


def test_brute_force_finds_all_planted(spark, planted_sf_dir):
    sf, planted = planted_sf_dir
    got = _tops(spark, "q_ann_cosine_topk", sf)
    for q, ids in planted.items():
        assert got[q] == ids, (q, got[q], ids)


def test_lsh_bucketed_recall_on_planted_neighbors(spark, planted_sf_dir):
    """A cosine≈0.99 neighbor flips a sign-LSH bit only when the probe's
    component is within noise of 0 (few % per bit) — recall on real
    near-duplicates must be high even though recall on uniform noise is
    inherently low."""
    sf, planted = planted_sf_dir
    got = _tops(spark, "q_ann_lsh_bucketed_topk", sf)
    recalls = [
        len(got.get(q, set()) & ids) / len(ids) for q, ids in planted.items()
    ]
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_ivf_recall_on_planted_neighbors(spark, planted_sf_dir):
    """Near-duplicates of the probe land in (or next to) the probe's
    coarse cell, so nprobe-bounded search must retrieve them."""
    sf, planted = planted_sf_dir
    got = _tops(spark, "q_ann_ivf_topk", sf)
    recalls = [
        len(got.get(q, set()) & ids) / len(ids) for q, ids in planted.items()
    ]
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_ivf_fixture_recall_floor(spark):
    """Regression floor on the real fixture (uniform corpus — the hard
    case): IVF with its registered nprobe must keep beating the
    random-baseline by a wide margin."""
    from tests.conftest import SF_CORRECTNESS

    exact = _tops(spark, "q_ann_cosine_topk", SF_CORRECTNESS)
    approx = _tops(spark, "q_ann_ivf_topk", SF_CORRECTNESS)
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_semdedup_removes_planted_twins(spark, planted_sf_dir):
    """SemDeDup contract on the same planted corpus: each probe's
    cosine≈0.99 twins sit (deterministically) in the probe's k-means
    cluster, so every twin must be removed with a same-group keeper
    (the probe or a lower-id twin) — cluster-then-cosine finds the
    planted semantic duplicates, not just the fixture's moderate-cosine
    neighbors the oracle checks."""
    removed = {
        r.vec_id: r.dup_of
        for r in QUERIES["q_semdedup_embeddings"](spark, planted_sf_dir[0]).collect()
    }
    for q, ids in planted_sf_dir[1].items():
        group = {q} | ids
        for pid in ids:
            assert pid in removed, (q, pid)
            assert removed[pid] in group, (pid, removed[pid], group)
