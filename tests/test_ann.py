"""Banded sign-LSH ANN: recall floor vs the exact yardstick, and the
candidate-pair bound that makes it the 100 TB path (VERDICT r2 #4)."""

import numpy as np
import duckdb
import pytest

from sits_spark import queries

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def vectors():
    emb = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet' ORDER BY vec_id"
    ).fetchnumpy()
    V = np.stack([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
    return emb["vec_id"], V


def test_planes_distinct():
    """The plane family must not be periodic in j (a closed-form pattern
    used before round 3 had period 5, collapsing 8 bits to 5)."""
    planes = {tuple(queries._plane(j)) for j in range(queries._N_PLANES)}
    assert len(planes) == queries._N_PLANES


def test_candidate_pairs_bounded(vectors):
    """OR'd bands generate a small fraction of all pairs — the equi-join
    candidate set stays ~bands * n^2 / 2^bits, not n^2."""
    _, V = vectors
    n = len(V)
    Q = np.floor(V * queries._ANN_QSCALE + 0.5)
    pairs = set()
    for b in range(queries._ANN_BANDS):
        key = np.zeros(n, dtype=np.int64)
        for k in range(queries._ANN_BITS):
            p = np.array(queries._plane(b * queries._ANN_BITS + k))
            key += (Q @ p > 0).astype(np.int64) << k
        order = np.argsort(key)
        for g in np.split(order, np.flatnonzero(np.diff(key[order])) + 1):
            for i in range(len(g)):
                for j in range(i + 1, len(g)):
                    pairs.add((min(g[i], g[j]), max(g[i], g[j])))
    frac = len(pairs) / (n * (n - 1) / 2)
    assert frac < 0.05, frac


def test_ann_recall_floor_vs_exact_knn(spark, vectors):
    """Banded ANN must keep a recall floor vs brute-force cosine top-5 on
    this near-random corpus (high-cosine near-dup recall is far higher —
    per-band collision ~ (1 - theta/pi)^bits)."""
    exact = {
        (r.query_id, r.neighbor_id)
        for r in queries.emb_knn_cosine(spark, SF_DIR).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in queries.emb_ann_lsh_topk(spark, SF_DIR).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.08, recall
