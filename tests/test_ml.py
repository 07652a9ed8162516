"""Tests for the ML model zoo, tuning and hierarchical clustering
(sits_spark/ml.py; reference surface /root/reference/R/sits_cluster.R,
R/sits_machine_learning.R, R/sits_tuning.R).

linkage_matrix has no scipy to compare against in this container, so it
is verified two ways: against a brute-force naive agglomerative
implementation written independently here (full distance-matrix
recompute from cluster membership each merge — O(n^4), fine at n<=40),
and against a hand-computed 4-point example.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sits_spark import api
from sits_spark.ml import (
    RandomForestModel,
    cluster_clean,
    cluster_dendro,
    cluster_frequency,
    cut_tree,
    linkage_matrix,
    tune,
)


# ---------------------------------------------------------- references


def _naive_linkage(X: np.ndarray, linkage: str) -> np.ndarray:
    """Independent O(n^4) agglomerative reference: clusters are member
    lists; inter-cluster distance recomputed from scratch each merge."""
    X = np.asarray(X, dtype=np.float64)
    n = len(X)

    def dist2(a: list[int], b: list[int]) -> float:
        d2 = ((X[a][:, None, :] - X[b][None, :, :]) ** 2).sum(axis=2)
        if linkage == "single":
            return d2.min()
        if linkage == "complete":
            return d2.max()
        if linkage == "average":
            return d2.mean()
        # ward.D2: between-cluster increase in squared error
        ca, cb = X[a].mean(axis=0), X[b].mean(axis=0)
        return (
            len(a) * len(b) / (len(a) + len(b)) * ((ca - cb) ** 2).sum() * 2.0
        )

    # NB: the ward expression above is scaled to match Lance-Williams on
    # squared Euclidean distances (factor 2 because leaf "distances" are
    # ||x-y||^2 = 2 * ESS increase for singletons).
    clusters: list[tuple[int, list[int]]] = [(i, [i]) for i in range(n)]
    Z = np.zeros((n - 1, 4))
    for m in range(n - 1):
        best = (np.inf, -1, -1)
        for i in range(len(clusters)):
            for j in range(i + 1, len(clusters)):
                d = dist2(clusters[i][1], clusters[j][1])
                if d < best[0] - 1e-12:
                    best = (d, i, j)
        d, i, j = best
        (na, ma), (nb, mb) = clusters[i], clusters[j]
        a, b = (na, nb) if na < nb else (nb, na)
        Z[m] = [a, b, np.sqrt(d), len(ma) + len(mb)]
        clusters = (
            [c for k, c in enumerate(clusters) if k not in (i, j)]
            + [(n + m, ma + mb)]
        )
    return Z


def _lcg_points(n: int, d: int, seed: int = 7) -> np.ndarray:
    """Deterministic pseudo-random points without np.random state."""
    x = seed
    out = np.empty(n * d)
    for i in range(n * d):
        x = (x * 1664525 + 1013904223) % (1 << 32)
        out[i] = (x / (1 << 32)) * 10.0 - 5.0
    return out.reshape(n, d)


# ------------------------------------------------------------- linkage


@pytest.mark.parametrize("linkage", ["single", "complete", "average", "ward"])
def test_linkage_matches_naive_reference(linkage):
    X = _lcg_points(24, 3)
    Z = linkage_matrix(X, linkage=linkage)
    Zn = _naive_linkage(X, linkage)
    # merge heights must agree exactly-ish; merge partners must agree as
    # sets at every step (ids can differ only on exact ties, which the
    # LCG points do not produce)
    np.testing.assert_allclose(Z[:, 2], Zn[:, 2], rtol=1e-9)
    np.testing.assert_array_equal(Z[:, :2], Zn[:, :2])
    np.testing.assert_array_equal(Z[:, 3], Zn[:, 3])


def test_linkage_hand_example():
    # 1-D points 0, 1, 5, 7 — single linkage merges (0,1)@1, (5,7)@2,
    # then the two pairs at gap 4
    X = np.array([[0.0], [1.0], [5.0], [7.0]])
    Z = linkage_matrix(X, linkage="single")
    np.testing.assert_allclose(Z[:, 2], [1.0, 2.0, 4.0])
    assert Z[0][:2].tolist() == [0, 1]
    assert Z[1][:2].tolist() == [2, 3]
    assert Z[2][:2].tolist() == [4, 5]


def test_linkage_validates():
    with pytest.raises(ValueError):
        linkage_matrix(np.zeros((5, 2)), linkage="median")
    with pytest.raises(ValueError):
        linkage_matrix(np.zeros((1, 2)))


def test_cut_tree_k_and_height():
    X = np.array([[0.0], [1.0], [5.0], [7.0]])
    Z = linkage_matrix(X, linkage="single")
    np.testing.assert_array_equal(cut_tree(Z, 4, k=2), [0, 0, 1, 1])
    np.testing.assert_array_equal(cut_tree(Z, 4, k=4), [0, 1, 2, 3])
    # height cut between 2 and 4 -> same as k=2
    np.testing.assert_array_equal(cut_tree(Z, 4, height=3.0), [0, 0, 1, 1])
    with pytest.raises(ValueError):
        cut_tree(Z, 4)
    with pytest.raises(ValueError):
        cut_tree(Z, 4, k=2, height=1.0)
    # labels are renumbered in first-leaf order: leaf 0 always cluster 0
    assert cut_tree(Z, 4, k=3)[0] == 0


# ----------------------------------------------------------- verbs


def _toy_embeddings(spark, n=120, d=4):
    """3 well-separated blobs with one 'mislabeled' row per blob."""
    rows = []
    centers = np.eye(3, d) * 10.0
    pts = _lcg_points(n, d, seed=11) * 0.1
    for i in range(n):
        g = i % 3
        v = centers[g] + pts[i]
        label = f"c{g}" if i >= 9 else f"c{(g + 1) % 3}"  # first 9 mislabeled
        rows.append((i, [float(x) for x in v], label))
    return spark.createDataFrame(
        rows, "vec_id int, embedding array<double>, label string"
    )


def test_cluster_dendro_recovers_blobs(spark):
    df = _toy_embeddings(spark)
    out = cluster_dendro(df, "embedding", "vec_id", k=3, sample_cap=60)
    pdf = out.toPandas()
    assert set(pdf.columns) == set(df.columns) | {"cluster", "cdist"}
    assert pdf["cluster"].nunique() == 3
    # every geometric blob lands in ONE cluster (ignoring label noise)
    pdf["blob"] = pdf["vec_id"] % 3
    assert (pdf.groupby("blob")["cluster"].nunique() == 1).all()
    # and distances to the nearest sample member are small vs blob sep
    assert pdf["cdist"].max() < 3.0
    # deterministic: second run identical
    pdf2 = (
        cluster_dendro(df, "embedding", "vec_id", k=3, sample_cap=60)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        pdf.drop(columns="blob").sort_values("vec_id").reset_index(drop=True),
        pdf2,
    )


def test_cluster_frequency_and_clean(spark):
    df = _toy_embeddings(spark)
    clustered = cluster_dendro(df, "embedding", "vec_id", k=3, sample_cap=60)
    clustered.persist()
    try:
        freq = cluster_frequency(clustered, "label").toPandas()
        # per-cluster fractions sum to 1
        s = freq.groupby("cluster")["frac"].sum()
        assert ((s - 1.0).abs() < 1e-6).all()
        cleaned = cluster_clean(clustered, "label")
        n_before = clustered.count()
        n_after = cleaned.count()
        # exactly the 9 mislabeled rows (3 per blob) are dropped
        assert n_before - n_after == 9
        # cleaned clusters are pure
        purity = (
            cluster_frequency(cleaned, "label")
            .groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("nl"))
            .toPandas()
        )
        assert (purity["nl"] == 1).all()
    finally:
        clustered.unpersist()


# ------------------------------------------------- random forest + tune


def _toy_predictors(spark, n=200):
    pts = _lcg_points(n, 2, seed=23)
    rows = [
        (i, float(p[0]), float(p[1]), "pos" if p[0] + p[1] > 0 else "neg")
        for i, p in enumerate(pts)
    ]
    return spark.createDataFrame(rows, "sid int, f1 double, f2 double, label string")


def test_random_forest_classify_seam(spark):
    df = _toy_predictors(spark)
    model = RandomForestModel.fit(
        df, ["f1", "f2"], "label", num_trees=20, max_depth=5, seed=1
    )
    assert model.classes == ["neg", "pos"]  # sorted vocabulary
    scored = api.classify(df, model, ["f1", "f2"]).toPandas()
    assert {"p_neg", "p_pos", "predicted"} <= set(scored.columns)
    # separable toy -> near-perfect train accuracy through the seam
    acc = (scored["predicted"] == scored["label"]).mean()
    assert acc > 0.97
    # probabilities are normalized
    assert ((scored["p_neg"] + scored["p_pos"] - 1.0).abs() < 1e-5).all()
    # deterministic with a fixed seed: same predictions on refit
    model2 = RandomForestModel.fit(
        df, ["f1", "f2"], "label", num_trees=20, max_depth=5, seed=1
    )
    scored2 = api.classify(df, model2, ["f1", "f2"]).toPandas()
    pd.testing.assert_frame_equal(
        scored.sort_values("sid").reset_index(drop=True),
        scored2.sort_values("sid").reset_index(drop=True),
    )


def test_random_forest_kfold(spark):
    df = _toy_predictors(spark)

    def fit(pdf: pd.DataFrame):
        return RandomForestModel.fit(
            pdf, ["f1", "f2"], "label", num_trees=15, max_depth=4, seed=3
        )

    folds = api.validate_kfold(df, 3, ["sid"], fit, ["f1", "f2"], "label")
    pdf = folds.toPandas()
    assert len(pdf) == 3
    assert pdf["n"].sum() == 200
    assert (pdf["accuracy"] > 0.9).all()


def test_tune_selects_best_grid_point(spark):
    df = _toy_predictors(spark)

    def factory(max_depth: int):
        def fit(pdf: pd.DataFrame):
            return RandomForestModel.fit(
                pdf, ["f1", "f2"], "label",
                num_trees=10, max_depth=max_depth, seed=5,
            )

        return fit

    grid = [{"max_depth": 1}, {"max_depth": 5}]
    out = tune(
        df, 3, ["sid"], factory, grid, ["f1", "f2"], "label"
    ).toPandas()
    assert list(out.columns) == ["grid_idx", "params", "n", "accuracy"]
    assert len(out) == 2
    # best-first ordering; the deeper forest must not score worse than
    # a depth-1 stump on a diagonal boundary
    assert out.iloc[0]["accuracy"] >= out.iloc[1]["accuracy"]
    assert out.iloc[0]["params"] == '{"max_depth": 5}'
    # paired folds -> rerun reproduces exactly
    out2 = tune(df, 3, ["sid"], factory, grid, ["f1", "f2"], "label").toPandas()
    pd.testing.assert_frame_equal(out, out2)


# --------------------------------------------- dedup group assignment


def test_dedup_groups_closure_invariants(spark):
    """doc_dedup_groups: transitive-closure semantics over the LSH
    candidate graph — every candidate pair lands in the same group, the
    group id is the member minimum, sizes are consistent, and docs with
    no pairs are singletons."""
    from sits_spark.queries import doc_dedup_groups, doc_minhash_lsh

    sf = "/root/testdata/sf0.01"
    groups = {
        r.doc_id: (r.group_id, r.group_size)
        for r in doc_dedup_groups(spark, sf).collect()
    }
    pairs = [(r.doc_a, r.doc_b) for r in doc_minhash_lsh(spark, sf).collect()]
    assert pairs, "fixture should produce candidate pairs"
    for a, b in pairs:
        assert groups[a][0] == groups[b][0], (a, b)
    # group id = min member; size = member count
    from collections import defaultdict

    members = defaultdict(list)
    for d, (g, _s) in groups.items():
        members[g].append(d)
    for g, ms in members.items():
        assert g == min(ms)
        for d in ms:
            assert groups[d][1] == len(ms)
    # at least one non-trivial group and at least one singleton
    sizes = sorted(len(m) for m in members.values())
    assert sizes[0] == 1 and sizes[-1] > 1


# ------------------------------------------------------------------ MLP


def _circle_data(spark, n=300):
    """Radially-separable labels — a linear model cannot fit this."""
    pts = _lcg_points(n, 2, seed=31)  # in [-5, 5]^2
    rows = [
        (i, float(p[0]), float(p[1]),
         "in" if p[0] * p[0] + p[1] * p[1] < 8.0 else "out")
        for i, p in enumerate(pts)
    ]
    return spark.createDataFrame(rows, "sid int, f1 double, f2 double, label string")


def test_mlp_beats_linear_on_radial_boundary(spark):
    from sits_spark.ml import MLPModel

    df = _circle_data(spark)
    mlp = MLPModel.fit(df, ["f1", "f2"], "label", layers=(24,), epochs=400, seed=9)
    assert mlp.classes == ["in", "out"]
    scored = api.classify(df, mlp, ["f1", "f2"]).toPandas()
    acc = (scored["predicted"] == scored["label"]).mean()
    assert acc > 0.95, acc
    # the linear fixture cannot exceed the majority-class rate by much
    import numpy as np

    lin = api.LinearSoftmaxModel(["in", "out"], [[0.3, -0.2], [-0.1, 0.4]], [0.0, 0.0])
    lin_scored = api.classify(df, lin, ["f1", "f2"]).toPandas()
    lin_acc = (lin_scored["predicted"] == lin_scored["label"]).mean()
    assert acc > lin_acc + 0.15
    # deterministic refit
    mlp2 = MLPModel.fit(df, ["f1", "f2"], "label", layers=(24,), epochs=400, seed=9)
    np.testing.assert_array_equal(
        mlp.predict_proba(np.array([[1.0, 2.0], [-3.0, 0.5]])),
        mlp2.predict_proba(np.array([[1.0, 2.0], [-3.0, 0.5]])),
    )


def test_mlp_sample_cap(spark):
    from sits_spark.ml import MLPModel

    df = _circle_data(spark, n=50)
    with pytest.raises(ValueError, match="sample_cap"):
        MLPModel.fit(df, ["f1", "f2"], "label", sample_cap=10)


# ------------------------------------------------- active-learning picks


def test_uncertainty_sampling_nms_and_topn(spark):
    """Window-local maxima only, threshold applied, top-n deterministic."""
    rows = []
    series = {
        "a": [0.1, 0.9, 0.2, 0.3, 0.85, 0.1],  # two local peaks
        "b": [0.5, 0.95, 0.5, 0.2, 0.2, 0.2],  # one peak
        "c": [0.3, 0.35, 0.3, 0.3, 0.3, 0.3],  # below threshold
    }
    for k, vals in series.items():
        rows += [(k, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "conv_id string, ts int, uncert double")
    got = api.uncertainty_sampling(
        df, "conv_id", "ts", "uncert", n=2, min_uncert=0.4, window=2
    ).collect()
    picked = [(r.conv_id, r.ts, r.uncert) for r in got]
    # top-2 by uncertainty: b@1 (0.95) then a@1 (0.9); a@4 excluded by n
    assert picked == [("b", 1, 0.95), ("a", 1, 0.9)]
    # widen n: a@4 is a local max within +-2 and above threshold
    got3 = api.uncertainty_sampling(
        df, "conv_id", "ts", "uncert", n=5, min_uncert=0.4, window=2
    ).collect()
    assert ("a", 4, 0.85) in [(r.conv_id, r.ts, r.uncert) for r in got3]
    # series c never appears (below min_uncert)
    assert all(r.conv_id != "c" for r in got3)


def test_confidence_sampling_per_class(spark):
    rows = [
        # conv, ts, p_x, p_y  (margin = |p_x - p_y| here)
        ("a", 0, 0.9, 0.1),   # confident x, local max
        ("a", 1, 0.8, 0.2),   # suppressed by a@0 within window
        ("a", 2, 0.2, 0.8),   # confident y
        ("b", 0, 0.55, 0.45), # margin 0.1 < 0.5 -> excluded
        ("b", 1, 0.05, 0.95), # confident y, best
    ]
    df = spark.createDataFrame(rows, "conv_id string, ts int, p_x double, p_y double")
    got = api.confidence_sampling(
        df, "conv_id", "ts", ["p_x", "p_y"], n_per_class=1, min_margin=0.5, window=3
    ).collect()
    by_label = {r.sampled_label: (r.conv_id, r.ts) for r in got}
    assert by_label == {"p_x": ("a", 0), "p_y": ("b", 1)}
    assert all(r.sampled_margin >= 0.5 for r in got)
