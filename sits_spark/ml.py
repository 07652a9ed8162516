"""ML model zoo + tuning + hierarchical sample clustering.

Spark-first re-expression of the reference's model/QA toolkit:

- ``RandomForestModel`` — the reference's default classifier
  (``sits_rfor``, /root/reference/R/sits_machine_learning.R:45, ranger
  backend trained single-node on the samples tibble). Here training is
  DISTRIBUTED (pyspark.ml RandomForestClassifier over the predictors
  pivot) and inference never leaves the JVM: ``api.classify`` routes any
  model exposing ``transform_classify`` through a native
  VectorAssembler -> model.transform -> vector_to_array plan — zero
  Python in the scoring path (one step past the Arrow seam used for
  driver-side closures).
- ``tune`` — deterministic grid search scored by k-fold accuracy
  (``sits_tuning``, /root/reference/R/sits_tuning.R:95 random-searches
  hyperparams against a validation split; the grid here is explicit so
  results replay exactly).
- ``cluster_dendro`` / ``cluster_frequency`` / ``cluster_clean`` —
  hierarchical agglomerative sample QA (``sits_cluster_dendro`` et al.,
  /root/reference/R/sits_cluster.R:59,141,177; dendrogram built by
  dtwclust/hclust, cut by cutree). The linkage matrix is built
  driver-side over a bounded deterministic sample (the reference also
  clusters the sample tibble, never the cube), then every remaining row
  is assigned DISTRIBUTED to the cluster of its nearest sample member —
  one Arrow gemm per batch, same shape as ``api.som_map``.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "RandomForestModel",
    "MLPModel",
    "tune",
    "linkage_matrix",
    "cut_tree",
    "cluster_dendro",
    "cluster_frequency",
    "cluster_clean",
]


# ------------------------------------------------------ random forest


class RandomForestModel:
    """Spark-ML random forest behind the ``api.classify`` seam.

    ``fit`` accepts either a DataFrame or a pandas frame (the shape
    ``validate_kfold``'s fold-fit closure passes) — pandas input is
    round-tripped through the active SparkSession, so the same factory
    works in both places. Class order is the sorted label vocabulary
    (deterministic; mirrors ranger's factor-level ordering on sorted
    levels), and the label index is built with a plain CASE chain so no
    fitted StringIndexer state needs to ship anywhere."""

    def __init__(self, spark_model, classes: Sequence[str], feature_cols: Sequence[str]):
        self.spark_model = spark_model
        self.classes = list(classes)
        self.feature_cols = list(feature_cols)

    @classmethod
    def fit(
        cls,
        df: "DataFrame | pd.DataFrame",
        feature_cols: Sequence[str],
        label_col: str,
        num_trees: int = 100,
        max_depth: int = 8,
        seed: int = 42,
    ) -> "RandomForestModel":
        from pyspark.ml.classification import RandomForestClassifier
        from pyspark.ml.feature import VectorAssembler

        if isinstance(df, pd.DataFrame):
            spark = SparkSession.getActiveSession()
            if spark is None:
                raise RuntimeError("RandomForestModel.fit(pandas) needs an active SparkSession")
            df = spark.createDataFrame(df)
        feature_cols = list(feature_cols)
        classes = sorted(
            str(r[0]) for r in df.select(label_col).distinct().collect()
        )
        li = F.lit(None).cast("double")
        for i, c in reversed(list(enumerate(classes))):
            li = F.when(F.col(label_col).cast("string") == c, float(i)).otherwise(li)
        assembled = VectorAssembler(
            inputCols=feature_cols, outputCol="_fv"
        ).transform(df.withColumn("_li", li))
        rf = RandomForestClassifier(
            featuresCol="_fv",
            labelCol="_li",
            probabilityCol="_prob",
            rawPredictionCol="_raw",
            predictionCol="_pred_idx",
            numTrees=num_trees,
            maxDepth=max_depth,
            seed=seed,
        )
        return cls(rf.fit(assembled), classes, feature_cols)

    def transform_classify(
        self,
        df: DataFrame,
        feature_cols: Sequence[str],
        out_prefix: str = "p_",
        label_col: str | None = "predicted",
    ) -> DataFrame:
        """Native scoring plan: assemble -> forest transform ->
        vector_to_array -> per-class probability columns (+ argmax
        label). Output schema matches the Arrow ``classify`` path:
        input columns, then ``p_<class>`` rounded to 6, then the label
        (ties -> first class, same as which.max / np.argmax)."""
        from pyspark.ml.feature import VectorAssembler
        from pyspark.ml.functions import vector_to_array

        feature_cols = list(feature_cols) or self.feature_cols
        in_cols = df.columns
        assembled = VectorAssembler(
            inputCols=feature_cols, outputCol="_fv"
        ).transform(df)
        scored = self.spark_model.transform(assembled)
        parr = vector_to_array(F.col("_prob"))
        out_cols = [F.col(c) for c in in_cols] + [
            F.round(parr[i], 6).alias(f"{out_prefix}{c}")
            for i, c in enumerate(self.classes)
        ]
        if label_col:
            lbl = F.array(*[F.lit(c) for c in self.classes])[
                F.col("_pred_idx").cast("int")
            ]
            out_cols.append(lbl.alias(label_col))
        return scored.select(*out_cols)


class MLPModel:
    """Multi-layer perceptron through the classify seam (``sits_mlp``,
    /root/reference/R/sits_mlp.R — the reference trains a torch MLP
    single-node on the samples tibble; torch is absent here, so this is
    a from-scratch numpy MLP with the same deployment shape): ReLU
    hidden layers + softmax output, full-batch Adam with L2, features
    standardized by training stats, deterministic seeded init. ``fit``
    runs driver-side on the (sample-sized) predictors frame exactly
    like the reference; scoring is distributed via ``api.classify``'s
    Arrow path (the ``classes``/``predict_proba`` protocol)."""

    def __init__(self, classes, feature_cols, params, mu, sd):
        self.classes = list(classes)
        self.feature_cols = list(feature_cols)
        self._params = params  # [(W, b), ...] per layer
        self._mu = mu
        self._sd = sd

    @classmethod
    def fit(
        cls,
        df: "DataFrame | pd.DataFrame",
        feature_cols: Sequence[str],
        label_col: str,
        layers: Sequence[int] = (32,),
        epochs: int = 300,
        lr: float = 0.01,
        l2: float = 1e-4,
        seed: int = 42,
        sample_cap: int = 100_000,
    ) -> "MLPModel":
        if isinstance(df, DataFrame):
            n_rows = df.count()
            if n_rows > sample_cap:
                raise ValueError(
                    f"MLPModel.fit trains driver-side; frame has {n_rows}"
                    f" rows > sample_cap={sample_cap}. Sample first or"
                    " raise sample_cap explicitly."
                )
            pdf = df.select(*feature_cols, label_col).toPandas()
        else:
            pdf = df
        feature_cols = list(feature_cols)
        classes = sorted(pdf[label_col].astype(str).unique())
        cidx = {c: i for i, c in enumerate(classes)}
        X = pdf[feature_cols].to_numpy(dtype=np.float64)
        y = np.array([cidx[str(v)] for v in pdf[label_col]])
        mu = X.mean(axis=0)
        sd = np.maximum(X.std(axis=0), 1e-9)
        Xs = (X - mu) / sd
        rng = np.random.default_rng(seed)
        dims = [len(feature_cols), *layers, len(classes)]
        params = [
            (
                rng.normal(0.0, np.sqrt(2.0 / dims[i]), (dims[i], dims[i + 1])),
                np.zeros(dims[i + 1]),
            )
            for i in range(len(dims) - 1)
        ]
        Y = np.zeros((len(y), len(classes)))
        Y[np.arange(len(y)), y] = 1.0
        # full-batch Adam (deterministic: no minibatch shuffling)
        m_t = [(np.zeros_like(W), np.zeros_like(b)) for W, b in params]
        v_t = [(np.zeros_like(W), np.zeros_like(b)) for W, b in params]
        b1, b2, eps = 0.9, 0.999, 1e-8
        n = len(Xs)
        for t in range(1, epochs + 1):
            acts = [Xs]
            for li, (W, b) in enumerate(params):
                z = acts[-1] @ W + b
                acts.append(np.maximum(z, 0.0) if li < len(params) - 1 else z)
            logits = acts[-1]
            mx = logits.max(axis=1, keepdims=True)
            e = np.exp(logits - mx)
            probs = e / e.sum(axis=1, keepdims=True)
            delta = (probs - Y) / n
            grads = []
            for li in range(len(params) - 1, -1, -1):
                W, _b = params[li]
                gW = acts[li].T @ delta + l2 * W
                gb = delta.sum(axis=0)
                grads.append((gW, gb))
                if li > 0:
                    delta = (delta @ W.T) * (acts[li] > 0)
            grads.reverse()
            for li, ((gW, gb), (W, b)) in enumerate(zip(grads, params)):
                mW, mb = m_t[li]
                vW, vb = v_t[li]
                mW = b1 * mW + (1 - b1) * gW
                mb = b1 * mb + (1 - b1) * gb
                vW = b2 * vW + (1 - b2) * gW**2
                vb = b2 * vb + (1 - b2) * gb**2
                m_t[li], v_t[li] = (mW, mb), (vW, vb)
                mhW, mhb = mW / (1 - b1**t), mb / (1 - b1**t)
                vhW, vhb = vW / (1 - b2**t), vb / (1 - b2**t)
                params[li] = (
                    W - lr * mhW / (np.sqrt(vhW) + eps),
                    b - lr * mhb / (np.sqrt(vhb) + eps),
                )
        return cls(classes, feature_cols, params, mu, sd)

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        a = (np.asarray(X, dtype=np.float64) - self._mu) / self._sd
        for li, (W, b) in enumerate(self._params):
            z = a @ W + b
            a = np.maximum(z, 0.0) if li < len(self._params) - 1 else z
        mx = a.max(axis=1, keepdims=True)
        e = np.exp(a - mx)
        return e / e.sum(axis=1, keepdims=True)


# -------------------------------------------------------------- tuning


def tune(
    df: DataFrame,
    k: int,
    key_cols: Sequence[str],
    fit_factory,
    grid: Sequence[Mapping[str, object]],
    feature_cols: Sequence[str],
    label_col: str,
    sample_cap: int = 100_000,
) -> DataFrame:
    """Deterministic hyperparameter grid search (sits_tuning,
    /root/reference/R/sits_tuning.R:95): every grid point is scored by
    k-fold overall accuracy (``api.validate_kfold`` — same deterministic
    hash folds for every candidate, so the comparison is paired), and
    the result frame is ordered best-first with ties broken by grid
    position. ``fit_factory(**params)`` must return a fold-fit callable
    ``pandas -> model``. The grid loop is a driver loop over a handful
    of candidates; each candidate's scoring is distributed."""
    import json

    from . import api

    results = []
    for i, params in enumerate(grid):
        folds = api.validate_kfold(
            df, k, key_cols, fit_factory(**params), feature_cols, label_col,
            sample_cap=sample_cap,
        ).collect()
        n = sum(r.n for r in folds)
        hits = sum(r.hits for r in folds)
        acc = round(hits / n, 6) if n else 0.0
        results.append((i, json.dumps(dict(params), sort_keys=True), n, acc))
    spark = df.sparkSession
    out = spark.createDataFrame(
        results, "grid_idx int, params string, n long, accuracy double"
    )
    return out.orderBy(F.desc("accuracy"), F.asc("grid_idx"))


# ------------------------------------------- hierarchical clustering


_LINKAGES = ("single", "complete", "average", "ward")


def linkage_matrix(X: np.ndarray, linkage: str = "ward") -> np.ndarray:
    """Agglomerative linkage over a sample matrix — scipy-free
    Lance-Williams recurrence (scipy is absent in this container).
    Returns the standard (n-1, 4) merge table [id_a, id_b, height,
    size]: leaves are 0..n-1, merge i creates node n+i. Heights are
    Euclidean distances (ward: sqrt of the Lance-Williams d2 chain,
    matching hclust's ward.D2 — the reference default,
    /root/reference/R/sits_cluster.R:62). Tie-break: smallest (i, j)
    pair wins, so the dendrogram is deterministic."""
    if linkage not in _LINKAGES:
        raise ValueError(f"linkage must be one of {_LINKAGES}")
    X = np.asarray(X, dtype=np.float64)
    n = len(X)
    if n < 2:
        raise ValueError("need at least 2 samples to cluster")
    sq = (X**2).sum(axis=1)
    D = sq[:, None] - 2.0 * X @ X.T + sq[None, :]
    np.maximum(D, 0.0, out=D)  # d^2 between current clusters
    np.fill_diagonal(D, np.inf)
    size = np.ones(n)
    node = np.arange(n)  # dendrogram node id of each active row
    active = np.ones(n, dtype=bool)
    Z = np.zeros((n - 1, 4))
    for m in range(n - 1):
        Dm = np.where(active[:, None] & active[None, :], D, np.inf)
        i, j = np.unravel_index(np.argmin(Dm), Dm.shape)  # first min = smallest (i,j)
        if i > j:
            i, j = j, i
        d2 = D[i, j]
        a, b = (node[i], node[j]) if node[i] < node[j] else (node[j], node[i])
        Z[m] = [a, b, np.sqrt(d2), size[i] + size[j]]
        k = np.flatnonzero(active)
        k = k[(k != i) & (k != j)]
        if linkage == "single":
            newd = np.minimum(D[i, k], D[j, k])
        elif linkage == "complete":
            newd = np.maximum(D[i, k], D[j, k])
        elif linkage == "average":
            newd = (size[i] * D[i, k] + size[j] * D[j, k]) / (size[i] + size[j])
        else:  # ward (Lance-Williams on squared distances)
            tot = size[i] + size[j] + size[k]
            newd = (
                (size[i] + size[k]) * D[i, k]
                + (size[j] + size[k]) * D[j, k]
                - size[k] * d2
            ) / tot
        D[i, k] = newd
        D[k, i] = newd
        size[i] += size[j]
        node[i] = n + m
        active[j] = False
    return Z


def cut_tree(Z: np.ndarray, n: int, k: int | None = None, height: float | None = None) -> np.ndarray:
    """cutree analog (/root/reference/R/sits_cluster.R:109): stop
    merging after n-k merges (or at the first merge above ``height``)
    and label each leaf by its component, ids renumbered 0..k-1 in
    first-leaf order."""
    if (k is None) == (height is None):
        raise ValueError("pass exactly one of k / height")
    stop = n - k if k is not None else int(np.searchsorted(Z[:, 2], height, side="right"))
    parent = np.arange(n + stop)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for m in range(stop):
        a, b = int(Z[m, 0]), int(Z[m, 1])
        parent[find(a)] = n + m
        parent[find(b)] = n + m
    roots = np.array([find(i) for i in range(n)])
    _, lbl = np.unique(roots, return_inverse=True)
    order = {}
    out = np.empty(n, dtype=np.int64)
    for i, r in enumerate(lbl):
        out[i] = order.setdefault(r, len(order))
    return out


def cluster_dendro(
    df: DataFrame,
    feature_col: str,
    id_col: str,
    k: int = 4,
    linkage: str = "ward",
    sample_cap: int = 1_000,
) -> DataFrame:
    """sits_cluster_dendro (/root/reference/R/sits_cluster.R:59): build
    the dendrogram driver-side on a bounded deterministic sample, cut at
    ``k`` clusters, then assign EVERY row to the cluster of its nearest
    sample member (1-NN), distributed as one Arrow gemm per batch.
    Adds ``cluster`` (int) and ``cdist`` (distance to the nearest
    sample member). The driver never holds more than ``sample_cap``
    vectors — identical bound story to ``api.som_map``."""
    import pyarrow as pa
    from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

    sample = (
        df.select(id_col, feature_col)
        .orderBy(F.abs(F.hash(F.col(id_col))), F.col(id_col))
        .limit(sample_cap)
        .toPandas()
    )
    S = np.stack([np.asarray(v, dtype=np.float64) for v in sample[feature_col]])
    Z = linkage_matrix(S, linkage=linkage)
    lbl = cut_tree(Z, len(S), k=min(k, len(S)))
    St = S.T.copy()
    ss = (S**2).sum(axis=1)
    lbl32 = lbl.astype(np.int32)

    schema = StructType(
        list(df.schema.fields)
        + [StructField("cluster", IntegerType()), StructField("cdist", DoubleType())]
    )

    def assign(batches):
        for batch in batches:
            vals = batch.column(feature_col).flatten().to_numpy(zero_copy_only=False)
            E = vals.astype(np.float64).reshape(len(batch), -1)
            d = (E**2).sum(axis=1, keepdims=True) - 2.0 * E @ St + ss[None, :]
            nn = np.argmin(d, axis=1)
            cd = np.sqrt(np.maximum(d[np.arange(len(E)), nn], 0.0))
            yield pa.RecordBatch.from_arrays(
                [
                    *batch.columns,
                    pa.array(lbl32[nn], type=pa.int32()),
                    pa.array(cd, type=pa.float64()),
                ],
                names=[*batch.schema.names, "cluster", "cdist"],
            )

    return df.mapInArrow(assign, schema=schema)


def cluster_frequency(df: DataFrame, label_col: str, cluster_col: str = "cluster") -> DataFrame:
    """sits_cluster_frequency (/root/reference/R/sits_cluster.R:141):
    label x cluster contingency with per-cluster totals."""
    from pyspark.sql import Window as W

    return (
        df.groupBy(label_col, cluster_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("cluster_total", F.sum("n").over(W.partitionBy(cluster_col)))
        .withColumn("frac", F.round(F.col("n") / F.col("cluster_total"), 6))
    )


def cluster_clean(df: DataFrame, label_col: str, cluster_col: str = "cluster") -> DataFrame:
    """sits_cluster_clean (/root/reference/R/sits_cluster.R:177): keep
    only rows whose label is the majority label of their cluster (ties
    -> lexicographically smallest label, a total order both engines
    agree on)."""
    from pyspark.sql import Window as W

    counts = df.groupBy(cluster_col, label_col).agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy(cluster_col).orderBy(F.desc("n"), F.asc(label_col))
    majority = (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(cluster_col, F.col(label_col).alias("_maj"))
    )
    return (
        df.join(F.broadcast(majority), cluster_col)
        .where(F.col(label_col) == F.col("_maj"))
        .drop("_maj")
    )
