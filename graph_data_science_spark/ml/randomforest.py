"""Distributed random-forest classifier — histogram split finding.

Reference: ml/ml-algo/src/main/java/org/neo4j/gds/ml/models/randomforest/
RandomForestClassifierTrainer.java (bootstrap per tree via
DatasetBootstrapper, feature bagging maxFeaturesRatio ~ sqrt(d)/d, Gini
split criterion GiniIndex.java, majority-vote prediction
RandomForestClassifier.java). The reference grows each tree over an
in-heap sample; a shuffle engine can't random-access rows, so this is
the standard level-synchronous HISTOGRAM formulation (the XGBoost/
LightGBM-hist family):

- features are discretized once into `num_bins` quantile bins
  (percentile_approx per feature — one pass);
- each tree's bootstrap is a deterministic hash-Poisson(1) weight per
  (row, tree) — rows never replicate, the weight multiplies histogram
  counts (the classic weighted-bootstrap identity);
- one level = ONE groupBy over (tree, node, feature, bin) summing
  per-class weights — map-side partial aggregation does the heavy
  lifting, the driver sees only T x nodes x d x bins histogram rows
  (independent of row count) and picks the best Gini split per node
  with feature bagging applied driver-side (hash-chosen sqrt(d)
  features per node);
- routing to children is a broadcast join + element_at comparison,
  lineage-cut per level.

Driver state is the model itself (T x 2^depth nodes — KB), never
O(rows). Prediction walks all trees vectorized in mapInPandas
(numpy gather per level), emitting majority class + averaged leaf
class distributions.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class RandomForestModel:
    kind: str                      # "rf_class"
    num_classes: int
    num_trees: int
    max_depth: int
    # per (tree, heap-node): feat (-1 = leaf), threshold (raw feature
    # value), and for leaves the class distribution
    split_feat: np.ndarray         # (T, max_nodes) int32
    split_thr: np.ndarray          # (T, max_nodes) float64
    leaf_probs: np.ndarray         # (T, max_nodes, C) float64
    oob_like_metric: float = float("nan")
    loss_per_epoch: list[float] = field(default_factory=list)


def _bin_edges(df: DataFrame, dim: int, num_bins: int) -> list[np.ndarray]:
    """Per-feature quantile edges (len <= num_bins - 1, deduped)."""
    qs = [i / num_bins for i in range(1, num_bins)]
    rows = (
        df.select(F.posexplode("features").alias("feat", "v"))
        .groupBy("feat")
        .agg(F.percentile_approx("v", qs, 10_000).alias("edges"))
        .collect()
    )
    edges = [np.array([0.0]) for _ in range(dim)]
    for r in rows:
        e = np.unique(np.asarray(r["edges"], dtype=np.float64))
        edges[r["feat"]] = e if len(e) else np.array([0.0])
    return edges


def fit_random_forest_classifier(
    df: DataFrame,
    num_classes: int,
    num_trees: int = 10,
    max_depth: int = 5,
    num_bins: int = 16,
    min_split_size: int = 2,
    max_features_ratio: float | None = None,
    seed: int = 42,
) -> RandomForestModel:
    """df: (sid long, features array<double>, y double in [0, C)).
    max_features_ratio: fraction of features considered per node
    (default sqrt(d)/d, the reference's classification default)."""
    spark = df.sparkSession
    dim = len(df.select("features").first()[0])
    edges = _bin_edges(df, dim, num_bins)
    k_feats = max(1, int(round((max_features_ratio or (math.sqrt(dim) / dim)) * dim)))

    edges_b = spark.sparkContext.broadcast(edges)

    def binize(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["features"].to_numpy()).astype(np.float64)
            b = np.empty_like(x, dtype=np.int32)
            for j in range(x.shape[1]):
                b[:, j] = np.searchsorted(edges_b.value[j], x[:, j], side="right")
            yield pd.DataFrame(
                {"sid": pdf["sid"], "y": pdf["y"].astype("int64"), "b": list(b)}
            )

    binned = df.select("sid", "features", "y").mapInPandas(
        binize, "sid long, y long, b array<int>"
    )

    # hash-Poisson(1) bootstrap weight per (row, tree); truncated at 3
    # (cumulative pmf .3679 / .7358 / .9197 / 1)
    u = (
        F.pmod(
            F.abs(F.xxhash64(F.lit(seed), F.col("sid"), F.col("tree"))),
            F.lit(1 << 30),
        ).cast("double")
        / F.lit(float(1 << 30))
    )
    w = (
        F.when(u < 0.3679, F.lit(0))
        .when(u < 0.7358, F.lit(1))
        .when(u < 0.9197, F.lit(2))
        .otherwise(F.lit(3))
    )
    active = (
        binned.select(
            "sid", "y", "b",
            F.explode(F.sequence(F.lit(0), F.lit(num_trees - 1))).alias("tree"),
        )
        .withColumn("w", w)
        .filter(F.col("w") > 0)
        .select("y", "b", "tree", "w")
        .withColumn("node", F.lit(1))
        .localCheckpoint(eager=True)
    )

    max_nodes = 1 << (max_depth + 1)
    split_feat = np.full((num_trees, max_nodes), -1, dtype=np.int32)
    split_thr = np.zeros((num_trees, max_nodes), dtype=np.float64)
    leaf_probs = np.zeros((num_trees, max_nodes, num_classes), dtype=np.float64)
    cls_sums = [
        F.sum(F.col("w") * (F.col("y") == c).cast("long")).alias(f"c{c}")
        for c in range(num_classes)
    ]

    def _gini_gain(hist: np.ndarray) -> tuple[int, float]:
        """hist: (bins+1, C) weighted class counts per bin. Returns the
        best (threshold-bin, gain); gain <= 0 means don't split."""
        total = hist.sum(axis=0)
        n_tot = total.sum()
        if n_tot <= 0:
            return -1, 0.0
        gini_parent = 1.0 - float(np.sum((total / n_tot) ** 2))
        left = np.cumsum(hist, axis=0)[:-1]  # split AFTER bin i
        nl = left.sum(axis=1)
        nr = n_tot - nl
        valid = (nl > 0) & (nr > 0)
        if not valid.any():
            return -1, 0.0
        with np.errstate(divide="ignore", invalid="ignore"):
            gl = 1.0 - np.sum((left / np.maximum(nl, 1)[:, None]) ** 2, axis=1)
            right = total[None, :] - left
            gr = 1.0 - np.sum((right / np.maximum(nr, 1)[:, None]) ** 2, axis=1)
        gain = gini_parent - (nl * gl + nr * gr) / n_tot
        gain[~valid] = -np.inf
        i = int(np.argmax(gain))
        return i, float(gain[i])

    for depth in range(max_depth + 1):
        hist_rows = (
            active.select(
                "tree", "node", "y", "w", F.posexplode("b").alias("feat", "bin")
            )
            .groupBy("tree", "node", "feat", "bin")
            .agg(*cls_sums)
            .collect()
        )
        # (tree, node) -> (feat -> hist matrix)
        groups: dict[tuple[int, int], np.ndarray] = {}
        for r in hist_rows:
            key = (r["tree"], r["node"])
            h = groups.get(key)
            if h is None:
                h = np.zeros((dim, num_bins + 1, num_classes))
                groups[key] = h
            for c in range(num_classes):
                h[r["feat"], r["bin"], c] = float(r[f"c{c}"] or 0)
        routes = []  # (tree, node, feat, bin_thr)
        for (t, nd), h in sorted(groups.items()):
            total = h[0].sum(axis=0)  # class totals (any feature's bins)
            n_tot = total.sum()
            probs = total / n_tot if n_tot > 0 else np.ones(num_classes) / num_classes
            leaf_probs[t, nd] = probs
            if depth == max_depth or n_tot < min_split_size or (total > 0).sum() <= 1:
                continue  # leaf (split_feat stays -1)
            rng = np.random.default_rng([seed, t, nd])
            feats = rng.choice(dim, size=min(k_feats, dim), replace=False)
            best = (-1, -1, 0.0)  # feat, bin, gain
            for f in sorted(int(x) for x in feats):
                i, gain = _gini_gain(h[f])
                if gain > best[2] + 1e-12:
                    best = (f, i, gain)
            if best[0] < 0:
                continue
            split_feat[t, nd] = best[0]
            e = edges[best[0]]
            split_thr[t, nd] = float(e[min(best[1], len(e) - 1)])
            routes.append((t, nd, best[0], best[1]))
        if not routes or depth == max_depth:
            break
        route_df = spark.createDataFrame(
            routes, "tree int, node int, sfeat int, sbin int"
        )
        active = (
            active.join(F.broadcast(route_df), ["tree", "node"])
            .withColumn(
                "node",
                F.when(
                    F.element_at("b", F.col("sfeat") + 1) <= F.col("sbin"),
                    F.col("node") * 2,
                ).otherwise(F.col("node") * 2 + 1),
            )
            .drop("sfeat", "sbin")
            .localCheckpoint(eager=True)
        )

    edges_b.destroy()
    return RandomForestModel(
        kind="rf_class",
        num_classes=num_classes,
        num_trees=num_trees,
        max_depth=max_depth,
        split_feat=split_feat,
        split_thr=split_thr,
        leaf_probs=leaf_probs,
    )


def predict_expr(model: RandomForestModel):
    """mapInPandas fn: adds predicted_class (majority vote over averaged
    leaf distributions) + probabilities (mean of per-tree leaf class
    distributions — the reference averages votes the same way)."""
    sf = model.split_feat
    st = model.split_thr
    lp = model.leaf_probs
    T, C = model.num_trees, model.num_classes
    depth = model.max_depth

    def fn(iterator):
        for pdf in iterator:
            if not len(pdf):
                continue
            x = np.stack(pdf["features"].to_numpy()).astype(np.float64)
            m = len(x)
            probs = np.zeros((m, C))
            for t in range(T):
                node = np.ones(m, dtype=np.int64)
                for _ in range(depth + 1):
                    f = sf[t, node]
                    leaf = f < 0
                    if leaf.all():
                        break
                    go = ~leaf
                    fv = x[np.arange(m)[go], f[go]]
                    # side="right" binning: bin(v) <= i  <=>  v < edges[i]
                    left = fv < st[t, node[go]]
                    node[go] = np.where(left, node[go] * 2, node[go] * 2 + 1)
                probs += lp[t, node]
            probs /= T
            out = pdf.drop(columns=["features"])
            out["predicted_class"] = probs.argmax(axis=1).astype("int64")
            out["probabilities"] = list(probs)
            yield out

    return fn
