"""ML pipeline tests — finite-difference gradient checks for all three
model heads, link-prediction AUC on a structured graph, classification /
regression quality, and determinism. Mirrors the INTENTS of the
reference's LinkPredictionTrainTest / LogisticRegressionTrainerTest /
NodeRegression tests (exact values not portable: Java-seeded init)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.ml import logreg
from graph_data_science_spark.ml.pipelines import (
    link_features, link_prediction_train, node_classification_train,
    node_regression_train,
)
from graph_data_science_spark.plans.graph import Graph


@pytest.mark.parametrize("kind,classes", [("binary", 2), ("softmax", 3), ("linear", 2)])
def test_gradient_check(spark, kind, classes):
    rng = np.random.default_rng(5)
    rows = [([float(v) for v in rng.normal(size=3)],
             float(rng.integers(0, classes if kind == "softmax" else 2))
             if kind != "linear" else float(rng.normal()))
            for _ in range(40)]
    df = spark.createDataFrame(rows, "features array<double>, y double").repartition(3)
    w = (rng.normal(scale=0.3, size=(classes, 4)) if kind == "softmax"
         else rng.normal(scale=0.3, size=4))
    g, loss, m = logreg._partials(df, w, kind)
    eps = 1e-6
    idxs = [(0,), (2,)] if kind != "softmax" else [(0, 0), (classes - 1, 3)]
    for idx in idxs:
        wp, wm = w.copy(), w.copy()
        wp[idx] += eps
        wm[idx] -= eps
        lp = logreg._partials(df, wp, kind)[1]
        lm = logreg._partials(df, wm, kind)[1]
        num = (lp - lm) / (2 * eps)
        assert abs(num - g[idx]) <= 1e-4 * max(1.0, abs(num)), (kind, idx, num, g[idx])


def test_binary_fit_separates(spark):
    rng = np.random.default_rng(1)
    rows = []
    for _ in range(200):
        y = float(rng.integers(0, 2))
        mu = 2.0 if y else -2.0
        rows.append(([float(mu + rng.normal(0, 0.5)), float(rng.normal())], y))
    df = spark.createDataFrame(rows, "features array<double>, y double")
    m = logreg.fit(df, kind="binary", epochs=60, learning_rate=0.5, seed=3)
    assert m.loss_per_epoch[-1] < m.loss_per_epoch[0] * 0.3


def _two_clique_graph(spark):
    edges = []
    for base in (0, 10):
        for i in range(10):
            for j in range(i + 1, 10):
                if (i * 7 + j) % 3 != 0:  # sparse-ish cliques, leaves non-edges
                    edges.append((base + i, base + j, 1.0))
                    edges.append((base + j, base + i, 1.0))
    edges.append((9, 10, 1.0))
    return Graph.from_edges(
        spark.createDataFrame(edges, "src long, dst long, weight double")
    )


def test_link_prediction_auc_and_determinism(spark):
    """Intra-cluster pairs must score above cross-cluster pairs: with
    cluster-indicator embeddings the hadamard feature is perfectly
    informative, so test AUC should be near 1."""
    g = _two_clique_graph(spark)
    emb = spark.createDataFrame(
        [(v, [1.0, 0.0] if v < 10 else [0.0, 1.0]) for v in range(20)],
        "vid long, embedding array<double>",
    )
    m1 = link_prediction_train(g, emb, feature_steps=["hadamard", "cosine"],
                               epochs=80, seed=11)
    assert m1.test_auc > 0.8, m1.test_auc
    m2 = link_prediction_train(g, emb, feature_steps=["hadamard", "cosine"],
                               epochs=80, seed=11)
    assert np.allclose(m1.model.weights, m2.model.weights)
    # predict: an intra-clique non-edge outranks a cross-clique non-edge
    pairs = spark.createDataFrame([(0, 3), (0, 13)], "src long, dst long")
    p = {(r["src"], r["dst"]): r["probability"] for r in m1.predict(pairs).collect()}
    assert p[(0, 3)] > p[(0, 13)]


def test_link_features_shapes(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 4.0])], "vid long, embedding array<double>"
    )
    pairs = spark.createDataFrame([(0, 1)], "src long, dst long")
    r = link_features(pairs, emb, ["hadamard", "l2", "cosine"]).collect()[0]
    assert r["features"] == pytest.approx([3.0, 8.0, 4.0, 4.0,
                                           11.0 / (np.sqrt(5) * 5.0)])


def test_node_classification_accuracy(spark):
    rng = np.random.default_rng(2)
    rows = []
    for v in range(300):
        c = v % 3
        mu = {0: (3, 0), 1: (-3, 0), 2: (0, 3)}[c]
        rows.append((v, [float(mu[0] + rng.normal(0, 0.6)),
                         float(mu[1] + rng.normal(0, 0.6))], f"c{c}"))
    nodes = spark.createDataFrame(rows, "vid long, features array<double>, label string")
    m = node_classification_train(nodes, epochs=120, learning_rate=0.5, seed=4)
    assert m.test_metric > 0.9, m.test_metric
    pred = m.predict(nodes.limit(5))
    assert set(pred.columns) == {"vid", "predicted_class", "probabilities"}
    assert all(r["predicted_class"] in ("c0", "c1", "c2") for r in pred.collect())


def test_node_regression_r2(spark):
    rng = np.random.default_rng(6)
    rows = []
    for v in range(300):
        x = rng.normal(size=2)
        t = 3.0 * x[0] - 2.0 * x[1] + 1.0 + rng.normal(0, 0.1)
        rows.append((v, [float(x[0]), float(x[1])], float(t)))
    nodes = spark.createDataFrame(rows, "vid long, features array<double>, target double")
    m = node_regression_train(nodes, epochs=300, learning_rate=0.3, seed=8)
    assert m.test_metric > 0.9, m.test_metric
