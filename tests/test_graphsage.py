"""GraphSage tests: finite-difference gradient check of the hand-derived
backward pass, loss descent on a structured graph, determinism, and
inductive inference — mirroring GraphSageModelTrainerTest /
GraphSageTrainAlgorithmFactoryTest intents (exact values are not portable:
the reference trains with Java-seeded init)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.operators.graphsage import (
    _loss_and_grads, _sample_edges, graphsage_embeddings, graphsage_train,
    GraphSageModel,
)
from graph_data_science_spark.plans.graph import Graph


def _toy(spark):
    """Two 4-cliques joined by one bridge edge; features = one-hot-ish."""
    edges = []
    for base in (0, 4):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((base + i, base + j, 1.0))
                edges.append((base + j, base + i, 1.0))
    edges.append((3, 4, 1.0))
    edges.append((4, 3, 1.0))
    e = spark.createDataFrame(edges, "src long, dst long, weight double")
    rng = np.random.default_rng(7)
    feats = spark.createDataFrame(
        [(v, [float(x) for x in rng.normal(size=3)]) for v in range(8)],
        "vid long, feat array<double>",
    )
    return Graph.from_edges(e), feats


@pytest.mark.parametrize("activation", ["sigmoid", "relu"])
def test_gradient_check(spark, activation):
    """Analytic dL/dW within 1e-4 relative error of central differences,
    through mean layers, activation, row normalization, and the loss."""
    g, feats = _toy(spark)
    n_part = 2
    rng = np.random.default_rng(3)
    weights = [rng.normal(scale=0.5, size=(3, 3)), rng.normal(scale=0.5, size=(2, 3))]
    sampled = [_sample_edges(g, 3, 11, l, n_part) for l in range(2)]
    trip = spark.createDataFrame(
        [(0, 1, 5), (2, 3, 6), (4, 5, 0)], "vid long, pos long, neg long"
    )
    feats = feats.persist()

    loss0, grads = _loss_and_grads(
        spark, feats, sampled, [w.copy() for w in weights],
        activation, trip, 5.0, n_part,
    )
    assert loss0 > 0
    eps = 1e-5
    checked = 0
    for l, w in enumerate(weights):
        for idx in [(0, 0), (1, 2), (w.shape[0] - 1, w.shape[1] - 1)]:
            wp = [x.copy() for x in weights]
            wm = [x.copy() for x in weights]
            wp[l][idx] += eps
            wm[l][idx] -= eps
            lp, _ = _loss_and_grads(spark, feats, sampled, wp, activation, trip, 5.0, n_part)
            lm, _ = _loss_and_grads(spark, feats, sampled, wm, activation, trip, 5.0, n_part)
            num = (lp - lm) / (2 * eps)
            ana = grads[l][idx]
            assert abs(num - ana) <= 1e-4 * max(1.0, abs(num), abs(ana)), (
                f"layer {l} idx {idx}: numeric {num} vs analytic {ana}"
            )
            checked += 1
    assert checked == 6
    for s in sampled:
        s.unpersist()


def test_training_reduces_loss_and_is_deterministic(spark):
    g, feats = _toy(spark)
    r1 = graphsage_train(
        g, feats, embedding_dimension=4, sample_sizes=[3, 3],
        epochs=8, learning_rate=0.3, batch_size=8, search_depth=2, seed=9,
    )
    losses = r1.model.loss_per_epoch
    assert len(losses) >= 3
    assert min(losses[2:]) < losses[0]  # descent
    r2 = graphsage_train(
        g, feats, embedding_dimension=4, sample_sizes=[3, 3],
        epochs=8, learning_rate=0.3, batch_size=8, search_depth=2, seed=9,
    )
    assert np.allclose(
        np.concatenate([w.ravel() for w in r1.model.weights]),
        np.concatenate([w.ravel() for w in r2.model.weights]),
    )
    m1 = {r["vid"]: r["embedding"] for r in r1.embeddings.collect()}
    m2 = {r["vid"]: r["embedding"] for r in r2.embeddings.collect()}
    assert m1.keys() == m2.keys() and all(
        np.allclose(m1[k], m2[k]) for k in m1
    )
    # row-normalized output of the documented dimension
    for v in m1.values():
        assert len(v) == 4
        n = float(np.linalg.norm(v))
        assert n == pytest.approx(1.0, abs=1e-9) or n == 0.0


def test_inductive_inference_on_unseen_graph(spark):
    """GraphSage is inductive: a trained model embeds a DIFFERENT graph
    (the reference's train-on-one, stream-on-another contract)."""
    g, feats = _toy(spark)
    res = graphsage_train(
        g, feats, embedding_dimension=4, sample_sizes=[2, 2],
        epochs=2, batch_size=8, search_depth=2, seed=5,
    )
    e2 = spark.createDataFrame(
        [(10, 11, 1.0), (11, 12, 1.0), (12, 10, 1.0)],
        "src long, dst long, weight double",
    )
    g2 = Graph.from_edges(e2)
    rng = np.random.default_rng(1)
    feats2 = spark.createDataFrame(
        [(v, [float(x) for x in rng.normal(size=3)]) for v in (10, 11, 12)],
        "vid long, feat array<double>",
    )
    emb = graphsage_embeddings(g2, feats2, res.model, seed=5)
    rows = emb.collect()
    assert {r["vid"] for r in rows} == {10, 11, 12}
    assert all(len(r["embedding"]) == 4 for r in rows)
