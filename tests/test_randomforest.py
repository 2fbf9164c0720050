"""Distributed random-forest classifier (ml/randomforest.py).

Reference shape: ml/ml-algo/src/main/java/org/neo4j/gds/ml/models/
randomforest/RandomForestClassifierTrainer.java (bootstrap + feature
bagging + Gini splits, majority-vote ClassifierFactory), and the
pipeline candidate surface addRandomForest / addLogisticRegression
(pipeline/.../TrainingPipeline.java) with best-by-metric selection.

The learnability gate is XOR: a linear (logistic) head provably cannot
exceed ~0.5 accuracy on XOR-labeled data, a depth>=2 tree ensemble can —
so RF beating logistic here checks the trees are real, not plumbing.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.ml import randomforest as rf


def _xor_df(spark, n=1200, dim=4, seed=7):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1.0, 1.0, size=(n, dim))
    y = ((x[:, 0] > 0) ^ (x[:, 1] > 0)).astype(float)
    rows = [(int(i), [float(v) for v in x[i]], float(y[i])) for i in range(n)]
    return spark.createDataFrame(rows, "sid long, features array<double>, y double")


def test_rf_learns_xor_and_is_deterministic(spark):
    df = _xor_df(spark).cache()
    m = rf.fit_random_forest_classifier(
        df, num_classes=2, num_trees=10, max_depth=5, seed=42
    )
    pred = df.mapInPandas(
        rf.predict_expr(m),
        "sid long, y double, predicted_class long, probabilities array<double>",
    )
    n = df.count()
    acc = (
        pred.filter(F.col("y") == F.col("predicted_class").cast("double")).count()
        / n
    )
    assert acc > 0.9, f"RF failed to learn XOR: acc={acc}"

    # same seed -> bit-identical model (hash-bootstrap + seeded bagging)
    m2 = rf.fit_random_forest_classifier(
        df, num_classes=2, num_trees=10, max_depth=5, seed=42
    )
    assert np.array_equal(m.split_feat, m2.split_feat)
    assert np.allclose(m.leaf_probs, m2.leaf_probs)

    # probabilities are a distribution; majority class matches argmax
    row = pred.first()
    assert abs(sum(row["probabilities"]) - 1.0) < 1e-9
    df.unpersist()


def test_rf_depth_zero_is_majority_class(spark):
    df = _xor_df(spark, n=300)
    # bias labels 2:1 so the majority is well-defined
    df = df.withColumn("y", (F.col("sid") % 3 == 0).cast("double"))
    m = rf.fit_random_forest_classifier(
        df, num_classes=2, num_trees=3, max_depth=0, seed=1
    )
    pred = df.mapInPandas(
        rf.predict_expr(m),
        "sid long, y double, predicted_class long, probabilities array<double>",
    )
    assert pred.select("predicted_class").distinct().collect() == [(0,)]


def test_node_classification_rf_beats_logistic_on_xor(spark):
    from graph_data_science_spark.ml.pipelines import node_classification_train

    nodes = (
        _xor_df(spark, n=1200)
        .select(F.col("sid").alias("vid"), "features",
                F.col("y").cast("long").alias("label"))
        .cache()
    )
    rf_model = node_classification_train(
        nodes, test_fraction=0.3, model_family="randomforest",
        num_trees=10, max_depth=5, seed=42,
    )
    lg_model = node_classification_train(
        nodes, test_fraction=0.3, epochs=40, seed=42,
    )
    assert rf_model.test_metric > 0.85
    assert rf_model.test_metric > lg_model.test_metric + 0.2
    # predict() surfaces original labels through the class index
    out = rf_model.predict(nodes.select("vid", "features"))
    assert set(out.columns) >= {"vid", "predicted_class", "probabilities"}
    nodes.unpersist()


def test_pipeline_catalog_candidate_selection(spark):
    """addLogisticRegression + addRandomForest -> train() keeps the best
    candidate by the main metric (reference model-selection semantics)."""
    from graph_data_science_spark.ml.catalog import ModelCatalog, PipelineCatalog
    from graph_data_science_spark.plans.graph import Graph, Orientation

    # two 10-cliques joined by one bridge: link prediction is learnable
    edges = []
    for base in (0, 100):
        ids = [base + i for i in range(10)]
        edges += [(u, v) for u in ids for v in ids if u < v]
    edges.append((0, 100))
    g = Graph.from_edges(
        spark.createDataFrame(
            [(u, v, 1.0) for u, v in edges], "src long, dst long, weight double"
        ),
        orientation=Orientation.UNDIRECTED,
    )
    cat, models = PipelineCatalog(), ModelCatalog()
    pipe = (
        cat.create_link_prediction("lp-rf")
        .add_node_property("fastRP", embedding_dimension=16, seed=7)
        .add_feature("hadamard")
        .configure_split(test_fraction=0.3, negative_sampling_ratio=1.0)
        .add_logistic_regression(epochs=40)
        .add_random_forest(num_trees=8, max_depth=4)
    )
    model = pipe.train(g, model_name="lp-rf-model", model_catalog=models)
    trials = model.metrics[-1]["candidates"]
    assert len(trials) == 2
    assert {t["config"]["model_family"] for t in trials} == {
        "logistic", "randomforest"
    }
    assert model.test_auc == pytest.approx(
        max(t["test_auc"] for t in trials)
    )
    assert models.get("lp-rf-model") is model
    # the winning model scores pairs regardless of family
    pairs = spark.createDataFrame([(0, 100), (0, 150)], "src long, dst long")
    # 150 is not in the graph; restrict to known nodes
    scored = model.predict(pairs.filter(F.col("dst") == 100))
    row = scored.first()
    assert 0.0 <= row["probability"] <= 1.0
