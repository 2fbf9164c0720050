"""Pipeline / model catalog facade (gds.beta.pipeline.* / gds.model.*).

Reference shape: PipelineCatalog.java (create/get/drop/list, duplicate
rejection), LinkPredictionTrainingPipeline (create -> addNodeProperty ->
addFeature -> configureSplit -> train), ModelCatalog registration."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.ml.catalog import ModelCatalog, PipelineCatalog
from graph_data_science_spark.plans.graph import Graph, Orientation


def _two_cliques(spark, k=8):
    edges = []
    for base in (0, 100):
        ids = [base + i for i in range(k)]
        edges += [(u, v) for u in ids for v in ids if u < v]
    edges.append((0, 100))
    df = spark.createDataFrame(
        [(u, v, 1.0) for u, v in edges], "src long, dst long, weight double"
    )
    return Graph.from_edges(df, orientation=Orientation.UNDIRECTED)


def test_pipeline_catalog_lifecycle(spark):
    cat = PipelineCatalog()
    p = cat.create_link_prediction("lp")
    assert cat.exists("lp") and cat.get("lp") is p
    with pytest.raises(ValueError, match="already exists"):
        cat.create_link_prediction("lp")
    cat.create_node_classification("nc")
    assert cat.list() == ["lp", "nc"]
    cat.drop("lp")
    assert not cat.exists("lp")
    with pytest.raises(ValueError, match="does not exist"):
        cat.get("lp")


def test_unknown_step_rejected(spark):
    cat = PipelineCatalog()
    p = cat.create_link_prediction("lp2")
    with pytest.raises(ValueError, match="unknown link feature step"):
        p.add_feature("nope")
    g = _two_cliques(spark)
    p.add_node_property("definitelyNotAnAlgo")
    with pytest.raises(ValueError, match="unknown nodeProperty step"):
        p.train(g, model_name="m", model_catalog=None)


def test_link_prediction_pipeline_end_to_end(spark):
    g = _two_cliques(spark)
    cat, models = PipelineCatalog(), ModelCatalog()
    pipe = (
        cat.create_link_prediction("lp3")
        .add_node_property("fastRP", embedding_dimension=16, seed=7)
        .add_feature("hadamard")
        .configure_split(test_fraction=0.3, negative_sampling_ratio=1.0)
    )
    model = pipe.train(g, model_name="lp3-model", model_catalog=models, epochs=60)
    assert models.exists("lp3-model") and models.get("lp3-model") is model
    assert model.test_auc > 0.6  # clique edges separate from cross negatives
    preds = model.predict(
        spark.createDataFrame([(1, 2), (1, 101)], "src long, dst long")
    ).collect()
    assert len(preds) == 2
    with pytest.raises(ValueError, match="already exists"):
        models.register("lp3-model", model)


def test_node_classification_pipeline_end_to_end(spark):
    g = _two_cliques(spark)
    nodes = g.nodes.withColumn("cls", (F.col("vid") >= 100).cast("long"))
    g2 = Graph(nodes=nodes, edges=g.edges, orientation=g.orientation)
    cat, models = PipelineCatalog(), ModelCatalog()
    pipe = (
        cat.create_node_classification("nc2")
        .add_node_property("fastRP", embedding_dimension=16, seed=7)
        .add_node_property("degree")
    )
    model = pipe.train(g2, label_col="cls", model_name="nc2-model",
                       model_catalog=models, epochs=120)
    assert models.exists("nc2-model")
    assert model.test_metric >= 0.5  # tiny test split; structure separable
