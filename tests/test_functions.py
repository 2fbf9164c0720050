import math

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.functions.linkprediction import (
    adamic_adar,
    common_neighbors,
    neighbor_sets,
    preferential_attachment,
    resource_allocation,
    same_community,
    total_neighbors,
)
from graph_data_science_spark.functions.similarity import (
    cosine,
    euclidean,
    euclidean_distance,
    jaccard,
    overlap,
    pearson,
)
from graph_data_science_spark.functions.util import gds_is_finite, one_hot_encoding
from graph_data_science_spark.plans.graph import Graph


def _eval(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_similarity_functions(spark):
    a = F.array(*[F.lit(x) for x in [3.0, 8.0, 7.0, 5.0, 2.0, 9.0]])
    b = F.array(*[F.lit(x) for x in [10.0, 8.0, 6.0, 6.0, 4.0, 5.0]])
    # oracles computed with numpy definitions
    assert _eval(spark, cosine(a, b)) == pytest.approx(0.8638935626791596)
    assert _eval(spark, euclidean_distance(a, b)) == pytest.approx(math.sqrt(71))
    assert _eval(spark, euclidean(a, b)) == pytest.approx(1 / (1 + math.sqrt(71)))
    assert _eval(spark, pearson(a, b)) == pytest.approx(-0.06578330489043524)


def test_set_similarity(spark):
    a = F.array(*[F.lit(x) for x in [1, 2, 3, 4]])
    b = F.array(*[F.lit(x) for x in [3, 4, 5]])
    assert _eval(spark, jaccard(a, b)) == pytest.approx(2 / 5)
    assert _eval(spark, overlap(a, b)) == pytest.approx(2 / 3)


def test_util(spark):
    assert _eval(spark, gds_is_finite(F.lit(1.0)))
    assert not _eval(spark, gds_is_finite(F.lit(float("inf"))))
    got = _eval(
        spark,
        one_hot_encoding(
            F.array(F.lit("a"), F.lit("b"), F.lit("c")), F.array(F.lit("c"), F.lit("a"))
        ),
    )
    assert got == [1, 0, 1]


@pytest.fixture(scope="module")
def lp_graph(spark):
    # triangle a(0)-b(1)-c(2) plus d(3) attached to a and b
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (3, 0, 1.0), (3, 1, 1.0)],
        "src long, dst long, weight double",
    )
    return Graph.from_edges(edges)


def test_link_prediction(spark, lp_graph):
    nbrs = neighbor_sets(lp_graph).persist()
    pairs = spark.createDataFrame([(2, 3)], "a long, b long")
    # N(2)={0,1}, N(3)={0,1} -> common 2, union 2
    assert common_neighbors(pairs, nbrs).collect()[0]["score"] == 2.0
    assert total_neighbors(pairs, nbrs).collect()[0]["score"] == 2.0
    assert preferential_attachment(pairs, nbrs).collect()[0]["score"] == 4.0
    # deg(0)=3, deg(1)=3 -> AA = 2/ln(3), RA = 2/3
    assert adamic_adar(pairs, nbrs).collect()[0]["score"] == pytest.approx(2 / math.log(3))
    assert resource_allocation(pairs, nbrs).collect()[0]["score"] == pytest.approx(2 / 3)


def test_same_community(spark):
    comm = spark.createDataFrame([(0, 10), (1, 10), (2, 20)], "vid long, community long")
    pairs = spark.createDataFrame([(0, 1), (0, 2)], "a long, b long")
    got = {(r["a"], r["b"]): r["score"] for r in same_community(pairs, comm).collect()}
    assert got == {(0, 1): 1.0, (0, 2): 0.0}
