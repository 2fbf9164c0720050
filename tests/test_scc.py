import pytest

from graph_data_science_spark.operators.scc import scc
from graph_data_science_spark.plans.graph import Graph


def comps(res):
    return {r["vid"]: r["component"] for r in res.components.collect()}


def test_cycle_plus_tail(spark):
    # cycle 0->1->2->0, tail 2->3: SCCs {0,1,2} and {3}
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (2, 3, 1.0)],
        "src long, dst long, weight double",
    )
    got = comps(scc(Graph.from_edges(edges)))
    assert got[0] == got[1] == got[2] == 2  # max vid in the SCC
    assert got[3] == 3


def test_two_cycles_bridge(spark):
    # cycles {0,1} and {4,5} bridged 1->4 (one direction only)
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 0, 1.0), (4, 5, 1.0), (5, 4, 1.0), (1, 4, 1.0)],
        "src long, dst long, weight double",
    )
    got = comps(scc(Graph.from_edges(edges)))
    assert got[0] == got[1] == 1
    assert got[4] == got[5] == 5


def test_dag_all_singletons(spark):
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0)], "src long, dst long, weight double"
    )
    got = comps(scc(Graph.from_edges(edges)))
    assert got == {0: 0, 1: 1, 2: 2}


def test_directionality_matters_vs_wcc(spark):
    # 0->1<-2 : weakly connected but three singleton SCCs
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (2, 1, 1.0)], "src long, dst long, weight double"
    )
    got = comps(scc(Graph.from_edges(edges)))
    assert got == {0: 0, 1: 1, 2: 2}


def test_scc_round_budget_truncation(spark):
    # two 2-cycles in a chain need >1 peeling round; with max_rounds=1 the
    # leftovers must still be assigned (singletons) and flagged
    from graph_data_science_spark.operators.scc import scc as _scc
    from graph_data_science_spark.plans.graph import Graph

    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 0, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 2, 1.0)],
        "src long, dst long, weight double",
    )
    g = Graph.from_edges(edges)
    res = _scc(g, max_rounds=1)
    assert res.components.count() == 4  # nobody dropped
    full = _scc(g)
    assert full.did_converge
    comp = {r["vid"]: r["component"] for r in full.components.collect()}
    assert comp[0] == comp[1] and comp[2] == comp[3] and comp[0] != comp[2]
