"""Engine-level tests: checkpointing, resume, lineage, metrics.

Resumability is the north-rule addition over the reference's in-memory
Pregel loop (Pregel.java:178-216): kill after superstep k, resume from
the durable snapshot, identical final results.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.operators.pagerank import page_rank
from graph_data_science_spark.operators.pregel import PregelEngine
from graph_data_science_spark.operators.wcc import wcc
from tests.fixtures import pagerank_graph, wcc_chain_graph


def test_resume_matches_uninterrupted(spark, tmp_ckpt):
    g = pagerank_graph(spark)
    # uninterrupted run
    full = page_rank(g, tolerance=0, max_iterations=30)
    # interrupted: stop after 10 supersteps, then resume to 30
    eng = PregelEngine(spark, checkpoint_dir=tmp_ckpt, checkpoint_interval=5)
    page_rank(g, tolerance=0, max_iterations=10, engine=eng)
    eng2 = PregelEngine(spark, checkpoint_dir=tmp_ckpt, checkpoint_interval=5)
    resumed = page_rank(g, tolerance=0, max_iterations=30, engine=eng2, resume=True)

    full_scores = {r["vid"]: r["score"] for r in full.scores.collect()}
    res_scores = {r["vid"]: r["score"] for r in resumed.scores.collect()}
    for v in full_scores:
        assert res_scores[v] == pytest.approx(full_scores[v], abs=1e-12)


def test_checkpoint_lineage_and_metrics(spark, tmp_ckpt):
    g = wcc_chain_graph(spark)
    eng = PregelEngine(spark, checkpoint_dir=tmp_ckpt, checkpoint_interval=2)
    res = wcc(g, engine=eng)
    assert res.did_converge

    latest = eng.manager.latest_superstep()
    assert latest is not None
    lineage = eng.manager.lineage(latest)
    assert lineage["superstep"] == latest
    assert lineage["num_partitions"] >= 1
    assert any(f == "_SUCCESS" for f in lineage["files"])

    metrics = eng.manager.metrics()
    assert len(metrics) == len(res.metrics)
    assert all("changed_count" in m and "wall_sec" in m for m in metrics)
    # convergence metrics are monotone for WCC min-propagation
    changed = [m["changed_count"] for m in metrics]
    assert changed[-1] == 0


def test_durable_snapshot_is_atomic(spark, tmp_ckpt):
    # a snapshot without _lineage.json (simulated crash mid-write) is ignored
    g = wcc_chain_graph(spark)
    eng = PregelEngine(spark, checkpoint_dir=tmp_ckpt, checkpoint_interval=1)
    wcc(g, engine=eng)
    latest = eng.manager.latest_superstep()
    bogus = os.path.join(tmp_ckpt, f"superstep={latest + 1}")
    os.makedirs(bogus)
    with open(os.path.join(bogus, "part-00000.parquet"), "w") as fh:
        fh.write("garbage")
    assert eng.manager.latest_superstep() == latest
