"""BSP superstep driver — the Spark answer to the reference's Pregel loop.

Reference: pregel/src/main/java/org/neo4j/gds/beta/pregel/Pregel.java:178-216
runs iterations over shared-memory huge arrays with a messenger and vote
bits. On Spark there is no shared memory across executors, so:

  - per-node state        -> a state DataFrame (vid + value columns)
  - messages + combiner   -> a shuffle: groupBy(dst).agg(...) with
                             Catalyst's partial (map-side) aggregation
                             playing the ReducingMessenger role
                             (ReducingMessenger.java:80-85)
  - vote-to-halt bits     -> a `halted` boolean column; the step filter
                             over it is predicate-pushed into the
                             checkpointed parquet scan
  - masterCompute         -> driver code between supersteps (the
                             `converged` callback over per-superstep stats)
  - iteration memory      -> localCheckpoint (eager) per superstep to cut
                             lineage + durable parquet/Iceberg snapshot
                             every `checkpoint_interval` supersteps for
                             resume (our addition; reference is in-memory
                             only)

The engine is algorithm-agnostic: an algorithm provides
  step(state, superstep) -> new state DataFrame
  stats_exprs            -> aggregate Columns evaluated on the new state
                            in ONE job (the only driver-side action per
                            superstep besides materialization)
  converged(stats)       -> bool, the masterCompute hook
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import Column, DataFrame, SparkSession

from graph_data_science_spark.streaming.checkpoint import CheckpointManager


@dataclass
class PregelResult:
    state: DataFrame
    ran_iterations: int
    did_converge: bool
    metrics: list[dict[str, Any]] = field(default_factory=list)


class PregelEngine:
    def __init__(
        self,
        spark: SparkSession,
        checkpoint_dir: str | None = None,
        checkpoint_interval: int = 5,
        use_local_checkpoint: bool = True,
    ):
        """checkpoint_dir=None disables durable snapshots (pure in-memory,
        like the reference). checkpoint_interval=k writes a durable
        snapshot every k supersteps plus the final one."""
        self.spark = spark
        self.checkpoint_interval = checkpoint_interval
        self.use_local_checkpoint = use_local_checkpoint
        self.manager = CheckpointManager(checkpoint_dir, spark) if checkpoint_dir else None

    def run(
        self,
        initial_state: DataFrame | None,
        step: Callable[[DataFrame, int], DataFrame],
        stats_exprs: list[Column],
        converged: Callable[[dict[str, Any]], bool],
        max_iterations: int,
        resume: bool = False,
        on_superstep: Callable[[int, dict[str, Any]], None] | None = None,
        stats_interval: int = 1,
    ) -> PregelResult:
        """Drive supersteps until convergence or max_iterations.

        Iteration counting mirrors the reference exactly
        (Pregel.java:186-216: `for (; iteration < max; iteration++) {...;
        if (didConverge) break; }` then ranIterations = iteration): when
        convergence is detected after superstep s, ran_iterations = s (the
        converging superstep is not counted); on exhaustion it equals
        max_iterations. converged(stats) is evaluated after each superstep
        (the masterCompute position).

        stats_interval > 1 chains that many supersteps lazily into ONE
        Spark job before materializing + checking convergence — the
        per-superstep driver/job overhead amortizes away (vital for tiny
        graphs and cheap supersteps). Convergence is then detected at the
        next checked superstep; ran_iterations becomes an upper bound
        within the interval. Use the default (1) when exact
        iteration-count parity with the reference matters.
        """
        start_superstep = 0
        state = initial_state
        metrics: list[dict[str, Any]] = []

        if resume:
            if self.manager is None:
                raise ValueError("resume=True requires a checkpoint_dir")
            loaded = self.manager.load()
            if loaded is not None:
                state, last = loaded
                start_superstep = last + 1
                metrics = [m for m in self.manager.metrics() if m.get("superstep", -1) <= last]

        if state is None:
            raise ValueError("no initial state and nothing to resume from")

        # AQE re-plans (and re-submits) stage by stage, which serializes the
        # superstep chain on the driver: measured 2.6x wall inflation and a
        # ~2.1 s/superstep driver gap with AQE on vs ~0.5 s with it off
        # (tools/stage_profile.py, 8.4M edges, local[8]). The iterative loop
        # has a FIXED, known shape — partition counts are chosen up front —
        # so runtime re-planning buys nothing here. Disable it for the loop
        # and restore the caller's setting after (AQE stays on for one-shot
        # analytics queries, where skew-splitting/coalescing do help).
        conf = self.spark.conf
        old_aqe = conf.get("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.enabled", "false")

        live: list[DataFrame] = []  # persisted ancestors still in lineage
        did_converge = False
        ran = start_superstep
        t0 = time.time()
        try:
            for s in range(start_superstep, max_iterations):
                new_state = step(state, s)
                if stats_interval > 1 and (s + 1) % stats_interval != 0 and s != max_iterations - 1:
                    # Stay lazy (no job), but cut the LOGICAL plan at the RDD
                    # boundary: step() references `state` more than once (state
                    # ⋈ msgs(state)), so chaining raw plans grows the tree
                    # exponentially (2^k subtree copies). A lazy localCheckpoint
                    # plans this superstep now (small plan) and hands the next
                    # superstep a LogicalRDD — RDD lineage is a shared DAG, so
                    # growth is linear and one job materializes the whole chain.
                    state = new_state.localCheckpoint(eager=False)
                    continue
                new_state = new_state.persist()
                # ONE action per superstep: the stats aggregate both
                # materializes the persisted state and feeds masterCompute
                stats = new_state.agg(*stats_exprs).collect()[0].asDict()
                stats["superstep"] = s
                stats["wall_sec"] = time.time() - t0
                t0 = time.time()
                is_converged = converged(stats)
                # reference counting: converging superstep not counted
                ran = s if is_converged else s + 1
                is_last = is_converged or s == max_iterations - 1

                # lineage truncation every checkpoint_interval supersteps (and
                # at the end): durable parquet snapshot when a checkpoint dir
                # is configured, localCheckpoint otherwise. In between, plan
                # depth is bounded by the interval (persisted ancestors are
                # scanned from cache, one-superstep recompute worst case).
                truncate = is_last or ((s - start_superstep + 1) % self.checkpoint_interval == 0)
                if truncate:
                    pre_truncate = new_state
                    if self.manager is not None:
                        new_state = self.manager.save(new_state, s, extra={"stats": _plain(stats)})
                        stats["checkpointed"] = True
                    elif self.use_local_checkpoint:
                        new_state = new_state.localCheckpoint(eager=True)
                    if new_state is not pre_truncate:
                        live.append(pre_truncate)
                    for df in live:
                        df.unpersist()
                    live = []
                if self.manager is not None:
                    self.manager.log_metrics(_plain(stats))
                metrics.append(stats)
                if on_superstep:
                    on_superstep(s, stats)

                live.append(new_state)
                state = new_state
                if is_converged:
                    did_converge = True
                    break

        finally:
            conf.set("spark.sql.adaptive.enabled", old_aqe)

        return PregelResult(state=state, ran_iterations=ran, did_converge=did_converge, metrics=metrics)


def _plain(d: dict[str, Any]) -> dict[str, Any]:
    """JSON-safe copy of a stats dict."""
    out = {}
    for k, v in d.items():
        if hasattr(v, "item"):
            v = v.item()
        out[k] = v
    return out
