"""Influence maximization — gds.beta.influenceMaximization.celf.

Reference: algo/src/main/java/org/neo4j/gds/influenceMaximization/
CELF.java (greedy + lazy-forward over Monte-Carlo Independent-Cascade
simulations; defaults propagationProbability=0.1,
monteCarloSimulations=100 from InfluenceMaximizationBaseConfig:30-39;
result = seed node -> spread, ties to the smaller node id :66-72).

Spark-first estimator: the reference's ICLazyForwardMC re-simulates
cascades per candidate on shared memory — a shape that cannot fan out
as DataFrame ops. The distributed equivalent from the public
literature is REVERSE-REACHABLE (RR) sampling (Borgs et al., SODA 2014;
Tang et al. TIM/IMM, SIGMOD 2014-15): sample R random (root, live-edge
subgraph) pairs, compute each root's reverse-reachable set with ONE
multi-source reverse-BFS fixpoint (all roots propagate together as
(root, node) rows), then run the SAME greedy CELF performs as
max-coverage over the RR table — k rounds of groupBy-count + anti-join.
spread(S) is estimated by n * coveredFraction. The greedy sequence and
tie rule match CELF; the spread values are the RIS estimator's, not
MC-replay ones (both converge to the true expected spread as their
sample counts grow; documented divergence).

Every random choice is a pure hash of (random_seed, sample, edge) — no
RNG state, deterministic at any parallelism.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.plans.graph import Graph
from graph_data_science_spark.plans.lineage import cut_lineage


@dataclass
class CELFResult:
    seeds: DataFrame  # (rank, vid, spread) — spread = cumulative estimate
    rr_sets: int
    metrics: list[dict] = field(default_factory=list)


def _md5_u32(*cols):
    """First 8 md5 hex chars of '#'-joined parts as a uint32 — identical
    in DuckDB as ('0x' || substr(md5(...), 1, 8))::BIGINT, which is what
    makes the graph_celf oracle hash-exact. Shared engine-portable coin:
    fastrp (base vectors) and k1coloring (init colors) import it; any
    change here must be mirrored in every oracle's SQL replay."""
    return F.conv(
        F.substring(F.md5(F.concat_ws("#", *cols)), 1, 8), 16, 10
    ).cast("long")


def celf(
    graph: Graph,
    seed_set_size: int,
    propagation_probability: float = 0.1,
    monte_carlo_simulations: int = 100,
    random_seed: int = 42,
    rr_per_simulation: int = 10,
    max_iterations: int = 50,
    coin: str = "xxhash64",
) -> CELFResult:
    """Greedy influence maximization under Independent Cascade.
    R = monte_carlo_simulations * rr_per_simulation reverse-reachable
    samples; each sample draws a uniform root (hash) and a live-edge
    subgraph (every edge kept i.i.d. with propagation_probability).
    coin="xxhash64" (default, pure-JVM fast path) or "md5" (engine-
    portable — the DuckDB oracle replays the identical coins)."""
    spark = graph.edges.sparkSession
    n = graph.nodes.count()
    k = min(seed_set_size, n)
    r_total = monte_carlo_simulations * rr_per_simulation

    # roots: sample r_total uniform nodes (hash-ranked with replacement
    # via modulo over a dense rank)
    from graph_data_science_spark.plans.ranking import distributed_row_index

    ranked = distributed_row_index(graph.nodes.select("vid"), ["vid"], index_col="rk")
    samples = spark.range(r_total).select(F.col("id").alias("sample"))
    if coin == "md5":
        root_rk = F.pmod(
            _md5_u32(F.lit(str(random_seed)), F.lit("r"), F.col("sample")), F.lit(n)
        )
    else:
        root_rk = F.pmod(
            F.abs(F.xxhash64(F.lit(random_seed), F.col("sample"))), F.lit(n)
        )
    roots = (
        samples.withColumn("rk", root_rk)
        .join(ranked, "rk")
        .select("sample", F.col("vid").alias("node"))
    )

    # reverse multi-source BFS over per-sample live edges: frontier rows
    # (sample, node); an edge (src -> dst) is traversed dst -> src iff
    # hash(seed, sample, src, dst) keeps it (the SAME coin for a given
    # (sample, edge) every round — one live-edge draw per simulation)
    p_scaled = int(propagation_probability * (1 << 30))
    redges = (
        graph.edges.select(F.col("dst").alias("node"), F.col("src").alias("prev"))
        .distinct()
        .persist()
    )
    if coin == "md5":
        p32 = int(propagation_probability * (1 << 32))
        live = (
            _md5_u32(F.lit(str(random_seed)), F.lit("e"), F.col("sample"),
                     F.col("prev"), F.col("node"))
            < F.lit(p32)
        )
    else:
        live = (
            F.pmod(
                F.abs(
                    F.xxhash64(
                        F.lit(random_seed + 1), F.col("sample"),
                        F.col("prev"), F.col("node"),
                    )
                ),
                F.lit(1 << 30),
            )
            < F.lit(p_scaled)
        )
    member = roots.withColumn("origin", F.lit(True)).persist()
    frontier = roots
    for _ in range(max_iterations):
        nxt = (
            frontier.join(redges, "node")
            .filter(live)
            .select("sample", F.col("prev").alias("node"))
            .distinct()
            .join(member.select("sample", "node"), ["sample", "node"], "left_anti")
            .transform(cut_lineage)
        )
        if nxt.limit(1).count() == 0:
            break
        prev_member = member
        # cut_lineage materializes the union eagerly (checkpoint blocks),
        # so the superseded cumulative frame can be dropped immediately —
        # no extra persist/count copy on top of the checkpoint
        member = member.unionByName(
            nxt.withColumn("origin", F.lit(False))
        ).transform(cut_lineage)
        prev_member.unpersist()
        frontier = nxt

    rr = member.select("sample", "node").persist()
    redges.unpersist()

    # greedy max-coverage: k rounds of count-per-node + covered-set
    # removal (exactly CELF's greedy order; ties to the smaller vid)
    seeds: list[tuple[int, int, float]] = []
    covered_total = 0
    uncovered = rr
    for rank in range(k):
        top = (
            uncovered.groupBy("node")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("node"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        v, cnt = int(top[0]["node"]), int(top[0]["cnt"])
        covered_total += cnt
        seeds.append((rank, v, float(n) * covered_total / r_total))
        hit = uncovered.filter(F.col("node") == v).select("sample").distinct()
        uncovered = uncovered.join(hit, "sample", "left_anti").transform(cut_lineage)
    rr.unpersist()
    member.unpersist()

    seeds_df = spark.createDataFrame(
        seeds or [(0, -1, 0.0)][:0], "rank int, vid long, spread double"
    )
    return CELFResult(seeds=seeds_df, rr_sets=r_total)
