"""Random walks + random-walk-with-restart graph sampling.

Reference surface:
  - gds.randomWalk (algo/.../walking/RandomWalk.java — node2vec-style
    walks with return/in-out factors; we implement the uniform case)
  - gds.graph.sample.rwr (graph-sampling/.../samplers/rw/rwr —
    random walk with restart subgraph sampling; Gemulla-style)

Spark-first: walker steps are pure hash functions of
(seed, walker, step) — deterministic at any parallelism, no RNG state.
One iteration = one join against the cached adjacency-list table and an
element_at pick; walk state stays a DataFrame (walker, position, path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.plans.graph import Graph


def _adjacency(graph: Graph) -> DataFrame:
    """(vid, nbrs sorted array, deg) — cached per sampling run."""
    return (
        graph.edges.groupBy(F.col("src").alias("vid"))
        .agg(F.array_sort(F.collect_list("dst")).alias("nbrs"))
        .withColumn("deg", F.size("nbrs"))
        .persist()
    )


def random_walks(
    graph: Graph,
    walks_per_node: int = 1,
    walk_length: int = 5,
    seed: int = 42,
    start_nodes: DataFrame | None = None,
) -> DataFrame:
    """(walk_id, start, path array<long>). Walks stop early at sinks.

    Uniform next-neighbor choice: index = xxhash64(seed, walk_id, step)
    mod degree — the deterministic analogue of the reference's seeded
    uniform sampler.
    """
    adj = _adjacency(graph)
    starts = (start_nodes or graph.nodes).select("vid")
    walkers = starts.select(
        F.col("vid").alias("start"),
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1))).alias("w"),
    ).select(
        F.concat_ws("_", F.col("start"), F.col("w")).alias("walk_id"),
        "start",
        F.col("start").alias("cur"),
        F.array(F.col("start")).alias("path"),
        F.lit(False).alias("stopped"),
    )
    state = walkers.persist()
    for step in range(walk_length):
        nbr = adj.select(F.col("vid").alias("cur"), "nbrs", "deg")
        joined = state.join(nbr, "cur", "left")
        idx = F.pmod(
            F.abs(F.xxhash64(F.lit(seed), F.col("walk_id"), F.lit(step))), F.col("deg")
        )
        nxt = F.when(
            ~F.col("stopped") & F.col("deg").isNotNull() & (F.col("deg") > 0),
            F.element_at(F.col("nbrs"), (idx + 1).cast("int")),
        )
        new_state = joined.select(
            "walk_id",
            "start",
            F.coalesce(nxt, F.col("cur")).alias("cur"),
            F.when(nxt.isNotNull(), F.concat(F.col("path"), F.array(nxt)))
            .otherwise(F.col("path"))
            .alias("path"),
            (F.col("stopped") | nxt.isNull()).alias("stopped"),
        ).persist()
        new_state.count()
        state.unpersist()
        state = new_state
    out = state.select("walk_id", "start", "path")
    adj.unpersist()
    return out


def sample_cnarw(
    graph: Graph,
    start_nodes: DataFrame,
    restart_probability: float = 0.1,
    walk_length: int = 10,
    walks_per_node: int = 5,
    seed: int = 42,
    coin: str = "xxhash64",
) -> Graph:
    """Common-neighbor-aware random walk sampling (gds.graph.sample.cnarw,
    graph-sampling/.../samplers/rw/cnarw — CNARW, Li et al., public
    literature): like RWR, but the next-hop choice is BIASED toward
    neighbors sharing many common neighbors with the current node
    (weight 1 + |N(cur) ∩ N(next)|), which steers walks into dense
    clusters instead of escaping through bridges.

    The per-edge common-neighbor counts are precomputed once with the
    same shared-neighbor self-join node_similarity uses (bounded by
    Σ_c indeg(c)²; cap hubs upstream via filter_edges for skewed
    graphs). The biased pick folds a deterministic hash over the
    cumulative weights — no RNG state, partition-invariant.

    coin="md5" swaps both per-step coins for the engine-portable md5
    family AND switches the roulette to INTEGER arithmetic (the 1+cn
    weights are integral: r = md5 % total weight, integer
    remaining-weight fold), so the graph_sample_cnarw DuckDB oracle
    replays every pick exactly — integer compares cannot diverge
    between the fold and the oracle's prefix-sum formulation the way a
    float subtraction chain can."""
    # common neighbors per existing edge (u,v): count of w with u->w, v->w
    e = graph.edges.select("src", "dst").distinct()
    l1 = e.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    l2 = e.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    cn = (
        l1.join(l2, "w")
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    weighted_adj = (
        e.join(
            cn.select(F.col("u").alias("src"), F.col("v").alias("dst"), "cn"),
            ["src", "dst"], "left",
        )
        .select(
            "src", "dst", (F.lit(1.0) + F.coalesce("cn", F.lit(0))).alias("wt")
        )
        .groupBy(F.col("src").alias("vid"))
        .agg(
            F.array_sort(F.collect_list(F.struct("dst", "wt"))).alias("nbrs"),
        )
        .withColumn(
            "total_wt",
            F.aggregate("nbrs", F.lit(0.0), lambda a, x: a + x["wt"]),
        )
        .persist()
    )
    walkers = start_nodes.select(
        F.col("vid").alias("start"),
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1))).alias("w"),
    ).select(
        F.concat_ws("_", F.col("start"), F.col("w")).alias("walk_id"),
        "start",
        F.col("start").alias("cur"),
    )
    visited = walkers.select(F.col("cur").alias("vid"))
    state = walkers.persist()
    p_scaled = int(restart_probability * (1 << 30))
    p32 = int(restart_probability * (1 << 32))
    for step in range(walk_length):
        nbr = weighted_adj.select(F.col("vid").alias("cur"), "nbrs", "total_wt")
        joined = state.join(nbr, "cur", "left")
        if coin == "md5":
            from graph_data_science_spark.operators.influence import _md5_u32

            restart = _md5_u32(F.lit("cnarw"), F.lit("r"), F.lit(str(seed)),
                               F.col("walk_id"), F.lit(str(step))) < F.lit(p32)
            # integer roulette: weights are integral (1 + cn), so
            # r = coin % total and an integer remaining-weight fold are
            # exact — replayable as a prefix-sum pick in the oracle
            total_long = F.aggregate(
                "nbrs", F.lit(0).cast("long"),
                lambda a, x: a + x["wt"].cast("long"),
            )
            r = F.pmod(
                _md5_u32(F.lit("cnarw"), F.lit("i"), F.lit(str(seed)),
                         F.col("walk_id"), F.lit(str(step))),
                total_long,
            )
            rem_is_long = True
        else:
            restart = (
                F.pmod(F.abs(F.xxhash64(F.lit(seed + 1), F.col("walk_id"), F.lit(step))),
                       F.lit(1 << 30))
                < p_scaled
            )
            # weighted pick: fold cumulative weights against a hash in
            # [0, total_wt) — the deterministic analogue of roulette sampling
            r = (
                F.pmod(F.abs(F.xxhash64(F.lit(seed), F.col("walk_id"), F.lit(step))),
                       F.lit(1 << 30)).cast("double")
                / F.lit(float(1 << 30))
                * F.col("total_wt")
            )
            rem_is_long = False
        wt_of = (lambda x: x["wt"].cast("long")) if rem_is_long else (lambda x: x["wt"])
        picked = F.aggregate(
            "nbrs",
            F.struct(r.alias("rem"), F.lit(None).cast("long").alias("pick")),
            lambda acc, x: F.when(acc["pick"].isNotNull(), acc)
            .when(
                acc["rem"] < wt_of(x),
                F.struct(acc["rem"].alias("rem"), x["dst"].alias("pick")),
            )
            .otherwise(
                F.struct((acc["rem"] - wt_of(x)).alias("rem"),
                         F.lit(None).cast("long").alias("pick"))
            ),
        )["pick"]
        nxt = F.when(restart, F.col("start")).otherwise(
            F.coalesce(picked, F.col("start"))  # sink -> restart
        )
        new_state = joined.select("walk_id", "start", nxt.alias("cur")).persist()
        new_state.count()
        state.unpersist()
        state = new_state
        visited = visited.unionByName(state.select(F.col("cur").alias("vid")))
    keep = visited.distinct().persist()
    kept_nodes = graph.nodes.join(keep, "vid", "left_semi")
    kept_edges = (
        graph.edges.join(keep.withColumnRenamed("vid", "src"), "src", "left_semi")
        .join(keep.withColumnRenamed("vid", "dst"), "dst", "left_semi")
        .select("src", "dst", "weight")
    )
    weighted_adj.unpersist()
    from dataclasses import replace

    return replace(
        graph, nodes=kept_nodes, edges=kept_edges, name=f"{graph.name or 'g'}_cnarw"
    )


def sample_rwr(
    graph: Graph,
    start_nodes: DataFrame,
    restart_probability: float = 0.1,
    walk_length: int = 10,
    walks_per_node: int = 5,
    seed: int = 42,
    coin: str = "xxhash64",
) -> Graph:
    """Random-walk-with-restart subgraph sample (gds.graph.sample.rwr):
    the induced subgraph over all nodes visited by restarting walks.

    Restart = with probability p the walker jumps back to its start
    (decided by hash(seed+1, walk_id, step) — deterministic).
    coin="md5" swaps both per-step coins for the engine-portable md5
    family so the graph_sample_rwr DuckDB oracle replays the walks.
    """
    adj = _adjacency(graph)
    walkers = start_nodes.select(
        F.col("vid").alias("start"),
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1))).alias("w"),
    ).select(
        F.concat_ws("_", F.col("start"), F.col("w")).alias("walk_id"),
        "start",
        F.col("start").alias("cur"),
    )
    visited = walkers.select(F.col("cur").alias("vid"))
    state = walkers.persist()
    p_scaled = int(restart_probability * (1 << 30))
    p32 = int(restart_probability * (1 << 32))
    for step in range(walk_length):
        nbr = adj.select(F.col("vid").alias("cur"), "nbrs", "deg")
        joined = state.join(nbr, "cur", "left")
        if coin == "md5":
            from graph_data_science_spark.operators.influence import _md5_u32

            restart = _md5_u32(F.lit("rwr"), F.lit("r"), F.lit(str(seed)),
                               F.col("walk_id"), F.lit(str(step))) < F.lit(p32)
            idx = F.pmod(
                _md5_u32(F.lit("rwr"), F.lit("i"), F.lit(str(seed)),
                         F.col("walk_id"), F.lit(str(step))),
                F.col("deg"),
            )
        else:
            restart = (
                F.pmod(F.abs(F.xxhash64(F.lit(seed + 1), F.col("walk_id"), F.lit(step))),
                       F.lit(1 << 30))
                < p_scaled
            )
            idx = F.pmod(
                F.abs(F.xxhash64(F.lit(seed), F.col("walk_id"), F.lit(step))), F.col("deg")
            )
        nxt = F.when(restart, F.col("start")).otherwise(
            F.when(
                F.col("deg").isNotNull() & (F.col("deg") > 0),
                F.element_at(F.col("nbrs"), (idx + 1).cast("int")),
            ).otherwise(F.col("start"))  # sink -> restart
        )
        new_state = joined.select("walk_id", "start", nxt.alias("cur")).persist()
        new_state.count()
        state.unpersist()
        state = new_state
        visited = visited.unionByName(state.select(F.col("cur").alias("vid")))
    keep = visited.distinct().persist()
    kept_nodes = graph.nodes.join(keep, "vid", "left_semi")
    kept_edges = (
        graph.edges.join(keep.withColumnRenamed("vid", "src"), "src", "left_semi")
        .join(keep.withColumnRenamed("vid", "dst"), "dst", "left_semi")
        .select("src", "dst", "weight")
    )
    adj.unpersist()
    from dataclasses import replace

    return replace(graph, nodes=kept_nodes, edges=kept_edges, name=f"{graph.name or 'g'}_rwr")


def biased_random_walks(
    graph: Graph,
    walks_per_node: int = 10,
    walk_length: int = 80,
    return_factor: float = 1.0,
    in_out_factor: float = 1.0,
    seed: int = 42,
    start_nodes: DataFrame | None = None,
) -> DataFrame:
    """node2vec second-order biased walks (reference
    algo/.../traversal/RandomWalk.java + Node2VecRandomWalkTask.java:
    unnormalized transition weight from (prev -> cur) to next is
    w(cur,next) * alpha, alpha = 1/returnFactor if next == prev, 1 if
    next adjacent to prev, 1/inOutFactor otherwise — Grover & Leskovec,
    node2vec, KDD 2016). Returns (walk_id, start, path array<long>).

    Spark-first: the whole transition — bias computation, cumulative
    roulette pick against a deterministic hash — runs inside ARRAY
    expressions on the cached adjacency struct (no explode, no window);
    one join per step. The previous node's neighbor-id array is carried
    forward from the previous step's join, so adjacency is joined
    exactly once per step."""
    adj = (
        graph.edges.groupBy(F.col("src").alias("vid"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("dst").alias("dst"), F.col("weight").alias("w")))
            ).alias("nbrs_w")
        )
        .withColumn("nbr_ids", F.transform("nbrs_w", lambda x: x["dst"]))
        .persist()
    )
    starts = (start_nodes or graph.nodes).select("vid")
    state = starts.select(
        F.col("vid").alias("start"),
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1))).alias("wk"),
    ).select(
        F.concat_ws("_", F.col("start"), F.col("wk")).alias("walk_id"),
        "start",
        F.lit(None).cast("long").alias("prev"),
        F.col("start").alias("cur"),
        F.lit(None).cast("array<long>").alias("prev_nbr_ids"),
        F.array(F.col("start")).alias("path"),
        F.lit(False).alias("stopped"),
    ).persist()
    inv_p = 1.0 / return_factor
    inv_q = 1.0 / in_out_factor
    for step in range(walk_length):
        nbr = adj.select(F.col("vid").alias("cur"), "nbrs_w", "nbr_ids")
        joined = state.join(nbr, "cur", "left")
        # alpha per candidate (first step: prev is null -> alpha = 1)
        biased = F.transform(
            "nbrs_w",
            lambda x: F.struct(
                x["dst"].alias("dst"),
                (
                    x["w"]
                    * F.when(F.col("prev").isNull(), F.lit(1.0))
                    .when(x["dst"] == F.col("prev"), F.lit(inv_p))
                    .when(
                        F.array_contains(F.col("prev_nbr_ids"), x["dst"]),
                        F.lit(1.0),
                    )
                    .otherwise(F.lit(inv_q))
                ).alias("wt"),
            ),
        )
        joined = joined.withColumn("biased", biased).withColumn(
            "total_wt", F.aggregate("biased", F.lit(0.0), lambda a, x: a + x["wt"])
        )
        r = (
            F.pmod(F.abs(F.xxhash64(F.lit(seed), F.col("walk_id"), F.lit(step))),
                   F.lit(1 << 30)).cast("double")
            / F.lit(float(1 << 30))
            * F.col("total_wt")
        )
        picked = F.aggregate(
            "biased",
            F.struct(r.alias("rem"), F.lit(None).cast("long").alias("pick")),
            lambda acc, x: F.when(acc["pick"].isNotNull(), acc)
            .when(
                acc["rem"] < x["wt"],
                F.struct(acc["rem"].alias("rem"), x["dst"].alias("pick")),
            )
            .otherwise(
                F.struct((acc["rem"] - x["wt"]).alias("rem"),
                         F.lit(None).cast("long").alias("pick"))
            ),
        )["pick"]
        nxt = F.when(
            ~F.col("stopped") & (F.col("total_wt") > 0), picked
        )
        new_state = joined.select(
            "walk_id",
            "start",
            F.when(nxt.isNotNull(), F.col("cur")).otherwise(F.col("prev")).alias("prev"),
            F.coalesce(nxt, F.col("cur")).alias("cur"),
            F.when(nxt.isNotNull(), F.col("nbr_ids"))
            .otherwise(F.col("prev_nbr_ids"))
            .alias("prev_nbr_ids"),
            F.when(nxt.isNotNull(), F.concat(F.col("path"), F.array(nxt)))
            .otherwise(F.col("path"))
            .alias("path"),
            (F.col("stopped") | nxt.isNull()).alias("stopped"),
        ).persist()
        new_state.count()
        state.unpersist()
        state = new_state
    out = state.select("walk_id", "start", "path")
    adj.unpersist()
    return out
