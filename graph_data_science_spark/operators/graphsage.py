"""GraphSage node embeddings — inductive mean-aggregator GNN with
unsupervised (skip-gram-style) training.

Reference (specification, not implementation):
  algo/src/main/java/org/neo4j/gds/embeddings/graphsage/
    MeanAggregator.java            h_l = act(MEAN({h_{l-1}(v)} ∪
                                   {h_{l-1}(u), u ∈ sampled N(v)}) · W_lᵀ)
    GraphSageHelper.java:84        final representations are row-L2-normalized
    GraphSageLoss.java:43-57       L = mean_i[-w·log σ(z_i·z_pos)
                                   - Q·log σ(-z_i·z_neg)]
    GraphSageModelTrainer.java     epoch loop, Adam, batch sampling,
                                   positives from short random walks
                                   (BatchSampler searchDepth), negatives
                                   sampled degree-proportionally
    LayerFactory.java:91           uniform(-bound, bound) weight init
  tests: GraphSageTrainAlgorithmFactoryTest / GraphSageModelTrainerTest
  (loss decreases, determinism).

Spark-first execution:
  - the forward pass is fully distributed: neighbor sampling is a
    deterministic xxhash64 rank (top-S per receiving node), the mean is a
    map-side-combinable sum/count aggregate, and the W multiply is an
    Arrow-batched pandas UDF (numpy matmul — the "UDF only where builtins
    can't express it" case);
  - the backward pass is hand-derived for the mean/activation/normalize
    chain (gradient-checked in tests/test_graphsage.py against numerical
    differentiation) and runs as the same joins in reverse; per-layer
    weight gradients reduce via per-partition einsum partials
    (mapInPandas), so only O(partitions × dim²) floats reach the driver;
  - Adam and the (small) weight matrices live on the driver and ship as
    broadcast literals — the reference holds them in one JVM too;
  - positives come from a distributed uniform-neighbor hop chain
    (searchDepth hops, hash-seeded), negatives from a degree-proportional
    hash-ranked pool (edge endpoints), both deterministic in (seed, epoch).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

from graph_data_science_spark.plans.graph import Graph
from graph_data_science_spark.plans.lineage import cut_lineage


@dataclass
class GraphSageModel:
    weights: list[np.ndarray]       # W_l: (dim_l, dim_{l-1})
    sample_sizes: list[int]
    activation: str                 # "sigmoid" | "relu"
    feature_dimension: int
    loss_per_epoch: list[float] = field(default_factory=list)


@dataclass
class GraphSageResult:
    embeddings: DataFrame           # (vid, embedding array<double>)
    model: GraphSageModel
    metrics: list[dict[str, Any]] = field(default_factory=list)


def _act(a: np.ndarray, kind: str) -> np.ndarray:
    if kind == "sigmoid":
        return 1.0 / (1.0 + np.exp(-a))
    return np.maximum(a, 0.0)


def _act_grad_from_out(h: np.ndarray, a: np.ndarray, kind: str) -> np.ndarray:
    if kind == "sigmoid":
        return h * (1.0 - h)
    return (a > 0).astype(np.float64)


def _matmul_udf(w: np.ndarray, activation: str | None):
    """(vid, m) -> (vid, a, h): a = m @ Wᵀ, h = act(a). Arrow-batched."""
    wT = w.T.copy()

    def fn(iterator):
        for pdf in iterator:
            m = np.stack(pdf["m"].to_numpy()) if len(pdf) else np.zeros((0, wT.shape[0]))
            a = m @ wT
            out = pd.DataFrame({
                "vid": pdf["vid"],
                "a": list(a),
                "h": list(_act(a, activation)) if activation else list(a),
            })
            yield out

    return fn


def _mean_layer(edges_l: DataFrame, prev: DataFrame, n_part: int) -> DataFrame:
    """m(v) = (h(v) + Σ_{u in sampled N(v)} h(u)) / (1 + |sampled N(v)|).
    Returns (vid, m array<double>, cnt). prev: (vid, h)."""
    nbr = (
        edges_l.join(prev.select(F.col("vid").alias("e_src"), F.col("h").alias("hs")), "e_src")
        .groupBy(F.col("e_dst").alias("vid"))
        .agg(
            F.aggregate(
                F.collect_list("hs"),
                F.transform(F.first("hs"), lambda _: F.lit(0.0)),
                lambda acc, v: F.zip_with(acc, v, lambda x, y: x + y),
            ).alias("nsum"),
            F.count(F.lit(1)).alias("ncnt"),
        )
    )
    joined = prev.join(nbr, "vid", "left")
    cnt = F.coalesce(F.col("ncnt"), F.lit(0))
    m = F.when(
        F.col("nsum").isNotNull(),
        F.zip_with("h", "nsum", lambda a, b: (a + b) / (cnt + F.lit(1)).cast("double")),
    ).otherwise(F.col("h"))
    return joined.select("vid", m.alias("m"), (cnt + 1).cast("double").alias("deg"))


def _sample_edges(graph: Graph, sample_size: int, seed: int, tag: int, n_part: int) -> DataFrame:
    """Deterministic top-S in-neighbors per receiving node: rank edges by
    xxhash64(seed, tag, dst, src) within dst, keep rank <= S. Receiving
    side = edge dst (messages flow src -> dst)."""
    from pyspark.sql import Window

    e = graph.edges.select(F.col("src").alias("e_src"), F.col("dst").alias("e_dst"))
    w = Window.partitionBy("e_dst").orderBy(
        F.xxhash64(F.lit(seed), F.lit(tag), F.col("e_dst"), F.col("e_src"))
    )
    return (
        e.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= sample_size)
        .drop("_r")
        .repartition(n_part, "e_dst")
        .persist()
    )


def _forward(
    features: DataFrame,
    sampled: list[DataFrame],
    weights: list[np.ndarray],
    activation: str,
    n_part: int,
):
    """Layer-wise forward pass. Returns (tapes, z) where tapes[l] is the
    cached (vid, m, deg, a, h) frame of layer l and z is the row-normalized
    final embedding frame (vid, z array<double>)."""
    spark = features.sparkSession
    cur = features.select("vid", F.col("feat").alias("h"))
    tapes = []
    for l, w in enumerate(weights):
        means = _mean_layer(sampled[l], cur, n_part)
        schema = "vid long, a array<double>, h array<double>"
        ah = means.select("vid", "m").mapInPandas(_matmul_udf(w, activation), schema)
        tape = cut_lineage(
            means.join(ah, "vid").select("vid", "m", "deg", "a", "h")
        ).persist()
        tape.count()
        tapes.append(tape)
        cur = tape.select("vid", "h")
    norm = F.sqrt(F.aggregate("h", F.lit(0.0), lambda acc, x: acc + x * x))
    z = cur.select(
        "vid",
        F.transform(
            "h", lambda x: F.when(norm > 0, x / norm).otherwise(x)
        ).alias("z"),
        norm.alias("znorm"),
    )
    return tapes, z


def _sum_arrays(df: DataFrame, vid_col: str, arr_col: str) -> DataFrame:
    """Elementwise sum of array<double> per vid — exploded so the shuffle
    is a map-side-combinable scalar sum."""
    return (
        df.select(F.col(vid_col).alias("vid"), F.posexplode(arr_col).alias("i", "x"))
        .groupBy("vid", "i").agg(F.sum("x").alias("x"))
        .groupBy("vid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "x"))), lambda s: s["x"]
            ).alias("arr")
        )
    )


def _weight_grad(rows: DataFrame, dim_out: int, dim_in: int) -> np.ndarray:
    """Σ_v da(v)ᵀ ⊗ m(v) as per-partition einsum partials; only
    O(partitions × dim_out × dim_in) floats hit the driver."""
    def fn(iterator):
        acc = np.zeros((dim_out, dim_in))
        for pdf in iterator:
            if len(pdf):
                da = np.stack(pdf["da"].to_numpy())
                m = np.stack(pdf["m"].to_numpy())
                acc += np.einsum("bi,bj->ij", da, m)
        yield pd.DataFrame({"g": [acc.ravel()]})

    parts = rows.mapInPandas(fn, "g array<double>").collect()
    out = np.zeros((dim_out, dim_in))
    for r in parts:
        out += np.asarray(r["g"]).reshape(dim_out, dim_in)
    return out


def _positive_pairs(graph: Graph, batch: DataFrame, depth: int, seed: int) -> DataFrame:
    """(vid, pos): endpoint of a `depth`-hop uniform-hash walk from vid
    (BatchSampler's searchDepth positives). Deterministic in seed."""
    from pyspark.sql import Window

    cur = batch.select("vid", F.col("vid").alias("pos"))
    e = graph.edges.select(F.col("src").alias("pos"), F.col("dst").alias("nxt"))
    for hop in range(depth):
        w = Window.partitionBy("vid").orderBy(
            F.xxhash64(F.lit(seed), F.lit(hop), F.col("vid"), F.col("nxt"))
        )
        stepped = (
            cur.join(e, "pos", "left")
            .withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
            .select("vid", F.coalesce("nxt", "pos").alias("pos"))
        )
        cur = stepped.localCheckpoint(eager=True)
    return cur


def _negative_pool(graph: Graph, pool_size: int, seed: int) -> list[int]:
    """Degree-proportional candidate pool: hash-ranked edge destinations
    (each node appears ∝ in-degree, the reference's negative sampling
    bias). Bounded driver footprint (pool_size ids)."""
    rows = (
        graph.edges.select("src", "dst")
        .withColumn("_h", F.xxhash64(F.lit(seed), F.col("src"), F.col("dst")))
        .orderBy("_h").limit(pool_size).collect()
    )
    return [int(r["dst"]) for r in rows]


def _loss_and_grads(
    spark,
    feats: DataFrame,
    sampled: list[DataFrame],
    weights: list[np.ndarray],
    activation: str,
    trip: DataFrame,                # (vid, pos, neg)
    negative_sample_weight: float,
    n_part: int,
) -> tuple[float, list[np.ndarray]]:
    """Loss + dL/dW_l for fixed weights / samples / triples — the unit the
    finite-difference test checks (tests/test_graphsage.py)."""
    tapes, z = _forward(feats, sampled, weights, activation, n_part)
    z = cut_lineage(z).persist()
    rows = (
        trip.join(z.select(F.col("vid").alias("b"), F.col("z").alias("zb")),
                  trip["vid"] == F.col("b"))
        .join(z.select(F.col("vid").alias("p"), F.col("z").alias("zp")),
              trip["pos"] == F.col("p"))
        .join(z.select(F.col("vid").alias("n"), F.col("z").alias("zn")),
              trip["neg"] == F.col("n"))
        .select("vid", "pos", "neg", "zb", "zp", "zn")
        .collect()
    )  # bounded by batch_size
    B = len(rows)
    if B == 0:
        for tape in tapes:
            tape.unpersist()
        z.unpersist()
        return 0.0, [np.zeros_like(w) for w in weights]
    zb = np.array([r["zb"] for r in rows])
    zp = np.array([r["zp"] for r in rows])
    zn = np.array([r["zn"] for r in rows])
    pos_aff = np.sum(zb * zp, axis=1)
    neg_aff = np.sum(zb * zn, axis=1)
    sig_p = 1.0 / (1.0 + np.exp(-pos_aff))
    sig_n = 1.0 / (1.0 + np.exp(-neg_aff))
    Q = negative_sample_weight
    loss = float(np.mean(-np.log(np.clip(sig_p, 1e-12, 1))
                         - Q * np.log(np.clip(1 - sig_n, 1e-12, 1))))

    c_p = -(1.0 - sig_p) / B          # dL/d(pos_aff)
    c_n = (Q * sig_n) / B             # dL/d(neg_aff)
    dz_acc: dict[int, np.ndarray] = {}

    def add(vid, g):
        dz_acc[vid] = dz_acc.get(vid, 0) + g

    for i, r in enumerate(rows):
        add(int(r["vid"]), c_p[i] * zp[i] + c_n[i] * zn[i])
        add(int(r["pos"]), c_p[i] * zb[i])
        add(int(r["neg"]), c_n[i] * zb[i])
    dz_df = spark.createDataFrame(
        [(int(v), [float(x) for x in g]) for v, g in dz_acc.items()],
        "vid long, dz array<double>",
    ).repartition(n_part, "vid")

    # backprop through row normalization: dh = (dz - z(z·dz)) / ||h||
    zj = z.join(dz_df, "vid")
    zdot = F.aggregate(
        F.zip_with("z", "dz", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
    )
    dh = zj.select(
        "vid",
        F.zip_with(
            "dz", "z",
            lambda d, zc: F.when(
                F.col("znorm") > 0, (d - zc * zdot) / F.col("znorm")
            ).otherwise(d),
        ).alias("dh"),
    )

    grads: list[np.ndarray] = [None] * len(weights)  # type: ignore[list-item]
    for l in range(len(weights) - 1, -1, -1):
        tape = tapes[l]
        joined = tape.join(dh, "vid")
        if activation == "sigmoid":
            da = F.zip_with("dh", "h", lambda d, hv: d * hv * (F.lit(1.0) - hv))
        else:
            da = F.zip_with(
                "dh", "a", lambda d, av: F.when(av > 0, d).otherwise(F.lit(0.0))
            )
        da_rows = cut_lineage(
            joined.select("vid", da.alias("da"), "m", "deg")
        ).persist()
        da_rows.count()
        grads[l] = _weight_grad(
            da_rows.select("da", "m"), weights[l].shape[0], weights[l].shape[1]
        )
        if l > 0:
            # dm = da · W_l ; dh_{l-1}(u) += dm(v)/deg(v) for u ∈ {v} ∪ S_l(v)
            wl = weights[l]

            def dm_fn(iterator, _w=wl):
                for pdf in iterator:
                    if len(pdf):
                        d = np.stack(pdf["da"].to_numpy()) @ _w
                        d = d / pdf["deg"].to_numpy()[:, None]
                        yield pd.DataFrame({"vid": pdf["vid"], "dm": list(d)})
                    else:
                        yield pd.DataFrame({"vid": [], "dm": []})

            dm = da_rows.select("vid", "da", "deg").mapInPandas(
                dm_fn, "vid long, dm array<double>"
            )
            scatter = dm.select("vid", "dm").unionByName(
                sampled[l]
                .join(dm.select(F.col("vid").alias("e_dst"), "dm"), "e_dst")
                .select(F.col("e_src").alias("vid"), "dm")
            )
            dh = _sum_arrays(scatter, "vid", "dm").select(
                "vid", F.col("arr").alias("dh")
            )
            dh = cut_lineage(dh)
        da_rows.unpersist()
    for tape in tapes:
        tape.unpersist()
    z.unpersist()
    return loss, grads


def graphsage_train(
    graph: Graph,
    features: DataFrame,            # (vid, feat array<double>)
    embedding_dimension: int = 16,
    sample_sizes: list[int] | None = None,
    activation: str = "sigmoid",
    epochs: int = 10,
    learning_rate: float = 0.1,
    batch_size: int = 256,
    search_depth: int = 5,
    negative_sample_weight: float = 20.0,
    tolerance: float = 1e-4,
    seed: int = 42,
) -> GraphSageResult:
    """Train mean-aggregator GraphSage weights (GraphSageModelTrainer) and
    return embeddings for every node. One hash-sampled batch per epoch
    (the reference draws batchesPerIteration batches; the update rule per
    batch is identical)."""
    if sample_sizes is None:
        sample_sizes = [25, 10]
    spark = graph.edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    feat_row = features.select(F.size("feat").alias("d")).first()
    feat_dim = int(feat_row["d"]) if feat_row else 0

    dims = [feat_dim] + [embedding_dimension] * len(sample_sizes)
    rng = np.random.default_rng(seed)
    weights = []
    for l in range(len(sample_sizes)):
        bound = np.sqrt(6.0) / np.sqrt(dims[l] + dims[l + 1])
        weights.append(rng.uniform(-bound, bound, (dims[l + 1], dims[l])))

    feats = features.select("vid", "feat").repartition(n_part, "vid").persist()
    feats.count()
    pool = _negative_pool(graph, 1024, seed)

    # Adam state
    mom = [np.zeros_like(w) for w in weights]
    vel = [np.zeros_like(w) for w in weights]
    b1, b2, eps = 0.9, 0.999, 1e-8
    loss_per_epoch: list[float] = []
    metrics: list[dict[str, Any]] = []

    for epoch in range(epochs):
        sampled = [
            _sample_edges(graph, s, seed + epoch, l, n_part)
            for l, s in enumerate(sample_sizes)
        ]
        # batch + positives + negatives (deterministic per epoch)
        batch = (
            graph.nodes.select("vid")
            .orderBy(F.xxhash64(F.lit(seed), F.lit(epoch), F.col("vid")))
            .limit(batch_size)
        )
        pairs = _positive_pairs(graph, batch, search_depth, seed + 31 * epoch)
        neg_idx = F.pmod(
            F.xxhash64(F.lit(seed), F.lit(epoch + 977), F.col("vid")), F.lit(len(pool))
        ).cast("int")
        pool_lit = F.array(*[F.lit(p) for p in pool])
        trip = pairs.select(
            "vid", "pos", F.element_at(pool_lit, neg_idx + 1).alias("neg")
        )
        loss, grads = _loss_and_grads(
            spark, feats, sampled, weights, activation, trip,
            negative_sample_weight, n_part,
        )
        loss_per_epoch.append(loss)

        # Adam update
        t = epoch + 1
        for l, g in enumerate(grads):
            mom[l] = b1 * mom[l] + (1 - b1) * g
            vel[l] = b2 * vel[l] + (1 - b2) * g * g
            mhat = mom[l] / (1 - b1**t)
            vhat = vel[l] / (1 - b2**t)
            weights[l] = weights[l] - learning_rate * mhat / (np.sqrt(vhat) + eps)

        metrics.append({"epoch": epoch, "loss": loss})
        for s in sampled:
            s.unpersist()
        if len(loss_per_epoch) > 1 and abs(loss_per_epoch[-2] - loss) < tolerance:
            break

    model = GraphSageModel(
        weights=weights, sample_sizes=sample_sizes,
        activation=activation, feature_dimension=feat_dim,
        loss_per_epoch=loss_per_epoch,
    )
    emb = graphsage_embeddings(graph, feats, model, seed=seed)
    feats.unpersist()
    return GraphSageResult(embeddings=emb, model=model, metrics=metrics)


def graphsage_embeddings(
    graph: Graph,
    features: DataFrame,
    model: GraphSageModel,
    seed: int = 42,
) -> DataFrame:
    """Inference: the trained layers applied to (possibly new) nodes —
    GraphSageEmbeddingsGenerator. Returns (vid, embedding)."""
    spark = graph.edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sampled = [
        _sample_edges(graph, s, seed, 1000 + l, n_part)
        for l, s in enumerate(model.sample_sizes)
    ]
    feats = features.select("vid", "feat")
    tapes, z = _forward(feats, sampled, model.weights, model.activation, n_part)
    out = z.select("vid", F.col("z").alias("embedding"))
    out = cut_lineage(out)
    for tape in tapes:
        tape.unpersist()
    for s in sampled:
        s.unpersist()
    return out
