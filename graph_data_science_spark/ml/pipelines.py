"""The reference's trained pipelines, Spark-first.

References (specification, not implementation):
  pipeline/src/main/java/org/neo4j/gds/ml/pipeline/linkPipeline/
    linkfunctions/{Hadamard,L2,Cosine}FeatureStep.java  — link features
    LinkPredictionSplitConfig.java                      — testFraction /
      trainFraction / negativeSamplingRatio
    train/LinkPredictionTrain.java                      — split, negative
      sampling, logistic model, evaluation
  pipeline/.../nodePipeline/classification/... , regression/...
  The pipeline CATALOG surface lives in ml/catalog.py (named pipelines,
  model candidates, AutoTuningConfig random search); the model families
  a candidate can pick are logistic/linear (ml/logreg.py), random
  forest (ml/randomforest.py) and MLP (ml/mlp.py).

Spark-first: feature vectors are built as DataFrame ops (zip_with /
aggregate over embedding arrays), splits and negative samples are pure
hash functions (deterministic at any parallelism), training reduces
per-partition gradient partials (ml/logreg.py), and evaluation (AUC)
uses the distributed two-phase rank — no single-partition stage."""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.ml import logreg
from graph_data_science_spark.plans.graph import Graph
from graph_data_science_spark.plans.ranking import distributed_row_index

_COMBINERS = ("hadamard", "l2", "cosine")


def link_features(pairs: DataFrame, embeddings: DataFrame,
                  steps: list[str]) -> DataFrame:
    """(src, dst, ...) + (vid, embedding) -> + features array<double>.
    hadamard: elementwise product; l2: squared difference; cosine: one
    scalar (LinkFeatureStepFactory names)."""
    for s in steps:
        if s not in _COMBINERS:
            raise ValueError(f"unknown feature step {s!r}")
    out = (
        pairs.join(embeddings.select(F.col("vid").alias("src"),
                                     F.col("embedding").alias("_ea")), "src")
        .join(embeddings.select(F.col("vid").alias("dst"),
                                F.col("embedding").alias("_eb")), "dst")
    )
    parts = []
    for s in steps:
        if s == "hadamard":
            parts.append(F.zip_with("_ea", "_eb", lambda a, b: a * b))
        elif s == "l2":
            parts.append(F.zip_with("_ea", "_eb", lambda a, b: (a - b) * (a - b)))
        else:  # cosine
            dot = F.aggregate(F.zip_with("_ea", "_eb", lambda a, b: a * b),
                              F.lit(0.0), lambda acc, x: acc + x)
            na = F.sqrt(F.aggregate(F.transform("_ea", lambda a: a * a),
                                    F.lit(0.0), lambda acc, x: acc + x))
            nb = F.sqrt(F.aggregate(F.transform("_eb", lambda a: a * a),
                                    F.lit(0.0), lambda acc, x: acc + x))
            parts.append(F.array(F.when(na * nb > 0, dot / (na * nb)).otherwise(F.lit(0.0))))
    feats = parts[0]
    for p in parts[1:]:
        feats = F.concat(feats, p)
    return out.withColumn("features", feats).drop("_ea", "_eb")


@dataclass
class LinkPredictionModel:
    model: logreg.TrainedModel
    feature_steps: list[str]
    embeddings: DataFrame
    test_auc: float
    train_positives: int
    test_positives: int
    metrics: list[dict] = field(default_factory=list)

    def predict(self, pairs: DataFrame) -> DataFrame:
        """(src, dst) -> + probability."""
        featured = link_features(pairs, self.embeddings, self.feature_steps)
        kind = getattr(self.model, "kind", "")
        if kind in ("rf_class", "mlp_class"):
            if kind == "rf_class":
                from graph_data_science_spark.ml import randomforest as head
            else:
                from graph_data_science_spark.ml import mlp as head

            return featured.select("src", "dst", "features").mapInPandas(
                head.predict_expr(self.model),
                "src long, dst long, predicted_class long, "
                "probabilities array<double>",
            ).select(
                "src", "dst",
                F.element_at("probabilities", 2).alias("probability"),
            )
        return featured.select("src", "dst", "features").mapInPandas(
            logreg.predict_expr(self.model),
            "src long, dst long, probability double",
        )


def _auc(scored: DataFrame) -> float:
    """Rank-sum (Mann-Whitney) AUC, distributed: rank all test scores with
    the two-phase index, replace each tie group's ranks with the group's
    MIDRANK (avg rank per distinct probability — the standard Mann-Whitney
    tie correction), then AUC = (Σ midranks⁺ - P(P+1)/2) / (P·N). Without
    midranks a tied positive outranks every tied negative and a
    constant-score classifier scores 1.0 instead of 0.5 — and sigmoid
    saturation makes large tie groups realistic."""
    ranked = distributed_row_index(
        scored, ["probability", "y", "src", "dst"], index_col="_r"
    )
    mid = ranked.groupBy("probability").agg(F.avg(F.col("_r") + 1).alias("_mr"))
    ranked = ranked.join(mid, "probability")
    agg = ranked.agg(
        F.sum(F.when(F.col("y") == 1.0, F.col("_mr"))).alias("rsum"),
        F.sum(F.when(F.col("y") == 1.0, 1).otherwise(0)).alias("p"),
        F.count(F.lit(1)).alias("t"),
    ).collect()[0]
    p, t = int(agg["p"]), int(agg["t"])
    n = t - p
    if p == 0 or n == 0:
        return float("nan")
    return (float(agg["rsum"]) - p * (p + 1) / 2.0) / (p * n)


def link_prediction_train(
    graph: Graph,
    embeddings: DataFrame,          # (vid, embedding array<double>)
    feature_steps: list[str] | None = None,
    test_fraction: float = 0.3,
    negative_sampling_ratio: float = 1.0,
    epochs: int = 100,
    learning_rate: float = 0.2,
    l2_penalty: float = 0.0,
    seed: int = 42,
    model_family: str = "logistic",
    num_trees: int = 10,
    max_depth: int = 5,
    hidden_layer_sizes: tuple = (16,),
) -> LinkPredictionModel:
    """LinkPredictionTrain.java re-expressed: hash-split positive edges
    into train/test, draw `ratio` hash-deterministic negative non-edges
    per positive, train the model head on the configured link feature
    steps, and report test AUC. model_family: "logistic" (the reference
    default head here), "randomforest" (the reference's default LP
    candidate family — ml/ml-algo/.../models/randomforest/, trained by
    ml/randomforest.py's distributed histogram builder) or "mlp"
    (MLPClassifierTrainer.java — ml/mlp.py distributed backprop)."""
    if feature_steps is None:
        feature_steps = ["hadamard"]
    spark = graph.edges.sparkSession

    pos = graph.edges.select("src", "dst").distinct()
    h = F.pmod(F.abs(F.xxhash64(F.lit(seed), F.col("src"), F.col("dst"))), F.lit(1000))
    pos = pos.withColumn("_test", h < F.lit(int(test_fraction * 1000)))
    n_pos = pos.count()

    # negatives: hash-pick (rankA, rankB) pairs over the dense node rank,
    # reject self-pairs, actual edges (anti-join) and duplicate candidate
    # pairs (different _j can hash to the same (src, dst)); keep the first
    # `needed` survivors by hash order. Dense graphs reject many
    # candidates, so grow the attempt pool geometrically until enough
    # distinct negatives survive (or the pool is hopeless).
    ranked = distributed_row_index(graph.nodes.select("vid"), ["vid"], index_col="rk")
    ranked = ranked.persist()
    n = ranked.count()
    needed = int(negative_sampling_ratio * n_pos)

    def _candidates(pool: int) -> DataFrame:
        attempts = spark.range(pool).select(F.col("id").alias("_j"))
        return (
            attempts.withColumn(
                "_ra", F.pmod(F.abs(F.xxhash64(F.lit(seed + 1), F.col("_j"))), F.lit(n))
            ).withColumn(
                "_rb", F.pmod(F.abs(F.xxhash64(F.lit(seed + 2), F.col("_j"))), F.lit(n))
            )
            .join(ranked.select(F.col("rk").alias("_ra"), F.col("vid").alias("src")), "_ra")
            .join(ranked.select(F.col("rk").alias("_rb"), F.col("vid").alias("dst")), "_rb")
            .filter(F.col("src") != F.col("dst"))
            .select("_j", "src", "dst")
            .join(pos.select("src", "dst"), ["src", "dst"], "left_anti")
            .groupBy("src", "dst").agg(F.min("_j").alias("_j"))
        )

    pool = int(needed * 2) + 8
    # persist + count once per attempt: the candidate plan (hash gen +
    # two rank joins + anti-join + orderBy/limit) is re-read by every
    # downstream action otherwise
    cand = _candidates(pool).orderBy("_j").limit(needed).persist()
    n_cand = cand.count()
    for _ in range(3):
        if n_cand >= needed:
            break
        cand.unpersist()
        pool *= 4
        cand = _candidates(pool).orderBy("_j").limit(needed).persist()
        n_cand = cand.count()
    if n_cand < needed:
        import warnings

        warnings.warn(
            f"negative sampling found only {n_cand}/{needed} distinct "
            "non-edges (graph too dense); training proceeds with fewer negatives"
        )
    hneg = F.pmod(F.abs(F.xxhash64(F.lit(seed + 3), F.col("src"), F.col("dst"))), F.lit(1000))
    neg = cand.withColumn("_test", hneg < F.lit(int(test_fraction * 1000)))

    labeled = (
        pos.withColumn("y", F.lit(1.0))
        .unionByName(neg.select("src", "dst", "_test").withColumn("y", F.lit(0.0)))
    )
    featured = link_features(labeled, embeddings, feature_steps).persist()
    test = featured.filter(F.col("_test"))
    if model_family == "randomforest":
        from graph_data_science_spark.ml import randomforest as rf

        train = featured.filter(~F.col("_test")).select(
            F.xxhash64("src", "dst").alias("sid"), "features", "y"
        )
        model = rf.fit_random_forest_classifier(
            train, num_classes=2, num_trees=num_trees, max_depth=max_depth,
            seed=seed,
        )
        scored = test.select("src", "dst", "y", "features").mapInPandas(
            rf.predict_expr(model),
            "src long, dst long, y double, predicted_class long, "
            "probabilities array<double>",
        ).select(
            "src", "dst", "y",
            F.element_at("probabilities", 2).alias("probability"),
        )
    elif model_family == "mlp":
        from graph_data_science_spark.ml import mlp as mlpmod

        train = featured.filter(~F.col("_test")).select("features", "y")
        model = mlpmod.fit_mlp_classifier(
            train, num_classes=2, hidden_layer_sizes=hidden_layer_sizes,
            epochs=epochs, learning_rate=learning_rate,
            l2_penalty=l2_penalty, seed=seed,
        )
        scored = test.select("src", "dst", "y", "features").mapInPandas(
            mlpmod.predict_expr(model),
            "src long, dst long, y double, predicted_class long, "
            "probabilities array<double>",
        ).select(
            "src", "dst", "y",
            F.element_at("probabilities", 2).alias("probability"),
        )
    else:
        train = featured.filter(~F.col("_test")).select("features", "y")
        model = logreg.fit(
            train, kind="binary", epochs=epochs, learning_rate=learning_rate,
            l2_penalty=l2_penalty, seed=seed,
        )
        scored = test.select("src", "dst", "y", "features").mapInPandas(
            logreg.predict_expr(model),
            "src long, dst long, y double, probability double",
        )
    auc = _auc(scored)
    tp = test.filter(F.col("y") == 1.0).count()
    featured.unpersist()
    ranked.unpersist()
    cand.unpersist()
    return LinkPredictionModel(
        model=model, feature_steps=feature_steps, embeddings=embeddings,
        test_auc=auc, train_positives=n_pos - tp, test_positives=tp,
        metrics=[{"loss_per_epoch": model.loss_per_epoch, "test_auc": auc}],
    )


@dataclass
class NodeModel:
    model: logreg.TrainedModel
    classes: list | None
    test_metric: float              # accuracy (classification) / R2 (regression)
    candidate_metrics: list = field(default_factory=list)  # catalog model selection

    def predict(self, nodes: DataFrame) -> DataFrame:
        """(vid, features) -> predictions for the model kind."""
        if self.model.kind in ("softmax", "rf_class", "mlp_class"):
            if self.model.kind == "rf_class":
                from graph_data_science_spark.ml import randomforest as rf

                fn = rf.predict_expr(self.model)
            elif self.model.kind == "mlp_class":
                from graph_data_science_spark.ml import mlp as mlpmod

                fn = mlpmod.predict_expr(self.model)
            else:
                fn = logreg.predict_expr(self.model)
            out = nodes.select("vid", "features").mapInPandas(
                fn,
                "vid long, predicted_class long, probabilities array<double>",
            )
            if self.classes is not None:
                cls = F.array(*[F.lit(c) for c in self.classes])
                out = out.withColumn(
                    "predicted_class",
                    F.element_at(cls, F.col("predicted_class").cast("int") + 1),
                )
            return out
        return nodes.select("vid", "features").mapInPandas(
            logreg.predict_expr(self.model), "vid long, value double"
        )


def node_classification_train(
    nodes: DataFrame,               # (vid, features array<double>, label)
    test_fraction: float = 0.3,
    epochs: int = 100,
    learning_rate: float = 0.2,
    l2_penalty: float = 0.0,
    seed: int = 42,
    model_family: str = "logistic",
    num_trees: int = 10,
    max_depth: int = 5,
    hidden_layer_sizes: tuple = (16,),
) -> NodeModel:
    """nodePipeline/classification over node features, hash-deterministic
    train/test split, test accuracy reported. model_family: "logistic"
    (softmax head), "randomforest" (distributed histogram trees,
    ml/randomforest.py — the reference's RandomForestClassifierTrainer
    family) or "mlp" (ml/mlp.py — MLPClassifierTrainer.java)."""
    classes = [r["label"] for r in
               nodes.select("label").distinct().orderBy("label").collect()]
    cls_lit = F.array(*[F.lit(c) for c in classes])
    df = nodes.withColumn(
        "y", (F.array_position(cls_lit, F.col("label")) - 1).cast("double")
    ).withColumn(
        "_test",
        F.pmod(F.abs(F.xxhash64(F.lit(seed), F.col("vid"))), F.lit(1000))
        < F.lit(int(test_fraction * 1000)),
    ).persist()
    if model_family == "randomforest":
        from graph_data_science_spark.ml import randomforest as rf

        model = rf.fit_random_forest_classifier(
            df.filter(~F.col("_test")).select(
                F.col("vid").alias("sid"), "features", "y"
            ),
            num_classes=len(classes), num_trees=num_trees,
            max_depth=max_depth, seed=seed,
        )
        pred_fn = rf.predict_expr(model)
    elif model_family == "mlp":
        from graph_data_science_spark.ml import mlp as mlpmod

        model = mlpmod.fit_mlp_classifier(
            df.filter(~F.col("_test")).select("features", "y"),
            num_classes=len(classes), hidden_layer_sizes=hidden_layer_sizes,
            epochs=epochs, learning_rate=learning_rate,
            l2_penalty=l2_penalty, seed=seed,
        )
        pred_fn = mlpmod.predict_expr(model)
    else:
        model = logreg.fit(
            df.filter(~F.col("_test")).select("features", "y"),
            kind="softmax", num_classes=len(classes), epochs=epochs,
            learning_rate=learning_rate, l2_penalty=l2_penalty, seed=seed,
        )
        pred_fn = logreg.predict_expr(model)
    test = df.filter(F.col("_test"))
    pred = test.select("vid", "y", "features").mapInPandas(
        pred_fn,
        "vid long, y double, predicted_class long, probabilities array<double>",
    )
    agg = pred.agg(
        F.avg((F.col("predicted_class") == F.col("y").cast("long")).cast("double")).alias("acc")
    ).collect()[0]
    df.unpersist()
    return NodeModel(model=model, classes=classes,
                     test_metric=float(agg["acc"] or 0.0))


def node_regression_train(
    nodes: DataFrame,               # (vid, features array<double>, target double)
    test_fraction: float = 0.3,
    epochs: int = 200,
    learning_rate: float = 0.2,
    l2_penalty: float = 0.0,
    seed: int = 42,
) -> NodeModel:
    """nodePipeline/regression: linear model; test R² reported."""
    df = nodes.withColumn("y", F.col("target").cast("double")).withColumn(
        "_test",
        F.pmod(F.abs(F.xxhash64(F.lit(seed), F.col("vid"))), F.lit(1000))
        < F.lit(int(test_fraction * 1000)),
    ).persist()
    model = logreg.fit(
        df.filter(~F.col("_test")).select("features", "y"),
        kind="linear", epochs=epochs, learning_rate=learning_rate,
        l2_penalty=l2_penalty, seed=seed,
    )
    test = df.filter(F.col("_test"))
    pred = test.select("vid", "y", "features").mapInPandas(
        logreg.predict_expr(model), "vid long, y double, value double"
    )
    # R2 in two scalar passes (mean, then residuals) — no global window
    mean_y = test.agg(F.avg("y")).collect()[0][0] or 0.0
    stats = pred.agg(
        F.sum(F.pow(F.col("y") - F.col("value"), 2)).alias("ss_res"),
        F.sum(F.pow(F.col("y") - F.lit(mean_y), 2)).alias("ss_tot"),
    ).collect()[0]
    ss_res, ss_tot = float(stats["ss_res"] or 0), float(stats["ss_tot"] or 0)
    r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else float("nan")
    df.unpersist()
    return NodeModel(model=model, classes=None, test_metric=r2)
