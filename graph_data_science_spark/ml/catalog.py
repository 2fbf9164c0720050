"""Pipeline + model catalogs — the gds.beta.pipeline.* / gds.model.* surface.

Reference (specification, not implementation):
  pipeline/src/main/java/org/neo4j/gds/ml/pipeline/PipelineCatalog.java
    (per-user named registry: create / get / drop / list, duplicate-name
    rejection)
  pipeline/.../TrainingPipeline.java (nodePropertySteps + featureSteps)
  pipeline/.../linkPipeline/LinkPredictionTrainingPipeline.java
    (gds.beta.pipeline.linkPrediction.create / addNodeProperty /
     addFeature / configureSplit / train)
  pipeline/.../nodePipeline/classification + regression
  model-catalog-api (ModelCatalog: named trained models)

Model candidates (reference: addLogisticRegression / addRandomForest /
addMLP on the pipeline; ml/ml-algo/.../models/randomforest/
RandomForestClassifierTrainer.java, mlp/MLPClassifierTrainer.java):
LP and NC pipelines accept multiple candidates via add_logistic_regression /
add_random_forest / add_mlp; train() fits every candidate and keeps the
best by the pipeline's main metric (AUC / accuracy) — the reference's
model-selection semantics. Autotuning (AutoTuningConfig.java +
RandomSearch.java): a candidate hyperparameter given as
{"range": [lo, hi]} marks the candidate TUNABLE; configure_auto_tuning
(max_trials, default 10 like AutoTuningConfig.MAX_TRIALS) caps how many
concrete configs are sampled from the tunable candidates (round-robin,
seeded; log-uniform for learning_rate / l2_penalty / tolerance — the
params the reference marks LogScale — uniform otherwise, integer-valued
when both bounds are ints). Concrete candidates always train.

The facade executes each node-property step (an operator from the algo
surface: fastRP / hashGNN / pageRank / degree) against the train graph,
concatenates the produced properties into ONE feature vector per node
(array<double>, scalars widened to 1-wide arrays — the reference's
feature-assembly contract), and delegates training to ml/pipelines.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.plans.graph import Graph


class ModelCatalog:
    """gds.model.* — named trained models (model-catalog-api)."""

    def __init__(self):
        self._models: dict[str, Any] = {}

    def register(self, name: str, model: Any) -> None:
        if name in self._models:
            raise ValueError(f"Model with name `{name}` already exists.")
        self._models[name] = model

    def get(self, name: str) -> Any:
        if name not in self._models:
            raise ValueError(f"Model with name `{name}` does not exist.")
        return self._models[name]

    def exists(self, name: str) -> bool:
        return name in self._models

    def drop(self, name: str) -> None:
        if name not in self._models:
            raise ValueError(f"Model with name `{name}` does not exist.")
        del self._models[name]

    def list(self) -> list[str]:
        return sorted(self._models)


def _run_node_property_step(graph: Graph, procedure: str, config: dict) -> DataFrame:
    """Execute one nodePropertyStep; returns (vid, _prop array<double>)."""
    proc = procedure.lower().replace(".", "").replace("_", "")
    if proc == "fastrp":
        from graph_data_science_spark.operators.fastrp import fast_rp

        out = fast_rp(graph, **config)
        return out.select("vid", F.col("embedding").alias("_prop"))
    if proc == "hashgnn":
        from graph_data_science_spark.operators.hashgnn import hashgnn

        out = hashgnn(graph, **config)
        return out.embeddings.select(
            "vid", F.col("embedding").cast("array<double>").alias("_prop")
        )
    if proc == "pagerank":
        from graph_data_science_spark.operators.pagerank import page_rank

        out = page_rank(graph, **config)
        return out.scores.select("vid", F.array(F.col("score")).alias("_prop"))
    if proc == "degree":
        from graph_data_science_spark.operators.degree import degree_centrality

        out = degree_centrality(graph, **config)
        return out.select("vid", F.array(F.col("score")).alias("_prop"))
    raise ValueError(
        f"unknown nodeProperty step {procedure!r}; supported: "
        "fastRP, hashGNN, pageRank, degree"
    )


_LOG_SCALE_PARAMS = {"learning_rate", "l2_penalty", "tolerance"}


def _is_range(v) -> bool:
    return isinstance(v, dict) and "range" in v


def _sample_config(cand: dict, rng) -> dict:
    """One concrete trial from a tunable candidate (RandomSearch.java)."""
    out = {}
    for k, v in cand.items():
        if not _is_range(v):
            out[k] = v
            continue
        lo, hi = v["range"]
        if isinstance(lo, int) and isinstance(hi, int):
            out[k] = int(rng.integers(lo, hi + 1))
        elif k in _LOG_SCALE_PARAMS and lo > 0:
            out[k] = float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
        else:
            out[k] = float(rng.uniform(lo, hi))
    return out


def _expand_candidates(candidates: list[dict], max_trials: int,
                       seed: int) -> list[dict]:
    """Concrete candidates pass through; tunable ones (any {"range":..}
    param) are sampled round-robin up to max_trials total trials."""
    if not candidates:
        return [{"model_family": "logistic"}]
    concrete = [c for c in candidates if not any(_is_range(v) for v in c.values())]
    tunable = [c for c in candidates if any(_is_range(v) for v in c.values())]
    if not tunable:
        return concrete
    rng = np.random.default_rng(seed)
    trials = [_sample_config(tunable[i % len(tunable)], rng)
              for i in range(max_trials)]
    return concrete + trials


@dataclass
class _TrainingPipeline:
    name: str
    node_property_steps: list[tuple[str, dict]] = field(default_factory=list)
    model_candidates: list[dict] = field(default_factory=list)
    max_trials: int = 10             # AutoTuningConfig.MAX_TRIALS default
    tuning_seed: int = 42

    def add_logistic_regression(self, **config) -> "_TrainingPipeline":
        """gds.beta.pipeline.*.addLogisticRegression — register a model
        candidate; train() fits all candidates and keeps the best.
        Any param may be {"range": [lo, hi]} to make it tunable."""
        self.model_candidates.append({"model_family": "logistic", **config})
        return self

    def add_random_forest(self, **config) -> "_TrainingPipeline":
        """gds.beta.pipeline.*.addRandomForest (classification families;
        ml/randomforest.py distributed histogram trees)."""
        self.model_candidates.append({"model_family": "randomforest", **config})
        return self

    def add_mlp(self, **config) -> "_TrainingPipeline":
        """gds.alpha.pipeline.*.addMLP (ml/mlp.py distributed backprop;
        hidden_layer_sizes tuple, ReLU + softmax head)."""
        self.model_candidates.append({"model_family": "mlp", **config})
        return self

    def configure_auto_tuning(self, max_trials: int = 10) -> "_TrainingPipeline":
        """gds.alpha.pipeline.*.configureAutoTuning (AutoTuningConfig.java):
        cap on sampled trials from tunable candidates."""
        if max_trials < 1:
            raise ValueError("max_trials must be >= 1")
        self.max_trials = max_trials
        return self

    def _trial_configs(self) -> list[dict]:
        return _expand_candidates(self.model_candidates, self.max_trials,
                                  self.tuning_seed)

    def add_node_property(self, procedure: str, **config) -> "_TrainingPipeline":
        """gds.beta.pipeline.*.addNodeProperty — an algo producing node
        properties, executed at train() time against the train graph."""
        self.node_property_steps.append((procedure, dict(config)))
        return self

    def _node_features(self, graph: Graph) -> DataFrame:
        """(vid, features array<double>) — concat of all step outputs."""
        if not self.node_property_steps:
            raise ValueError(
                f"pipeline `{self.name}` has no nodeProperty steps — "
                "call add_node_property first"
            )
        feats = None
        for i, (proc, cfg) in enumerate(self.node_property_steps):
            step = _run_node_property_step(graph, proc, cfg).withColumnRenamed(
                "_prop", f"_p{i}"
            )
            feats = step if feats is None else feats.join(step, "vid")
        cols = [F.col(f"_p{i}") for i in range(len(self.node_property_steps))]
        return feats.select(
            "vid", F.concat(*cols).cast("array<double>").alias("features")
        )


@dataclass
class LinkPredictionPipeline(_TrainingPipeline):
    """gds.beta.pipeline.linkPrediction.*"""

    feature_steps: list[str] = field(default_factory=list)
    test_fraction: float = 0.3
    negative_sampling_ratio: float = 1.0

    def add_feature(self, step: str) -> "LinkPredictionPipeline":
        """hadamard | l2 | cosine (LinkFeatureStepFactory names)."""
        if step not in ("hadamard", "l2", "cosine"):
            raise ValueError(f"unknown link feature step {step!r}")
        self.feature_steps.append(step)
        return self

    def configure_split(self, test_fraction: float | None = None,
                        negative_sampling_ratio: float | None = None
                        ) -> "LinkPredictionPipeline":
        if test_fraction is not None:
            self.test_fraction = test_fraction
        if negative_sampling_ratio is not None:
            self.negative_sampling_ratio = negative_sampling_ratio
        return self

    def train(self, graph: Graph, model_name: str,
              model_catalog: ModelCatalog | None = None, **train_kw):
        from graph_data_science_spark.ml.pipelines import link_prediction_train

        embeddings = self._node_features(graph).withColumnRenamed(
            "features", "embedding"
        ).persist()
        best, trials = None, []
        for cand in self._trial_configs():
            model = link_prediction_train(
                graph, embeddings,
                feature_steps=self.feature_steps or ["hadamard"],
                test_fraction=self.test_fraction,
                negative_sampling_ratio=self.negative_sampling_ratio,
                **{**cand, **train_kw},
            )
            trials.append({"config": dict(cand), "test_auc": model.test_auc})
            if best is None or model.test_auc > best.test_auc:
                best = model
        embeddings.unpersist()
        best.metrics.append({"candidates": trials})
        if model_catalog is not None:
            model_catalog.register(model_name, best)
        return best


@dataclass
class NodeClassificationPipeline(_TrainingPipeline):
    """gds.beta.pipeline.nodeClassification.*"""

    test_fraction: float = 0.3

    def configure_split(self, test_fraction: float) -> "NodeClassificationPipeline":
        self.test_fraction = test_fraction
        return self

    def train(self, graph: Graph, label_col: str, model_name: str,
              model_catalog: ModelCatalog | None = None, **train_kw):
        from graph_data_science_spark.ml.pipelines import node_classification_train

        nodes = self._node_features(graph).join(
            graph.nodes.select("vid", F.col(label_col).alias("label")), "vid"
        ).persist()
        best, trials = None, []
        for cand in self._trial_configs():
            model = node_classification_train(
                nodes, test_fraction=self.test_fraction, **{**cand, **train_kw}
            )
            trials.append({"config": dict(cand), "test_metric": model.test_metric})
            if best is None or model.test_metric > best.test_metric:
                best = model
        nodes.unpersist()
        best.candidate_metrics = trials
        if model_catalog is not None:
            model_catalog.register(model_name, best)
        return best


@dataclass
class NodeRegressionPipeline(_TrainingPipeline):
    """gds.alpha.pipeline.nodeRegression.*"""

    test_fraction: float = 0.3

    def configure_split(self, test_fraction: float) -> "NodeRegressionPipeline":
        self.test_fraction = test_fraction
        return self

    def train(self, graph: Graph, target_col: str, model_name: str,
              model_catalog: ModelCatalog | None = None, **train_kw):
        from graph_data_science_spark.ml.pipelines import node_regression_train

        nodes = self._node_features(graph).join(
            graph.nodes.select("vid", F.col(target_col).alias("target")), "vid"
        )
        model = node_regression_train(
            nodes, test_fraction=self.test_fraction, **train_kw
        )
        if model_catalog is not None:
            model_catalog.register(model_name, model)
        return model


class PipelineCatalog:
    """gds.beta.pipeline registry (PipelineCatalog.java): named pipelines,
    duplicate names rejected, typed create per pipeline family."""

    def __init__(self):
        self._pipelines: dict[str, _TrainingPipeline] = {}

    def _create(self, name: str, pipe: _TrainingPipeline) -> _TrainingPipeline:
        if name in self._pipelines:
            raise ValueError(f"Pipeline with name `{name}` already exists.")
        self._pipelines[name] = pipe
        return pipe

    def create_link_prediction(self, name: str) -> LinkPredictionPipeline:
        return self._create(name, LinkPredictionPipeline(name=name))

    def create_node_classification(self, name: str) -> NodeClassificationPipeline:
        return self._create(name, NodeClassificationPipeline(name=name))

    def create_node_regression(self, name: str) -> NodeRegressionPipeline:
        return self._create(name, NodeRegressionPipeline(name=name))

    def get(self, name: str) -> _TrainingPipeline:
        if name not in self._pipelines:
            raise ValueError(f"Pipeline with name `{name}` does not exist.")
        return self._pipelines[name]

    def exists(self, name: str) -> bool:
        return name in self._pipelines

    def drop(self, name: str) -> None:
        if name not in self._pipelines:
            raise ValueError(f"Pipeline with name `{name}` does not exist.")
        del self._pipelines[name]

    def list(self) -> list[str]:
        return sorted(self._pipelines)
