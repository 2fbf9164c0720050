"""Distributed full-batch training for the three model heads the
reference's pipelines train (ml/ml-algo/.../models/logisticregression/
LogisticRegressionTrainer.java, linearregression/LinearRegressionTrainer.java):
binary logistic, multiclass softmax, and linear regression.

Spark-first: features stay distributed; each epoch broadcasts the (tiny)
weight matrix and reduces per-partition gradient partials via
mapInPandas (numpy einsum — the graphsage pattern), so driver traffic is
O(partitions × params) per epoch regardless of row count. Adam on the
driver (the reference trains with Adam too: AdamOptimizer.java).
Gradients are finite-difference-checked in tests/test_ml_pipelines.py."""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


@dataclass
class TrainedModel:
    weights: np.ndarray          # binary/linear: (d+1,); softmax: (C, d+1)
    kind: str                    # "binary" | "softmax" | "linear"
    loss_per_epoch: list[float] = field(default_factory=list)


def _partials(df: DataFrame, w: np.ndarray, kind: str) -> tuple[np.ndarray, float, int]:
    """Σ partition-local (gradient, loss, count) for the model `kind`.
    df: (features array<double>, y double). Bias folds in as a constant
    1.0 feature appended on the worker."""
    wb = w.copy()

    def fn(iterator):
        g = np.zeros_like(wb, dtype=np.float64)
        loss = 0.0
        m = 0
        for pdf in iterator:
            if not len(pdf):
                continue
            x = np.stack(pdf["features"].to_numpy()).astype(np.float64)
            x = np.hstack([x, np.ones((len(x), 1))])
            y = pdf["y"].to_numpy().astype(np.float64)
            if kind == "binary":
                p = 1.0 / (1.0 + np.exp(-(x @ wb)))
                g += x.T @ (p - y)
                loss += float(-np.sum(y * np.log(np.clip(p, 1e-12, 1))
                                      + (1 - y) * np.log(np.clip(1 - p, 1e-12, 1))))
            elif kind == "softmax":
                z = x @ wb.T                       # (m, C)
                z -= z.max(axis=1, keepdims=True)
                e = np.exp(z)
                p = e / e.sum(axis=1, keepdims=True)
                yi = y.astype(int)
                onehot = np.zeros_like(p)
                onehot[np.arange(len(yi)), yi] = 1.0
                g += (p - onehot).T @ x            # (C, d+1)
                loss += float(-np.sum(np.log(np.clip(p[np.arange(len(yi)), yi], 1e-12, 1))))
            else:                                  # linear (MSE/2)
                r = x @ wb - y
                g += x.T @ r
                loss += float(0.5 * np.sum(r * r))
            m += len(x)
        yield pd.DataFrame({"g": [g.ravel()], "loss": [loss], "m": [m]})

    rows = df.mapInPandas(fn, "g array<double>, loss double, m long").collect()
    g = np.zeros_like(wb, dtype=np.float64)
    loss, m = 0.0, 0
    for r in rows:
        g += np.asarray(r["g"]).reshape(wb.shape)
        loss += r["loss"]
        m += int(r["m"])
    return g, loss, m


def fit(
    df: DataFrame,                 # (features array<double>, y double)
    kind: str = "binary",
    num_classes: int = 2,
    epochs: int = 100,
    learning_rate: float = 0.1,
    l2_penalty: float = 0.0,
    tolerance: float = 1e-5,
    seed: int = 42,
) -> TrainedModel:
    row = df.select("features").first()
    if row is None:
        raise ValueError("empty training set")
    d = len(row["features"])
    rng = np.random.default_rng(seed)
    if kind == "softmax":
        w = rng.normal(scale=0.01, size=(num_classes, d + 1))
    else:
        w = rng.normal(scale=0.01, size=d + 1)
    mom, vel = np.zeros_like(w), np.zeros_like(w)
    b1, b2, eps = 0.9, 0.999, 1e-8
    losses: list[float] = []
    df = df.persist()
    df.count()
    for t in range(1, epochs + 1):
        g, loss, m = _partials(df, w, kind)
        g = g / m + l2_penalty * w
        loss = loss / m + 0.5 * l2_penalty * float(np.sum(w * w))
        losses.append(loss)
        mom = b1 * mom + (1 - b1) * g
        vel = b2 * vel + (1 - b2) * g * g
        w = w - learning_rate * (mom / (1 - b1**t)) / (np.sqrt(vel / (1 - b2**t)) + eps)
        if len(losses) > 1 and abs(losses[-2] - losses[-1]) < tolerance:
            break
    df.unpersist()
    return TrainedModel(weights=w, kind=kind, loss_per_epoch=losses)


def predict_expr(model: TrainedModel):
    """Returns fn(features_pdf_iterator) for mapInPandas producing
    prediction columns for the model kind (probability / class+probs /
    value). Kept as a pandas UDF: the matvec is the hot path."""
    w = model.weights.copy()
    kind = model.kind

    def fn(iterator):
        for pdf in iterator:
            if not len(pdf):
                continue
            x = np.stack(pdf["features"].to_numpy()).astype(np.float64)
            x = np.hstack([x, np.ones((len(x), 1))])
            out = pdf.drop(columns=["features"])
            if kind == "binary":
                out["probability"] = 1.0 / (1.0 + np.exp(-(x @ w)))
            elif kind == "softmax":
                z = x @ w.T
                z -= z.max(axis=1, keepdims=True)
                e = np.exp(z)
                p = e / e.sum(axis=1, keepdims=True)
                out["predicted_class"] = p.argmax(axis=1).astype("int64")
                out["probabilities"] = list(p)
            else:
                out["value"] = x @ w
            yield out

    return fn
