"""ML pipelines — the reference's `pipeline/` + `ml/` family re-expressed
Spark-first: linkPrediction, nodeClassification, nodeRegression over
distributed feature computation with driver-held (small) model weights."""
