from graph_data_science_spark.functions.similarity import (
    cosine,
    euclidean,
    euclidean_distance,
    jaccard,
    overlap,
    pearson,
)
from graph_data_science_spark.functions.util import (
    gds_infinity,
    gds_is_finite,
    gds_is_infinite,
    gds_nan,
    one_hot_encoding,
    version,
)

__all__ = [
    "cosine", "euclidean", "euclidean_distance", "jaccard", "overlap",
    "pearson", "gds_nan", "gds_infinity", "gds_is_finite",
    "gds_is_infinite", "one_hot_encoding", "version",
]
