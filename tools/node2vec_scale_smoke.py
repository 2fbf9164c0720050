"""node2vec sharded-backend scale smoke: 1e7 model rows, zero O(n)
driver-side PYTHON state.

Drives operators/node2vec_sharded.sgns_train_sharded directly with
synthetic positive pairs (the walk/pair stages have their own bench and
oracle coverage) at a node count 5x past the driver backend's
max_model_nodes cap, and reports wall + driver peak RSS. The driver
backend would need ~2 * 1e7 * dim * 4B broadcast per epoch plus the
collect of every touched row's delta; the sharded backend's driver
traffic is P prefix-sum scalars + one loss scalar per round.

Usage: SPARK_GRAFT_CPUS=16 python tools/node2vec_scale_smoke.py [n] [pairs]
Prints one JSON line.
"""

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graph_data_science_spark.operators.node2vec_sharded import (  # noqa: E402
    sgns_train_sharded,
)
from graph_data_science_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000
    n_pairs = int(float(sys.argv[2])) if len(sys.argv) > 2 else 2_000_000
    dim = 32
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark(cores=cores, shuffle_partitions=cores, driver_memory=os.environ.get("SMOKE_MEM", "48g"))

    # synthetic positives: skewed centers (hub rows repeat), scattered
    # contexts — all generated distributed, no driver data
    pairs = spark.range(0, n_pairs, 1, cores).select(
        F.pmod(F.xxhash64(F.lit(1), "id"), F.lit(n)).alias("c_row"),
        F.pmod(F.xxhash64(F.lit(2), "id"), F.lit(n)).alias("x_row"),
    )
    # freq over every row, mild skew (hubs every 1000th row)
    freq = spark.range(0, n, 1, cores).select(
        F.col("id").alias("row"),
        F.when(F.col("id") % 1000 == 0, F.lit(100)).otherwise(F.lit(1)).alias("cnt"),
    )

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024  # MiB
    t0 = time.time()
    emb, losses = sgns_train_sharded(
        spark, pairs, freq, n, dim,
        iterations=1, negative_sampling_rate=2,
        initial_learning_rate=0.05, random_seed=7,
        minibatch_rounds=2, num_partitions=cores,
    )
    n_emb = emb.count()
    wall = time.time() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    print(json.dumps({
        "metric": "node2vec_sharded_smoke",
        "n_model_rows": n,
        "n_pairs": n_pairs,
        "dim": dim,
        "embeddings": n_emb,
        "losses": losses,
        "wall_sec": round(wall, 1),
        "driver_rss_before_mb": round(rss0),
        "driver_rss_after_mb": round(rss1),
    }))


if __name__ == "__main__":
    main()
