"""Probe: count Exchange operators per pagerank superstep plan.

Reproduces the sql-backend superstep chain and prints the formatted
physical plan of a mid-loop superstep, so we can see whether the state
side of `senders join edges` and `state join msgs` re-shuffles (i.e.
whether HashPartitioning survives persist/localCheckpoint truncation).
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graph_data_science_spark.session import get_spark
from graph_data_science_spark.sources.generator import random_graph

spark = get_spark(app_name="probe", cores=8, shuffle_partitions=8, driver_memory="8g")
spark.conf.set("spark.sql.adaptive.enabled", "false")

g = random_graph(spark, 200_000, 8, seed=42)
n_part = 8
edges_renamed = (
    g.edges.select(F.col("src").alias("e_src"), F.col("dst").alias("e_dst"), "weight")
    .repartition(n_part, "e_src")
    .sortWithinPartitions("e_src")
    .persist()
)
edges_renamed.count()

deg = g.degrees(direction="out")
alpha = 0.15
state = deg.select(
    "vid",
    F.col("degree").alias("deg"),
    F.lit(alpha).alias("rank"),
    F.lit(alpha).alias("delta"),
    F.lit(False).alias("halted"),
    (F.col("degree") > 0).alias("will_send"),
)


def step(state):
    senders = state.filter(F.col("will_send")).select(
        F.col("vid").alias("e_src"), (F.col("delta") / F.col("deg")).alias("contrib")
    )
    msgs_raw = senders.join(edges_renamed, "e_src").select(
        F.col("e_dst").alias("vid"), F.col("contrib").alias("m")
    )
    msgs_raw = msgs_raw.repartition(n_part, "vid")
    msgs = msgs_raw.groupBy("vid").agg(F.sum("m").alias("msg_sum"))
    joined = state.join(msgs, "vid", "left")
    computes = F.col("msg_sum").isNotNull() | ~F.col("halted")
    new_delta = F.when(
        computes, 0.85 * F.coalesce(F.col("msg_sum"), F.lit(0.0))
    ).otherwise(F.col("delta"))
    return joined.select(
        "vid",
        "deg",
        F.when(computes, F.col("rank") + new_delta).otherwise(F.col("rank")).alias("rank"),
        new_delta.alias("delta"),
        F.when(computes, ~(new_delta > 1e-6)).otherwise(F.col("halted")).alias("halted"),
        (computes & (new_delta > 1e-6) & (F.col("deg") > 0)).alias("will_send"),
    )


def count_exchanges(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    shuffles = len(re.findall(r"Exchange hashpartitioning", plan))
    return shuffles, plan


# superstep 1 from raw state
s1 = step(state)
# mimic engine: persist + agg + localCheckpoint(eager=True)
s1 = s1.persist()
s1.agg(F.sum(F.col("will_send").cast("long"))).collect()
s1ck = s1.localCheckpoint(eager=True)

# superstep 2 from the checkpointed state
s2 = step(s1ck)
n, plan = count_exchanges(s2)
print("=== superstep-from-localCheckpoint: exchanges =", n)
print(plan[:4000])

# also: what does a lazy localCheckpoint mid-chain look like
s2l = step(s2.localCheckpoint(eager=False))
n2, plan2 = count_exchanges(s2l)
print("=== superstep-from-lazy-ckpt: exchanges =", n2)

# and via cut_lineage (stats reset path)
from graph_data_science_spark.plans.lineage import cut_lineage

s2c = step(cut_lineage(s1))
n3, _p3 = count_exchanges(s2c)
print("=== superstep-from-cut_lineage: exchanges =", n3)
