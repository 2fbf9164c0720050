import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from graph_data_science_spark.session import get_spark
from graph_data_science_spark.plans.graph import Graph
from graph_data_science_spark.api import Algo
from graph_data_science_spark.sources.sampling import random_walks, sample_rwr

spark = get_spark(app_name="verify-3", cores=4, shuffle_partitions=4, driver_memory="8g")
edges = spark.createDataFrame([(0,2,1.0),(0,3,1.0),(1,2,1.0),(1,3,1.0),(2,0,1.0)],
                              "src long, dst long, weight double")
g = Graph.from_edges(edges)
algo = Algo(g)
h = algo.hits(hits_iterations=8).stream().collect()
print("HITS rows:", len(h), sorted((r["vid"], round(r["authority"],3)) for r in h))
e = algo.fast_rp(embedding_dimension=8).stream().collect()
print("FASTRP rows:", len(e), "dim:", len(e[0]["embedding"]))
w = random_walks(g, walks_per_node=1, walk_length=3).collect()
print("WALKS:", sorted((r["start"], tuple(r["path"])) for r in w))
sub = sample_rwr(g, spark.createDataFrame([(0,)], "vid long"), walk_length=5)
print("RWR nodes:", sorted(r["vid"] for r in sub.nodes.collect()))
