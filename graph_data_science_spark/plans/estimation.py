"""Memory estimation — the gds.<algo>.estimate surface, Spark-first.

Reference shape: `memory-usage/src/main/java/org/neo4j/gds/core/utils/
mem/MemoryEstimations.java` builds a COMPOSITION TREE of fixed /
perNode / perThread byte ranges scaled by graph dimensions +
concurrency; `algo/src/main/java/org/neo4j/gds/results/
MemoryEstimateResult.java:31-46` renders it into the procedure columns
(requiredMemory, treeView, mapView, bytesMin/bytesMax, nodeCount,
relationshipCount, heapPercentageMin/heapPercentageMax). Per-algorithm
definitions live in `*MemoryEstimateDefinition.java` — e.g. WCC is one
per-node long array (+ one more when seeded/incremental,
`WccMemoryEstimateDefinition.java:36-42` via
`HugeAtomicDisjointSetStruct.java:70-78`), PageRank is the Pregel
composition: vote bits + node value map + reducing-messenger send/
receive arrays (`PageRankMemoryEstimateDefinition.java:31-37`,
`Pregel.java:93-114`, `ReducingMessenger.java:56-61`).

Spark-first translation. The reference pins exact JVM heap bytes
because GDS REFUSES to start an algorithm that does not fit its heap.
Spark never refuses — it spills — so byte-exactness buys nothing;
what a 1000-executor deployment actually needs from an estimate is
PLAN-SHAPING answers:

  - total distributed state (the per-superstep vertex-state DataFrame)
    and per-superstep SHUFFLE volume (the message exchange — Spark's
    shuffle IS the messenger, so ReducingMessenger's send+receive
    arrays become bytes-over-the-wire per superstep);
  - whether the state fits the BROADCAST threshold (join-strategy
    choice: broadcast-hash vs shuffle);
  - a suggested `spark.sql.shuffle.partitions` so each shuffle
    partition lands near the target partition size instead of
    spilling (CLAUDE.md/BASELINE sizing discipline);
  - an executor-fit fraction — the heapPercentage analogue against
    executor memory instead of driver heap.

The composition-tree API, the result columns, and the per-algorithm
formulas mirror the reference (cited per definition below); the
`spark` advisory block is ours. Estimates are derived from dimensions
only — no job runs.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Callable

# Serialized width of the standard columns in Tungsten row format /
# shuffle wire format (approximate, documented as such): 8-byte word
# per long/double plus ~8 bytes amortized row+null-tracking overhead.
_WORD = 8
_ROW_OVERHEAD = 8

_KIB, _MIB, _GIB = 1024, 1024**2, 1024**3


def _human(n: int) -> str:
    """Bytes -> human string, mirroring the reference's
    MemoryUsage.humanReadable rendering (KiB/MiB/GiB, one decimal)."""
    if n < _KIB:
        return f"{n} Bytes"
    for unit, div in (("KiB", _KIB), ("MiB", _MIB), ("GiB", _GIB)):
        if n < div * 1024 or unit == "GiB":
            return f"{n / div:.1f} {unit}"
    return f"{n} Bytes"  # pragma: no cover


@dataclass(frozen=True)
class MemoryRange:
    """[min, max] bytes — reference core/utils/mem/MemoryRange."""

    min: int
    max: int

    def __post_init__(self):
        if self.min < 0 or self.max < self.min:
            raise ValueError(f"invalid MemoryRange [{self.min}, {self.max}]")

    def __add__(self, other: "MemoryRange") -> "MemoryRange":
        return MemoryRange(self.min + other.min, self.max + other.max)

    def times(self, k: int) -> "MemoryRange":
        return MemoryRange(self.min * k, self.max * k)

    def render(self) -> str:
        if self.min == self.max:
            return _human(self.min)
        return f"[{_human(self.min)} ... {_human(self.max)}]"

    @staticmethod
    def of(n: int) -> "MemoryRange":
        return MemoryRange(n, n)


@dataclass
class MemoryTree:
    """Named component with a byte range and sub-components — reference
    core/utils/mem/MemoryTree (render() / renderMap())."""

    name: str
    range: MemoryRange
    children: list["MemoryTree"] = field(default_factory=list)

    def render(self, depth: int = 0) -> str:
        pad = "    " * depth
        lines = [f"{pad}|-- {self.range.render()}: {self.name}"]
        for c in self.children:
            lines.append(c.render(depth + 1))
        return "\n".join(lines)

    def render_map(self) -> dict[str, Any]:
        out: dict[str, Any] = {"name": self.name, "memoryUsage": self.range.render()}
        if self.children:
            out["components"] = [c.render_map() for c in self.children]
        return out


def composite(name: str, children: list[MemoryTree]) -> MemoryTree:
    total = MemoryRange.of(0)
    for c in children:
        total = total + c.range
    return MemoryTree(name, total, children)


@dataclass(frozen=True)
class Dimensions:
    """GraphDimensions analogue: what every estimate is a function of."""

    node_count: int
    relationship_count: int
    concurrency: int = 32


def _array_bytes(n: int, width: int = _WORD) -> int:
    """Distributed column of n fixed-width values. The reference charges
    paged-array overhead (pages of 2^14, HugeArrays.java:29-31); the
    Spark analogue is a DataFrame column in Tungsten pages — we charge
    width + amortized row overhead. Approximate by design."""
    return n * (width + _ROW_OVERHEAD)


def per_node(name: str, dims: Dimensions, width: int = _WORD) -> MemoryTree:
    return MemoryTree(name, MemoryRange.of(_array_bytes(dims.node_count, width)))


def per_rel(name: str, dims: Dimensions, width: int = _WORD) -> MemoryTree:
    return MemoryTree(name, MemoryRange.of(_array_bytes(dims.relationship_count, width)))


def per_thread(name: str, dims: Dimensions, bytes_each: int) -> MemoryTree:
    """Reference perThread(...) — Spark analogue: per shuffle-partition /
    task-slot working set (concurrency tasks in flight)."""
    return MemoryTree(name, MemoryRange.of(bytes_each * dims.concurrency))


def fixed(name: str, lo: int, hi: int | None = None) -> MemoryTree:
    return MemoryTree(name, MemoryRange(lo, hi if hi is not None else lo))


# ---------------------------------------------------------------------------
# Per-algorithm definitions. Each mirrors the reference's
# *MemoryEstimateDefinition composition (citation in docstring) with the
# state laid out as distributed DataFrame columns.
# ---------------------------------------------------------------------------


def _pregel_estimation(
    dims: Dimensions, name: str, properties: dict[str, int], queue_based: bool = False
) -> MemoryTree:
    """Pregel.java:93-114: vote bits + node value (one column per
    schema property) + messenger. Reduced messenger = send+receive
    double arrays (ReducingMessenger.java:56-61) -> in Spark one
    shuffled msgs(dst,value) DataFrame materialized at the reducer plus
    its in-flight shuffle blocks: same 2x charge."""
    children = [
        MemoryTree("vote bits", MemoryRange.of(max(dims.node_count // 8, 1))),
        composite(
            "node value",
            [per_node(prop, dims, width) for prop, width in properties.items()],
        ),
    ]
    if queue_based:
        # queue messenger: per-node variable-length queues — min one
        # message, max avg-degree messages per node
        lo = _array_bytes(dims.node_count, _WORD)
        hi = _array_bytes(max(dims.relationship_count, dims.node_count), _WORD)
        children.append(MemoryTree("message queues", MemoryRange(lo, hi)))
    else:
        children.append(
            composite(
                "message arrays",
                [per_node("send array", dims), per_node("receive array", dims)],
            )
        )
    children.append(per_thread("compute steps", dims, 64 * _KIB))
    return composite(name, children)


def _est_pagerank(dims: Dimensions, **_cfg) -> MemoryTree:
    # PageRankMemoryEstimateDefinition.java:31-37 — Pregel, one DOUBLE
    # property, reduced messenger.
    return _pregel_estimation(dims, "PageRank", {"pagerank": _WORD})


def _est_wcc(dims: Dimensions, seeded: bool = False, **_cfg) -> MemoryTree:
    # WccMemoryEstimateDefinition via HugeAtomicDisjointSetStruct
    # .java:70-78: perNode parent array, + perNode seeding info when
    # incremental. Spark: the comp(vid, comp) state frame (+ seed col).
    children = [per_node("dss: component ids", dims)]
    if seeded:
        children.append(per_node("dss: seeding information", dims))
    return composite("Wcc", children)


def _est_lpa(dims: Dimensions, **_cfg) -> MemoryTree:
    # LabelPropagation: labels + vote weights per node, double-buffered
    # across a superstep (current + next state frame both live until
    # the plan cut).
    return composite(
        "LabelPropagation",
        [
            per_node("labels (current)", dims),
            per_node("labels (next)", dims),
            per_rel("vote shuffle", dims, 2 * _WORD),
        ],
    )


def _est_triangle(dims: Dimensions, **_cfg) -> MemoryTree:
    # IntersectingTriangleCountMemoryEstimateDefinition: perNode long
    # counts; the intersection works off the (already loaded) sorted
    # adjacency — in Spark the c<b<a oriented edge self-join, charged
    # as one extra edge projection.
    return composite(
        "IntersectingTriangleCount",
        [per_node("triangle counts", dims), per_rel("oriented edges", dims, 2 * _WORD)],
    )


def _est_degree(dims: Dimensions, **_cfg) -> MemoryTree:
    return composite("DegreeCentrality", [per_node("degrees", dims)])


def _est_louvain(dims: Dimensions, max_levels: int = 10, **_cfg) -> MemoryTree:
    # LouvainMemoryEstimateDefinition: community arrays per hierarchy
    # level (min 1 level, max maxLevels) + the modularity-optimization
    # working set; graph shrinks per level so charge level 0 fully and
    # bound the rest by a geometric tail (documented approximation).
    one_level = _array_bytes(dims.node_count) + _array_bytes(
        dims.relationship_count, 3 * _WORD
    )
    return MemoryTree(
        "Louvain",
        MemoryRange(one_level, one_level * 2 + max_levels * _array_bytes(dims.node_count)),
        [
            fixed("level 0 aggregation", one_level),
            fixed(
                "hierarchy tail (shrinking levels)",
                0,
                one_level + max_levels * _array_bytes(dims.node_count),
            ),
        ],
    )


def _est_bfs(dims: Dimensions, **_cfg) -> MemoryTree:
    return composite(
        "BFS", [per_node("depth/visited", dims), per_rel("frontier expansion", dims)]
    )


def _est_dijkstra(dims: Dimensions, **_cfg) -> MemoryTree:
    # DijkstraMemoryEstimateDefinition: distance + predecessor per node
    # (+ the relaxation message shuffle in Spark).
    return composite(
        "Dijkstra",
        [
            per_node("distances", dims),
            per_node("predecessors", dims),
            per_rel("relaxation shuffle", dims, 2 * _WORD),
        ],
    )


def _est_node_similarity(dims: Dimensions, top_k: int = 10, **_cfg) -> MemoryTree:
    # NodeSimilarityMemoryEstimateDefinition: vectors (adjacency as
    # sets) + topK result heaps per node.
    return composite(
        "NodeSimilarity",
        [
            per_rel("neighbor sets", dims),
            per_node("topK result rows", dims, top_k * 2 * _WORD),
        ],
    )


def _est_fastrp(dims: Dimensions, embedding_dimension: int = 128, **_cfg) -> MemoryTree:
    return composite(
        "FastRP",
        [
            per_node("embeddings (current)", dims, embedding_dimension * _WORD),
            per_node("embeddings (next)", dims, embedding_dimension * _WORD),
            per_rel("neighbor-mean shuffle", dims, embedding_dimension * _WORD),
        ],
    )


ALGORITHMS: dict[str, Callable[..., MemoryTree]] = {
    "page_rank": _est_pagerank,
    "article_rank": _est_pagerank,
    "eigenvector": _est_pagerank,
    "wcc": _est_wcc,
    "label_propagation": _est_lpa,
    "triangle_count": _est_triangle,
    "degree": _est_degree,
    "louvain": _est_louvain,
    "leiden": _est_louvain,
    "bfs": _est_bfs,
    "dfs": _est_bfs,
    "dijkstra": _est_dijkstra,
    "node_similarity": _est_node_similarity,
    "knn": _est_node_similarity,
    "fastrp": _est_fastrp,
}


# ---------------------------------------------------------------------------
# Spark plan advisory — the part the reference cannot have.
# ---------------------------------------------------------------------------

_DEFAULT_TARGET_PARTITION = 128 * _MIB  # spark.sql.files.maxPartitionBytes default
_DEFAULT_BROADCAST_THRESHOLD = 10 * _MIB  # spark.sql.autoBroadcastJoinThreshold


def spark_plan_advisory(
    dims: Dimensions,
    tree: MemoryTree,
    target_partition_bytes: int = _DEFAULT_TARGET_PARTITION,
    broadcast_threshold_bytes: int = _DEFAULT_BROADCAST_THRESHOLD,
    executor_memory_bytes: int | None = None,
) -> dict[str, Any]:
    """Plan-shaping advisory derived from the estimate:

    - shuffleBytesPerSuperstep: the message exchange (dst key + value +
      row overhead per relationship) — the dominant recurring cost of
      every iterative operator; at 1000 executors this is the number
      to divide by the cluster bisection bandwidth.
    - suggestedShufflePartitions: ceil(shuffle volume / target
      partition size), floored at the task-slot count so every core
      has work — the sizing rule BASELINE.md measures.
    - stateBroadcastable: whether the per-node state frame fits under
      the broadcast join threshold (small-graph fast path: broadcast
      the state, skip the shuffle entirely).
    - executorFitFraction: largest single shuffle partition vs executor
      memory — the heapPercentage analogue; > 1.0 predicts spill.
    """
    shuffle_per_superstep = dims.relationship_count * (2 * _WORD + _ROW_OVERHEAD)
    state_bytes = _array_bytes(dims.node_count, 2 * _WORD)
    parts = max(
        dims.concurrency,
        math.ceil(shuffle_per_superstep / max(target_partition_bytes, 1)),
    )
    out: dict[str, Any] = {
        "shuffleBytesPerSuperstep": shuffle_per_superstep,
        "suggestedShufflePartitions": parts,
        "stateBytes": state_bytes,
        "stateBroadcastable": state_bytes <= broadcast_threshold_bytes,
        "targetPartitionBytes": target_partition_bytes,
    }
    if executor_memory_bytes:
        per_partition = max(shuffle_per_superstep // parts, state_bytes // parts, 1)
        out["executorFitFraction"] = round(per_partition / executor_memory_bytes, 4)
        out["predictedSpill"] = per_partition > executor_memory_bytes
    return out


@dataclass
class MemoryEstimateResult:
    """Column-compatible with the reference's MemoryEstimateResult
    (MemoryEstimateResult.java:31-46) + the Spark advisory block."""

    required_memory: str
    tree_view: str
    map_view: dict[str, Any]
    bytes_min: int
    bytes_max: int
    node_count: int
    relationship_count: int
    heap_percentage_min: float
    heap_percentage_max: float
    spark: dict[str, Any]

    def as_dict(self) -> dict[str, Any]:
        return {
            "requiredMemory": self.required_memory,
            "treeView": self.tree_view,
            "mapView": self.map_view,
            "bytesMin": self.bytes_min,
            "bytesMax": self.bytes_max,
            "nodeCount": self.node_count,
            "relationshipCount": self.relationship_count,
            "heapPercentageMin": self.heap_percentage_min,
            "heapPercentageMax": self.heap_percentage_max,
            "spark": self.spark,
        }


def estimate(
    algo: str,
    node_count: int,
    relationship_count: int,
    concurrency: int = 32,
    heap_bytes: int | None = None,
    executor_memory_bytes: int | None = None,
    **config: Any,
) -> MemoryEstimateResult:
    """gds.<algo>.estimate: build the composition tree for `algo` from
    dimensions only (no job runs) and render the reference result
    columns + the Spark plan advisory. heap_bytes defaults to the
    driver's configured memory when a live session exists, else 0
    (percentages NaN, matching MemoryEstimateResult.java:68-71)."""
    key = algo.lower().replace(".", "_").replace("-", "_")
    if key not in ALGORITHMS:
        raise ValueError(
            f"no memory estimation for {algo!r}; known: {sorted(ALGORITHMS)}"
        )
    dims = Dimensions(node_count, relationship_count, concurrency)
    tree = ALGORITHMS[key](dims, **config)
    if heap_bytes is None:
        heap_bytes = 0
    if heap_bytes > 0:
        pct_min = math.ceil(tree.range.min / heap_bytes * 10) / 10
        pct_max = math.ceil(tree.range.max / heap_bytes * 10) / 10
    else:
        pct_min = pct_max = float("nan")
    return MemoryEstimateResult(
        required_memory=tree.range.render(),
        tree_view=tree.render(),
        map_view=tree.render_map(),
        bytes_min=tree.range.min,
        bytes_max=tree.range.max,
        node_count=node_count,
        relationship_count=relationship_count,
        heap_percentage_min=pct_min,
        heap_percentage_max=pct_max,
        spark=spark_plan_advisory(
            dims, tree, executor_memory_bytes=executor_memory_bytes
        ),
    )
