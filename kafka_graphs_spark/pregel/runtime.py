"""The generic Pregel driver loop.

Reference: io/kgraph/pregel/PregelComputation.java (superstep dataflow:
workSet → BarrierSync → VertexComputeUdf → solutionSet/sendMessages,
:275-301) and ComputeFunction.java:44-267 (the user surface: compute,
sendMessageTo, setNewVertexValue, voteToHalt, add/removeEdge,
aggregate, masterCompute).

Spark re-expression (SURVEY.md §3.1): one superstep = one declarative
DataFrame pipeline —

    messages.groupBy(id).agg(collect_list | combiner)     # work set
      ⟕ vertices (full_outer)                             # solution set
      ⟕ out-adjacency (left)                              # edges store
      → mapInPandas(compute)                              # VertexComputeUdf
      → split: new vertices / new messages / aggregator
               contributions / edge mutations

The driver's sequential loop is the BSP barrier (the reference needs
ZooKeeper + Kafka offsets for this, PregelComputation.java:408-548).

Scale design:
- vertices & adjacency are hash-partitioned on id once and persisted; the
  per-superstep groupBy(id) shuffles messages INTO that partitioning, so
  both joins are co-partitioned (no vertex/adjacency re-shuffle).
- ``combiner`` turns message aggregation into a partial (map-side) agg —
  essential for skewed/hub vertices (star graphs, power-law degrees).
- ``localCheckpoint`` each superstep truncates lineage — the classic
  iterative-Spark OOM/stack-overflow failure mode (SURVEY.md §4.1 "state").
- the compute UDF is an Arrow-batched mapInPandas (not per-row Python).
- termination stats + aggregator merge are ONE small aggregation job per
  superstep (partial-aggregated, tiny driver collect).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_graphs_spark.graph import Graph
from kafka_graphs_spark.library._loop import (
    AdaptiveLoopConf,
    eager_checkpoint,
    free_df,
    lazy_checkpoint,
)
from kafka_graphs_spark.pregel.aggregators import Aggregator


class ComputeContext:
    """Per-vertex callback surface handed to ``compute``.

    Reference: ComputeFunction.Callback (ComputeFunction.java:155-267).
    """

    __slots__ = (
        "_messages_out",
        "_new_value",
        "_value_set",
        "_halted",
        "_aggs",
        "_edge_adds",
        "_edge_dels",
        "aggregates",
        "configs",
    )

    def __init__(self, aggregates: Dict[str, float], configs: Dict[str, Any]):
        self.aggregates = aggregates
        self.configs = configs
        self._reset()

    def _reset(self):
        self._messages_out: List[dict] = []
        self._new_value = None
        self._value_set = False
        self._halted = False
        self._aggs: Dict[str, float] = {}
        self._edge_adds: List[dict] = []
        self._edge_dels: List[dict] = []

    # -- reference: cb.sendMessageTo(target, message) (ComputeFunction.java:213-216)
    def send_message_to(self, target, message) -> None:
        self._messages_out.append({"target": target, "message": message})

    # -- reference: cb.setNewVertexValue(v) (ComputeFunction.java:218-220)
    def set_new_vertex_value(self, value) -> None:
        self._new_value = value
        self._value_set = True

    # -- reference: cb.voteToHalt() (ComputeFunction.java:249-251); NOT calling
    #    this keeps the vertex active via self-message (PregelComputation.java:767-770)
    def vote_to_halt(self) -> None:
        self._halted = True

    # -- reference: cb.addEdge / setNewEdgeValue / removeEdge
    #    (ComputeFunction.java:222-247) — graph mutation during computation
    def add_edge(self, src, target, value) -> None:
        self._edge_adds.append({"src": src, "dst": target, "value": value})

    def set_new_edge_value(self, src, target, value) -> None:
        self._edge_adds.append({"src": src, "dst": target, "value": value})

    def remove_edge(self, src, target) -> None:
        self._edge_dels.append({"src": src, "dst": target})

    # -- reference: cb.aggregate(name, value) (ComputeFunction.java:253-267);
    #    per-vertex contributions are map-semantics (last call per vertex wins)
    def aggregate(self, name: str, value: float) -> None:
        self._aggs[name] = float(value)

    def get_aggregate(self, name: str, default: float = None) -> float:
        return self.aggregates.get(name, default)


@dataclass
class PregelResult:
    """Outcome of a Pregel run (reference: GraphAlgorithmState.java:71-99)."""

    vertices: DataFrame                 # final solution set (id, value)
    edges: DataFrame                    # final edge set (mutations applied)
    superstep: int                      # number of supersteps executed
    state: str                          # COMPLETED (max iter) | HALTED (converged/master)
    aggregates: Dict[str, float] = field(default_factory=dict)


def _to_py(obj):
    """Normalize Arrow/pandas row cells to plain Python for the compute fn."""
    import numpy as np

    if obj is None:
        return None
    if isinstance(obj, np.generic):
        return obj.item()
    if isinstance(obj, np.ndarray):
        return [_to_py(x) for x in obj]
    if isinstance(obj, list):
        return [_to_py(x) for x in obj]
    if isinstance(obj, dict):
        return {k: _to_py(v) for k, v in obj.items()}
    return obj


def pregel(
    graph: Graph,
    compute: Callable,
    *,
    vertex_value_type: str,
    message_type: str,
    initial_message: Any = None,
    max_iterations: int = 30,
    combiner: Optional[str] = None,
    aggregators: Optional[Dict[str, Aggregator]] = None,
    master_compute: Optional[Callable[[int, Dict[str, float]], bool]] = None,
    configs: Optional[Dict[str, Any]] = None,
    num_partitions: Optional[int] = None,
    pre_superstep: Optional[Callable[[int, Dict[str, float]], None]] = None,
    post_superstep: Optional[Callable[[int, Dict[str, float]], None]] = None,
) -> PregelResult:
    """Run a vertex-centric BSP computation to convergence.

    compute(superstep, vertex_id, vertex_value, messages, edges, ctx):
        the vertex program (reference ComputeFunction.compute,
        ComputeFunction.java:84-88). ``edges`` is the list of out-edges
        [{'dst':…, 'value':…}]; ``messages`` the incoming message list.
    vertex_value_type / message_type: Spark DDL type strings (the
        reference's serde declarations, GraphSerialized.java:21-55).
    initial_message: optional seed delivered to every vertex at
        superstep 0 (PregelComputation.java:124,271).
    combiner: optional aggregate name ('min'|'max'|'sum'|...) applied to
        messages per target — compute then sees a 1-element list. Mirrors
        where the reference ships whole lists (SURVEY.md §4.2.3).
    master_compute(superstep, aggregates) -> bool: driver-side hook at the
        barrier; return True to halt (ComputeFunction.java:129-153).
    pre_superstep / post_superstep(superstep, aggregates): partition-scoped
        setup/teardown hooks, run on the EXECUTOR once per partition before
        the first / after the last compute call of that superstep — the
        reference's ComputeFunction.preSuperstep/postSuperstep
        (ComputeFunction.java:72-73, invoked PregelComputation.java:743-747,
        853-855). Must be picklable; side effects are per-worker-process.
    Termination: no vertex is active (all voted halt and no messages) or
        superstep limit (PregelComputation.java:564-578).
    """
    spark = graph.vertices.sparkSession
    aggregators = dict(aggregators or {})
    configs = dict(configs or {})

    id_type = dict(graph.vertices.dtypes)["id"]
    edge_value_type = dict(graph.edges.dtypes).get("value", "long")

    out_schema = (
        f"id {id_type}, value {vertex_value_type}, halted boolean, "
        f"messages array<struct<target:{id_type}, message:{message_type}>>, "
        f"aggs map<string,double>, "
        f"edge_adds array<struct<src:{id_type}, dst:{id_type}, value:{edge_value_type}>>, "
        f"edge_dels array<struct<src:{id_type}, dst:{id_type}>>"
    )

    # partition count for the co-located vertex/adjacency stores: sized
    # ONCE from the measured vertex count (constant across supersteps so
    # the per-superstep joins stay co-partitioned), capped at the session
    # setting — at 100 TB this is thousands of partitions, at test scale
    # it stops every superstep from fanning 32 near-empty tasks per stage
    if num_partitions is not None:
        n_part = int(num_partitions)
    else:
        session_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        n_v = graph.vertices.count()
        n_part = min(
            max(1, -(-n_v // AdaptiveLoopConf.ROWS_PER_PARTITION)),
            max(session_parts, 1),
        )

    # solution set: (id, value, halted) — hash-partitioned on id, persisted.
    vertices = (
        graph.vertices.select("id", F.col("value").cast(vertex_value_type).alias("value"))
        .withColumn("halted", F.lit(False))
        .repartition(n_part, "id")
        .persist()
    )

    # edges store: out-adjacency grouped by src (PregelComputation.java:242-247),
    # partitioned like the vertices so the per-superstep join is co-located.
    edges = graph.edges.select(
        "src", "dst", F.col("value").cast(edge_value_type).alias("value")
    )

    def build_adjacency(e: DataFrame) -> DataFrame:
        return (
            e.groupBy(F.col("src").alias("id"))
            .agg(F.collect_list(F.struct("dst", "value")).alias("edges"))
            .repartition(n_part, "id")
            .persist()
        )

    adjacency = build_adjacency(edges)

    # work set: (id, message) — superstep 0 delivers the optional initial
    # message to every vertex (PregelComputation.java:259-273).
    if initial_message is not None:
        messages = vertices.select(
            "id", F.lit(initial_message).cast(message_type).alias("message")
        )
    else:
        messages = vertices.select("id", F.lit(None).cast(message_type).alias("message"))

    superstep = 0
    state = "COMPLETED"
    # frames from the previous generation, freed only after the next
    # superstep's stats action has materialized the current one
    pending_free: List[DataFrame] = []
    # loop-scoped session tuning from the per-superstep stats (see
    # AdaptiveLoopConf): small supersteps are driver-latency-bound
    loop_conf = AdaptiveLoopConf()

    try:
        while superstep < max_iterations:
            # ---- barrier work: merge aggregators from previous superstep is done
            # below at collection time; expose current values to compute via closure.
            agg_values = {name: a.value for name, a in aggregators.items()}
            step = superstep
            compute_fn = compute
            cfgs = configs

            # 1. aggregate the work set per target (combiner ⇒ partial agg).
            if combiner is not None:
                agg_col = getattr(F, combiner)("message").alias("_combined")
                msgs_by_target = (
                    messages.groupBy("id")
                    .agg(agg_col, F.count("message").alias("_nmsgs"))
                    .select("id", F.array("_combined").alias("msgs"), "_nmsgs")
                )
            else:
                msgs_by_target = messages.groupBy("id").agg(
                    F.collect_list("message").alias("msgs"),
                    F.count("message").alias("_nmsgs"),
                )

            # 2. join solution set + work set + edges store. full_outer: messages
            # may target ids with no vertex state yet (compute sees value=None and
            # may create the vertex — reference VertexComputeUdf null handling).
            joined = (
                vertices.join(msgs_by_target, on="id", how="full_outer")
                .withColumn("_nmsgs", F.coalesce(F.col("_nmsgs"), F.lit(0)))
                .withColumn("halted", F.coalesce(F.col("halted"), F.lit(False)))
            )

            # Active = received a message, or did not vote to halt. Superstep 0
            # activates everyone (work-set init, PregelComputation.java:259-273).
            is_active = (F.col("_nmsgs") > 0) | (~F.col("halted"))
            active = joined.filter(is_active).join(adjacency, on="id", how="left")
            inactive = joined.filter(~is_active).select("id", "value", "halted")

            pre_fn = pre_superstep
            post_fn = post_superstep

            def run_compute(iterator):
                # mapInPandas runs this once per PARTITION (iterator of Arrow
                # batches) — the reference's per-partition hook scope.
                ctx = ComputeContext(agg_values, cfgs)
                import pandas as pd

                if pre_fn is not None:
                    pre_fn(step, agg_values)
                for pdf in iterator:
                    out_rows = []
                    for row in pdf.itertuples(index=False):
                        d = row._asdict()
                        vid = _to_py(d["id"])
                        value = _to_py(d.get("value"))
                        msgs = _to_py(d.get("msgs")) or []
                        msgs = [m for m in msgs if m is not None]
                        out_edges = _to_py(d.get("edges")) or []
                        ctx._reset()
                        compute_fn(step, vid, value, msgs, out_edges, ctx)
                        out_rows.append(
                            {
                                "id": vid,
                                "value": ctx._new_value if ctx._value_set else value,
                                "halted": ctx._halted,
                                "messages": ctx._messages_out,
                                "aggs": ctx._aggs,
                                "edge_adds": ctx._edge_adds,
                                "edge_dels": ctx._edge_dels,
                            }
                        )
                    yield pd.DataFrame(
                        out_rows,
                        columns=[
                            "id", "value", "halted", "messages", "aggs", "edge_adds", "edge_dels",
                        ],
                    )
                if post_fn is not None:
                    post_fn(step, agg_values)

            out = active.mapInPandas(run_compute, schema=out_schema).persist()

            # 3. one small stats job: message volume, activity, mutations, aggregators.
            stats_cols = [
                F.coalesce(F.sum(F.size("messages")), F.lit(0)).alias("n_msgs"),
                F.coalesce(F.sum(F.when(~F.col("halted"), 1).otherwise(0)), F.lit(0)).alias("n_active"),
                F.coalesce(F.sum(F.size("edge_adds")), F.lit(0)).alias("n_adds"),
                F.coalesce(F.sum(F.size("edge_dels")), F.lit(0)).alias("n_dels"),
            ]
            stats = out.agg(*stats_cols).collect()[0]
            loop_conf.tune(spark, stats["n_msgs"] + stats["n_active"])
            # the stats action computed through (and thereby materialized)
            # the previous generation's lazy checkpoints — its frames are
            # now dead
            for df in pending_free:
                free_df(df)
            pending_free = []

            if aggregators:
                contrib = (
                    out.select(F.explode("aggs").alias("name", "v"))
                    .groupBy("name")
                    .agg(
                        F.sum("v").alias("sum"),
                        F.min("v").alias("min"),
                        F.max("v").alias("max"),
                        F.product("v").alias("product"),
                    )
                    .collect()
                )
                by_name = {r["name"]: r for r in contrib}
                for name, agg in aggregators.items():
                    agg.reset()
                    r = by_name.get(name)
                    if r is not None:
                        col = {"and": "min", "or": "max"}.get(agg.op, agg.op)
                        agg.merge(r[col])

            # 4. next solution set = computed ∪ untouched — a LAZY checkpoint
            # leaf: its blocks materialize during the NEXT superstep's stats
            # action (while ``out`` is still persisted — the previous
            # generation is freed only after that materialization, so the
            # possibly non-deterministic compute UDF still executes exactly
            # once per superstep). ChainLoop discipline: 2 fewer driver
            # jobs per superstep than eager checkpoints.
            new_vertices = lazy_checkpoint(
                out.select("id", "value", "halted")
                .unionByName(inactive)
                .repartition(n_part, "id")
            )

            superstep += 1

            # ---- masterCompute at the barrier (ComputeFunction.java:129-153)
            halted = bool(
                master_compute is not None
                and master_compute(superstep, {n: a.value for n, a in aggregators.items()})
            )
            # no active vertex and no in-flight message ⇒ converged
            # (PregelComputation.java:564-578)
            halted = halted or (stats["n_msgs"] == 0 and stats["n_active"] == 0)
            running = not halted and superstep < max_iterations

            # 5. next work set — same lazy-leaf discipline as the solution set
            if running and stats["n_msgs"] > 0:
                new_messages = lazy_checkpoint(
                    out.select(F.explode("messages").alias("m")).select(
                        F.col("m.target").alias("id"), F.col("m.message").alias("message")
                    )
                )
            else:
                # empty work set with the right schema; iteration (if any)
                # proceeds on n_active alone.
                new_messages = spark.createDataFrame(
                    [], f"id {id_type}, message {message_type}"
                )

            # 6. apply edge mutations (rebuild the edges store only when mutated —
            # reference writes the local adjacency store, ComputeFunction.java:222-247).
            if stats["n_adds"] or stats["n_dels"]:
                adds = out.select(F.explode("edge_adds").alias("e")).select(
                    "e.src", "e.dst", "e.value"
                ).dropDuplicates(["src", "dst"])
                dels = out.select(F.explode("edge_dels").alias("e")).select("e.src", "e.dst")
                new_edges = eager_checkpoint(
                    edges.join(adds.select("src", "dst"), on=["src", "dst"], how="left_anti")
                    .unionByName(adds)
                    .join(dels, on=["src", "dst"], how="left_anti")
                )
                old_edges, edges = edges, new_edges
                free_df(adjacency)
                free_df(old_edges)
                if running:
                    adjacency = build_adjacency(edges)

            # defer freeing: the new lazy checkpoints read ``out``'s cache
            # when the NEXT superstep's stats action materializes them —
            # this generation's frames are freed after that action.
            pending_free.extend([out, vertices, messages])
            vertices, messages = new_vertices, new_messages

            if halted:
                state = "HALTED"
                break

    finally:
        loop_conf.restore(spark)

    # materialize the final solution set through the last generation's
    # still-persisted cache, then drop the leftovers
    vertices.count()
    for df in pending_free:
        free_df(df)
    free_df(messages)
    free_df(adjacency)
    return PregelResult(
        vertices=vertices.select("id", "value"),
        edges=edges,
        superstep=superstep,
        state=state,
        aggregates={n: a.value for n, a in aggregators.items()},
    )
