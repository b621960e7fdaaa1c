"""Custom stateful streaming operators via ``applyInPandasWithState``.

Reference: the EdgeStream running aggregates keep per-vertex HashMaps
inside mapper instances (io/kgraph/streaming/EdgeStream.java:269-295
degrees, :325-338 distinct neighborhoods) — per-partition, in-memory,
non-fault-tolerant. The Structured Streaming state store is the same
mechanism made durable: keyed state survives micro-batches AND query
restarts (checkpointed), which is the semantics the reference only
approximates.

These are the engine's custom-stateful-operator template: grouped Arrow
batches in, per-key GroupState, update-mode output. At 100 TB the state
is sharded by key across executors (RocksDB-backed state store in
production configs) — no driver-side structure anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

SRC, DST = "src", "dst"


def stateful_degrees(edges_stream: DataFrame) -> DataFrame:
    """Running total degree per vertex over a STREAM of edges.

    Batch twin: ``EdgeStream.degrees()`` (one groupBy). The streaming form
    maintains one long of state per vertex and emits an updated (id,
    degree) row whenever a micro-batch touches the vertex — exactly the
    reference's continuously-improving degree stream
    (EdgeStream.java:269-295), fault-tolerant.
    """
    import pandas as pd  # noqa: F401 — documents the worker-side dependency

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ends = edges_stream.select(F.col(SRC).alias("id")).unionByName(
        edges_stream.select(F.col(DST).alias("id"))
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        count = state.get[0] if state.exists else 0
        for pdf in pdfs:
            count += len(pdf)
        state.update((count,))
        yield pd.DataFrame({"id": [key[0]], "degree": [count]})

    return ends.groupBy("id").applyInPandasWithState(
        update,
        outputStructType="id long, degree long",
        stateStructType="degree long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_distinct_degrees(edges_stream: DataFrame) -> DataFrame:
    """Running DISTINCT-neighbor degree per vertex (set-valued state).

    The reference's distinct-neighborhood mapper (EdgeStream.java:325-338)
    keeps a per-vertex neighbor HashSet; here the set is per-key
    GroupState (array of longs), deduplicated incrementally — state size
    is the vertex's neighborhood, sharded by vertex across the cluster.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ends = edges_stream.select(
        F.col(SRC).alias("id"), F.col(DST).alias("nbr")
    ).unionByName(edges_stream.select(F.col(DST).alias("id"), F.col(SRC).alias("nbr")))

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            seen.update(int(x) for x in pdf["nbr"])
        state.update((sorted(seen),))
        yield pd.DataFrame({"id": [key[0]], "degree": [len(seen)]})

    return ends.groupBy("id").applyInPandasWithState(
        update,
        outputStructType="id long, degree long",
        stateStructType="nbrs array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_heavy_vertices(edges_stream: DataFrame, min_degree: int) -> DataFrame:
    """Heavy-hitter alerting: emit (id, degree) exactly once per vertex,
    the micro-batch its running total degree first reaches ``min_degree``.

    The streaming "trending entity" pattern: state is one long plus an
    emitted flag per vertex (checkpointed, sharded by id); downstream
    sinks receive each vertex at most once, when it crosses the
    threshold — no re-emission churn on every touch like the running
    degree stream.
    """
    import pandas as pd  # noqa: F401 — worker-side dependency

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if min_degree < 1:
        raise ValueError("min_degree must be >= 1")

    ends = edges_stream.select(F.col(SRC).alias("id")).unionByName(
        edges_stream.select(F.col(DST).alias("id"))
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        count, emitted = state.get if state.exists else (0, False)
        for pdf in pdfs:
            count += len(pdf)
        fire = (not emitted) and count >= min_degree
        state.update((count, emitted or fire))
        # yield ONLY on the threshold crossing — the steady-state hot path
        # (already-emitted / below-threshold groups) serializes nothing
        if fire:
            yield pd.DataFrame({"id": [key[0]], "degree": [count]})

    return ends.groupBy("id").applyInPandasWithState(
        update,
        outputStructType="id long, degree long",
        stateStructType="degree long, emitted boolean",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_sessions(
    events_stream: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming twin of ``pipeline.sessions.session_stats``: per-user
    gap-based sessions over an event STREAM.

    State per user: (last event micros, session number, running count,
    session start micros, running value sum) — checkpointed, sharded by
    user. Each micro-batch emits the user's CURRENT session row (update
    mode); a session row is superseded downstream when more events extend
    it, exactly the continuously-improving result stream of the reference
    model. Events are processed in (ts, arrival) order WITHIN a batch;
    cross-batch reordering follows the stream's delivery order (the
    single-pass assumption the reference's streaming tier makes —
    io/kgraph/streaming/EdgeStream.java single-pass summaries).
    """
    import pandas as pd  # noqa: F401 — worker-side dependency

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(gap_minutes) * 60 * 1_000_000
    sel = events_stream.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).cast("timestamp_ntz").alias("ts"),
        F.col(value_col).cast("double").alias("value"),
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            last_us, session, n, start_us, total = state.get
        else:
            last_us, session, n, start_us, total = None, 0, 0, None, 0.0
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            batch = batch.sort_values("ts", kind="stable")
            # emit every session this batch touched: sessions closed by a
            # gap get their FINAL row; the still-open session its running
            # row (a batch can open and close several sessions at once)
            emitted = []
            for ts, val in zip(batch["ts"], batch["value"]):
                us = int(pd.Timestamp(ts).value // 1_000)
                if last_us is not None and us - last_us > gap_us:
                    emitted.append((session, n, start_us, last_us, round(total, 6)))
                    session += 1
                    n, start_us, total = 0, us, 0.0
                if start_us is None:
                    start_us = us
                n += 1
                total += float(val)
                last_us = us
            emitted.append((session, n, start_us, last_us, round(total, 6)))
            state.update((last_us, session, n, start_us, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(emitted),
                    "session": [e[0] for e in emitted],
                    "n_events": [e[1] for e in emitted],
                    "start_us": [e[2] for e in emitted],
                    "end_us": [e[3] for e in emitted],
                    "total_value": [e[4] for e in emitted],
                }
            )

    return sel.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id long, session long, n_events long, "
            "start_us long, end_us long, total_value double"
        ),
        stateStructType=(
            "last_us long, session long, n long, start_us long, total double"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
