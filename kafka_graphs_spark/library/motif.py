"""Motif (pattern) finding — declarative subgraph matching compiled to joins.

Beyond-reference operator (the reference has no pattern-query surface; its
closest analogue is hand-written multi-join topology code such as the
triangle enumeration in ``core/streaming/library/ExactTriangleCount``-style
summaries). The public-API model here is the GraphFrames ``find()`` motif
language (Apache-licensed Spark package; language documented in the
GraphFrames user guide) — re-implemented from the grammar, not ported:

    pattern := term (';' term)*
    term    := edge | '!' edge
    edge    := '(' [name] ')' '-' '[' [name] ']' '->' '(' [name] ')'

Semantics:

- A named vertex binds that name to one vertex row; every occurrence of
  the name refers to the same vertex (a join constraint). A named edge
  binds the full edge row. Anonymous ``()`` / ``[]`` bind nothing.
- The result has one STRUCT column per named element, in order of first
  appearance: vertices carry the full vertex row, edges the full edge row.
- ``!(a)-[]->(b)`` (negated term) filters out matches where an edge
  a→b exists. Negated edges must be anonymous and their endpoints must be
  bound by positive terms (same restriction as GraphFrames).
- Distinctness is NOT imposed: two names may bind the same vertex (pure
  join semantics). Add ``a.id < b.id``-style filters for isomorphic
  matching, exactly as in GraphFrames.

Execution model / 100 TB notes: the pattern compiles to a chain of
equi-joins on edge endpoints — no UDFs, fully codegen, so Catalyst gets
join reordering, predicate pushdown through the struct columns, and AQE
skew handling for free. Each positive term adds one join against the edge
table (shuffle on the shared vertex key, broadcast-eligible when one side
is small); each negated term is a left-anti equi-join; each named vertex
adds one join against the vertex table (typically the small/broadcast
side). Disconnected patterns produce an explicit cross-join, as in
GraphFrames — the caller opted into the product. Worst-case output is the
usual subgraph-matching blowup; filters written against the struct columns
push into the join pipeline, so selective motifs never materialize the
unfiltered product.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_graphs_spark.graph import DST, ID, SRC, Graph

_TERM_RE = re.compile(r"^(!?)\((\w*)\)-\[(\w*)\]->\((\w*)\)$")


@dataclass(frozen=True)
class _Term:
    negated: bool
    src: str | None
    edge: str | None
    dst: str | None


def _parse(pattern: str) -> list[_Term]:
    terms: list[_Term] = []
    for raw in pattern.split(";"):
        token = re.sub(r"\s+", "", raw)
        if not token:
            continue
        m = _TERM_RE.match(token)
        if not m:
            raise ValueError(
                f"bad motif term {raw!r}: expected '(a)-[e]->(b)' "
                "(names optional, '!' prefix for negation)"
            )
        neg, src, edge, dst = m.groups()
        terms.append(_Term(bool(neg), src or None, edge or None, dst or None))
    if not terms:
        raise ValueError("empty motif pattern")
    names = [t.edge for t in terms if t.edge]
    vertex_names = {t.src for t in terms} | {t.dst for t in terms}
    dup = [n for n in names if names.count(n) > 1 or n in vertex_names]
    if dup:
        raise ValueError(f"edge names must be unique and distinct from vertex names: {dup}")
    for t in terms:
        if t.negated:
            if t.edge:
                raise ValueError("negated terms must use an anonymous edge: !(a)-[]->(b)")
            if not t.src or not t.dst:
                raise ValueError("negated terms need named endpoints: !(a)-[]->(b)")
    bound = {t.src for t in terms if not t.negated} | {t.dst for t in terms if not t.negated}
    for t in terms:
        if t.negated and not {t.src, t.dst} <= bound:
            raise ValueError(
                f"negated term endpoints ({t.src},{t.dst}) must be bound by a positive term"
            )
    return terms


def find(graph: Graph, pattern: str) -> DataFrame:
    """Match ``pattern`` against the graph; one row per assignment.

    Returns a DataFrame with one struct column per named vertex/edge in
    order of first appearance (vertex structs = full vertex row, edge
    structs = full edge row). See the module docstring for the grammar
    and the join plan this compiles to.
    """
    terms = _parse(pattern)
    edges, vertices = graph.edges, graph.vertices

    # Working frame columns: one flat column per binding —
    #   vertex name v  -> "__v_<v>"  (the vertex id)
    #   edge name e    -> "__e_<e>_<col>" for every edge column
    result: DataFrame | None = None
    bound: set[str] = set()          # bound vertex names
    order: list[tuple[str, str]] = []  # ("v"|"e", name) in first-appearance order

    fresh = iter(range(10**6))

    def note(kind: str, name: str | None) -> None:
        if name and (kind, name) not in order:
            order.append((kind, name))

    for t in terms:
        if t.negated:
            continue
        # Alias this term's edge occurrence with unique flat names.
        tag = next(fresh)
        src_c, dst_c = f"__t{tag}_src", f"__t{tag}_dst"
        e = edges.select(
            F.col(SRC).alias(src_c),
            F.col(DST).alias(dst_c),
            *[
                F.col(c).alias(f"__t{tag}_{c}")
                for c in edges.columns
                if c not in (SRC, DST)
            ],
        )
        conds: list[Column] = []
        new_cols: list[tuple[str, str]] = []  # (existing alias in e, final name)
        seen_in_term: dict[str, str] = {}
        for name, col in ((t.src, src_c), (t.dst, dst_c)):
            if not name:
                continue
            if name in bound:
                conds.append(F.col(col) == F.col(f"__v_{name}"))
            elif name in seen_in_term:
                # same NEW name on both endpoints: '(a)-[]->(a)' self-loop
                conds.append(F.col(col) == F.col(seen_in_term[name]))
            else:
                seen_in_term[name] = col
                new_cols.append((col, f"__v_{name}"))
        if result is None:
            result = e
            for c in conds:  # within-term constraints on the seed term
                result = result.filter(c)
        elif conds:
            cond = conds[0]
            for c in conds[1:]:
                cond = cond & c
            result = result.join(e, on=cond)
        else:
            # Disconnected pattern component — explicit cartesian product,
            # same semantics as GraphFrames.
            result = result.crossJoin(e)
        # Promote new vertex bindings and the edge struct's columns. A
        # source column may be re-aliased twice (endpoint that is both a
        # new vertex binding and part of a named edge) — hence pairs, not
        # a dict.
        renames: list[tuple[str, str]] = list(new_cols)
        if t.edge:
            renames.append((src_c, f"__e_{t.edge}_{SRC}"))
            renames.append((dst_c, f"__e_{t.edge}_{DST}"))
            for c in edges.columns:
                if c not in (SRC, DST):
                    renames.append((f"__t{tag}_{c}", f"__e_{t.edge}_{c}"))
        keep = [c for c in result.columns if not c.startswith(f"__t{tag}_")]
        sel = [F.col(c) for c in keep]
        for old, new in renames:
            sel.append(F.col(old).alias(new))
        result = result.select(*sel)
        for name in (t.src, t.dst):
            if name:
                bound.add(name)
        note("v", t.src)
        note("e", t.edge)
        note("v", t.dst)

    # _parse rejects all-negated patterns (their endpoints can't be bound),
    # so at least one positive term seeded `result`.
    assert result is not None

    for t in terms:
        if not t.negated:
            continue
        anti = edges.select(
            F.col(SRC).alias("__neg_src"), F.col(DST).alias("__neg_dst")
        )
        result = result.join(
            anti,
            on=[
                F.col(f"__v_{t.src}") == F.col("__neg_src"),
                F.col(f"__v_{t.dst}") == F.col("__neg_dst"),
            ],
            how="left_anti",
        )

    # Attach vertex rows and build the output structs.
    out_cols: list[Column] = []
    for kind, name in order:
        if kind == "v":
            tag = next(fresh)
            v = vertices.select(
                F.col(ID).alias(f"__t{tag}_{ID}"),
                *[
                    F.col(c).alias(f"__t{tag}_{c}")
                    for c in vertices.columns
                    if c != ID
                ],
            )
            result = result.join(
                v, on=F.col(f"__v_{name}") == F.col(f"__t{tag}_{ID}")
            )
            out_cols.append(
                F.struct(
                    *[F.col(f"__t{tag}_{c}").alias(c) for c in vertices.columns]
                ).alias(name)
            )
        else:
            out_cols.append(
                F.struct(
                    *[F.col(f"__e_{name}_{c}").alias(c) for c in edges.columns]
                ).alias(name)
            )
    return result.select(*out_cols)
