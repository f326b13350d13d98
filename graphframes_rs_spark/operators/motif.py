"""Motif finding: GraphFrames' ``find()`` pattern-matching API re-expressed
as a deterministic chain of DataFrame joins.

Pattern language (the GraphFrames core subset):

* ``(a)-[e]->(b)`` — a directed edge term; ``a``/``b`` bind vertices,
  ``e`` binds the edge. Re-using a name across terms unifies the binding.
* ``()`` / ``[]`` — anonymous vertices/edges: participate in matching but
  produce no output column and never unify.
* ``!(a)-[]->(b)`` — negated term: matches only when NO such edge exists
  (left-anti join). Negated terms cannot name an edge and must reference
  vertices bound by positive terms.

Output: one column per *named* element — vertex columns are structs of the
full vertex row, edge columns are structs of (src, dst, edge attrs) — the
same shape GraphFrames returns, so downstream ``F.col("a.id")`` works.

Spark-first plan: every positive term is one equi-join against the edge
frame on whichever endpoints are already bound (Catalyst orders/executes
them as ordinary shuffled hash/SMJ joins; AQE handles skewed vertices);
disconnected pattern components become cross joins exactly as in
GraphFrames — the caller's pattern, not the engine, decides that cost.
Negations are broadcast-friendly left-anti joins at the end, after the
positive bindings have pruned the row count.

The edge frame is referenced once per pattern term, so a graph whose
edges are themselves an expensive pipeline (joins, distinct) should be
materialized first (checkpoint / localCheckpoint) — otherwise Catalyst
recomputes that pipeline per term unless ReusedExchange happens to fire.

TERM ORDER IS JOIN ORDER: terms join left-to-right on whichever
endpoints are already bound, and Catalyst does not re-order them (each
join's keys depend on the prior bindings). Put the most selective terms
early; the intermediate after each join is the count of partial matches
so far, which term order can change by orders of magnitude on skewed
graphs. For patterns where every ordering routes through a hub (e.g.
dense triangles), prefer the dedicated degree-ordered operators
(``triangle_count``) when the full binding list isn't needed.

"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import DST, ID, SRC, GraphFrameError

_TERM_RE = re.compile(r"^(!?)\((\w*)\)-\[(\w*)\]->\((\w*)\)$")


def _parse(pattern: str) -> List[Tuple[bool, str, str, str]]:
    """[(negated, src_name, edge_name, dst_name)] with '' for anonymous."""
    terms = []
    for raw in pattern.split(";"):
        term = raw.strip()
        if not term:
            continue
        m = _TERM_RE.match(term)
        if not m:
            raise GraphFrameError(
                f"unsupported motif term {term!r}; expected "
                "'(a)-[e]->(b)' optionally prefixed with '!'"
            )
        neg, s, e, d = m.groups()
        if neg and e:
            raise GraphFrameError(
                f"negated term {term!r} cannot bind an edge name"
            )
        terms.append((bool(neg), s, e, d))
    if not terms:
        raise GraphFrameError("empty motif pattern")
    e_names = [e for _, _, e, _ in terms if e]
    dupes = {n for n in e_names if e_names.count(n) > 1}
    if dupes:
        raise GraphFrameError(
            f"edge name(s) {sorted(dupes)} bound by more than one term"
        )
    return terms


def find(graph, pattern: str) -> DataFrame:
    """Match ``pattern`` against the graph; see module docstring."""
    terms = _parse(pattern)
    edges = graph.edges
    vertices = graph.vertices
    e_attrs = [c for c in edges.columns if c not in (SRC, DST)]

    anon_counter = [0]

    def vname(name: str) -> str:
        if name:
            return name
        anon_counter[0] += 1
        return f"__anon{anon_counter[0]}"

    bound: List[str] = []  # vertex names with a __vid_<name> column so far
    result: Optional[DataFrame] = None

    positives = [t for t in terms if not t[0]]
    negatives = [t for t in terms if t[0]]
    if not positives:
        raise GraphFrameError("motif pattern needs at least one positive term")

    for i, (_, s_raw, e_name, d_raw) in enumerate(positives):
        s, d = vname(s_raw), vname(d_raw)
        edge_struct = F.struct(
            F.col(SRC).alias(SRC),
            F.col(DST).alias(DST),
            *[F.col(c) for c in e_attrs],
        )
        if s == d:  # (a)-[]->(a): match self-loops only
            cols = [F.col(SRC).alias(f"__vid_{s}")]
            if e_name:
                cols.append(edge_struct.alias(f"__edge_{e_name}"))
            term_df = edges.filter(F.col(SRC) == F.col(DST)).select(*cols)
        else:
            cols = [
                F.col(SRC).alias(f"__vid_{s}"),
                F.col(DST).alias(f"__vid_{d}"),
            ]
            if e_name:
                cols.append(edge_struct.alias(f"__edge_{e_name}"))
            term_df = edges.select(*cols)
        if result is None:
            result = term_df
        else:
            on = list(
                dict.fromkeys(f"__vid_{n}" for n in (s, d) if n in bound)
            )
            if on:
                result = result.join(term_df, on)
            else:  # disconnected component: cartesian, as in GraphFrames
                result = result.crossJoin(term_df)
        for n in (s, d):
            if n not in bound:
                bound.append(n)

    for _, s_raw, _, d_raw in negatives:
        if not s_raw or not d_raw:
            raise GraphFrameError("negated terms cannot use anonymous vertices")
        for n in (s_raw, d_raw):
            if n not in bound:
                raise GraphFrameError(
                    f"negated term references unbound vertex '{n}'"
                )
        anti = edges.select(
            F.col(SRC).alias(f"__vid_{s_raw}"), F.col(DST).alias(f"__vid_{d_raw}")
        )
        result = result.join(
            anti, [f"__vid_{s_raw}", f"__vid_{d_raw}"], "left_anti"
        )

    # attach vertex structs for named vertices, edge structs for named edges.
    # When the vertex frame carries no attributes beyond id, the struct is
    # built directly from the bound id column — zero joins (a 3-name motif
    # would otherwise pay three id-only shuffled joins for data it already
    # has). Semantic note: the join form also filters matches to vertices
    # present in the vertex frame; the attribute-free form skips that check,
    # which is sound because GraphFrame edges reference vertex ids by
    # construction.
    out_cols = []
    v_has_attrs = any(c != ID for c in vertices.columns)
    for name in [n for n in bound if not n.startswith("__anon")]:
        if v_has_attrs:
            v_struct = vertices.select(
                F.col(ID).alias(f"__vid_{name}"),
                F.struct(*[F.col(c) for c in vertices.columns]).alias(name),
            )
            result = result.join(v_struct, f"__vid_{name}")
        else:
            result = result.withColumn(
                name, F.struct(F.col(f"__vid_{name}").alias(ID))
            )
        out_cols.append(name)
    for _, _, e_name, _ in positives:
        if e_name:
            result = result.withColumnRenamed(f"__edge_{e_name}", e_name)
            out_cols.append(e_name)
    return result.select(*out_cols)
