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
graphs.

EXCEPTION — closed triangles: patterns whose three positive terms cover
all three unordered pairs of three named vertices (any direction mix, no
edge names) are detected and rewritten to degree-ordered triangle
enumeration (``_triangle_bindings``): wedge fan-out is bounded by the
LOW-degree endpoint instead of Σdeg(hub)², then each undirected triangle
expands into the pattern's valid directed assignments from per-pair
direction counts. Binding-for-binding identical to the join chain —
self-loop degenerate matches and parallel-edge multiplicities included
(equivalence pinned by an adversarial multiset test). Measured 11x at
sf0.1 on the hub-heavy lineitem triple graph (56s → 5s for 670k
bindings). Kill switch: ``spark.graphframes.motif.triangleFastPath``.

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


def _triangle_gate(positives) -> Optional[Tuple[List[str], List[Tuple[str, str]]]]:
    """(names, directed terms) when the positive terms form a closed
    3-name triangle eligible for the degree-ordered fast path: exactly
    three terms, every vertex named, no edge names, no self-loop terms,
    and the three unordered name pairs each covered exactly once."""
    if len(positives) != 3:
        return None
    names: List[str] = []
    pairs = set()
    terms: List[Tuple[str, str]] = []
    for _, s, e, d in positives:
        if e or not s or not d or s == d:
            return None
        terms.append((s, d))
        pairs.add(frozenset((s, d)))
        for n in (s, d):
            if n not in names:
                names.append(n)
    if len(names) != 3 or len(pairs) != 3:
        return None
    return names, terms


def _chain_positives(edges, positives, e_attrs, vname):
    """The literal left-to-right join chain over the positive terms —
    term order is join order (module docstring). Returns (result, bound)."""
    bound: List[str] = []  # vertex names with a __vid_<name> column so far
    result: Optional[DataFrame] = None
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
    return result, bound


def _triangle_bindings(edges, names, terms, positives, e_attrs, vname):
    """Directed-triangle bindings without the naive wedge blowup.

    1. Collapse the (possibly duplicated) directed edge set into one row
       per unordered vertex pair carrying BOTH direction multiplicities.
    2. Orient each pair low→high by (degree, id) and enumerate each
       undirected triangle exactly once — wedge fan-out is bounded by the
       lower-degree endpoint, so hub vertices never anchor Σdeg(hub)²
       intermediates (the same mitigation as ``triangle_count``).
    3. Expand each triangle into the pattern's 6 vertex assignments,
       keeping those whose three required directed edges exist; duplicate
       parallel edges multiply bindings exactly as the join chain would
       (explode over the multiplicity product).
    4. Bindings that repeat a vertex are possible only via self-loop
       edges (every name pair is a pattern term, so a repeated vertex
       implies some term matched x→x); they are recovered by running the
       literal chain on the loop-incident edge subset and keeping only
       repeated-vertex rows — exact, and priced on the (tiny) loop set.
    """
    from functools import reduce as _reduce
    from itertools import permutations

    E = edges.select(SRC, DST)
    loops = E.filter(F.col(SRC) == F.col(DST))
    nonloops = E.filter(F.col(SRC) != F.col(DST))

    dirs = nonloops.groupBy(SRC, DST).agg(F.count(F.lit(1)).alias("cnt"))
    pairs = (
        dirs.select(
            F.least(SRC, DST).alias("u"),
            F.greatest(SRC, DST).alias("v"),
            F.when(F.col(SRC) < F.col(DST), F.col("cnt"))
            .otherwise(F.lit(0))
            .alias("fwd"),
            F.when(F.col(SRC) > F.col(DST), F.col("cnt"))
            .otherwise(F.lit(0))
            .alias("rev"),
        )
        .groupBy("u", "v")
        .agg(F.sum("fwd").alias("c_uv"), F.sum("rev").alias("c_vu"))
        # referenced 5 times below (orientation, degrees, 3 direction
        # lookups): materialize once instead of re-running the groupBys
        .localCheckpoint(eager=False)
    )

    deg = (
        pairs.select(F.col("u").alias(ID))
        .unionAll(pairs.select(F.col("v").alias(ID)))
        .groupBy(ID)
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ku = deg.select(
        F.col(ID).alias("u"),
        F.struct(F.col("deg").alias("d"), F.col(ID).alias("i")).alias("ku"),
    )
    kv = deg.select(
        F.col(ID).alias("v"),
        F.struct(F.col("deg").alias("d"), F.col(ID).alias("i")).alias("kv"),
    )
    # orient each pair low→high by (degree, id) and CARRY both direction
    # multiplicities — the wedge and closing joins below then deliver every
    # pair's counts to its triangles with zero extra lookup joins
    lo_first = F.col("ku") < F.col("kv")  # lexicographic (deg, id)
    o = (
        pairs.join(ku, "u")
        .join(kv, "v")
        .select(
            F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("x"),
            F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("y"),
            F.when(lo_first, F.col("kv")).otherwise(F.col("ku")).alias("ky"),
            F.when(lo_first, F.col("c_uv")).otherwise(F.col("c_vu")).alias("cf"),
            F.when(lo_first, F.col("c_vu")).otherwise(F.col("c_uv")).alias("cr"),
        )
    )
    w1 = o.select(
        "x",
        "y",
        F.col("ky").alias("k1"),
        F.col("cf").alias("cnt_xy"),
        F.col("cr").alias("cnt_yx"),
    )
    w2 = o.select(
        "x",
        F.col("y").alias("z"),
        F.col("ky").alias("k2"),
        F.col("cf").alias("cnt_xz"),
        F.col("cr").alias("cnt_zx"),
    )
    wedges = w1.join(w2, "x").filter(F.col("k1") < F.col("k2"))
    # k1 < k2 ⇒ the y-z pair (if present) is oriented y→z
    o3 = o.select(
        F.col("x").alias("y"),
        F.col("y").alias("z"),
        F.col("cf").alias("cnt_yz"),
        F.col("cr").alias("cnt_zy"),
    )
    closed = wedges.join(o3, ["y", "z"]).select(
        "x", "y", "z",
        "cnt_xy", "cnt_yx", "cnt_xz", "cnt_zx", "cnt_yz", "cnt_zy",
    )

    # one row per undirected triangle with all six direction counts —
    # materialize before the 6-assignment expansion, which would otherwise
    # recompute the wedge join once per union branch
    closed = closed.localCheckpoint(eager=False)

    branches = []
    for perm in permutations(("x", "y", "z")):
        slot = dict(zip(names, perm))
        weight = None
        for s, d in terms:
            c = F.col(f"cnt_{slot[s]}{slot[d]}")
            weight = c if weight is None else weight * c
        branches.append(
            closed.select(
                *[F.col(slot[n]).alias(f"__vid_{n}") for n in names],
                weight.alias("__w"),
            ).filter(F.col("__w") > 0)
        )
    result = _reduce(DataFrame.unionAll, branches)
    result = result.select(
        *[f"__vid_{n}" for n in names],
        F.explode(
            F.sequence(F.lit(1).cast("long"), F.col("__w").cast("long"))
        ).alias("__dup"),
    ).drop("__dup")

    if not loops.isEmpty():
        vl = loops.select(F.col(SRC).alias("__lid")).distinct()
        incident = (
            E.join(
                vl.withColumnRenamed("__lid", "__l1"),
                F.col(SRC) == F.col("__l1"),
                "left",
            )
            .join(
                vl.withColumnRenamed("__lid", "__l2"),
                F.col(DST) == F.col("__l2"),
                "left",
            )
            .filter(F.col("__l1").isNotNull() | F.col("__l2").isNotNull())
            .select(SRC, DST)
        )
        degen, _ = _chain_positives(incident, positives, e_attrs, vname)
        a, b, c = (F.col(f"__vid_{n}") for n in names)
        degen = degen.filter((a == b) | (b == c) | (a == c))
        result = result.unionByName(degen.select(*result.columns))

    return result, list(names)


def find(graph, pattern: str) -> DataFrame:
    """Match ``pattern`` against the graph; see module docstring."""
    from graphframes_rs_spark import config as gf_config

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

    positives = [t for t in terms if not t[0]]
    negatives = [t for t in terms if t[0]]
    if not positives:
        raise GraphFrameError("motif pattern needs at least one positive term")

    tri = _triangle_gate(positives)
    if tri is not None and gf_config.motif_triangle_fast_path(
        edges.sparkSession
    ):
        result, bound = _triangle_bindings(
            edges, tri[0], tri[1], positives, e_attrs, vname
        )
    else:
        result, bound = _chain_positives(edges, positives, e_attrs, vname)

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
