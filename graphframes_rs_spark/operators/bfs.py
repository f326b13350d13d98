"""BFS between vertex sets with path output (GraphFrames ``bfs`` parity).

``bfs(graph, from_expr, to_expr, max_path_length)`` finds the SHORTEST
paths from any vertex matching ``from_expr`` to any vertex matching
``to_expr`` — GraphFrames semantics: expansion stops at the first depth
at which any match exists, and all matches at that depth are returned
(global shortest, not per-pair). Returns
``[from_id, to_id, path: array<id>, length]`` with ``path`` listing every
vertex from source to target inclusive.

Spark-first design: the frontier is a DataFrame of partial paths expanded
one hop per round through an equi-join on the edge frame — the same
join-per-superstep shape as the Pregel loop, with cycle pruning via
``array_contains`` on the carried path (bounded by ``max_path_length``, so
the carried array stays small). Each round's match check is one action;
at 100 TB the frontier frame shuffles on the join key like any superstep
and the path column adds O(depth) longs per row — use landmark
``shortest_paths`` when only distances are needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import DST, ID, SRC, GraphFrameError


def bfs(
    graph,
    from_expr,
    to_expr,
    max_path_length: int = 10,
    edge_filter=None,
) -> DataFrame:
    """See module docstring. ``from_expr``/``to_expr`` are Columns or SQL
    strings over the vertex frame's columns; ``edge_filter`` (Column or
    SQL string over the edge frame's columns) restricts which edges the
    search may traverse — GraphFrames' ``edgeFilter`` parameter."""
    if max_path_length < 0:
        raise GraphFrameError("max_path_length must be >= 0")
    f_cond = F.expr(from_expr) if isinstance(from_expr, str) else from_expr
    t_cond = F.expr(to_expr) if isinstance(to_expr, str) else to_expr
    vertices = graph.vertices
    edges = graph.edges
    if edge_filter is not None:
        e_cond = (
            F.expr(edge_filter) if isinstance(edge_filter, str) else edge_filter
        )
        edges = edges.filter(e_cond)
    edges = edges.select(SRC, DST)
    targets = vertices.filter(t_cond).select(F.col(ID).alias("__bfs_target"))

    frontier = vertices.filter(f_cond).select(
        F.col(ID).alias("from_id"),
        F.col(ID).alias("__cur"),
        F.array(F.col(ID)).alias("path"),
    )

    def matches(fr: DataFrame) -> DataFrame:
        return fr.join(
            targets, fr["__cur"] == targets["__bfs_target"], "inner"
        ).select(
            "from_id",
            F.col("__cur").alias("to_id"),
            "path",
            (F.size("path") - 1).cast("long").alias("length"),
        )

    for _depth in range(max_path_length + 1):
        found = matches(frontier)
        # one action per round: the standard BFS frontier loop (the same
        # cost the Pregel voting check pays per superstep)
        if not found.isEmpty():
            return found
        nxt = (
            frontier.join(edges, frontier["__cur"] == edges[SRC])
            .filter(~F.array_contains(F.col("path"), F.col(DST)))
            .select(
                "from_id",
                F.col(DST).alias("__cur"),
                F.concat(F.col("path"), F.array(F.col(DST))).alias("path"),
            )
        )
        # truncate lineage + materialize each round so round k never
        # recomputes rounds 0..k-1 (executor-local checkpoint; the
        # frontier is the small side of this loop by construction)
        frontier = nxt.localCheckpoint(eager=True)

    # exhausted the depth budget with no match: empty result, stable schema
    return matches(frontier).limit(0)
