"""Core GraphFrame abstraction.

Mirrors the reference's ``GraphFrame { vertices, edges }`` struct
(reference: src/lib.rs:60-97) as a Python class over two
``pyspark.sql.DataFrame`` objects. IDs are hard-required LongType
(reference: src/lib.rs:81-86).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

ID = "id"
SRC = "src"
DST = "dst"


class GraphFrameError(ValueError):
    pass


def _require_long(df: DataFrame, col: str, side: str) -> None:
    fields = {f.name: f.dataType for f in df.schema.fields}
    if col not in fields:
        raise GraphFrameError(f"{side} DataFrame must contain column '{col}'")
    if not isinstance(fields[col], LongType):
        # Same contract as the reference: "ID, SRC and DST should have data
        # type Int64 (LONG)" (src/lib.rs:81-86).
        raise GraphFrameError(
            f"Column '{col}' of {side} must be LongType (Int64), got {fields[col]}"
        )


def symmetrize_edges(edges: DataFrame, deduplicate: bool = False) -> DataFrame:
    """Undirected view of an edge frame: drop self-loops, add the reverse of
    every edge, optionally deduplicate (reference: src/utils/graph_utils.rs:8-28).

    Only ``src``/``dst`` are kept when ``deduplicate`` is requested by the
    caller passing a pre-projected frame; attribute columns are carried
    through the reversal otherwise.
    """
    cols = edges.columns
    no_loops = edges.filter(F.col(SRC) != F.col(DST))
    reversed_edges = no_loops.select(
        *[
            F.col(DST).alias(SRC) if c == SRC else (F.col(SRC).alias(DST) if c == DST else F.col(c))
            for c in cols
        ]
    )
    out = no_loops.unionByName(reversed_edges)
    if deduplicate:
        out = out.distinct()
    return out


class GraphFrame:
    """A graph as a pair of DataFrames (reference: src/lib.rs:60-64).

    vertices: must contain ``id: long`` (+ arbitrary attribute columns)
    edges: must contain ``src: long, dst: long`` (+ arbitrary attributes)
    """

    def __init__(self, vertices: DataFrame, edges: DataFrame):
        _require_long(vertices, ID, "vertices")
        _require_long(edges, SRC, "edges")
        _require_long(edges, DST, "edges")
        self._vertices = vertices
        self._edges = edges

    # -- accessors (src/lib.rs:91-97) --------------------------------------
    @property
    def vertices(self) -> DataFrame:
        return self._vertices

    @property
    def edges(self) -> DataFrame:
        return self._edges

    # -- counts (src/lib.rs:125-159) ---------------------------------------
    def num_nodes(self) -> int:
        return self._vertices.count()

    def num_edges(self) -> int:
        return self._edges.count()

    # -- degrees (src/lib.rs:191-234) --------------------------------------
    @property
    def in_degrees(self) -> DataFrame:
        """Per-vertex incoming-edge count: DataFrame[id, in_degree]."""
        return (
            self._edges.groupBy(F.col(DST).alias(ID))
            .agg(F.count(F.lit(1)).alias("in_degree"))
        )

    @property
    def out_degrees(self) -> DataFrame:
        """Per-vertex outgoing-edge count: DataFrame[id, out_degree]."""
        return (
            self._edges.groupBy(F.col(SRC).alias(ID))
            .agg(F.count(F.lit(1)).alias("out_degree"))
        )

    @property
    def degrees(self) -> DataFrame:
        """Total degree (in + out): DataFrame[id, degree]."""
        ends = self._edges.select(F.col(SRC).alias(ID)).unionAll(
            self._edges.select(F.col(DST).alias(ID))
        )
        return ends.groupBy(ID).agg(F.count(F.lit(1)).alias("degree"))

    # -- symmetrize (src/lib.rs:245-278) -----------------------------------
    def symmetrize(self) -> "GraphFrame":
        """Add the reverse of every edge, preserving attribute columns and
        column order. Self-loops are kept (method form; the undirected-simple
        utility is :func:`symmetrize_edges`)."""
        cols = self._edges.columns
        reversed_edges = self._edges.select(
            *[
                F.col(DST).alias(SRC)
                if c == SRC
                else (F.col(SRC).alias(DST) if c == DST else F.col(c))
                for c in cols
            ]
        )
        return GraphFrame(self._vertices, self._edges.unionByName(reversed_edges))

    # -- triplets (src/lib.rs:322-371) -------------------------------------
    def triplets(self) -> DataFrame:
        """DataFrame[src_vertex: struct, edge: struct, dst_vertex: struct].

        Edge-centric: one row per edge; vertex attributes packed into
        structs, joined via two left joins (missing endpoints → null struct,
        matching the reference's outer-join assembly).
        """
        v_cols = self._vertices.columns
        e_cols = self._edges.columns
        src_v = self._vertices.select(
            F.col(ID).alias("__t_src_id"),
            F.struct(*[F.col(c) for c in v_cols]).alias("src_vertex"),
        )
        dst_v = self._vertices.select(
            F.col(ID).alias("__t_dst_id"),
            F.struct(*[F.col(c) for c in v_cols]).alias("dst_vertex"),
        )
        edges = self._edges.select(
            F.col(SRC), F.col(DST), F.struct(*[F.col(c) for c in e_cols]).alias("edge")
        )
        return (
            edges.join(src_v, F.col(SRC) == F.col("__t_src_id"), "left")
            .join(dst_v, F.col(DST) == F.col("__t_dst_id"), "left")
            .select("src_vertex", "edge", "dst_vertex")
        )

    def aggregate_messages(
        self,
        agg_expr,
        send_to_src=None,
        send_to_dst=None,
    ) -> DataFrame:
        """One-shot neighbourhood aggregation — the public face of a single
        Pregel superstep (API parity with GraphFrames' aggregateMessages;
        the reference exposes the same capability only through its full
        ``pregel()`` loop, src/algorithm/pregel.rs:103-224).

        ``send_to_src`` / ``send_to_dst`` are message expressions over the
        triplet namespace — build them with the same helpers Pregel uses:
        ``Pregel.src("attr")`` (source-vertex state), ``Pregel.dst("attr")``
        (destination-vertex state), ``Pregel.edge("attr")`` (edge
        attribute). ``agg_expr`` is an aggregate over ``Pregel.msg()``,
        applied per recipient. Returns DataFrame[id, agg].

        Plan shape: one projection per declared direction over the triplet
        join, unioned, then a single combine-enabled groupBy(id) — the
        exact dataflow of a Pregel superstep minus the state update and
        checkpoint, so everything said about superstep scaling (shuffle on
        vertex id, map-side partial aggregation) applies unchanged."""
        from graphframes_rs_spark.pregel import (
            _DST_PREFIX,
            _EDGE_PREFIX,
            _MSG_PREFIX,
            _SRC_PREFIX,
            DEFAULT_MSG,
        )

        if send_to_src is None and send_to_dst is None:
            raise GraphFrameError(
                "at least one of send_to_src / send_to_dst is required"
            )
        v, e = self._vertices, self._edges
        src_state = v.select(
            F.col(ID).alias("__am_src_id"),
            *[F.col(c).alias(_SRC_PREFIX + c) for c in v.columns],
        )
        dst_state = v.select(
            F.col(ID).alias("__am_dst_id"),
            *[F.col(c).alias(_DST_PREFIX + c) for c in v.columns],
        )
        edges = e.select(
            F.col(SRC),
            F.col(DST),
            *[
                F.col(c).alias(_EDGE_PREFIX + c)
                for c in e.columns
                if c not in (SRC, DST)
            ],
        )
        trip = edges.join(
            src_state, F.col(SRC) == F.col("__am_src_id")
        ).join(dst_state, F.col(DST) == F.col("__am_dst_id"))
        msg = _MSG_PREFIX + DEFAULT_MSG
        frames = []
        if send_to_src is not None:
            frames.append(trip.select(F.col(SRC).alias(ID), send_to_src.alias(msg)))
        if send_to_dst is not None:
            frames.append(trip.select(F.col(DST).alias(ID), send_to_dst.alias(msg)))
        allm = frames[0]
        for fr in frames[1:]:
            allm = allm.unionByName(fr)
        return allm.groupBy(ID).agg(agg_expr.alias("agg"))

    # -- algorithm builders --------------------------------------------------
    def pregel(self) -> "PregelBuilder":
        from graphframes_rs_spark.pregel import PregelBuilder

        return PregelBuilder(self)

    def page_rank(self) -> "PageRankBuilder":
        from graphframes_rs_spark.operators.pagerank import PageRankBuilder

        return PageRankBuilder(self)

    def shortest_paths(self, landmarks: Sequence[int]) -> "ShortestPathsBuilder":
        from graphframes_rs_spark.operators.shortest_paths import ShortestPathsBuilder

        return ShortestPathsBuilder(self, list(landmarks))

    def connected_components(self) -> "ConnectedComponentsBuilder":
        from graphframes_rs_spark.operators.connected_components import (
            ConnectedComponentsBuilder,
        )

        return ConnectedComponentsBuilder(self)

    def k_core(self) -> "KCoreBuilder":
        from graphframes_rs_spark.operators.k_core import KCoreBuilder

        return KCoreBuilder(self)

    def maximal_independent_set(self) -> "MISBuilder":
        from graphframes_rs_spark.operators.maximal_independent_set import MISBuilder

        return MISBuilder(self)

    def strongly_connected_components(self) -> "SCCBuilder":
        from graphframes_rs_spark.operators.scc import SCCBuilder

        return SCCBuilder(self)

    def label_propagation(self) -> "LabelPropagationBuilder":
        from graphframes_rs_spark.operators.label_propagation import (
            LabelPropagationBuilder,
        )

        return LabelPropagationBuilder(self)

    def filter_vertices(self, condition) -> "GraphFrame":
        """Subgraph induced by vertices satisfying ``condition`` (a Column
        or SQL string): edges whose either endpoint is dropped are dropped
        too (GraphFrames ``filterVertices`` semantics). The endpoint check
        is two semi joins — no edge attributes are shuffled."""
        cond = F.expr(condition) if isinstance(condition, str) else condition
        v = self._vertices.filter(cond)
        ids = v.select(ID)
        e = (
            self._edges.join(
                ids.select(F.col(ID).alias(SRC)), SRC, "left_semi"
            ).join(ids.select(F.col(ID).alias(DST)), DST, "left_semi")
        )
        return GraphFrame(v, e)

    def filter_edges(self, condition) -> "GraphFrame":
        """Subgraph keeping only edges satisfying ``condition``; the vertex
        set is unchanged (GraphFrames ``filterEdges`` semantics — compose
        with :meth:`drop_isolated_vertices` to prune)."""
        cond = F.expr(condition) if isinstance(condition, str) else condition
        return GraphFrame(self._vertices, self._edges.filter(cond))

    def drop_isolated_vertices(self) -> "GraphFrame":
        """Remove vertices that appear in no edge (GraphFrames
        ``dropIsolatedVertices``): one semi join against the endpoint
        union."""
        endpoints = (
            self._edges.select(F.col(SRC).alias(ID))
            .unionByName(self._edges.select(F.col(DST).alias(ID)))
        )
        return GraphFrame(
            self._vertices.join(endpoints, ID, "left_semi"), self._edges
        )

    def find(self, pattern: str) -> DataFrame:
        """Motif finding (GraphFrames ``find`` parity): match a pattern like
        ``"(a)-[e]->(b); (b)-[]->(c); !(c)-[]->(a)"`` as a chain of joins.
        See :mod:`graphframes_rs_spark.operators.motif`."""
        from graphframes_rs_spark.operators.motif import find as _find

        return _find(self, pattern)

    def bfs(
        self, from_expr, to_expr, max_path_length: int = 10, edge_filter=None
    ) -> DataFrame:
        """Shortest paths between vertex sets with full path output
        (GraphFrames ``bfs`` parity, incl. ``edge_filter``). See
        :mod:`graphframes_rs_spark.operators.bfs`."""
        from graphframes_rs_spark.operators.bfs import bfs as _bfs

        return _bfs(self, from_expr, to_expr, max_path_length, edge_filter)

    def triangle_count(self) -> DataFrame:
        from graphframes_rs_spark.operators.triangles import triangle_count

        return triangle_count(self)

    def link_prediction(
        self, max_degree: Optional[int] = 10_000, min_common: int = 1
    ) -> DataFrame:
        from graphframes_rs_spark.operators.link_prediction import link_prediction

        return link_prediction(self, max_degree, min_common)

    def k_truss(self, k: int) -> "KTrussBuilder":
        from graphframes_rs_spark.operators.truss import KTrussBuilder

        return KTrussBuilder(self, k)

    def betweenness(self, sources) -> "BetweennessBuilder":
        from graphframes_rs_spark.operators.betweenness import BetweennessBuilder

        return BetweennessBuilder(self, sources)

    def greedy_coloring(self) -> "ColoringBuilder":
        from graphframes_rs_spark.operators.coloring import ColoringBuilder

        return ColoringBuilder(self)

    def degree_assortativity(self) -> DataFrame:
        """One-row DataFrame[assortativity] — Newman's degree-correlation
        coefficient: the Pearson correlation of endpoint degrees over the
        undirected simple edge set (both orientations, so the measure is
        symmetric). Positive on social-style graphs (hubs link hubs),
        negative on hub-and-spoke/bipartite graphs, NULL when every
        degree is identical (zero variance — correlation undefined).

        Scale shape: one degree groupBy, two broadcast-friendly joins to
        put (deg_src, deg_dst) on every edge row, one corr() aggregate —
        all combine-enabled, nothing quadratic. Rounded to 6 for
        cross-engine oracle stability."""
        und = symmetrize_edges(self.edges.select(SRC, DST), deduplicate=True)
        deg = und.groupBy(F.col(SRC).alias(ID)).agg(
            F.count(F.lit(1)).alias("__deg")
        )
        paired = und.join(
            deg.select(F.col(ID).alias(SRC), F.col("__deg").alias("__ds")),
            SRC,
        ).join(
            deg.select(F.col(ID).alias(DST), F.col("__deg").alias("__dd")),
            DST,
        )
        # explicit Pearson from covar/stddev: ANSI mode makes corr() THROW
        # on zero degree variance (regular graphs); the guard returns NULL
        # there instead — matching DuckDB corr()'s NULL
        stats = paired.agg(
            F.covar_pop("__ds", "__dd").alias("__cov"),
            F.stddev_pop("__ds").alias("__sx"),
            F.stddev_pop("__dd").alias("__sy"),
        )
        return stats.select(
            F.round(
                F.when(
                    F.col("__sx") * F.col("__sy") > 0,
                    F.col("__cov") / (F.col("__sx") * F.col("__sy")),
                ),
                6,
            ).alias("assortativity")
        )

    def reciprocity(self) -> DataFrame:
        """One-row DataFrame[num_vertices, num_edges, reciprocal_edges,
        reciprocity, density] — global directed-graph statistics:
        reciprocity is the fraction of (non-loop, distinct) directed
        edges whose reverse edge also exists (1.0 on symmetric graphs,
        0.0 on DAGs); density is |E| / (|V|·(|V|−1)), the filled
        fraction of the possible directed simple edges. Empty edge sets
        report NULL reciprocity (0/0) rather than a division blow-up.

        Not in the reference (its metric surface stops at degrees —
        SURVEY.md §2.1); standard digraph statistic (Newman,
        "Networks", §7.10) added for engine completeness.

        Scale shape: one distinct over the edge set, one self-join on
        the reversed key pair to count mutual edges (equi-join on both
        columns — hash join, combine-enabled count), one row out.
        Nothing quadratic, nothing driver-side."""
        e = (
            self.edges.select(SRC, DST)
            .filter(F.col(SRC) != F.col(DST))
            .distinct()
        )
        rev = e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
        stats = e.agg(F.count(F.lit(1)).alias("__m")).crossJoin(
            e.join(rev, [SRC, DST], "left_semi").agg(
                F.count(F.lit(1)).alias("__r")
            )
        ).crossJoin(self.vertices.agg(F.count(F.lit(1)).alias("__n")))
        return stats.select(
            F.col("__n").alias("num_vertices"),
            F.col("__m").alias("num_edges"),
            F.col("__r").alias("reciprocal_edges"),
            F.round(
                F.when(F.col("__m") > 0, F.col("__r") / F.col("__m")), 6
            ).alias("reciprocity"),
            F.round(
                F.when(
                    F.col("__n") > 1,
                    F.col("__m") / (F.col("__n") * (F.col("__n") - F.lit(1))),
                ),
                6,
            ).alias("density"),
        )

    def rich_club(self, ks: Sequence[int] = (1, 2, 4, 8, 16)) -> DataFrame:
        """[k, n_nodes, n_edges, phi] — rich-club coefficient (Zhou &
        Mondragón 2004) at each degree threshold: among vertices with
        degree > k, ``phi = 2·E_k / (N_k·(N_k−1))`` is the realized
        fraction of possible edges. Rising phi(k) means hubs
        preferentially interconnect — the structural signal behind
        transit backbones and elite cores; NULL when fewer than two
        vertices clear the threshold.

        Scale shape: ONE pass for every k — degrees ride each undirected
        edge via two joins (the same frame assortativity builds), then a
        single aggregate evaluates all thresholds as conditional sums
        (never one scan per k), and the vertex-side counts come from one
        aggregate over the degree frame. Output is |ks| rows."""
        und = symmetrize_edges(self.edges.select(SRC, DST), deduplicate=True)
        deg = und.groupBy(F.col(SRC).alias(ID)).agg(
            F.count(F.lit(1)).alias("__deg")
        )
        paired = und.filter(F.col(SRC) < F.col(DST)).join(
            deg.select(F.col(ID).alias(SRC), F.col("__deg").alias("__ds")),
            SRC,
        ).join(
            deg.select(F.col(ID).alias(DST), F.col("__deg").alias("__dd")),
            DST,
        )
        ks = sorted({int(k) for k in ks})
        edge_aggs = [
            F.sum(
                F.when(
                    (F.col("__ds") > k) & (F.col("__dd") > k), 1
                ).otherwise(0)
            ).alias(f"__e{k}")
            for k in ks
        ]
        node_aggs = [
            F.sum(F.when(F.col("__deg") > k, 1).otherwise(0)).alias(f"__n{k}")
            for k in ks
        ]
        e_row = paired.agg(*edge_aggs)
        n_row = deg.agg(*node_aggs)
        both = e_row.crossJoin(n_row)
        per_k = [
            F.struct(
                F.lit(k).cast("long").alias("k"),
                F.coalesce(F.col(f"__n{k}"), F.lit(0))
                .cast("long")
                .alias("n_nodes"),
                F.coalesce(F.col(f"__e{k}"), F.lit(0))
                .cast("long")
                .alias("n_edges"),
            )
            for k in ks
        ]
        rows = both.select(F.explode(F.array(*per_k)).alias("__r")).select(
            "__r.k", "__r.n_nodes", "__r.n_edges"
        )
        return rows.select(
            "k",
            "n_nodes",
            "n_edges",
            F.round(
                F.when(
                    F.col("n_nodes") >= 2,
                    2.0
                    * F.col("n_edges")
                    / (F.col("n_nodes") * (F.col("n_nodes") - 1)),
                ),
                6,
            ).alias("phi"),
        )

    def hits(self) -> "HITSBuilder":
        from graphframes_rs_spark.operators.hits import HITSBuilder

        return HITSBuilder(self)

    def random_walks(
        self, num_walks: int = 1, walk_length: int = 3, seed: int = 42
    ) -> DataFrame:
        from graphframes_rs_spark.operators.random_walks import random_walks

        return random_walks(self, num_walks, walk_length, seed)

    def node2vec_walks(
        self,
        num_walks: int = 1,
        walk_length: int = 3,
        p: float = 1.0,
        q: float = 1.0,
        seed: int = 42,
    ) -> DataFrame:
        from graphframes_rs_spark.operators.random_walks import node2vec_walks

        return node2vec_walks(self, num_walks, walk_length, p, q, seed)

    def neighborhood_function(self) -> "NeighborhoodFunctionBuilder":
        from graphframes_rs_spark.operators.neighborhood import (
            NeighborhoodFunctionBuilder,
        )

        return NeighborhoodFunctionBuilder(self)

    def effective_diameter(self, ratio: float = 0.9, **kwargs) -> DataFrame:
        from graphframes_rs_spark.operators.neighborhood import (
            effective_diameter,
        )

        return effective_diameter(self, ratio=ratio, **kwargs)

    def clustering_coefficient(self) -> DataFrame:
        from graphframes_rs_spark.operators.triangles import clustering_coefficient

        return clustering_coefficient(self)

    def topological_layers(self) -> "TopologicalLayersBuilder":
        from graphframes_rs_spark.operators.topology import TopologicalLayersBuilder

        return TopologicalLayersBuilder(self)

    def feature_propagation(
        self,
        features: DataFrame,
        feature_col: str = "features",
        rounds: int = 2,
        alpha: float = 0.5,
        checkpoint_dir: Optional[str] = None,
    ) -> DataFrame:
        from graphframes_rs_spark.operators.feature_propagation import (
            feature_propagation,
        )

        return feature_propagation(
            self, features, feature_col, rounds, alpha, checkpoint_dir
        )

    def conductance(self, labels: DataFrame, label_col: str = "label") -> DataFrame:
        from graphframes_rs_spark.operators.modularity import conductance

        return conductance(self, labels, label_col)

    def modularity(self, labels: DataFrame, label_col: str = "label") -> DataFrame:
        from graphframes_rs_spark.operators.modularity import modularity

        return modularity(self, labels, label_col)

    def louvain(self, weight_col: Optional[str] = None) -> "LouvainBuilder":
        from graphframes_rs_spark.operators.louvain import LouvainBuilder

        return LouvainBuilder(self, weight_col)

    def weighted_shortest_paths(
        self, source: int, weight_col: str = "weight"
    ) -> "WeightedSSSPBuilder":
        from graphframes_rs_spark.operators.weighted_sssp import WeightedSSSPBuilder

        return WeightedSSSPBuilder(self, source, weight_col)

    def minimum_spanning_forest(self, weight_col: str = "weight") -> "MSTBuilder":
        from graphframes_rs_spark.operators.mst import MSTBuilder

        return MSTBuilder(self, weight_col)

    def closeness_centrality(self, landmarks) -> "ClosenessBuilder":
        from graphframes_rs_spark.operators.closeness import ClosenessBuilder

        return ClosenessBuilder(self, landmarks)

    def eigenvector_centrality(self) -> "EigenvectorBuilder":
        from graphframes_rs_spark.operators.eigenvector import EigenvectorBuilder

        return EigenvectorBuilder(self)

    def maximal_matching(self) -> "MatchingBuilder":
        from graphframes_rs_spark.operators.matching import MatchingBuilder

        return MatchingBuilder(self)

    def katz_centrality(self) -> "KatzBuilder":
        from graphframes_rs_spark.operators.katz import KatzBuilder

        return KatzBuilder(self)

    def densest_subgraph(self) -> "DensestSubgraphBuilder":
        from graphframes_rs_spark.operators.densest import DensestSubgraphBuilder

        return DensestSubgraphBuilder(self)

    def temporal_reachability(
        self, sources, ts_col: str = "ts", start_time: int = 0
    ) -> "TemporalReachabilityBuilder":
        from graphframes_rs_spark.operators.temporal import (
            TemporalReachabilityBuilder,
        )

        return TemporalReachabilityBuilder(self, sources, ts_col, start_time)
