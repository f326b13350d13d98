"""Cross-algorithm consistency: independent implementations must agree
on derivable identities — the cheapest way to catch a subtle divergence
in either one.

* triangle_count vs motif finding: per-vertex triangle counts summed
  must equal 3x the number of canonical motif matches (each undirected
  triangle has exactly one canonical a<b<c binding on the symmetrized
  edge set filtered to a<b).
* WCC vs SCC: on a symmetrized graph every weak component is strongly
  connected, so the two labelings must be identical partition-wise (both
  use min-member labels, so identical outright).
"""

from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import GraphFrame, symmetrize_edges
from graphframes_rs_spark.sources.graphs import customer_hierarchy_graph

SF_DIR = "/root/testdata/sf0.001"


def test_triangle_count_agrees_with_motif(spark):
    # deterministic triangle-rich fixture: two triangles sharing an edge +
    # a dangling path
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (2, 4), (4, 3), (4, 5), (5, 6)],
        "src long, dst long",
    )
    v = e.select(F.col("src").alias("id")).union(
        e.select(F.col("dst").alias("id"))
    ).distinct()
    g = GraphFrame(v, e)

    per_vertex = g.triangle_count()
    total_corners = per_vertex.agg(F.sum("triangles")).collect()[0][0]

    und = symmetrize_edges(e, deduplicate=True)
    canon = GraphFrame(v, und.filter(F.col("src") < F.col("dst")))
    matches = canon.find("(a)-[]->(b); (b)-[]->(c); (a)-[]->(c)")
    # canonical orientation: a<b<c exactly once per undirected triangle
    n_triangles = matches.count()
    assert total_corners == 3 * n_triangles
    assert n_triangles == 2  # {1,2,3} and {2,3,4}


def test_wcc_equals_scc_on_symmetrized_graph(spark, tmp_path):
    g = customer_hierarchy_graph(spark, SF_DIR)
    und = symmetrize_edges(g.edges, deduplicate=True)
    sg = GraphFrame(g.vertices, und)

    wcc = {r["id"]: r["component"] for r in (
        sg.connected_components()
        .set_checkpoint_dir(str(tmp_path / "wcc")).run().collect()
    )}
    scc = {r["id"]: r["component"] for r in (
        sg.strongly_connected_components()
        .set_checkpoint_dir(str(tmp_path / "scc")).run().collect()
    )}
    assert wcc == scc
