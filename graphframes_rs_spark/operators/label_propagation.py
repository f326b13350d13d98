"""Community detection via label propagation (LPA).

The reference DECLARES community detection as a category but ships no
implementation (src/algorithm/community.rs is empty — SURVEY.md §2.1);
this fills it with the standard synchronous LPA (Raghavan et al. 2007) as
a Pregel client:

  state:  label (init = own id)
  msg:    src.label over the symmetrized edge set
  agg:    label histogram via count-compressed messages (struct(value, cnt))
  update: argmax by (count, then SMALLEST label) over the neighbour
          histogram PLUS one self-vote — deterministic tie-break makes
          runs reproducible (classic LPA breaks ties randomly), and the
          self-vote damps the synchronous two-cycle (a lone edge would
          otherwise swap labels forever)
  stop:   no label changed, or the iteration cap (default 10 — synchronous
          LPA can still oscillate on larger bipartite structures)

The count-compressed aggregation is exactly the right delivery shape here:
a vertex with degree d whose neighbourhood holds k distinct labels
shuffles k (label, count) pairs per map task instead of d raw labels, and
the argmax is one ``array_max`` over struct(cnt, -label).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_rs_spark.graphframe import DST, GraphFrame, ID, SRC, symmetrize_edges
from graphframes_rs_spark.pregel import MessageDirection, Pregel

LABEL = "label"


def _mode_label(pairs, current):
    """Most frequent label with one self-vote added; ties to the smallest
    label. NULL (no neighbours) keeps the current label."""
    with_self = F.concat(
        pairs,
        F.array(F.struct(current.alias("value"), F.lit(0).cast("long").alias("cnt"))),
    )
    best = F.array_max(
        F.transform(
            with_self,
            lambda p: F.struct(
                (
                    p["cnt"]
                    + F.when(p["value"] == current, F.lit(1)).otherwise(F.lit(0))
                ).alias("cnt"),
                (-p["value"]).alias("neg"),
            ),
        )
    )
    return F.when(pairs.isNull(), current).otherwise(-best["neg"])


class LabelPropagationBuilder:
    def __init__(self, graph: GraphFrame):
        self.graph = graph
        self.max_iter = 10
        self._checkpoint_dir = None
        self.iterations_ = 0

    def max_iterations(self, n: int) -> "LabelPropagationBuilder":
        self.max_iter = n
        return self

    def set_checkpoint_dir(self, d: str) -> "LabelPropagationBuilder":
        self._checkpoint_dir = d
        return self

    def run(self) -> DataFrame:
        """Returns DataFrame[id, label]; isolated vertices keep their id."""
        edges = symmetrize_edges(self.graph.edges.select(SRC, DST), deduplicate=True)
        prep = GraphFrame(self.graph.vertices.select(ID), edges)

        new_label = _mode_label(Pregel.msg(), F.col(LABEL))
        builder = (
            prep.pregel()
            .add_vertex_column(LABEL, F.col(ID), new_label)
            .add_message(Pregel.src(LABEL), MessageDirection.SRC_TO_DST)
            .add_aggregate_expr(F.collect_list(Pregel.msg()))
            .with_count_compressed_messages()
            .with_vertex_voting("active", F.col(LABEL) != new_label)
            .max_iterations(self.max_iter)
            .skip_dest_state()
        )
        if self._checkpoint_dir:
            builder = builder.set_checkpoint_dir(self._checkpoint_dir)
        out = builder.run().select(ID, LABEL)
        self.iterations_ = builder.iterations_
        return out
