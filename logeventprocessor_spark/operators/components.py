"""Connected components over near-duplicate pairs: the clustering step
between pair generation and the drop decision.

Every dedup family in this package (n-gram Jaccard, MinHash+LSH,
SimHash, embedding cosine) emits EDGES -- (doc_a, doc_b) pairs above a
similarity threshold. A dedup policy acts on CLUSTERS: transitive
near-duplicates form a component, and exactly one canonical document
per component is kept (web-scale corpus pipelines all run this step;
the reference is a CEP engine and has no analog -- this belongs to the
training-data family of SURVEY.md 2.8).

The component id is the MINIMUM doc id reachable through the pair
graph, computed by iterative min-label propagation:

* each vertex starts labeled with itself;
* each iteration every vertex takes the min of its own label and its
  neighbors' labels (one edge join + one groupBy(id) shuffle);
* converged when no label decreased -- needs `diameter` iterations,
  and near-dup components are small and dense (diameter 1-3), so the
  loop is short in practice.

100 TB design: per iteration exactly ONE shuffle keyed on vertex id
(high cardinality, no skew); the labels frame is eagerly
``localCheckpoint``-ed every round so the plan never grows with the
iteration count (no 25-deep lineage for Catalyst to re-analyze); the
convergence test is a single cheap count() action per round -- the
standard driver-side loop shape of iterative Spark algorithms
(GraphX/GraphFrames' connectedComponents does the same alternation
under the hood). The symmetrized edge list is localCheckpoint-ed once
and reused by every iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    vertices: DataFrame | None = None,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """(id, comp) for every vertex; ``comp`` = min reachable id.

    ``vertices`` (optional) seeds the label table with EVERY document,
    so docs with no near-dup pair come out as singleton components
    (comp = self) and the result is total over the corpus -- the shape
    a downstream keep/drop filter wants. Without it, only pair
    endpoints are labeled.

    Raises after ``max_iter`` non-converged rounds rather than
    returning silently-partial components (a wrong canonical id drops
    the WRONG document downstream; at the default 25 even a
    pathological 2^25-vertex chain would have converged).
    """
    edges = pairs.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    edges = (
        edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    if vertices is not None:
        labels = vertices.select(F.col(id_col).cast("long").alias("id"))
    else:
        labels = edges.select(F.col("src").alias("id"))
    labels = labels.distinct().withColumn("comp", F.col("id")).localCheckpoint()

    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["src"] == labels["id"])
            .groupBy("dst")
            .agg(F.min("comp").alias("nbr_comp"))
            .withColumnRenamed("dst", "id")
        )
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") < F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations"
    )


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document dedup verdict from a near-dup pair set:
    (doc_id, comp_id, is_canonical). ``is_canonical`` marks the one
    document per component a keep-policy retains (min id -- the
    deterministic choice every engine can reproduce); singleton docs
    are their own canonical."""
    labels = connected_components(pairs, vertices=docs, id_col=id_col)
    return labels.select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("comp_id"),
        (F.col("id") == F.col("comp")).alias("is_canonical"),
    )
