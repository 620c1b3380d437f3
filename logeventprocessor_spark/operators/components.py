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
graph. Each round does TWO label-shrinking steps:

* **neighbor-min** (one edge join + one groupBy(id) shuffle): every
  vertex takes the min of its own label and its neighbors' labels --
  extends the hop horizon by one;
* **pointer jumping** (one labels self-join on ``comp == id``): every
  vertex then takes the label OF its current label
  (``comp := min(comp, comp[comp])``) -- since the label table is
  itself converging toward min-reachable ids, this step composes two
  known paths and roughly DOUBLES the hop horizon each round.

With the doubling step, convergence needs O(log diameter) rounds, not
O(diameter) -- the same round bound as the alternating
large-star/small-star scheme of Kiveris et al., "Connected Components
in MapReduce and Beyond" (SoCC'14), which GraphFrames implements. A
chain of 2^k vertices converges in ~k rounds; plain neighbor-min
propagation alone would need 2^k rounds and is NOT what this runs.

100 TB design: per iteration exactly two shuffles keyed on vertex id
(high cardinality, no skew); the labels frame is eagerly
``localCheckpoint``-ed every round so the plan never grows with the
iteration count (no deep lineage for Catalyst to re-analyze); the
convergence test is a single cheap count() action per round -- the
standard driver-side loop shape of iterative Spark algorithms. The
symmetrized edge list is localCheckpoint-ed once and reused by every
iteration.
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
    the WRONG document downstream). Because each round doubles the hop
    horizon (neighbor-min + pointer jump), the default 25 covers any
    component of diameter up to ~2^24 -- far beyond any physically
    representable graph -- so hitting the RuntimeError indicates a bug,
    not a long chain.
    """
    edges = pairs.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).localCheckpoint(eager=False)
    # checkpoint BEFORE the symmetrizing union: Spark evaluates each
    # union branch independently (no common-subexpression sharing), so
    # an un-materialized pair plan -- often a full near-dup pair
    # generation subtree -- would run TWICE
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
        # Step 1: neighbor-min -- one-hop label exchange along edges.
        nbr_min = (
            edges.join(labels, edges["src"] == labels["id"])
            .groupBy("dst")
            .agg(F.min("comp").alias("nbr_comp"))
            .withColumnRenamed("dst", "id")
        )
        # _old rides along so convergence needs no second join below;
        # the lazy checkpoint materializes hop ONCE inside this round's
        # single action -- un-materialized, the pointer-jump self-join
        # would evaluate the neighbor-min join subtree twice per round
        hop = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.col("comp").alias("_old"),
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=False)
        )
        # Step 2: pointer jump -- comp := min(comp, comp[comp]). Every
        # label value is itself a vertex id, so look its label up in
        # the same table; composing the two paths doubles the horizon.
        comp_of = hop.select(
            F.col("id").alias("c_id"), F.col("comp").alias("c_comp")
        )
        new_comp = F.least(F.col("comp"), F.coalesce("c_comp", F.col("comp")))
        new_labels = (
            hop.join(comp_of, hop["comp"] == comp_of["c_id"], "left")
            .select(
                "id",
                new_comp.alias("comp"),
                (new_comp < F.col("_old")).alias("_chg"),
            )
            .localCheckpoint(eager=False)
        )
        # ONE action per round: materializes the (lazy) checkpoints AND
        # counts label shrinkage -- replaces the former eager
        # checkpoint job + separate old-vs-new join/count job
        changed = new_labels.filter("_chg").count()
        labels = new_labels.select("id", "comp")
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
