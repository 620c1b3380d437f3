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
* **pointer jumping** (one join against the PREVIOUS round's label
  table on ``comp == id``): every vertex then takes the stored label
  OF its freshly-updated label (``comp := min(comp', prev[comp'])``)
  -- composing two known paths, which roughly DOUBLES the hop horizon
  each round (h_{k+1} = 2*h_k + 1). Jumping through the previous
  (already materialized) table instead of the current round's
  intermediate means the intermediate is referenced exactly ONCE, so
  it needs no materialization of its own -- one checkpoint per round
  instead of two, halving the driver-side planning/codegen cost that
  dominates small-graph rounds, at the price of one extra round on
  the deepest chains (2h+1 vs 2h+2 horizon growth).

With the doubling step, convergence needs O(log diameter) rounds, not
O(diameter) -- the same round bound as the alternating
large-star/small-star scheme of Kiveris et al., "Connected Components
in MapReduce and Beyond" (SoCC'14), which GraphFrames implements. A
chain of 2^k vertices converges in ~k rounds; plain neighbor-min
propagation alone would need 2^k rounds and is NOT what this runs.

100 TB design: per iteration exactly two shuffles keyed on vertex id
(high cardinality, no skew); the labels frame is (lazily)
``localCheckpoint``-ed every round so the plan never grows with the
iteration count (no deep lineage for Catalyst to re-analyze); the
convergence test is a single cheap count() action per round -- the
standard driver-side loop shape of iterative Spark algorithms. The
symmetrized edge list is built in ONE pass over the pair input (a
2-way explode, no self-union -- a union would evaluate the pair
subtree once per branch) and localCheckpoint-ed once, reused by every
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
    # Symmetrize in ONE pass: each pair row explodes into both edge
    # directions. (The former self-union evaluated the pair subtree
    # once per branch and needed a pre-union checkpoint to stop that;
    # the explode removes both the double evaluation and the extra
    # checkpoint -- guide §2.4.)
    s = F.col(src_col).cast("long")
    d = F.col(dst_col).cast("long")
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(s.alias("src"), d.alias("dst")),
                    F.struct(d.alias("src"), s.alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .localCheckpoint(eager=False)
    )
    if vertices is not None:
        labels = vertices.select(F.col(id_col).cast("long").alias("id"))
    else:
        labels = edges.select(F.col("src").alias("id"))
    # lazy: materialized by round 1's count action (an eager checkpoint
    # here would spend a whole extra job on the init table)
    labels = (
        labels.distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=False)
    )

    for _ in range(max_iter):
        # Step 1: neighbor-min -- one-hop label exchange along edges.
        nbr_min = (
            edges.join(labels, edges["src"] == labels["id"])
            .groupBy("dst")
            .agg(F.min("comp").alias("nbr_comp"))
            .withColumnRenamed("dst", "id")
        )
        # _old rides along so convergence needs no second join below.
        # hop is referenced exactly once (the jump join) -- no
        # materialization needed.
        hop = labels.join(nbr_min, "id", "left").select(
            "id",
            F.col("comp").alias("_old"),
            F.least(
                F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
            ).alias("comp"),
        )
        # Step 2: pointer jump through the PREVIOUS generation --
        # comp := min(comp', prev[comp']). Every label value is itself
        # a vertex id; prev is already materialized, so this round
        # checkpoints only its OUTPUT (one toRdd per round, not two).
        comp_of = labels.select(
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
