package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by min-label propagation with pointer
  * jumping — the second iterative graph operator (after PageRank,
  * SURVEY.md §2.14), and the closure step LSH dedup needs: one-pass
  * band clustering links A↔B and B↔C but leaves A and C apart;
  * propagating minimum labels to a fixed point merges chains into
  * true clusters.
  *
  * Shape per iteration: (1) each node takes the min of its own and
  * its neighbors' labels (one shuffle keyed on node id); (2) a
  * pointer-jump — `comp ← label(comp)` — halves label-chain depth,
  * so rounds needed are O(log diameter), not O(diameter): a 1M-hop
  * chain converges in ~20 rounds. Per-node state is one label, the
  * widest row is O(1). Convergence is detected by a changed-label
  * count (a scalar action per round); if `maxIterations` is somehow
  * exhausted first the run FAILS LOUDLY rather than returning
  * silently-split components.
  */
object Components {

  /** `edges(src, dst)` of any orderable key type → `(node, comp)`
    * where comp = min node id reachable. */
  def connectedComponents(edges: DataFrame, maxIterations: Int = 25): DataFrame = {
    val und = edges.select(col("src").as("a"), col("dst").as("b"))
      .unionByName(edges.select(col("dst").as("a"), col("src").as("b")))
      .distinct()
      .persist()
    var labels = und.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("comp"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      iter += 1
      // (1) neighbor min
      val received = und.join(labels, col("a") === col("node"))
        .groupBy(col("b")).agg(min(col("comp")).as("nbr_comp"))
      val stepped = labels.join(received, col("node") === col("b"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"),
          (col("nbr_comp") < col("comp")).as("changed"))
      // (2) pointer jump: comp ← label(comp), halving chain depth
      val jumpSrc = stepped.select(col("node").as("jnode"), col("comp").as("jcomp"))
      val jumped = stepped.join(jumpSrc, col("comp") === col("jnode"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("jcomp"), col("comp"))).as("comp"),
          (col("changed") || col("jcomp") < col("comp")).as("changed"))
      val prev = labels
      labels = jumped.localCheckpoint()
      prev.unpersist() // cap checkpoint residency at 2 label tables
      converged = labels.filter(col("changed")).isEmpty
      labels = labels.select(col("node"), col("comp"))
    }
    und.unpersist()
    if (!converged) {
      labels.unpersist()
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIterations iterations " +
          "(graph diameter > 2^iterations?) — refusing to return split components")
    }
    labels
  }
}
