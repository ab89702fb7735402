package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the
  * second iterative graph operator (after PageRank, SURVEY.md §2.14),
  * and the closure step LSH dedup needs: one-pass band clustering
  * links A↔B and B↔C but leaves A and C apart; propagating minimum
  * labels to a fixed point merges chains into true clusters.
  *
  * Shape per iteration: propagate each node's label to neighbors
  * (undirected — both edge directions), take the min of own and
  * received labels, count changes. All shuffles key on node id;
  * per-node state is one label, so the widest row is O(1). The
  * convergence check is a `count()` action per iteration — a scalar
  * to the driver, not data. Iterations are bounded by graph diameter;
  * `maxIterations` caps pathological chains (at 100 TB you'd switch
  * to the large-star/small-star variant, which squares the hop length
  * per round — same primitive ops, fewer rounds).
  */
object Components {

  /** `edges(src, dst)` of any orderable key type → `(node, component)`
    * where component = min node id reachable. */
  def connectedComponents(edges: DataFrame, maxIterations: Int = 20): DataFrame = {
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
      val received = und.join(labels, col("a") === col("node"))
        .groupBy(col("b")).agg(min(col("comp")).as("nbr_comp"))
      val next = labels.join(received, col("node") === col("b"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"),
          (col("nbr_comp") < col("comp")).as("changed"))
      val materialized = next.localCheckpoint()
      converged = materialized.filter(col("changed")).isEmpty
      labels = materialized.select(col("node"), col("comp"))
    }
    und.unpersist()
    labels
  }
}
