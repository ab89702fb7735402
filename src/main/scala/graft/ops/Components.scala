package graft.ops

import org.apache.spark.sql.{DataFrame, Observation}
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
  * widest row is O(1). Convergence is detected by an `observe()`
  * metric collected while the round's localCheckpoint job streams the
  * labels past — one job per round, not checkpoint + a separate scan; if
  * `maxIterations` is somehow exhausted first the run FAILS LOUDLY
  * rather than returning silently-split components.
  */
object Components {

  /** `edges(src, dst)` of any orderable key type → `(node, comp)`
    * where comp = min node id reachable. */
  def connectedComponents(edges: DataFrame, maxIterations: Int = 25): DataFrame = {
    // localCheckpoint, not persist: the caller's edge list can be an
    // arbitrarily deep pipeline (LSH banding is a DAG of self-joins),
    // and every round's plan would re-embed that DAG several times
    // (und feeds one side of each round's joins). Catalyst multiplies
    // size estimates across every embedded join, so keeping the deep
    // plan around makes both the optimizer work and the estimates grow
    // with the producer pipeline. Truncating the lineage here makes
    // every round's logical plan O(1) deep regardless of how the
    // edges were produced.
    val und = edges.select(col("src").as("a"), col("dst").as("b"))
      .unionByName(edges.select(col("dst").as("a"), col("src").as("b")))
      .distinct()
      .localCheckpoint()
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
      // (2) pointer jump: comp ← label(comp), halving chain depth.
      // Exactly ONE jump per round: a second jump (quartering depth)
      // was measured slower end-to-end — the extra self-join per round
      // costs more than the rounds it saves on every corpus tried,
      // because per-round cost is dominated by the two joins already
      // present, not by round count.
      val jumpSrc = stepped.select(col("node").as("jnode"), col("comp").as("jcomp"))
      val jumped = stepped.join(jumpSrc, col("comp") === col("jnode"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("jcomp"), col("comp"))).as("comp"),
          (col("changed") || col("jcomp") < col("comp")).as("changed"))
      // count changed labels as the checkpoint job streams rows past —
      // piggybacking on the materialization instead of a second
      // filter/isEmpty job halves the actions per round. observe()
      // attaches a CollectMetrics node to the SAME action with no
      // encoder boundary (the old Dataset.map + Encoders.row paid a
      // full deserialize/serialize round trip per row), and its
      // metrics are exactly-once per execution — a task retry can't
      // even overcount. `changed` is null when a node has no inbound
      // neighbor (null OR false folds to null) — that means unchanged,
      // and when() skips it.
      val obs = Observation(s"graft.cc.changed.$iter")
      val prev = labels
      // freshLeaf: Spark 4's localCheckpoint PRESERVES the source
      // plan's stats estimate, and the two self-joins above square it
      // — left alone, the estimate compounds ~4x per round and the
      // driver ends up grinding BigInteger stats math instead of
      // running jobs (measured: 611 bits → 728k bits by round 6).
      // Re-wrapping the checkpointed RDD as a fresh leaf resets the
      // estimate each round at zero execution cost.
      labels = org.apache.spark.sql.GraftColumnBridge.freshLeaf(
        jumped
          .observe(obs, sum(when(col("changed"), 1L)).as("n_changed"))
          .localCheckpoint())
      prev.unpersist() // cap checkpoint residency at 2 label tables
      converged = Option(obs.get("n_changed")).forall(_ == 0L)
      labels = labels.select(col("node"), col("comp"))
    }
    if (!converged) {
      labels.unpersist()
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIterations iterations " +
          "(graph diameter > 2^iterations?) — refusing to return split components")
    }
    labels
  }
}
