package graft

import graft.ops.PageRank
import org.apache.spark.TaskContext
import org.apache.spark.sql.functions.{col, udf, when}

/** The reference's task4 experiment (fault tolerance,
  * `assignment1/part3/task4/README.md:6` — kill a worker mid-job and
  * watch lineage recompute), simulated at task granularity: a filter
  * in the edge relation throws on every task's FIRST attempt in the
  * stage that materializes the loop invariants, the scheduler retries
  * under local[4,2] (spark.task.maxFailures=2), and the 10-iteration
  * PageRank must converge to EXACTLY the ranks of a clean run —
  * recovery demonstrated, not asserted. r3 verdict gap #3. */
class FaultToleranceSpec extends SparkSpec {
  import FaultToleranceSpec._

  test("PageRank survives first-attempt task failures with identical ranks") {
    val raw = spark.read.text(getClass.getResource("/toy_graph.tsv").getPath)
    val edges = PageRank.parseEdgeLines(raw)

    val clean = PageRank.run(edges, 10).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap

    // The flaky predicate throws once per (stageId, partitionId): the
    // first attempt of each task in the flaky stage dies, the retry
    // passes. It rides INSIDE the persisted loop-invariant edge
    // relation, so the failure hits the materialization the whole
    // iterative loop depends on.
    failedTasks.clear()
    val flaky = udf { (src: String) =>
      val tc = TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0 &&
          failedTasks.add(tc.stageId() + "_" + tc.partitionId()))
        throw new RuntimeException("injected first-attempt task failure")
      src != null
    }
    val recovered = PageRank.run(edges.filter(flaky(col("src"))), 10).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap

    assert(failedTasks.size() > 0, "injection never fired — the experiment didn't run")
    assert(recovered.keySet == clean.keySet,
      s"recovered run lost/gained nodes: ${recovered.keySet} vs ${clean.keySet}")
    clean.foreach { case (k, v) =>
      assert(recovered(k) == v, // bit-identical, not approximately equal:
        // recomputation replays the same deterministic plan
        s"node $k: recovered ${recovered(k)} != clean $v")
    }
  }
  test("connected components survive first-attempt task failures with identical labels") {
    import spark.implicits._
    import graft.ops.Components
    // chain + island: multi-round pointer jumping, so the injected
    // failure sits below several localCheckpoint generations. The
    // edges go through parquet so the flaky filter runs in executor
    // tasks — over a local Seq, predicate pushdown +
    // ConvertToLocalRelation fold the filter at the driver, where
    // TaskContext is null and the injection can never fire.
    val dir = java.nio.file.Files.createTempDirectory("graft_ft_cc").toString
    ((1L until 40L).map(i => (i, i + 1)) :+ (100L, 101L))
      .toDF("src", "dst").write.mode("overwrite").parquet(dir)
    val edges = spark.read.parquet(dir)
    val clean = Components.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    failedTasks.clear()
    val flaky = udf { (src: Long) =>
      val tc = TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0 &&
          failedTasks.add(tc.stageId() + "_" + tc.partitionId()))
        throw new RuntimeException("injected first-attempt task failure")
      true
    }
    val recovered = Components.connectedComponents(edges.filter(flaky(col("src"))))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(failedTasks.size() > 0, "injection never fired — the experiment didn't run")
    assert(recovered == clean,
      s"labels diverged after recovery: $recovered vs $clean")
  }

  // ---- r4 verdict task 5: the newer iterative loops run the same
  // checkpoint idiom as PageRank/CC but had no recovery evidence.
  // Same experiment for each: edges through parquet (so the flaky
  // filter runs in executor tasks, not the driver — see the CC test),
  // first attempt of every task in the poisoned stage dies, local[4,2]
  // retries, output must be BIT-IDENTICAL to a clean run. ----

  /** Chain 1–10 (multi-round frontier/peel behavior) plus triangle
    * 100-101-102 (a surviving 2-core / unreachable component). */
  private def chainPlusTriangle(): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ft_graph").toString
    ((1L until 10L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L), (100L, 102L)))
      .toDF("u", "v").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def flakyLong = udf { (_: Long) =>
    val tc = TaskContext.get()
    if (tc != null && tc.attemptNumber() == 0 &&
        failedTasks.add(tc.stageId() + "_" + tc.partitionId()))
      throw new RuntimeException("injected first-attempt task failure")
    true
  }

  test("BFS survives first-attempt task failures with identical distances") {
    import graft.ops.Graph
    val edges = chainPlusTriangle()
    val clean = Graph.bfs(edges, 1L).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(clean(10L) == 9, "chain must take 9 frontier rounds")

    failedTasks.clear()
    val recovered = Graph.bfs(edges.filter(flakyLong(col("u"))), 1L).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(failedTasks.size() > 0, "injection never fired — the experiment didn't run")
    assert(recovered == clean, s"distances diverged after recovery: $recovered vs $clean")
  }

  test("SSSP survives first-attempt task failures with identical distances") {
    import graft.ops.Graph
    // chain edges cost 1, triangle edges cost 3; source 1 walks the
    // 9-round chain (multi-round frontier recovery), triangle stays
    // unreached — and from 100 the direct-vs-2-hop costs differ
    val wedges = chainPlusTriangle()
      .withColumn("w", when(col("u") >= 100L, 3L).otherwise(1L))
    val clean = Graph.sssp(wedges, 1L, rounds = 12).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clean(10L) == 9L, "chain cost must equal its 9 unit hops")
    assert(!clean.contains(100L), "triangle unreachable from the chain")

    failedTasks.clear()
    val recovered = Graph.sssp(wedges.filter(flakyLong(col("u"))), 1L, rounds = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(failedTasks.size() > 0, "injection never fired — the experiment didn't run")
    assert(recovered == clean, s"distances diverged after recovery: $recovered vs $clean")
  }

  test("k-core peeling survives first-attempt task failures with identical cores") {
    import graft.ops.Graph
    val edges = chainPlusTriangle()
    val clean = Graph.kCore(edges, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clean.keySet == Set(100L, 101L, 102L),
      s"only the triangle survives 2-core peeling: $clean")

    failedTasks.clear()
    val recovered = Graph.kCore(edges.filter(flakyLong(col("u"))), 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(failedTasks.size() > 0, "injection never fired — the experiment didn't run")
    assert(recovered == clean, s"core diverged after recovery: $recovered vs $clean")
  }

  test("label propagation survives first-attempt task failures with identical communities") {
    import graft.ops.Graph
    // two cliques + bridge: the vote/argmax rounds run above the
    // injected failure in the symmetric-edge materialization
    val edges = chainPlusTriangle()
    val clean = Graph.labelPropagation(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    failedTasks.clear()
    val recovered = Graph.labelPropagation(edges.filter(flakyLong(col("u"))))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(failedTasks.size() > 0, "injection never fired — the experiment didn't run")
    assert(recovered == clean, s"labels diverged after recovery: $recovered vs $clean")
  }

  test("personalized PageRank survives first-attempt task failures with identical ranks") {
    import spark.implicits._
    // seed-reachable chain (1→10→12) + a branch only reachable via the
    // other root (2→12): restart dynamics + an exact-zero node
    val dir = java.nio.file.Files.createTempDirectory("graft_ft_ppr").toString
    Seq((1L, 10L), (1L, 11L), (10L, 12L), (2L, 12L))
      .toDF("src", "dst").write.mode("overwrite").parquet(dir)
    val edges = spark.read.parquet(dir)
    val clean = PageRank.runPersonalized(edges, seed = 1L, iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(clean(2L) == 0.0, "node 2 is unreachable from the seed")

    failedTasks.clear()
    val recovered = PageRank.runPersonalized(
        edges.filter(flakyLong(col("src"))), seed = 1L, iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(failedTasks.size() > 0, "injection never fired — the experiment didn't run")
    assert(recovered == clean, s"ranks diverged after recovery: $recovered vs $clean")
  }

  test("BPE merge induction survives first-attempt task failures with identical rules") {
    import graft.ops.Corpus
    // the newest iterative loop: 8 rounds of vocab-state checkpoints,
    // each feeding both the next pair count and the replace — the
    // injected failure sits in the word-rollup stage every round's
    // state descends from
    val docs = Tables.documents(spark, sf0001)
    val clean = Corpus.bpeMerges(docs).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

    failedTasks.clear()
    val recovered = Corpus.bpeMerges(docs.filter(flakyLong(col("doc_id")))).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(failedTasks.size() > 0, "injection never fired — the experiment didn't run")
    assert(recovered == clean, s"merge rules diverged after recovery: $recovered vs $clean")
  }

  test("k-means survives first-attempt task failures with identical clusters") {
    import graft.ops.Vectors
    val emb = Tables.embeddings(spark, sf0001)
    val clean = Vectors.kmeansCore(emb).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    failedTasks.clear()
    val recovered = Vectors.kmeansCore(emb.filter(flakyLong(col("vec_id")))).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(failedTasks.size() > 0, "injection never fired — the experiment didn't run")
    assert(recovered == clean, s"assignments diverged after recovery")
  }

  test("PQ train/encode/serve survives first-attempt task failures with identical rankings") {
    import graft.ops.Vectors
    // the deepest pipeline in the fault matrix: the injected failure
    // sits under 3 codebook assigns, 2 updates, the encode pass AND
    // the ADC serve — all must replay to the same bits
    val emb = Tables.embeddings(spark, sf0001)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))
    val clean = Vectors.pqAdcCore(emb, 5).collect().map(key).toMap

    failedTasks.clear()
    val recovered = Vectors.pqAdcCore(emb.filter(flakyLong(col("vec_id"))), 5)
      .collect().map(key).toMap
    assert(failedTasks.size() > 0, "injection never fired — the experiment didn't run")
    assert(recovered == clean, "ADC rankings diverged after recovery")
  }
}

object FaultToleranceSpec {
  /** (stageId_partitionId) pairs that already failed once — lives in
    * the object so every local executor thread sees the same set. */
  val failedTasks = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
}
