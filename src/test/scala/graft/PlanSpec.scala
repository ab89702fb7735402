package graft

/** Physical-plan shape guards: the optimizer wins found during round-1
  * tuning, pinned so a refactor can't silently regress them (a plan
  * that stops broadcasting or starts exchanging per iteration would
  * still return correct rows — only these assertions catch it). */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  test("broadcast join: dims broadcast, fact side never exchanges for the joins") {
    val p = planOf("q_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
    assert("BroadcastExchange".r.findAllIn(p).length == 2, p)
  }

  test("top-k plans TakeOrderedAndProject, not a global sort") {
    val p = planOf("q_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("flagship sort is a single range-partitioned exchange") {
    val p = planOf("q_sort_export")
    assert("Exchange".r.findAllIn(p).length == 1, p)
    assert(p.contains("rangepartitioning"), p)
  }

  test("vector pairs join is pure equi (no join-condition cosine)") {
    val p = planOf("q_vector_pairs")
    val joinLine = p.linesIterator.find(_.contains("Join")).getOrElse("")
    assert(!joinLine.contains("aggregate("),
      s"cosine fold leaked into the join condition: $joinLine")
  }

  test("SRP-LSH candidate join is pure equi (no hyperplane dot in join condition)") {
    // the 32 SRP dots must be projected into band keys BEFORE the
    // bucket self-join; a dot fold leaking into the join condition
    // would re-evaluate per candidate pair — quadratic at scale
    val p = ops.Vectors.srpPairs(Tables.embeddings(spark, sf0001), 0.25)
      .queryExecution.executedPlan.toString
    for (joinLine <- p.linesIterator.filter(_.contains("Join")))
      assert(!joinLine.contains("aggregate("),
        s"hyperplane dot fold leaked into a join condition: $joinLine")
    spark.catalog.clearCache() // srpPairs persists its banded relation
  }

  test("salted skew join shuffles on (key, salt), never broadcasts") {
    val p = planOf("q_join_skew_salted")
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("BroadcastHashJoin"),
      s"salting is pointless if the dim broadcasts — the query exists to pin the shuffled rendering: $p")
    val joinLine = p.linesIterator.find(_.contains("ShuffledHashJoin")).getOrElse("")
    assert(joinLine.contains("salt"), s"salt missing from join keys: $joinLine")
  }

  test("multi-consumer intermediates stay materialized (persist pins)") {
    // dropping these persists wouldn't change results — the corpus
    // would just get re-tokenized per consumer (4-8 scans at 100 TB)
    for (name <- Seq("q_tfidf", "q_dedup_ngram", "q_dedup_ngram_idf", "q_dedup_minhash")) {
      val p = planOf(name)
      assert(p.contains("InMemoryTableScan"),
        s"$name lost its shared-intermediate persist")
      spark.catalog.clearCache()
    }
  }

  test("no cartesian products outside the bounded cross join") {
    for (name <- SparkEntry.queries.keys if name != "q_join_cross") {
      val p = planOf(name)
      assert(!p.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
    }
  }

  test("filter pushdown reaches the parquet scan") {
    val p = planOf("q_filter_predicates")
    assert(p.contains("PushedFilters: [") &&
      p.contains("GreaterThanOrEqual(o_totalprice"), p)
  }

  test("column pruning: join reads only referenced lineitem columns") {
    val p = planOf("q_join_inner")
    val scan = p.linesIterator.find(l => l.contains("lineitem.parquet")).get
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>"), scan)
  }
}
