package graft

/** The mutation-aware scaler's contract is geometric, not textual:
  * token counts never change, and the differing-token fraction
  * between clone shards r and s is EXACTLY min(|r−s|, M)/M of the
  * windows (that closed form is what makes near-dup density constant
  * in the factor — each clone's above-threshold partners live within
  * a fixed shard distance, so pair output grows linearly where the
  * verbatim-clone corpus grew C(factor,2)). Pinned here on a
  * hand-sized doc whose token count is a multiple of M so the window
  * arithmetic is exact. */
class ScaleUpSpec extends SparkSpec {
  import spark.implicits._

  private val M = ScaleUp.MutateWindows

  // 10 full windows: positions 0..329, window = pos % 33
  private val tokens = (0 until 10 * M).map(p => s"w$p")
  private val factor = 45 // > M so the saturation regime is exercised

  private lazy val shardTexts: Map[Long, Array[String]] = {
    val df = Seq((0L, tokens.mkString(" "))).toDF("doc_id", "text")
    ScaleUp.scaleDocsMutated(df, Seq("doc_id"), factor)
      .collect()
      .map(r => (r.getLong(0) / ScaleUp.Stride) -> r.getString(1).split(" "))
      .toMap
  }

  test("mutation preserves token count and position structure in every shard") {
    assert(shardTexts.size == factor)
    shardTexts.foreach { case (r, ts) =>
      assert(ts.length == tokens.length, s"shard $r changed token count")
      ts.zipWithIndex.foreach { case (t, p) =>
        assert(t.startsWith(s"w$p"), s"shard $r pos $p: $t — base token must prefix")
      }
    }
  }

  test("shard 0 rewrites exactly window 0; shard r < M rewrites windows 0..r tagged with their index") {
    val s0 = shardTexts(0L)
    s0.zipWithIndex.foreach { case (t, p) =>
      if (p % M == 0) assert(t == s"w${p}x0", s"pos $p: $t")
      else assert(t == s"w$p", s"pos $p must stay base: $t")
    }
    val s5 = shardTexts(5L)
    s5.zipWithIndex.foreach { case (t, p) =>
      val i = p % M
      if (i <= 5) assert(t == s"w${p}x$i", s"pos $p: $t") // t_i(r) = i for r < M
      else assert(t == s"w$p", s"pos $p: $t")
    }
  }

  test("differing-token fraction between shards is exactly min(distance, M)/M") {
    def diffFrac(a: Long, b: Long): Double = {
      val (ta, tb) = (shardTexts(a), shardTexts(b))
      ta.zip(tb).count { case (x, y) => x != y }.toDouble / ta.length
    }
    // adjacent shards: 1 window of M
    assert(diffFrac(40L, 41L) == 1.0 / M, diffFrac(40L, 41L).toString)
    // distance 4
    assert(diffFrac(35L, 39L) == 4.0 / M, diffFrac(35L, 39L).toString)
    // distance >= M: fully divergent (no wrap-around similarity — the
    // property that kills the far-clone quadratic)
    assert(diffFrac(0L, 33L) == 1.0, diffFrac(0L, 33L).toString)
    assert(diffFrac(1L, 44L) == 1.0, diffFrac(1L, 44L).toString)
  }

  test("position-keyed mutation: equal base texts stay equal per shard, distinct stay distinct") {
    val df = Seq((0L, "alpha beta gamma"), (1L, "alpha beta gamma"),
      (2L, "delta beta gamma")).toDF("doc_id", "text")
    val out = ScaleUp.scaleDocsMutated(df, Seq("doc_id"), 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for (r <- 0L until 3L) {
      val (a, b, c) = (out(r * ScaleUp.Stride), out(r * ScaleUp.Stride + 1),
        out(r * ScaleUp.Stride + 2))
      assert(a == b, s"shard $r: exact-dup pair must stay exact: $a vs $b")
      assert(a != c, s"shard $r: distinct docs must stay distinct")
      // near-dup geometry within the shard: only the first token differs
      assert(a.split(" ").drop(1).sameElements(c.split(" ").drop(1)),
        s"shard $r: $a vs $c")
    }
  }
}
