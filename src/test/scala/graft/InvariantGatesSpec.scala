package graft

/** The invariant gates are themselves code that can be wrong — rank
  * closed forms, shard-major order arithmetic, lift algebra — so this
  * spec runs every gate against a REAL ScaleUp corpus built fresh in a
  * temp dir (factor 12 of sf0.001: big enough for the ann gate's
  * factor ≥ 10 requirement, small enough for the suite). A gate that
  * passes here has had its expected-side construction checked against
  * the engine at a scale where the engine itself is oracle-verified;
  * what the sf10 run then adds is purely the second-decade data point.
  *
  * The negative test plants a corrupted big side (one clone's vector
  * swapped) and requires the embed gate to FAIL — a gate that cannot
  * fail proves nothing.
  */
class InvariantGatesSpec extends SparkSpec {

  private val factor = 12

  private lazy val bigDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_invariant_big")
    ScaleUp.keyCols.foreach { case (t, keys) =>
      val src = spark.read.parquet(s"$sf0001/$t.parquet")
      ScaleUp.scaleTable(src, keys, factor)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir.toString
  }

  test("all six planted-structure gates hold on a factor-12 ScaleUp of sf0.001") {
    val results = InvariantGates.allGates(spark, sf0001, bigDir, factor)
    assert(results.size == 6)
    val failed = results.filterNot(_.ok)
    assert(failed.isEmpty, failed.map(r => s"${r.name}: ${r.detail}").mkString("; "))
  }

  test("the embed gate FAILS on a corrupted big side (one clone vector swapped)") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_invariant_bad")
    // donor and victim must sit in DIFFERENT base clusters, or the
    // swapped vector lands in the same group and the lift still holds
    val base = ops.Vectors.dedupEmbed(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val (donorId, _) = base.head
    val (victimBase, _) = base.find(_._2 != base.head._2).get
    ScaleUp.keyCols.foreach { case (t, keys) =>
      val src = spark.read.parquet(s"$sf0001/$t.parquet")
      val scaled = ScaleUp.scaleTable(src, keys, factor)
      val out =
        if (t != "embeddings") scaled
        else {
          // give one non-base clone the vector of a base row from a
          // different cluster: its star edge now reattaches it there,
          // so its cluster_rep can no longer equal its base row's
          val donor = scaled.filter(col("vec_id") === donorId)
            .select(col("embedding")).head.getSeq[Float](0)
          val victim = ScaleUp.Stride + victimBase // shard-1 clone
          scaled.withColumn("embedding",
            when(col("vec_id") === victim, typedLit(donor))
              .otherwise(col("embedding")))
        }
      out.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val r = InvariantGates.gateDedupEmbed(spark, sf0001, dir.toString, factor)
    assert(!r.ok, s"gate must flag the planted corruption: ${r.detail}")
  }
}
