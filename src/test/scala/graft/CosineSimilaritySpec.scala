package graft

import graft.functions.CosineSimilarity.cosineSim
import org.apache.spark.sql.functions._

/** The native expression must be bit-identical to the HOF fold the
  * DuckDB oracles mirror, and must actually participate in
  * whole-stage codegen. */
class CosineSimilaritySpec extends SparkSpec {

  private lazy val embs = Tables.embeddings(spark, sf0001)
    .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))

  test("bit-identical to the aggregate/zip_with fold on real embeddings") {
    val qvec = expr("transform(sequence(0, 63), i -> ((i % 7) - 3) / 3.0D)")
    val hof = ops.Vectors.cosineHof(col("v"), qvec)
    val diff = embs
      .select(cosineSim(col("v"), qvec).as("a"), hof.as("b"))
      .filter(col("a") =!= col("b")) // exact double comparison
      .count()
    assert(diff == 0L)
  }

  test("interpreted eval agrees with codegen path") {
    val a = Seq(1.0, 2.0, 3.0)
    val b = Seq(-1.0, 0.5, 2.0)
    val expected = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    import spark.implicits._
    val got = Seq((a, b)).toDF("a", "b")
      .select(cosineSim(col("a"), col("b"))).collect().head.getDouble(0)
    assert(math.abs(got - expected) < 1e-15)
  }

  test("mismatched lengths and null elements return NULL like the HOF fold") {
    import spark.implicits._
    val mismatched = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
      .select(cosineSim(col("a"), col("b")).as("c"))
    assert(mismatched.collect().head.isNullAt(0))
    val nulls = Seq((Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)))
      .toDF("a", "b").select(cosineSim(col("a"), col("b")).as("c"))
    assert(nulls.collect().head.isNullAt(0))
    val fine = Seq((Seq(3.0, 4.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(cosineSim(col("a"), col("b")).as("c"))
    assert(math.abs(fine.collect().head.getDouble(0) - 1.0) < 1e-15)
  }

  test("expression is codegen'd (its Project carries the * codegen marker)") {
    val plan = embs.select(cosineSim(col("v"), col("v")).as("c"))
      .queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("cosine_sim")).get.trim
    assert(line.startsWith("*"), s"cosine_sim project not codegen'd:\n$plan")
  }
}
