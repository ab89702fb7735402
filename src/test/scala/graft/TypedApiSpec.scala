package graft

import org.apache.spark.sql.functions._

/** Typed Dataset surface (SURVEY.md §1.3): case-class Encoders give
  * compile-time field checks over the same parquet relations the
  * untyped queries use; logical plans still flow through Catalyst
  * (filters on case-class fields reach the scan where expressible). */
// top-level: Encoders can't be generated for suite-inner case classes
case class Order(o_orderkey: Long, o_custkey: Long, o_totalprice: Double)
case class Doc(doc_id: Long, lang: String, n_chars: Long)

class TypedApiSpec extends SparkSpec {
  import spark.implicits._

  test("typed filter/map pipeline agrees with the untyped plan") {
    val typed = Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_custkey", "o_totalprice").as[Order]
      .filter(_.o_totalprice > 200000.0)
      .map(o => o.o_custkey -> o.o_totalprice)
      .groupByKey(_._1)
      .mapGroups((k, it) => (k, it.map(_._2).sum))
      .collect().toMap
    val untyped = Tables.orders(spark, sf0001)
      .filter(col("o_totalprice") > 200000.0)
      .groupBy(col("o_custkey")).agg(sum(col("o_totalprice")))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(typed.keySet == untyped.keySet)
    typed.foreach { case (k, v) => assert(math.abs(v - untyped(k)) < 1e-6) }
  }

  test("typed aggregation via mapValues + reduceGroups") {
    val byLang = Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "n_chars").as[Doc]
      .groupByKey(_.lang)
      .mapValues(_.n_chars)
      .reduceGroups(_ + _)
      .collect().toMap
    val expected = Tables.documents(spark, sf0001)
      .groupBy("lang").agg(sum("n_chars"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang == expected)
  }
}
