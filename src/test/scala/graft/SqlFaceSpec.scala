package graft

import org.apache.spark.sql.DataFrame

/** SQL-text face, broadened (r5 verdict task 7): a reference user
  * migrating SQL runs their TPC-H text VERBATIM through `spark.sql`
  * — these tests take five of the declared TPC-H oracles' ANSI SQL
  * strings (the exact strings the DuckDB gate executes, no rewriting)
  * and assert the text-driven result matches the DataFrame rendering
  * row for row. This is the API-surface claim behind q_sql_face made
  * checkable across the join/agg/window spectrum: same engine, same
  * Catalyst plan space, two front doors.
  *
  * Comparison is the driver's convention: columns sorted by name,
  * cells normalized (int-valued floats collapse, so a bigint count on
  * one side and a double on the other cannot false-fail), row order
  * taken as-is since every query ends in a total-order ORDER BY.
  */
class SqlFaceSpec extends SparkSpec {

  /** The five TPC-H shapes run as verbatim SQL text: a 6-table join
    * chain (Q5), a scan-heavy filter aggregate (Q6), a two-nation
    * volume join (Q7), a top-k join aggregate (Q3), and a CTE +
    * HAVING shape (Q18). */
  private val VerbatimKeys = Seq("q_tpch_regional", "q_tpch_forecast",
    "q_tpch_volume", "q_tpch_shipping", "q_tpch_bigorders")

  private def registerViews(): Unit = {
    Tables.region(spark, sf0001).createOrReplaceTempView("region")
    Tables.nation(spark, sf0001).createOrReplaceTempView("nation")
    Tables.customer(spark, sf0001).createOrReplaceTempView("customer")
    Tables.supplier(spark, sf0001).createOrReplaceTempView("supplier")
    Tables.part(spark, sf0001).createOrReplaceTempView("part")
    Tables.orders(spark, sf0001).createOrReplaceTempView("orders")
    Tables.lineitem(spark, sf0001).createOrReplaceTempView("lineitem")
  }

  private def norm(v: Any): String = v match {
    case null => "∅"
    case d: Double if !d.isNaN && !d.isInfinite &&
      d == math.rint(d) && math.abs(d) < 1e15 => d.toLong.toString
    case f: Float => norm(f.toDouble)
    case d: java.math.BigDecimal => norm(d.doubleValue())
    case ts: java.sql.Timestamp => ts.toString
    case other => String.valueOf(other)
  }

  /** Rows as name-sorted normalized cells (the driver's compare). */
  private def canon(df: DataFrame): Seq[Seq[String]] = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*).collect()
      .map(r => (0 until r.length).map(i => norm(r.get(i))).toSeq).toSeq
  }

  VerbatimKeys.foreach { key =>
    test(s"$key: the oracle's SQL text runs verbatim through spark.sql and matches the DataFrame rendering") {
      registerViews()
      val viaText = canon(spark.sql(SparkEntry.oracleSql(key)))
      val viaApi = canon(SparkEntry.queries(key)(spark, sf0001))
      assert(viaText.nonEmpty, "text face returned no rows")
      assert(viaText == viaApi,
        s"first text-only row: ${(viaText.toSet -- viaApi.toSet).headOption}; " +
          s"first api-only row: ${(viaApi.toSet -- viaText.toSet).headOption}")
    }
  }
}
