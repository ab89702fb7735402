package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself: every oracle key must name a declared
  * query (an orphaned oracle is silently never compared — the failure
  * mode is a green run that checked nothing), and the registries the
  * per-module maps merge into must not collide. No SparkSession
  * needed; this is pure registry hygiene. */
class ContractSpec extends AnyFunSuite {

  test("every oracle key has a matching declared query") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("query names are well-formed and unique across modules") {
    val all = Seq(
      ops.Relational.queries, ops.Joins.queries, ops.Windows.queries,
      ops.Functions.queries, ops.PageRank.queries, ops.Text.queries,
      ops.Vectors.queries, ops.Events.queries, ops.AllReduce.queries,
      ops.Multimodal.queries)
    val keys = all.flatMap(_.keys)
    assert(keys.forall(_.startsWith("q_")), keys.filterNot(_.startsWith("q_")).toString)
    val dupes = keys.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    // a module silently shadowing another's query would make the merged
    // map drop one implementation without any error
    assert(dupes.isEmpty, s"query keys declared in more than one module: $dupes")
  }

  test("scale_budgets.tsv rows name declared queries with sane per-decade slope budgets and a rationale") {
    // the scale tier's per-family slope budgets (Bench scale_up /
    // ScaleDecades): 4 columns since the r9 per-decade split —
    // query, max_slope (decade 1), max_slope_d2 (decade 2), rationale.
    // A row naming an undeclared query would silently budget nothing.
    // d1 MAY be <= 12 (tighter than the default gate — that is the
    // point of a per-decade budget, e.g. q_ann_pq d1=8 prices the
    // fixed-cost-dominated first decade), but must stay positive and
    // falsifiable; d2 >= d1 (cost models only get worse with scale) and
    // d2 > 12 (a d2 at-or-below the default gate would mean the row
    // shouldn't exist), both capped at 120 (~c^2 is unfalsifiable).
    val in = getClass.getResourceAsStream("/scale_budgets.tsv")
    assert(in != null, "scale_budgets.tsv missing from main resources")
    val rows = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().drop(1)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map(_.split("\t")).toSeq
    finally in.close()
    assert(rows.nonEmpty)
    rows.foreach { f =>
      assert(f.length == 4, s"row needs query/max_slope/max_slope_d2/rationale: ${f.mkString("|")}")
      assert(SparkEntry.queries.contains(f(0)), s"budget for undeclared query ${f(0)}")
      val d1 = f(1).toDouble
      val d2 = f(2).toDouble
      assert(d1 > 0.0 && d1 <= 120.0,
        s"${f(0)}: d1 budget $d1 outside (0, 120] — nonpositive is dead, past ~c^2 it's unfalsifiable")
      assert(d2 >= d1, s"${f(0)}: d2 budget $d2 below d1 $d1 — decade budgets must be monotone")
      assert(d2 > 12.0 && d2 <= 120.0,
        s"${f(0)}: d2 budget $d2 outside (12, 120] — at/below the default gate the row is redundant, past ~c^2 it's unfalsifiable")
      assert(f(3).trim.length > 20, s"${f(0)}: rationale must name the cost model")
    }
    val dupes = rows.groupBy(_.head).collect { case (k, vs) if vs.size > 1 => k }
    assert(dupes.isEmpty, s"duplicate budget rows: $dupes")
  }

  test("every oracle ends in an ORDER BY (hash compare needs a total order)") {
    // the FINAL clause must be ordered: an ORDER BY hiding inside a
    // CTE/subquery (or a window's OVER) while the outer SELECT is
    // unordered would leave the hash compare order-dependent, so the
    // last ORDER BY must come after the last FROM
    def lastPos(sql: String, re: String): Int =
      re.r.findAllMatchIn(sql).map(_.start).foldLeft(-1)(math.max)
    val missing = SparkEntry.oracleSql.collect {
      case (k, sql) if {
        val up = sql.toUpperCase
        lastPos(up, "\\bORDER\\s+BY\\b") < lastPos(up, "\\bFROM\\b")
      } => k
    }
    assert(missing.isEmpty, s"oracles whose outer SELECT lacks a final ORDER BY: $missing")
  }
}
