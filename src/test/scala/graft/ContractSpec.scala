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
