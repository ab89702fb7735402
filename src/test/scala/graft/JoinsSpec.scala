package graft

import graft.ops.Joins
import org.apache.spark.sql.functions._

/** Edge-semantics golden tests for the time joins (SURVEY §7.3 calls
  * tie-breaking the hard part of as-of): same-instant clicks match,
  * band boundaries are (exclusive, inclusive], later clicks win. */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  private def events(rows: (Long, String, String, Long)*) =
    rows.map { case (id, ts, et, u) => (id, t(ts), u, et) }
      .toDF("event_id", "ts", "user_id", "event_type")

  test("as-of: click at exactly the purchase instant matches (<= semantics)") {
    val ev = events(
      (1L, "2024-01-01 10:00:00", "click", 7L),
      (2L, "2024-01-01 10:00:00", "purchase", 7L))
    val out = Joins.asofCore(ev).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("matched_click_id") == 1L)
  }

  test("as-of: the latest at-or-before click wins; later clicks don't") {
    val ev = events(
      (1L, "2024-01-01 09:00:00", "click", 7L),
      (2L, "2024-01-01 09:30:00", "click", 7L),
      (3L, "2024-01-01 10:00:00", "purchase", 7L),
      (4L, "2024-01-01 11:00:00", "click", 7L)) // after: must not match
    val out = Joins.asofCore(ev).collect()
    assert(out.head.getAs[Long]("matched_click_id") == 2L)
  }

  test("as-of: no prior click gives a null match, other users don't leak") {
    val ev = events(
      (1L, "2024-01-01 09:00:00", "click", 8L),  // different user
      (2L, "2024-01-01 10:00:00", "purchase", 7L))
    val out = Joins.asofCore(ev).collect()
    assert(out.head.isNullAt(out.head.fieldIndex("matched_click_id")))
  }

  test("bloom prune: no false negatives, and the probe side really shrinks") {
    val sel = Tables.orders(spark, sf0001)
      .filter(col("o_totalprice") > 450000.0).select(col("o_orderkey"))
    val bloom = sel.agg(org.apache.spark.sql.GraftColumnBridge
      .bloomFilterAgg(xxhash64(col("o_orderkey")), 100000L, 1600000L).as("bf"))
    val probe = Tables.lineitem(spark, sf0001).select(col("l_orderkey"))
    val pruned = Joins.bloomPruned(probe, bloom)
    val exact = probe.join(sel, col("l_orderkey") === col("o_orderkey"), "left_semi")
    // every true match survives the bloom (false negatives never)...
    assert(exact.exceptAll(pruned).count() == 0)
    // ...and the prune is real: survivors track the ~10% selectivity,
    // not the full probe (this is the pre-shuffle volume at scale)
    assert(pruned.count() < probe.count() / 2,
      s"bloom kept ${pruned.count()} of ${probe.count()} probe rows — not pruning")
  }

  test("band join: boundary is (exclusive, inclusive]") {
    val ev = events(
      (1L, "2024-01-01 10:00:00", "click", 7L),
      (2L, "2024-01-01 10:00:00", "purchase", 7L),  // equal ts: excluded (>)
      (3L, "2024-01-01 10:10:00", "purchase", 7L),  // exactly +10min: included
      (4L, "2024-01-01 10:10:01", "purchase", 7L))  // beyond band: excluded
    val pairs = Joins.rangeCore(ev)
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 3L)), pairs.toString)
  }
}
