package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Advanced join shapes (SURVEY.md §2.3 J4–J6).
  *
  * The reference's only join is the per-iteration pair-RDD equi-join
  * in PageRank (`assignment1/part3/task1/task1.py:51`); the engine
  * widens that to the full join-type surface. Every join here keeps an
  * equi component so Catalyst can plan a shuffled (or broadcast) hash
  * join — no cartesian products at any SF; band/as-of predicates ride
  * along as post-join filters or window passes.
  */
object Joins {

  /** Left outer join + aggregate (J4): order stats per customer,
    * customers without orders kept with zeroed aggregates. `count` on
    * the join key counts non-null matches only, like SQL. */
  def joinOuter(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select("c_custkey", "c_mktsegment")
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("sum_price"))
      .orderBy(col("c_custkey"))

  /** Left semi (J4): customers with at least one high-value order —
    * the relational EXISTS. The probe side streams; no row duplication
    * regardless of match multiplicity. */
  def joinSemi(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 300000.0)
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), round(col("c_acctbal"), 2).as("acctbal"))
      .orderBy(col("c_custkey"))

  /** Left anti (J4): customers with no urgent-priority order —
    * NOT EXISTS. (Every customer has *some* order in the testdata, so
    * the predicate-free variant would be vacuously empty.) */
  def joinAnti(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Range (band) join (J5): click→purchase pairs of the same user
    * within a 10-minute band. The `user_id` equi-key anchors the join
    * (hash/SMJ partitioned by user); the time band is a residual
    * predicate, so candidate pairs are bounded by per-user activity,
    * not |events|² — the property that keeps this viable at 100 TB. */
  def joinRange(s: SparkSession, d: String): DataFrame =
    rangeCore(Tables.events(s, d))

  /** Core band join over any events relation (testable with synthetic
    * timestamps). The join itself lives in
    * [[graft.streaming.Streaming.clickToPurchase]] — ONE predicate
    * serves both the batch face (this, oracle-checked as
    * q_join_range) and the watermarked stream-stream face (ST7), so
    * the two can't drift apart. */
  def rangeCore(ev: DataFrame): DataFrame =
    graft.streaming.Streaming.clickToPurchase(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"))
      .orderBy("click_id", "purchase_id")

  /** As-of join (J6): for each purchase, the latest click of the same
    * user at-or-before the purchase timestamp. Spark has no native
    * as-of join; rather than an exploding inequality join we union
    * both sides and take `last(click_ts, ignoreNulls)` over an ordered
    * per-user window — one shuffle + one sort, linear in |events|.
    * Clicks sort before purchases on timestamp ties (`is_click` desc)
    * so a same-instant click matches, mirroring `<=` semantics. */
  def joinAsof(s: SparkSession, d: String): DataFrame =
    asofCore(Tables.events(s, d))

  /** Core as-of join over any events relation. */
  def asofCore(ev: DataFrame): DataFrame = {
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(1).as("is_click"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(0).as("is_click"), lit(null).cast("timestamp").as("click_ts"),
        lit(null).cast("long").as("click_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("is_click").desc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(buys)
      .withColumn("matched_click_ts", last(col("click_ts"), ignoreNulls = true).over(w))
      .withColumn("matched_click_id", last(col("click_id"), ignoreNulls = true).over(w))
      .filter(col("is_click") === 0)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("matched_click_ts"), col("matched_click_id"))
      .orderBy(col("purchase_id"))
  }

  /** As-of join with a lookback tolerance (J6 variant): matches
    * further back than 2 hours are discarded — the `tolerance`
    * parameter of real as-of APIs, rendered as a post-window filter
    * on the matched timestamp (still one shuffle + one sort). */
  def joinAsofTolerance(s: SparkSession, d: String): DataFrame = {
    val within = col("matched_click_ts") >= col("purchase_ts") - expr("INTERVAL 2 HOURS")
    joinAsof(s, d)
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        when(within, col("matched_click_ts")).as("matched_click_ts"),
        when(within, col("matched_click_id")).as("matched_click_id"))
      .orderBy(col("purchase_id"))
  }

  /** Salted skew join (the join-side twin of `q_agg_salted`): enrich
    * every event with its type-level average — a 5-key join, i.e. the
    * pathological shuffle-join shape where every fact row lands on one
    * of 5 reducers and the hottest key serializes the stage. The
    * salted rendering replicates the dim once per salt (5 rows → 5×S,
    * trivially small) and routes fact rows by `pmod(event_id, S)`, so
    * each hot key spreads across S reducers. Salt only routes rows —
    * the join result is bit-identical to the unsalted join, which is
    * what the DuckDB oracle checks. `shuffle_hash` hints pin the
    * shuffled rendering (PlanSpec asserts no broadcast): at real scale
    * a dim can be too big to broadcast yet still skew-joined, and AQE's
    * runtime skew split only covers sort-merge plans it can see stats
    * for. The dim's avg is rendered round(sum)/count so cross-engine
    * summation order can't straddle a rounding boundary. */
  def joinSkewSalted(s: SparkSession, d: String): DataFrame =
    skewSaltedCore(Tables.events(s, d)).orderBy(col("event_id"))

  /** Core salted join over any `(event_id, event_type, value)`
    * relation — DataFrame-parameterized so PropertySpec drives the
    * SAME code under adversarial partitioning (a private inline copy
    * in the test would silently drift from the operator). */
  def skewSaltedCore(ev: DataFrame, salts: Int = 8): DataFrame = {
    val dim = ev.groupBy(col("event_type"))
      .agg((round(sum(col("value")), 4) / count(lit(1))).as("type_avg"))
      .withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
    val fact = ev.select(col("event_id"), col("event_type"), col("value"))
      .withColumn("salt", pmod(col("event_id"), lit(salts.toLong)).cast("int"))
    fact.hint("shuffle_hash")
      .join(dim.hint("shuffle_hash"), Seq("event_type", "salt"))
      .select(col("event_id"), col("event_type"),
        round(col("value") - col("type_avg"), 6).as("dev_from_type_avg"))
  }

  /** Bloom-pruned semi join (J10, r4): the runtime-filter technique
    * made explicit. The build side (high-value orders, ~10% of the
    * table) aggregates its keys into ONE bloom filter row
    * (`bloom_filter_agg` via the catalyst bridge — the same expression
    * Spark's own `InjectRuntimeFilter` plants); the filter broadcasts
    * to the probe side, where `might_contain(xxhash64(key))` discards
    * ~90% of lineitem BEFORE the join shuffle. The exact left-semi
    * join then removes the bloom's false positives, so the result is
    * bit-identical to the plain semi join — which is exactly what the
    * DuckDB oracle checks (the bloom is a pure plan optimization,
    * invisible to semantics).
    *
    * Why this matters at 100 TB: a shuffled semi join moves the whole
    * probe side; AQE/InjectRuntimeFilter only inserts this prune when
    * its cost model notices. Declaring it explicitly makes the
    * pre-shuffle prune part of the operator contract — the probe
    * shuffle carries ~selectivity × |lineitem| rows, and the bloom
    * (1.6 Mbit here, sized ~16 bits/key at any scale) rides one
    * broadcast, never a shuffle. JoinsSpec pins that the bloom really
    * prunes (probe survivors ≪ probe rows) and PlanSpec pins the
    * might_contain filter sits BELOW the join. */
  def joinBloom(s: SparkSession, d: String): DataFrame = {
    val sel = Tables.orders(s, d)
      .filter(col("o_totalprice") > 450000.0)
      .select(col("o_orderkey"))
    val bloom = sel.agg(
      org.apache.spark.sql.GraftColumnBridge
        .bloomFilterAgg(xxhash64(col("o_orderkey")), 100000L, 1600000L).as("bf"))
    bloomPrunedSemi(Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity")), bloom, sel)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_items"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("l_orderkey"))
  }

  /** Probe-side bloom prune + exact confirm, factored so JoinsSpec can
    * count survivors between the two stages. `bloom` is a 1-row
    * relation (the aggregated filter), attached as a scalar subquery —
    * it executes once and its result ships to every probe task. */
  private[graft] def bloomPrunedSemi(probe: DataFrame, bloom: DataFrame,
      keys: DataFrame): DataFrame =
    bloomPruned(probe, bloom)
      .join(keys, col("l_orderkey") === col("o_orderkey"), "left_semi")

  private[graft] def bloomPruned(probe: DataFrame, bloom: DataFrame): DataFrame =
    probe.where(org.apache.spark.sql.GraftColumnBridge
      .bloomMightContain(bloom, xxhash64(col("l_orderkey"))))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_bloom" -> joinBloom,
    "q_join_skew_salted" -> ((s: SparkSession, d: String) => joinSkewSalted(s, d)),
    "q_join_asof_tol" -> joinAsofTolerance,
    "q_join_outer" -> joinOuter,
    "q_join_semi"  -> joinSemi,
    "q_join_anti"  -> joinAnti,
    "q_join_range" -> joinRange,
    "q_join_asof"  -> joinAsof,
  )

  /** Shared oracle CTE: the as-of union + ordered window (tie-break
    * ORDER BY ts, is_click DESC, event_id) used by both as-of oracles. */
  private val asofCte =
    """u AS (
           SELECT user_id, ts, event_id, 1 AS is_click, ts AS click_ts, event_id AS click_id
           FROM events WHERE event_type = 'click'
           UNION ALL
           SELECT user_id, ts, event_id, 0 AS is_click, NULL::TIMESTAMP AS click_ts,
                  NULL::BIGINT AS click_id
           FROM events WHERE event_type = 'purchase'),
         m AS (
           SELECT *,
             last_value(click_ts IGNORE NULLS) OVER w AS mts,
             last_value(click_id IGNORE NULLS) OVER w AS mid
           FROM u
           WINDOW w AS (PARTITION BY user_id
                        ORDER BY ts ASC, is_click DESC, event_id ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))"""

  val oracles: Map[String, String] = Map(
    // the plain semi join: the bloom prune must not change the result
    "q_join_bloom" ->
      """SELECT l_orderkey, count(*) AS n_items, round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_orderkey = l_orderkey AND o_totalprice > 450000.0)
         GROUP BY l_orderkey ORDER BY l_orderkey""",
    // the unsalted join: salting must not change the result
    "q_join_skew_salted" ->
      """WITH dim AS (SELECT event_type, round(sum(value), 4) / count(*) AS type_avg
                      FROM events GROUP BY event_type)
         SELECT event_id, e.event_type, round(e.value - d.type_avg, 6) AS dev_from_type_avg
         FROM events e JOIN dim d ON e.event_type = d.event_type
         ORDER BY event_id""",
    "q_join_asof_tol" ->
      s"""WITH $asofCte
         SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
                CASE WHEN mts >= ts - INTERVAL 2 HOUR THEN mts END AS matched_click_ts,
                CASE WHEN mts >= ts - INTERVAL 2 HOUR THEN mid END AS matched_click_id
         FROM m WHERE is_click = 0 ORDER BY purchase_id""",
    "q_join_outer" ->
      """SELECT c_custkey, c_mktsegment, count(o_orderkey) AS n_orders,
         round(coalesce(sum(o_totalprice), 0.0), 2) AS sum_price
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey, c_mktsegment ORDER BY c_custkey""",
    "q_join_semi" ->
      """SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
         ORDER BY c_custkey""",
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",
    "q_join_range" ->
      """SELECT c.user_id, c.event_id AS click_id, b.event_id AS purchase_id,
         c.ts AS click_ts, b.ts AS purchase_ts
         FROM events c JOIN events b
           ON c.user_id = b.user_id
          AND b.ts > c.ts AND b.ts <= c.ts + INTERVAL 10 MINUTE
         WHERE c.event_type = 'click' AND b.event_type = 'purchase'
         ORDER BY click_id, purchase_id""",
    "q_join_asof" ->
      s"""WITH $asofCte
         SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
                mts AS matched_click_ts, mid AS matched_click_id
         FROM m WHERE is_click = 0 ORDER BY purchase_id""",
  )
}
