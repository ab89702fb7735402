package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions + multi-dimensional aggregates (SURVEY.md §2.5,
  * A6). Absent from the reference entirely; required for top-k per
  * group, as-of joins, and sessionization. Windows shuffle once on the
  * partition key and sort within partitions — per-group state only, so
  * they scale with the widest single partition, not the table.
  */
object Windows {

  /** Ranking trio + top-k per group (W1/O3): top-3 orders per customer.
    * `row_number` gets a unique tiebreak (orderkey); `rank`/`dense_rank`
    * are computed over the price alone so ties share a rank — both
    * orderings are deterministic. */
  def windowRank(s: SparkSession, d: String): DataFrame = {
    val byPrice = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val byPriceOnly = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(byPrice))
      .withColumn("rnk", rank().over(byPriceOnly))
      .withColumn("drnk", dense_rank().over(byPriceOnly))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"),
        col("rn"), col("rnk"), col("drnk"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Analytic functions with a running frame (W2): per-user running
    * sum of event values plus lag/lead neighbors. ROWS frame over a
    * fully tiebroken ordering (ts, event_id) → deterministic. */
  def windowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("running_sum",
        round(sum(col("value")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("next_value", lead(col("value"), 1).over(w))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** RANGE frame moving average (W3): trailing 24h mean of `value`
    * per user, keyed on integral epoch micros so Spark and DuckDB
    * compute the identical frame (DuckDB's `epoch()` is a DOUBLE —
    * avoided). The mean is `round(sum,2)/count` rather than
    * `round(avg,…)`: an exact rational average of 2-decimal inputs can
    * land precisely on a rounding boundary, where cross-engine ULP
    * noise flips the digit; rounding the (grid-exact) sum first makes
    * the division bitwise identical in both engines. */
  def windowMovingAvg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("es"))
      .rangeBetween(-86400000000L, 0L)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("es"), col("value"))
      .withColumn("moving_avg",
        round(sum(col("value")).over(w), 2) / count(col("value")).over(w))
      .orderBy(col("user_id"), col("es"), col("event_id"))
  }

  /** first/last/nth navigation (W5, r4): each order alongside its
    * customer's first, latest, and second-ever order price — the
    * "compare to baseline" window family that completes the
    * navigation surface (W2 covers the ±1 neighbors; these reach the
    * partition EDGES). last_value needs the full-partition ROWS frame
    * spelled out — the SQL default frame stops at CURRENT ROW, which
    * silently turns last_value into "current value" (the classic
    * window bug; both engines share the default, so the oracle would
    * agree and hide it — the spelled-out frame is the fix, and the
    * fixture in RelationalSpec pins it). Ordering is fully tiebroken
    * by (o_orderdate, o_orderkey). */
  def windowFirstLast(s: SparkSession, d: String): DataFrame =
    windowFirstLastCore(Tables.orders(s, d))

  /** Navigation over any orders-shaped relation —
    * DataFrame-parameterized so RelationalSpec can pin the
    * full-partition frame (the last_value default-frame trap) by
    * hand. */
  def windowFirstLastCore(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      .withColumn("first_price", round(first(col("o_totalprice")).over(w), 2))
      .withColumn("last_price", round(last(col("o_totalprice")).over(w), 2))
      .withColumn("second_price", round(nth_value(col("o_totalprice"), 2).over(w), 2))
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"),
        col("first_price"), col("last_price"), col("second_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** ROLLUP (A6): hierarchical subtotals over (returnflag, linestatus)
    * + grand total, disambiguated by grouping_id. One pass — Spark
    * expands grouping sets before the hash aggregate. */
  def aggRollup(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        grouping_id().cast("int").as("gid"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** Explicit GROUPING SETS (A6, r4): per-returnflag totals AND
    * per-linestatus totals in one pass — the asymmetric shape neither
    * ROLLUP (hierarchical prefixes) nor CUBE (all 2^k subsets) can
    * express without computing sets the report doesn't want. Same
    * single-pass expansion before the hash aggregate; at scale this
    * is one shuffle where two separate GROUP BYs would scan and
    * shuffle twice. */
  def aggGroupingSets(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupingSets(Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        grouping_id().cast("int").as("gid"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** CUBE (A6): all 2^2 grouping sets over (returnflag, linestatus). */
  def aggCube(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        grouping_id().cast("int").as("gid"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** Rolling discrete median (W6, r4): per user, the lower-median of
    * the trailing-5 values over the fully tiebroken (ts, event_id)
    * ordering — the robust moving baseline (one spike can drag
    * [[windowMovingAvg]]'s mean arbitrarily; it cannot move this).
    * Spark has no native median window; rendered as a sort of the
    * COLLECTED bounded frame — w = 5, so the per-row sort is O(w log
    * w) on a constant, and the only exchange is the user partition
    * (the unpartitioned variant would be the single-task trap). Both
    * engines build the same ≤5-element list, sort it, and index
    * `(n+1) div 2` — the median IS a data value (the discrete-
    * quantile class: no interpolation, no epsilon). */
  def windowRollingMedian(s: SparkSession, d: String): DataFrame =
    windowRollingMedianCore(Tables.events(s, d))

  /** Rolling median over any events relation — DataFrame-
    * parameterized so AnalyticsSpec can pin the lower-median index
    * and the frame warm-up by hand. */
  def windowRollingMedianCore(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc).rowsBetween(-4, 0)
    // NULL values are excluded up front (engine AND oracle): Spark's
    // collect_list silently drops NULLs while DuckDB's list() keeps
    // them, so with any NULL the collected frames — and the median
    // index — would differ cross-engine (r4 advice). Filtering first
    // makes the trailing-5 frame mean "the last 5 OBSERVED values" on
    // both engines, the convention the other discrete-quantile
    // queries already follow.
    ev.filter(col("value").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("vals", collect_list(col("value")).over(w))
      .select(col("user_id"), col("ts"), col("event_id"), col("value"),
        expr("element_at(array_sort(vals), cast((size(vals) + 1) div 2 as int))").as("med5"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_window_median"     -> windowRollingMedian,
    "q_window_rank"       -> windowRank,
    "q_window_first_last" -> windowFirstLast,
    "q_window_running"    -> windowRunning,
    "q_window_moving_avg" -> windowMovingAvg,
    "q_agg_rollup"        -> aggRollup,
    "q_agg_cube"          -> aggCube,
    "q_agg_grouping_sets" -> aggGroupingSets,
  )

  val oracles: Map[String, String] = Map(
    // same collected ≤5-element frame, same sort, same (n+1)//2 index
    "q_window_median" ->
      """SELECT user_id, ts, event_id, value,
           list_sort(l)[(len(l) + 1) // 2] AS med5
         FROM (SELECT user_id, ts, event_id, value,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS l
           FROM events WHERE value IS NOT NULL)
         ORDER BY user_id, ts, event_id""",
    // same spelled-out full-partition frame for all three navigators
    "q_window_first_last" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
                round(first_value(o_totalprice) OVER w, 2) AS first_price,
                round(last_value(o_totalprice) OVER w, 2) AS last_price,
                round(nth_value(o_totalprice, 2) OVER w, 2) AS second_price
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY o_custkey, o_orderkey""",
    "q_window_rank" ->
      """SELECT * FROM (
           SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
             CAST(row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn,
             CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS INT) AS rnk,
             CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS INT) AS drnk
           FROM orders)
         WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "q_window_running" ->
      """SELECT user_id, ts, event_id, value,
         round(sum(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_sum,
         lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_value,
         lead(value, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS next_value
         FROM events ORDER BY user_id, ts, event_id""",
    "q_window_moving_avg" ->
      """SELECT user_id, event_id, epoch_us(ts) AS es, value,
         round(sum(value) OVER w, 2) / count(value) OVER w AS moving_avg
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
         ORDER BY user_id, es, event_id""",
    "q_agg_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
         round(sum(l_quantity), 2) AS sum_qty,
         CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "q_agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
         round(sum(l_quantity), 2) AS sum_qty,
         CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
         FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
         ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "q_agg_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
         round(sum(l_extendedprice), 2) AS sum_price,
         CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
  )
}
