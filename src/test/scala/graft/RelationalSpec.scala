package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Golden bounds for the sketch aggregates (engine-specific
  * estimates, no DuckDB oracle) and the reference's text sink (S5). */
class RelationalSpec extends SparkSpec {

  test("hand-rolled HLL lands inside 3 standard errors at every harness SF") {
    // σ = 1.04/√64 = 13%; the tri-SF measured errors are −10.6%,
    // +7.2%, +3.9% — pin the 3σ envelope so a mixer or rank
    // regression (both observed during construction: raw-hash ranks
    // read 96% low, raw-hash registers 62% low) fails loudly.
    for (sf <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val r = ops.Relational.hllDistinct(spark, sf).collect().head
      val err = math.abs(r.getDouble(4))
      assert(err <= 39.0, s"$sf: rel error $err% breaches 3σ = 39%: $r")
      assert(r.getLong(1) > 0 && r.getDouble(3) > 0, r.toString)
    }
  }

  test("grouped HLL: every group lands inside 3 standard errors, registers independent per group") {
    for (sf <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val rows = ops.Relational.hllGroups(spark, sf).collect()
      assert(rows.length >= 2, s"$sf: expected multiple event-type groups")
      rows.foreach { r =>
        val err = math.abs(r.getDouble(4))
        assert(err <= 39.0, s"$sf/${r.getString(0)}: rel error $err% breaches 3σ = 39%: $r")
        assert(r.getLong(1) > 0 && r.getDouble(3) > 0, r.toString)
      }
      // groups partition the rows, so per-group distincts can only
      // meet or exceed the global distinct (an id may recur across
      // groups, never within) — a cheap cross-query consistency pin
      val global = ops.Relational.hllDistinct(spark, sf).collect().head.getLong(1)
      assert(rows.map(_.getLong(1)).sum >= global,
        s"$sf: per-group exact counts sum below the global distinct")
    }
  }

  test("HLL shard-merge is lossless: max-merged registers reproduce the whole-corpus estimate") {
    for (sf <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val r = ops.Relational.hllMerge(spark, sf).collect().head
      assert(r.getBoolean(3), s"$sf: merged estimate diverged from whole-corpus: $r")
      assert(r.getDouble(1) == r.getDouble(2), r.toString)
      // and the merged path changes nothing about estimate quality
      val global = ops.Relational.hllDistinct(spark, sf).collect().head
      assert(r.getDouble(1) == global.getDouble(3),
        s"$sf: q_hll_merge's whole-corpus estimate must equal q_hll_distinct's")
    }
  }

  test("approx sketches stay within their error bounds of the declared exact twin") {
    // both sides are DECLARED queries: q_agg_approx (sketches, no
    // oracle by nature) and q_agg_approx_exact (oracle-checked), so
    // the no-oracle row is bounded by a green one — every group, all
    // four measures
    val approx = ops.Relational.aggApprox(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = ops.Relational.aggApproxExact(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (flag, e) =>
      val a = approx(flag)
      // HLL with rsd 0.02: assert a generous 3-sigma-ish 5% + 1
      for ((col, name) <- Seq(1 -> "orders", 2 -> "parts")) {
        val (ex, ap) = (e.getLong(col), a.getLong(col))
        assert(math.abs(ap - ex) <= 0.05 * ex + 1, s"$flag: approx $name $ap vs exact $ex")
      }
      // percentile_approx with accuracy 1000 on ~10^4 rows per group:
      // rank error ~ n/1000 → value error well under 10% / 15% here
      val exactMedian = e.getDouble(3)
      assert(math.abs(a.getDouble(3) - exactMedian) <= 0.10 * exactMedian,
        s"$flag: approx median ${a.getDouble(3)} vs exact $exactMedian")
      val exactP99 = e.getDouble(4)
      assert(math.abs(a.getDouble(4) - exactP99) <= 0.15 * exactP99,
        s"$flag: approx p99 ${a.getDouble(4)} vs exact $exactP99")
    }
  }

  test("MUTATION: a biased sketch fails the approx-vs-exact error bounds") {
    // Inverse guard (r6 verdict task 8) for the q_agg_approx
    // twin-bound: the bounds above only protect the no-oracle row if
    // a realistically-broken sketch actually violates them. The
    // plausible bug class is systematic bias (double-merged HLL
    // registers, a percentile sketch fed pre-aggregated rows) — model
    // it as a uniform +12% inflation of every approx measure, well
    // past the 5%+1 HLL and 10% percentile gates, and assert at least
    // one group trips each family of bounds.
    val approx = ops.Relational.aggApprox(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = ops.Relational.aggApproxExact(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    val distinctViolated = exact.exists { case (flag, e) =>
      (1 to 2).exists { c =>
        val biased = (approx(flag).getLong(c) * 1.12).toLong
        math.abs(biased - e.getLong(c)) > 0.05 * e.getLong(c) + 1
      }
    }
    val pctViolated = exact.exists { case (flag, e) =>
      math.abs(approx(flag).getDouble(3) * 1.12 - e.getDouble(3)) > 0.10 * e.getDouble(3)
    }
    assert(distinctViolated, "a +12% biased distinct-count sketch slipped through the 5%+1 bound")
    assert(pctViolated, "a +12% biased median sketch slipped through the 10% bound")
  }

  test("salted aggregation equals the direct groupBy") {
    val salted = ops.Relational.aggSalted(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val direct = Tables.events(spark, sf0001)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("s"))
      .orderBy(col("event_type")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted.toSeq == direct.toSeq)
  }

  test("key-hash sample is deterministic and near the target fraction") {
    val a = ops.Relational.sample(spark, sf0001).collect()
    val b = ops.Relational.sample(spark, sf0001).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
      "key-hash sample must give identical rows on re-run")
    val total = Tables.lineitem(spark, sf0001).count().toDouble
    val frac = a.length / total
    assert(frac > 0.05 && frac < 0.15, s"fraction $frac too far from 0.1")
  }

  test("skyline keeps exactly the non-dominated points") {
    import spark.implicits._
    // flag A: (10,5) dominated by (20,5) [higher price, equal qty];
    // (20,5) and (30,3) survive; (15,4) dominated by (20,5); ties at
    // price 20 collapse to the best qty (20,2 folds into 20,5)
    val items = Seq(
      ("A", 10.0, 5.0), ("A", 15.0, 4.0), ("A", 20.0, 5.0),
      ("A", 20.0, 2.0), ("A", 30.0, 3.0),
      ("B", 1.0, 1.0),
    ).toDF("l_returnflag", "l_extendedprice", "l_quantity")
    val got = ops.Relational.skylineCore(items).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(got == Set(("A", 20.0, 5.0), ("A", 30.0, 3.0), ("B", 1.0, 1.0)),
      got.toString)
  }

  test("first/last/nth window uses the full-partition frame, not the default") {
    import spark.implicits._
    // with the DEFAULT frame last_value would equal the current row's
    // price; the spelled-out frame must see the partition's real end
    val orders = Seq(
      (1L, 101L, java.sql.Date.valueOf("2024-01-01"), 10.0),
      (1L, 102L, java.sql.Date.valueOf("2024-01-02"), 20.0),
      (1L, 103L, java.sql.Date.valueOf("2024-01-03"), 30.0),
      (2L, 201L, java.sql.Date.valueOf("2024-02-01"), 7.0),
    ).toDF("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    val got = ops.Windows.windowFirstLastCore(orders).collect()
      .map(r => r.getLong(1) ->
        (r.getDouble(3), r.getDouble(4), Option(r.get(5)))).toMap
    assert(got(101L) == ((10.0, 30.0, Some(20.0))), got.toString)
    assert(got(102L) == ((10.0, 30.0, Some(20.0))), got.toString)
    assert(got(103L) == ((10.0, 30.0, Some(20.0))), got.toString)
    // single-order customer: no second order → nth_value is NULL
    assert(got(201L) == ((7.0, 7.0, None)), got.toString)
  }

  test("TPC-H trio: shipping top-10 ordering, promo share bounds, big-order threshold") {
    // invariants the DuckDB hash-compare can't see as SEMANTICS: the
    // shapes hold by construction of TPC-H, not by engine agreement
    val ship = ops.Relational.tpchShipping(spark, sf0001).collect()
    assert(ship.length == 10)
    val revs = ship.map(_.getDouble(3))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b }, "revenue must be non-increasing")
    assert(ship.map(_.getLong(0)).distinct.length == 10, "one row per order")
    // o_orderdate is TIMESTAMP_NTZ on the current vintage → LocalDateTime
    assert(ship.forall(_.getAs[java.time.LocalDateTime](1)
      .isBefore(java.time.LocalDateTime.parse("1997-07-01T00:00:00"))))

    val promo = ops.Relational.tpchPromo(spark, sf0001).collect()
    assert(promo.map(_.getInt(0)).toSeq == (1 to 12), "all 12 ship months")
    promo.foreach { r =>
      assert(r.getDouble(1) >= 0 && r.getDouble(1) <= r.getDouble(2), r.toString)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 100.0, r.toString)
    }

    val big = ops.Relational.tpchBigOrders(spark, sf0001).collect()
    assert(big.nonEmpty)
    assert(big.forall(_.getDouble(5) > 300.0), "HAVING threshold")
    val qtys = big.map(_.getDouble(5))
    assert(qtys.zip(qtys.tail).forall { case (a, b) => a >= b }, "sum_qty non-increasing")
    // l_quantity is integral-valued → the sums must be exact integers
    assert(qtys.forall(q => q == math.floor(q)), "integral quantity sums")
  }

  test("TPC-H wave 16: priority EXISTS semantics, returned top-20 ordering, disjunct branch partition") {
    val prio = ops.Relational.tpchPriority(spark, sf0001).collect()
    assert(prio.nonEmpty && prio.length <= 5)
    // count only orders in the window; priorities arrive sorted
    val names = prio.map(_.getString(0)).toSeq
    assert(names == names.sorted, names.toString)
    assert(prio.forall(_.getLong(1) > 0))

    val ret = ops.Relational.tpchReturned(spark, sf0001).collect()
    assert(ret.length <= 20)
    val revs = ret.map(_.getDouble(3))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b }, "revenue non-increasing")
    assert(ret.map(_.getLong(0)).distinct.length == ret.length, "one row per customer")

    val dis = ops.Relational.tpchDisjunct(spark, sf0001).collect()
    val branches = dis.map(_.getString(0)).toSet
    assert(branches.subsetOf(Set("promo_small", "economy_mid", "brand12_bulk")), branches.toString)
    // first-match CASE partitions the rows: every branch row has items,
    // and parts never exceed items
    dis.foreach { r =>
      assert(r.getLong(2) > 0 && r.getLong(3) <= r.getLong(2), r.toString)
    }
  }

  test("TPC-H wave 17: churn threshold semantics, mincost winner uniqueness and tiebreak") {
    val churn = ops.Relational.tpchChurn(spark, sf0001).collect()
    assert(churn.nonEmpty)
    churn.foreach { r =>
      assert(r.getLong(1) > 0, r.toString)
      // every qualifying customer beats the positive-balance average,
      // so each nation's mean balance must too (cents / count > 0)
      assert(r.getLong(2) > 0, r.toString)
    }

    val mc = ops.Relational.tpchMinCost(spark, sf0001).collect()
    assert(mc.nonEmpty)
    assert(mc.map(_.getLong(0)).distinct.length == mc.length, "one winner per part")
    assert(mc.forall(_.getLong(4) > 0), "positive unit cents")
    // the (unit_cents, suppkey) tiebreak is total → re-running yields
    // the identical winner set
    val again = ops.Relational.tpchMinCost(spark, sf0001).collect()
    assert(mc.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(2))).toSeq)
  }

  test("wave 20: custdist conserves customers, quantiles are ordered positions, IQR fences bound") {
    val cd = ops.Relational.tpchCustDist(spark, sf0001).collect()
    val nCust = Tables.customer(spark, sf0001).count()
    assert(cd.map(_.getLong(1)).sum == nCust, "every customer lands in exactly one bucket")
    val nQual = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority") =!= "5-LOW").count()
    assert(cd.map(r => r.getLong(0) * r.getLong(1)).sum == nQual,
      "bucket-weighted counts reproduce the qualifying order total")

    val qs = ops.Relational.quantiles(spark, sf0001).collect()
    qs.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(3) <= r.getLong(4),
        s"p50 <= p90 <= p99: $r")
    }
    assert(qs.map(_.getLong(1)).sum == Tables.orders(spark, sf0001).count())

    val iqr = ops.Relational.iqrOutliers(spark, sf0001).collect()
    iqr.foreach { r =>
      assert(r.getDouble(2) <= r.getDouble(3), s"q1 <= q3: $r")
      assert(r.getLong(4) + r.getLong(5) < r.getLong(1),
        s"fences must keep the interquartile mass inside: $r")
    }
  }

  test("quantile sketch brackets the exact twin within one bucket, per priority and percentile") {
    // the sketch family's portability pin (r5 verdict task 8): the
    // fixed-bucket sketch's lower edge must satisfy lo <= exact <
    // lo + width for the SAME TYPE-1 rank the exact twin selects —
    // the by-construction error bound, verified on the real table.
    val b = ops.Relational.QSketchBucketCents
    val exact = ops.Relational.quantiles(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val sketch = ops.Relational.quantileSketch(spark, sf0001).collect()
    assert(sketch.map(_.getString(0)).toSet == exact.keySet)
    sketch.foreach { r =>
      val (e50, e90, e99) = exact(r.getString(0))
      for ((lo, e, p) <- Seq((r.getLong(3), e50, 50), (r.getLong(4), e90, 90),
          (r.getLong(5), e99, 99))) {
        assert(lo <= e && e < lo + b,
          s"${r.getString(0)} p$p: exact $e outside sketch bucket [$lo, ${lo + b})")
      }
      // the sketch IS bounded state: never more buckets than the range allows
      assert(r.getLong(2) <= 500, s"bucket blow-up: $r")
    }

    // hand fixture: 10 known values, one bucket each → sketch lower
    // edges are exact multiples below the hand-computed quantiles
    import spark.implicits._
    val orders = (1 to 10).map(i => (s"P", i * 1000.0 + 0.5))
      .toDF("o_orderpriority", "o_totalprice")
    val got = ops.Relational.quantileSketchCore(orders).collect().head
    // cents = i*100000 + 50 → bucket i (width 100000). TYPE-1 ranks:
    // p50 → 5th value (bucket 5), p90 → 9th, p99 → 10th.
    assert(got.getLong(1) == 10 && got.getLong(2) == 10, got.toString)
    assert(got.getLong(3) == 5 * 100000L, s"p50 bucket: $got")
    assert(got.getLong(4) == 9 * 100000L, s"p90 bucket: $got")
    assert(got.getLong(5) == 10 * 100000L, s"p99 bucket: $got")
  }

  test("TPC-H wave 32: partvalue threshold, lateship conservation, suppcnt exclusion, waiting rewrite vs brute force") {
    val sf001 = "/root/testdata/sf0.01"

    // Q11 shape: every survivor clears 1/400 of the slice total, and
    // the total the engine gated on equals an independent recompute
    val pv = ops.Relational.tpchPartValue(spark, sf001).collect()
    assert(pv.nonEmpty)
    val tot = pv.map(_.getLong(1)).sum // survivors only — strictly below slice total
    val sliceTot = Tables.lineitem(spark, sf001)
      .join(Tables.supplier(spark, sf001), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, sf001).filter(col("n_name") === "NATION_3"),
        col("s_nationkey") === col("n_nationkey"))
      .agg(sum(expr("cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)" +
        " * cast(l_quantity as bigint)")).as("t")).head.getLong(0)
    assert(tot <= sliceTot)
    assert(pv.forall(_.getLong(1) * 400 > sliceTot), "HAVING threshold")
    val keys = pv.map(_.getLong(0)).toSeq
    assert(keys == keys.sorted && keys.distinct.length == keys.length)

    // Q12 shape: the two buckets partition the late lines exactly
    val ls = ops.Relational.tpchLateShip(spark, sf001).collect()
    val lateTotal = Tables.lineitem(spark, sf001)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(spark, sf001), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .count()
    assert(ls.map(r => r.getLong(1) + r.getLong(2)).sum == lateTotal,
      "high + low buckets must conserve the late-line count")

    // Q16 shape: no group can count more suppliers than the non-excluded pool
    val sc = ops.Relational.tpchSuppCnt(spark, sf001).collect()
    val pool = Tables.supplier(spark, sf001).filter(col("s_acctbal") >= 0.0).count()
    assert(sc.nonEmpty && sc.forall(r => r.getLong(3) >= 1 && r.getLong(3) <= pool))
    val cnts = sc.map(_.getLong(3))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b }, "sorted by count desc")

    // Q21 shape: the per-order aggregate rewrite must equal a literal
    // EXISTS / NOT EXISTS evaluation brute-forced on collected rows
    val w = ops.Relational.tpchWaiting(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val nation7 = Tables.supplier(spark, sf001)
      .join(Tables.nation(spark, sf001).filter(col("n_name") === "NATION_7"),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val lines = Tables.lineitem(spark, sf001)
      .join(Tables.orders(spark, sf001).filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("late"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val brute = lines.groupBy(_._1).toSeq.flatMap { case (_, ls0) =>
      ls0.filter(_._3).flatMap { case (_, supp, _) =>
        val othersExist = ls0.exists(_._2 != supp)
        val otherLate = ls0.exists(l => l._2 != supp && l._3)
        if (othersExist && !otherLate && nation7(supp)) Some(supp) else None
      }
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(w == brute, s"rewrite=${w.toSeq.sorted} brute=${brute.toSeq.sorted}")
  }

  test("pagerank text sink round-trips (reference saveAsTextFile, S5)") {
    val ranks = ops.PageRank.run(
      ops.PageRank.parseEdgeLines(
        spark.read.text(getClass.getResource("/toy_graph.tsv").getPath)), 2)
    val out = Files.createTempDirectory("prtext").toString + "/ranks"
    ranks.select(concat_ws("\t", col("node"), col("pr")))
      .write.mode("overwrite").text(out)
    val back = spark.read.text(out).collect().map(_.getString(0))
      .map(_.split("\t")).map(a => a(0) -> a(1).toDouble).toMap
    assert(back.keySet == Set("1", "2", "3", "5"))
    assert(math.abs(back("1") - 1.6020833333) < 1e-9)
  }

  test("abc classification: 70/90 cuts land exactly on the boundary, ties order by supplier id") {
    import spark.implicits._
    // nation X: 70+20+10 — cum shares land EXACTLY on 70% and 90%
    // (boundary is inclusive: cum·10 ≤ tot·{7,9}); nation Y: a tie at
    // the top must rank by s_suppkey, making supplier 1 the A carrier
    val rev = Seq(
      ("X", 1L, 70L), ("X", 2L, 20L), ("X", 3L, 10L),
      ("Y", 1L, 50L), ("Y", 2L, 50L))
      .toDF("n_name", "s_suppkey", "revenue_cents")
    val got = ops.Relational.abcClassCore(rev).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getString(3)).toMap
    assert(got == Map(
      ("X", 1L) -> "A", ("X", 2L) -> "B", ("X", 3L) -> "C",
      ("Y", 1L) -> "A", ("Y", 2L) -> "C"), got.toString)
  }

  test("AQP group-by: estimate self-consistent, error bar real, covered recomputes") {
    val rows = SparkEntry.queries("q_aqp_groupby")(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty, "the 1/16 sample must hit every language at sf0.01")
    rows.foreach { r =>
      val (ns, nEst, nTrue) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (est, half, tru, cov) =
        (r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getBoolean(7))
      assert(nEst == ns * 16, r.toString)
      // the 1/16 Bernoulli count concentrates around n_true within
      // ~4σ of the scaled binomial (σ_est ≈ √(16·n_true)); small
      // groups are legitimately noisy (sf0.01's 70-doc 'de' group
      // drew +1.7σ on the fixed hash), so the bound scales with size —
      // a broken hash stride, not sampling noise, is what this catches
      assert(math.abs(nEst - nTrue) <= 4 * math.sqrt(16.0 * nTrue) + 16,
        s"sampled count estimate implausible: $r")
      assert(half > 0, r.toString)
      assert(cov == (math.abs(est - tru) <= half),
        s"covered must recompute from the rounded grid values: $r")
      // the estimate can miss (5% per group by design) but not by miles
      assert(math.abs(est - tru) <= 5 * half, s"estimate off by >5 half-widths: $r")
    }
  }
}
