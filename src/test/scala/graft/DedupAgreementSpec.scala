package graft

import graft.ops.Text
import org.apache.spark.sql.functions.col

/** Prod↔portable dedup agreement (r3 verdict task #6): the xxhash64
  * production paths have no DuckDB oracle (the hash is
  * engine-specific), so until now they were bounded only by golden
  * fixtures plus the construction-identical mechanics of their green
  * `_portable` twins. This spec bounds them against GROUND TRUTH on
  * the harness corpus itself — exact shingle-set Jaccard computed
  * independently in plain Scala (the tokenization is `split(" ")` +
  * 3-word sliding windows, mirrored verbatim from docShingles).
  *
  * What agreement can honestly mean here: the corpus is bimodal
  * (planted pairs at jac ≈ 0.99, background below 0.2 from a tiny
  * vocabulary), and at s* ≈ 0.35 an LSH family's verdict on a
  * background pair is a legitimate per-family coin flip — the two
  * hash families MUST agree on the planted pairs (miss probability
  * (1-0.99²)⁸ ≈ 10⁻¹⁴ each) and must never hallucinate a cluster
  * edge with zero shared evidence, but they may legitimately differ
  * on borderline pairs. The assertions encode exactly that. */
class DedupAgreementSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf0001)

  /** Verbatim mirror of docShingles' tokenization. */
  private def shingleSet(t: String): Set[String] = {
    val ws = t.split(" ")
    if (ws.length < 3) Set.empty
    else ws.sliding(3).map(_.mkString(" ")).toSet
  }

  private lazy val shingles: Map[Long, Set[String]] =
    docs.select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (id, t) => id -> shingleSet(t) }.toMap

  private def jac(a: Long, b: Long): Double = {
    val (sa, sb) = (shingles(a), shingles(b))
    if (sa.isEmpty && sb.isEmpty) 0.0
    else (sa & sb).size.toDouble / (sa | sb).size
  }

  /** The planted near-duplicate pairs: jac ≥ 0.9 (observed ≈ 0.99;
    * the next similarity tier on this corpus is < 0.2). */
  private lazy val planted: Seq[(Long, Long)] = {
    val ids = shingles.keys.toSeq.sorted
    for { i <- ids; j <- ids if i < j && jac(i, j) >= 0.9 } yield (i, j)
  }

  private def clustersOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select(col("doc_id"), col("cluster_rep")).as[(Long, Long)].collect().toMap

  test("one-pass MinHash: both hash families catch every planted pair; prod edges always share a shingle") {
    assert(planted.size >= 20, s"expected the corpus's planted pairs, got ${planted.size}")
    val prod = clustersOf(Text.minhashClusters(docs))
    val port = clustersOf(Text.minhashClustersPortable(docs))
    planted.foreach { case (a, b) =>
      assert(prod(a) == prod(b), s"xxhash64 one-pass missed planted pair ($a,$b) jac=${jac(a, b)}")
      assert(port(a) == port(b), s"portable one-pass missed planted pair ($a,$b) jac=${jac(a, b)}")
    }
    // precision (prod only — the 20-bit portable hash space admits
    // coincidental min collisions by design, its oracle covers it):
    // a 64-bit band collision forces a genuinely shared argmin
    // shingle, and one-pass reps share a bucket with every member,
    // so every (doc, rep) edge must have nonzero exact Jaccard
    prod.collect { case (d, r) if d != r => (d, r) }.foreach { case (d, r) =>
      assert(jac(d, r) > 0.0,
        s"xxhash64 one-pass clustered ($d under $r) with zero shared shingles")
    }
  }

  test("closure MinHash: both families agree on planted pairs; prod components are connected by real similarity") {
    val prod = clustersOf(Text.minhashClustersClosure(docs))
    val port = clustersOf(Text.minhashClustersClosurePortable(docs))
    planted.foreach { case (a, b) =>
      assert(prod(a) == prod(b), s"xxhash64 closure split planted pair ($a,$b)")
      assert(port(a) == port(b), s"portable closure split planted pair ($a,$b)")
    }
    // precision for the transitive path: co-membership may chain, so
    // the requirement is connectivity in the shares-a-shingle graph
    // WITHIN each prod cluster, not pairwise sharing
    prod.groupBy(_._2).values.map(_.keys.toSeq.sorted).filter(_.length > 1).foreach { members =>
      val reach = scala.collection.mutable.Set(members.head)
      var grew = true
      while (grew) {
        grew = false
        for (m <- members if !reach(m) && members.exists(r => reach(r) && jac(m, r) > 0.0)) {
          reach += m; grew = true
        }
      }
      assert(reach.size == members.size,
        s"xxhash64 closure cluster $members is not connected in the shared-shingle graph")
    }
  }

  test("SimHash: both fingerprint families separate planted pairs from background") {
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val prodSig = Text.dedupSimhash(spark, sf0001)
      .select(col("doc_id"), col("simhash")).as[(Long, Long)].collect().toMap
    val portSig = Text.simhashPortable(docs)
      .select(col("doc_id"), col("simhash16")).as[(Long, Long)].collect().toMap
    val plantedSet = planted.toSet
    // deterministic background sample: consecutive ids that are not
    // planted pairs (the corpus's background similarity tier)
    val background = shingles.keys.toSeq.sorted.sliding(2)
      .collect { case Seq(a, b) if !plantedSet((a, b)) => (a, b) }.toSeq
    // the tails legitimately touch on this corpus — background docs
    // draw from the same ~31-word vocabulary (so a background pair can
    // land at hamming 7/64), and the 16-bit twin even has birthday
    // collisions at background min 0 — so the agreement contract is
    // DISTRIBUTIONAL: in both families the planted p90 sits strictly
    // below the background median (measured: prod 5 vs 18, port 1 vs
    // 4), i.e. the bulk of real near-dups is closer than the typical
    // unrelated pair, under either hash family.
    def p(xs: Seq[Int], q: Double): Int = { val s = xs.sorted; s((s.size * q).toInt min (s.size - 1)) }
    for ((label, sig) <- Seq("64-bit" -> prodSig, "16-bit portable" -> portSig)) {
      val pl = planted.map { case (a, b) => hamming(sig(a), sig(b)) }
      val bg = background.map { case (a, b) => hamming(sig(a), sig(b)) }
      assert(p(pl, 0.9) < p(bg, 0.5),
        s"$label simhash: planted p90 ${p(pl, 0.9)} not below background median ${p(bg, 0.5)}")
    }
    // and the production path's planted pairs are absolutely close:
    // a near-identical word bag flips only the handful of bits whose
    // votes the few differing words decide (measured max: 7/64)
    val prodPlantedMax = planted.map { case (a, b) => hamming(prodSig(a), prodSig(b)) }.max
    assert(prodPlantedMax <= 10, s"64-bit simhash planted max hamming $prodPlantedMax > 10")
  }
}
