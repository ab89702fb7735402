package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions surface: cosine_sim must be callable
  * from plain SQL in a session built with GraftExtensions. */
class ExtensionsSpec extends AnyFunSuite {

  test("cosine_sim registers via SparkSessionExtensions and works in SQL") {
    // extensions only apply at session creation: getOrCreate would
    // silently reuse the shared no-extensions session from other
    // suites, so tear down and let later suites rebuild theirs
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val got = spark.sql(
        """SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS same,
                  cosine_sim(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS orth""")
        .collect().head
      assert(math.abs(got.getDouble(0) - 1.0) < 1e-15)
      assert(math.abs(got.getDouble(1)) < 1e-15)
      // type check fires for wrong arity/types
      val err = intercept[Exception] {
        spark.sql("SELECT cosine_sim(array('a'), array('b'))").collect()
      }
      assert(err.getMessage.toLowerCase.contains("array<double>"))

      // portable_hash: same fold SQL-side as the Column API
      val ph = spark.sql("SELECT portable_hash('ab', 1000003L) AS h").collect().head
      assert(ph.getLong(0) == (97L * 31 + 98) % 1000003L)
      val phErr = intercept[Exception] {
        spark.sql("SELECT portable_hash('ab', length('xx'))").collect()
      }
      assert(phErr.getMessage.contains("integer literal"))

      // srp_band_keys: a constant vector's dot with plane j has the
      // sign of sum_i h_j(i); all-zeros input → every dot 0 → keys 0
      val sk = spark.sql(
        """SELECT srp_band_keys(transform(sequence(0, 63), i -> 0.0D), 4, 8) AS z,
                  srp_band_keys(transform(sequence(0, 63), i -> 1.0D), 4, 8) AS ones""")
        .collect().head
      assert(sk.getSeq[Int](0) == Seq(0, 0, 0, 0), "zero vector must key to all-zero bands")
      // deterministic planes → fixed keys for the all-ones vector;
      // assert shape + stability rather than hand-computing 32 dots
      assert(sk.getSeq[Int](1).length == 4)
      val again = spark.sql(
        "SELECT srp_band_keys(transform(sequence(0, 63), i -> 1.0D), 4, 8) AS k")
        .collect().head.getSeq[Int](0)
      assert(sk.getSeq[Int](1) == again)
      val skErr = intercept[Exception] {
        spark.sql("SELECT srp_band_keys(array('a'), 4, 8)").collect()
      }
      assert(skErr.getMessage.toLowerCase.contains("array<double>"))

      // array_top_count: mode multiplicity; empty array → NULL
      val tc = spark.sql(
        """SELECT array_top_count(array('a','b','a')) AS c,
                  array_top_count(CAST(array() AS array<string>)) AS e""").collect().head
      assert(tc.getInt(0) == 2 && tc.isNullAt(1))
      val tcErr = intercept[Exception] {
        spark.sql("SELECT array_top_count(array(1, 2))").collect()
      }
      assert(tcErr.getMessage.toLowerCase.contains("array<string>"))
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
