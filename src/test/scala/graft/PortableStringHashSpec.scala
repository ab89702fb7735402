package graft

import graft.functions.PortableStringHash
import org.apache.spark.sql.functions._

/** The native portable_hash expression must be bit-identical to the
  * HOF fold it replaced (`aggregate(split(s,""), 0L, (a,c) => (a*31 +
  * ascii(c)) % m)`) — that fold is the semantic contract shared with
  * the DuckDB oracles (`list_reduce` over `string_split`). */
class PortableStringHashSpec extends SparkSpec {
  import spark.implicits._

  private val M = 1000003L

  test("native hash equals the HOF fold on ASCII, unicode, and edge inputs") {
    val inputs = Seq(
      "", "a", "Z", "hello world", "the quick brown fox",
      "x" * 500,                       // long: fold wraps mod M many times
      "tab\tand\nnewline", "símbolo ñ", // multi-byte code points
      "emoji 😀 pair",        // surrogate pair: one code point
      "0123456789", " leading and trailing ")
    val df = inputs.toDF("s")
      .select(col("s"),
        PortableStringHash.portableHash(col("s"), M).as("native"),
        ops.Text.charHashHof(col("s")).as("hof"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"mismatch for '${r.getString(0)}': native=${r.getLong(1)} hof=${r.getLong(2)}")
    }
  }

  test("native hash equals the HOF fold across the real corpus words") {
    val words = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").distinct()
    val diff = words.select(
      PortableStringHash.portableHash(col("w"), M).as("native"),
      ops.Text.charHashHof(col("w")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.isEmpty, diff.take(5).mkString(";"))
  }

  test("null propagates, non-string input is rejected at analysis") {
    val r = Seq[Option[String]](None, Some("a")).toDF("s")
      .select(PortableStringHash.portableHash(col("s"), M).as("h"))
      .collect()
    assert(r(0).isNullAt(0) && !r(1).isNullAt(0))
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("x")
        .select(PortableStringHash.portableHash(col("x"), M)).collect()
    }
  }
}
