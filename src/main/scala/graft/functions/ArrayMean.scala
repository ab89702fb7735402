package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.12): element-wise mean over
  * `Array[Double]` columns — the custom-aggregation rendering of the
  * reference's gradient averaging (`assignment2/part2a/main.py:66`
  * stack-mean ≡ `part2b/main.py:47-49` all-reduce SUM after ÷W).
  *
  * Register with `functions.udaf(ArrayMean)` or call `.toColumn` on a
  * typed Dataset. The buffer is (element-wise sums, count), merged
  * associatively — Spark runs it as partial→final aggregation, so the
  * shuffle carries one buffer per partition per group, not rows: the
  * combiner shape that stands in for ring all-reduce.
  *
  * Tradeoff vs. the posexplode rendering in `ops.AllReduce`: this
  * keeps whole arrays in the buffer (better for few groups × long
  * vectors); the exploded form keeps per-group state at one double
  * (better for huge group counts). Both are provided deliberately.
  */
object ArrayMean extends Aggregator[Array[Double], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), a: Array[Double]): (Array[Double], Long) = {
    if (a == null) return b
    val sums = if (b._1.isEmpty) new Array[Double](a.length) else b._1
    // ragged groups are a data bug: fail loudly rather than silently
    // truncating (or overrunning) the element-wise sum
    require(a.length == sums.length,
      s"ArrayMean: ragged arrays in group (${a.length} vs ${sums.length})")
    var i = 0
    while (i < a.length) { sums(i) += a(i); i += 1 }
    (sums, b._2 + 1)
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    if (x._1.isEmpty) return y
    if (y._1.isEmpty) return x
    require(x._1.length == y._1.length,
      s"ArrayMean: ragged partial buffers (${x._1.length} vs ${y._1.length})")
    val sums = x._1
    var i = 0
    while (i < sums.length) { sums(i) += y._1(i); i += 1 }
    (sums, x._2 + y._2)
  }

  override def finish(r: (Array[Double], Long)): Array[Double] = {
    if (r._2 == 0L) return Array.empty[Double]
    val out = new Array[Double](r._1.length)
    var i = 0
    while (i < out.length) { out(i) = r._1(i) / r._2; i += 1 }
    out
  }

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(ExprEnc.arrayDouble, Encoders.scalaLong)

  override def outputEncoder: Encoder[Array[Double]] = ExprEnc.arrayDouble
}

private object ExprEnc {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  val arrayDouble: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}
