package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of the most frequent element of an `array<string>` — the
  * mode's multiplicity, used by the repetition filters
  * (`ops/Corpus.repetitionProfile`) for top-word and top-bigram
  * fractions.
  *
  * The HOF rendering
  * `array_max(transform(array_distinct(xs), w -> size(filter(xs, x -> x = w))))`
  * is O(distinct·n) interpreted lambda dispatch per ROW — it dominated
  * q_repetition's profile at sf0.1 (3.7 s for 5k docs), the same
  * CodegenFallback-in-a-hot-path class `portable_hash` fixed in round
  * 2. This expression is one O(n) hash-count pass per row.
  *
  * Bit-identical to the HOF on the oracle domain (no null elements):
  * empty array → NULL (`array_max([])`), all-null array → 0 (a null
  * element's `x = w` predicate is null, so the HOF counts it as 0) —
  * CorpusSpec property-pins expression ≡ HOF. */
case class ArrayTopCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"array_top_count expects array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "array_top_count"
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() == 0) null else ArrayTopCountUtil.topCount(a)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => s"""
       |if ($x.numElements() == 0) {
       |  ${ev.isNull} = true;
       |} else {
       |  ${ev.value} = graft.functions.ArrayTopCountUtil.topCount($x);
       |}
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ArrayTopCount {
  /** Column-level entry point (same bridge pattern as portable_hash). */
  def arrayTopCount(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumnBridge.wrap1(c)(ArrayTopCount(_))
}

/** Plain object (no companion class) so Scala emits a static forwarder
  * janino can call directly from generated code. */
object ArrayTopCountUtil {
  def topCount(a: ArrayData): Int = {
    val n = a.numElements()
    val counts = new java.util.HashMap[UTF8String, Integer](Math.min(n * 2, 64))
    var best = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val s = a.getUTF8String(i)
        val prev = counts.get(s)
        val c = if (prev == null) 1 else prev.intValue() + 1
        counts.put(s, c)
        if (c > best) best = c
      }
      i += 1
    }
    best
  }
}
