package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{ArrayTopCount, CosineSimilarity, PortableStringHash, SrpBandKeys}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.LongType

/** SparkSessionExtensions entry point: registers graft's native
  * expressions into the SQL function registry, so
  * `spark.sql("SELECT cosine_sim(a, b) ...")` works in any session
  * built with `.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  *
  * This is the (c)-tier extension surface from the build guidance;
  * no custom planner strategies or optimizer rules are injected —
  * nothing in the operator inventory needs one (SURVEY.md §4), and a
  * rule that can't prove a semantic win is pure risk. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"cosine_sim expects 2 arguments, got ${args.length}")
        CosineSimilarity(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("portable_hash"),
      new ExpressionInfo(classOf[PortableStringHash].getName, "portable_hash"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"portable_hash expects (str, mod), got ${args.length} args")
        val mod = args(1) match {
          case Literal(m: Long, LongType) => m
          case Literal(m: Int, _) => m.toLong
          case other => throw new IllegalArgumentException(
            s"portable_hash mod must be an integer literal, got $other")
        }
        PortableStringHash(args.head, mod)
      }))
    ext.injectFunction((
      FunctionIdentifier("array_top_count"),
      new ExpressionInfo(classOf[ArrayTopCount].getName, "array_top_count"),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"array_top_count expects 1 argument, got ${args.length}")
        ArrayTopCount(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("srp_band_keys"),
      new ExpressionInfo(classOf[SrpBandKeys].getName, "srp_band_keys"),
      (args: Seq[Expression]) => {
        require(args.length == 3, s"srp_band_keys expects (vec, nBands, bitsPerBand), got ${args.length} args")
        def intLit(e: Expression, what: String): Int = e match {
          case Literal(m: Int, _) => m
          case other => throw new IllegalArgumentException(
            s"srp_band_keys $what must be an integer literal, got $other")
        }
        SrpBandKeys(args.head, intLit(args(1), "nBands"), intLit(args(2), "bitsPerBand"))
      }))
  }
}
