package graft

import org.apache.spark.sql.{AnalysisException, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

import graft.functions.{CosineSimilarity, ShingleMd5s, WinnowFingerprints}

/** Engine extensions — registered either at session build time
  * (`.withExtensions(new GraftExtensions)`) or onto a live session via
  * [[GraftExtensions.register]]. Currently: the native `cosine_sim`,
  * `winnow_fingerprints`, and `shingle_md5s` expressions (SURVEY.md §7.3 —
  * the places a custom Catalyst Expression beats composed built-ins on a
  * hot path). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def checkArity(fn: String, children: Seq[Expression], n: Int): Unit =
    if (children.length != n)
      throw new AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$fn`",
          "expectedNum" -> n.toString,
          "actualNum" -> children.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  /** A literal/foldable integral argument, or a proper analysis error —
    * without this, `winnow_fingerprints(text)` died with
    * IndexOutOfBoundsException and a non-foldable k/w with a codegen-time
    * ClassCastException instead of an analysis-time message. */
  private def intLit(fn: String, param: String, e: Expression): Int = {
    val integral = e.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (!e.foldable || !integral)
      throw new AnalysisException(
        errorClass = "NON_FOLDABLE_ARGUMENT",
        messageParameters = Map(
          "funcName" -> s"`$fn`",
          "paramName" -> s"`$param`",
          "paramType" -> "\"INT\""))
    e.eval() match {
      case null => throw new AnalysisException(
        errorClass = "NON_FOLDABLE_ARGUMENT",
        messageParameters = Map(
          "funcName" -> s"`$fn`",
          "paramName" -> s"`$param`",
          "paramType" -> "\"INT\""))
      case v: Number =>
        // Number.intValue silently WRAPS a Long outside Int range —
        // winnow_fingerprints(text, 2^32 + 4, 4) would run with k = 4 and
        // return plausible-but-wrong fingerprints; range-check instead.
        // A fractional literal (4.7) would likewise truncate via longValue,
        // so non-integral values are rejected the same way.
        val l = v.longValue
        if (v.doubleValue != l.toDouble || l < Int.MinValue || l > Int.MaxValue)
          throw new AnalysisException(
            errorClass = "NON_FOLDABLE_ARGUMENT",
            messageParameters = Map(
              "funcName" -> s"`$fn`",
              "paramName" -> s"`$param`",
              "paramType" -> "\"INT\""))
        l.toInt
    }
  }

  /** [[intLit]] plus a range check, so an out-of-range literal (e.g.
    * `shingle_md5s(text, 2000)`) surfaces as an AnalysisException at
    * analysis time like every other argument validation here — not as the
    * expression body's require() IllegalArgumentException. The PATTERN
    * subclass renders as "The value of parameter(s) `<param>` in `<fn>` is
    * invalid: <value>." — the free-text slot carries the range. */
  private def intLitInRange(fn: String, param: String, e: Expression,
                            lo: Int, hi: Int): Int = {
    val v = intLit(fn, param, e)
    if (v < lo || v > hi)
      throw new AnalysisException(
        errorClass = "INVALID_PARAMETER_VALUE.PATTERN",
        messageParameters = Map(
          "functionName" -> s"`$fn`",
          "parameter" -> s"`$param`",
          "value" -> s"expects an integer in [$lo, $hi], but got $v"))
    v
  }

  private val descriptors: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        checkArity("cosine_sim", children, 2)
        CosineSimilarity(children(0), children(1))
      }),
    (FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (children: Seq[Expression]) => {
        checkArity("winnow_fingerprints", children, 3)
        WinnowFingerprints(children(0),
          intLitInRange("winnow_fingerprints", "k", children(1), 2, 64),
          intLitInRange("winnow_fingerprints", "w", children(2), 1, 64))
      }),
    (FunctionIdentifier("shingle_md5s"),
      new ExpressionInfo(classOf[ShingleMd5s].getName, "shingle_md5s"),
      (children: Seq[Expression]) => {
        checkArity("shingle_md5s", children, 2)
        ShingleMd5s(children(0),
          intLitInRange("shingle_md5s", "k", children(1), 1, 1024))
      }))

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
