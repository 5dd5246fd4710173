package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, WinnowFingerprints}

/** Engine extensions — registered either at session build time
  * (`.withExtensions(new GraftExtensions)`) or onto a live session via
  * [[GraftExtensions.register]]. Currently: the native `cosine_sim` and
  * `winnow_fingerprints` expressions (SURVEY.md §7.3 — the places a custom
  * Catalyst Expression beats composed built-ins on a hot path). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  private def intLit(e: Expression): Int =
    e.eval().asInstanceOf[Number].intValue

  private val descriptors: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))),
    (FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (children: Seq[Expression]) =>
        WinnowFingerprints(children(0), intLit(children(1)), intLit(children(2)))))

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
