package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.CosineSimilarity

/** Engine extensions — registered either at session build time
  * (`.withExtensions(new GraftExtensions)`) or onto a live session via
  * [[GraftExtensions.register]]. Currently: the native `cosine_sim`
  * expression (SURVEY.md §7.3 — the one place a custom Catalyst Expression
  * beats composed built-ins on a hot path). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.cosineSimDescriptor)
}

object GraftExtensions {
  private val cosineSimDescriptor = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (children: Seq[Expression]) => CosineSimilarity(children(0), children(1)))

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      cosineSimDescriptor._1, cosineSimDescriptor._2, cosineSimDescriptor._3)
}
