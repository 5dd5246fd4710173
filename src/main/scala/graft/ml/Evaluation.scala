package graft.ml

import org.apache.spark.ml.Model
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Metrics

/** Model evaluation + champion selection (M14–M17,
  * `evaluation.py:22-175`): metrics from confusion counts, AUC from the
  * rank statistic over P(class 1), champion = argmax f1 among models
  * clearing both quality gates; None when none qualify. */
object Evaluation {

  final case class ModelScore(name: String, accuracy: Double, precision: Double,
                              recall: Double, f1: Double, rocAuc: Double)

  /** M14 — predictions + P(class 1) (`deployment.py:95-110`). */
  def predict(model: Model[_], df: DataFrame): DataFrame =
    model.asInstanceOf[Model[_ <: Model[_]]].transform(df)
      .withColumn("p1", vector_to_array(col("probability")).getItem(1))

  /** M15/M16 — full metric set on a test DataFrame. */
  def evaluate(model: Model[_], test: DataFrame, name: String): ModelScore = {
    val pred = predict(model, test)
      .select(col("label").cast("int").as("y"),
        col("prediction").cast("int").as("yhat"),
        col("p1"))
      .cache()
    val m = Metrics.binaryMetrics(pred).collect()(0)
    // tie-aware midrank AUC (sklearn roc_auc_score semantics): model
    // probabilities tie heavily for tree ensembles, and an arbitrary
    // row-id tie-break would bias the statistic with physical row order.
    // Metrics.aucRank stays as the oracle-checkable declared-query form
    // (its (price, orderkey) ranking HAS a semantic tie-break key).
    val auc = Metrics.aucDistributedMidrank(pred, scoreCol = "p1")
    pred.unpersist()
    ModelScore(name, m.getAs[Double]("accuracy"), m.getAs[Double]("precision"),
      m.getAs[Double]("recall"), m.getAs[Double]("f1"), auc)
  }

  /** M17 — champion selection (`evaluation.py:125-175`): threshold filter
    * then argmax on the comparison metric, deterministic name tie-break. */
  def selectChampion(scores: Seq[ModelScore], minF1: Double, minAuc: Double)
      : Option[ModelScore] =
    scores.filter(s => s.f1 >= minF1 && s.rocAuc >= minAuc)
      .sortBy(s => (-s.f1, s.name)).headOption
}
