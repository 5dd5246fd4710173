package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classification-metric aggregates (SURVEY.md §2.4 M15–M17) re-expressed
  * relationally: confusion counts → accuracy / precision / recall / f1
  * (`evaluation.py:22-78`, sklearn zero_division=0 semantics), rank-statistic
  * ROC-AUC, and champion selection (`evaluation.py:125-175`).
  *
  * All metrics derive from integer confusion counts, so Spark and any SQL
  * oracle agree bit-exactly after identical division. The declared queries
  * build (label, prediction) from a deterministic rule (status flag ×
  * median-price threshold) so the whole path is SQL-checkable; model-backed
  * predictions flow through the same functions in [[graft.ml]].
  */
object Metrics {

  /** Attach binary label + rule-based prediction to orders: y = (status='F'),
    * yhat = price > global median. */
  def labeledOrders(orders: DataFrame): DataFrame = {
    val med = orders.agg(expr("percentile(o_totalprice, 0.5)").as("med"))
    orders.crossJoin(broadcast(med))
      .select(
        when(col("o_orderstatus") === "F", 1).otherwise(0).as("y"),
        when(col("o_totalprice") > col("med"), 1).otherwise(0).as("yhat"),
        col("o_totalprice"), col("o_orderkey"))
  }

  /** M16 — confusion matrix as grouped counts. */
  def confusionMatrix(labeled: DataFrame): DataFrame =
    labeled.groupBy(col("y"), col("yhat"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("y"), col("yhat"))

  private def safeDiv(n: Column, d: Column): Column =
    when(d === 0.0, 0.0).otherwise(n / d)

  /** M15 — accuracy / precision / recall / f1 from confusion counts
    * (sklearn `zero_division=0`). One wide row; divisions are exact given
    * identical integer counts, rounded portably. */
  def binaryMetrics(labeled: DataFrame): DataFrame = {
    val counts = labeled.agg(
      sum(when(col("y") === 1 && col("yhat") === 1, 1L).otherwise(0L)).as("tp"),
      sum(when(col("y") === 0 && col("yhat") === 1, 1L).otherwise(0L)).as("fp"),
      sum(when(col("y") === 0 && col("yhat") === 0, 1L).otherwise(0L)).as("tn"),
      sum(when(col("y") === 1 && col("yhat") === 0, 1L).otherwise(0L)).as("fn"))
    val tp = col("tp").cast("double"); val fp = col("fp").cast("double")
    val tn = col("tn").cast("double"); val fn = col("fn").cast("double")
    counts.select(
      col("tp"), col("fp"), col("tn"), col("fn"),
      Features.pround(safeDiv(tp + tn, tp + fp + tn + fn), 6).as("accuracy"),
      Features.pround(safeDiv(tp, tp + fp), 6).as("precision"),
      Features.pround(safeDiv(tp, tp + fn), 6).as("recall"),
      Features.pround(safeDiv(tp * 2.0, tp * 2.0 + fp + fn), 6).as("f1"))
  }

  /** M15 — ROC-AUC as the Mann-Whitney rank statistic:
    * (Σ rank⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻), ranks by (score, key) so ties are
    * deterministically broken identically in any engine.
    *
    * Scale note: the global rank is a single-partition window — fine for
    * the oracle path; at 100 TB use [[grouped AUC via
    * BinaryClassificationEvaluator]] or a binned approximation (the library
    * ML path does). */
  def aucRank(labeled: DataFrame): DataFrame = {
    val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
    val ranked = labeled.select(col("y"),
      row_number().over(w).cast("long").as("rn"))
    ranked.agg(
      sum(col("y").cast("long")).as("n1"),
      count(lit(1)).as("n"),
      sum(when(col("y") === 1, col("rn")).otherwise(0L)).as("sum_rank"))
      .select(Features.pround(
        (col("sum_rank").cast("double") - col("n1").cast("double") * (col("n1").cast("double") + 1.0) / 2.0)
          / (col("n1").cast("double") * (col("n").cast("double") - col("n1").cast("double"))), 6).as("auc"))
  }

  /** Exact AUC without a global window — the 100 TB path. Range-repartition
    * by (score, key), sort within partitions, compute each partition's
    * local positive-rank sum plus its row count, then combine on the driver
    * with cumulative offsets: a positive at local rank r in partition p has
    * global rank r + Σ_{q<p} n_q. Two passes, no single-partition stage;
    * bit-identical to the windowed [[aucRank]] (asserted in tests). */
  def aucDistributed(labeled: DataFrame, partitions: Int = 32): Double = {
    import org.apache.spark.sql.Row
    val sorted = labeled.select(col("y"), col("o_totalprice"), col("o_orderkey"))
      .repartitionByRange(partitions, col("o_totalprice"), col("o_orderkey"))
      .sortWithinPartitions(col("o_totalprice"), col("o_orderkey"))
    val perPart: Array[(Int, Long, Long, Long)] = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var n = 0L; var nPos = 0L; var localRankSum = 0L
        it.foreach { r: Row =>
          n += 1
          if (r.getInt(0) == 1) { nPos += 1; localRankSum += n }
        }
        Iterator.single((pid, n, nPos, localRankSum))
      }.collect().sortBy(_._1)
    var offset = 0L; var rankSum = 0.0; var n1 = 0.0; var n = 0.0
    perPart.foreach { case (_, cnt, nPos, localSum) =>
      rankSum += localSum + offset.toDouble * nPos
      n1 += nPos; n += cnt; offset += cnt
    }
    if (n1 == 0.0 || n1 == n) 0.0
    else (rankSum - n1 * (n1 + 1.0) / 2.0) / (n1 * (n - n1))
  }

  /** M17 — champion selection (`evaluation.py:139-166`): per-"model" (here:
    * market segment of the ordering customer) f1, filter by threshold,
    * argmax with deterministic tie-break. */
  def championBySegment(orders: DataFrame, customer: DataFrame, minF1: Double): DataFrame = {
    val med = orders.agg(expr("percentile(o_totalprice, 0.5)").as("med"))
    // med is a 1-row relation → broadcast; customer scales with SF → no
    // hint, AQE chooses (forced broadcast would OOM the driver at 100×)
    val labeled = orders.crossJoin(broadcast(med))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("model"),
        when(col("o_orderstatus") === "F", 1).otherwise(0).as("y"),
        when(col("o_totalprice") > col("med"), 1).otherwise(0).as("yhat"))
    val perModel = labeled.groupBy(col("model")).agg(
      sum(when(col("y") === 1 && col("yhat") === 1, 1L).otherwise(0L)).as("tp"),
      sum(when(col("y") === 0 && col("yhat") === 1, 1L).otherwise(0L)).as("fp"),
      sum(when(col("y") === 1 && col("yhat") === 0, 1L).otherwise(0L)).as("fn"))
    val tp = col("tp").cast("double")
    perModel
      .select(col("model"), Features.pround(
        when(tp * 2.0 + col("fp") + col("fn") === 0.0, 0.0)
          .otherwise(tp * 2.0 / (tp * 2.0 + col("fp").cast("double") + col("fn").cast("double"))), 6).as("f1"))
      .filter(col("f1") >= minF1)
      .orderBy(col("f1").desc, col("model"))
      .limit(1)
  }
}
