package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The data-quality entry point — the engine-side analog of the reference's
  * second DAG (`data_quality_dag.py:27-65`, daily drift check): profile the
  * current table, compare against a stored baseline profile, emit warnings.
  * Scheduling stays out-of-engine (SURVEY.md §3.2); this is the computation
  * a cron/Airflow task invokes. */
object QualityCheck {

  final case class Drift(column: String, baselineMean: Double, currentMean: Double,
                         relShift: Double, warned: Boolean)

  /** Wide 1-row profile (mean/std/nullfrac per column + row count). */
  def profile(df: DataFrame, numericCols: Seq[String]): Map[String, Double] = {
    val aggs = numericCols.flatMap(c => Seq(
      avg(col(c)).as(s"mean_$c"), stddev_samp(col(c)).as(s"std_$c"),
      avg(col(c).isNull.cast("double")).as(s"nullfrac_$c"))) :+
      count(lit(1)).cast("double").as("n_rows")
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    row.schema.fieldNames.map(f => f -> row.getAs[Double](f)).toMap
  }

  /** Compare a fresh profile to a baseline: a column drifts when its mean
    * moved more than `relThreshold` relative to the baseline std (the
    * reference warns on imbalance shifts; same shape). */
  def compare(baseline: Map[String, Double], current: Map[String, Double],
              numericCols: Seq[String], relThreshold: Double = 3.0): Seq[Drift] =
    numericCols.map { c =>
      val bMean = baseline(s"mean_$c"); val cMean = current(s"mean_$c")
      val bStd = math.max(baseline(s"std_$c"), 1e-12)
      val shift = math.abs(cMean - bMean) / bStd
      Drift(c, bMean, cMean, shift, shift > relThreshold)
    }

  /** End-to-end check used by the runner/test: baseline from one dataset,
    * current from another, warnings out. */
  def run(baselineDf: DataFrame, currentDf: DataFrame,
          numericCols: Seq[String]): Seq[Drift] =
    compare(profile(baselineDf, numericCols), profile(currentDf, numericCols),
      numericCols)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // baseline = seed 42 generation; "today's data" = a drifted generation
    val numeric = Seq("tenure", "monthly_charges", "total_charges",
      "num_support_tickets", "avg_monthly_usage_gb")
    val baseline = DataGen.generate(spark, 5000, 42L)
    val current = DataGen.generate(spark, 5000, 43L)
    val drifts = run(baseline, current, numeric)
    val json = drifts.map(d =>
      s"""{"column": "${d.column}", "rel_shift": ${d.relShift}, "warned": ${d.warned}}""")
      .mkString("[", ", ", "]")
    println(s"""{"drift_check": $json}""")
    spark.stop()
  }
}
