package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S8 — distributed synthetic churn-data generator, reproducing the
  * reference's distributions (`data_ingestion.py:12-109`) with seeded Spark
  * column expressions. Bit-exact NumPy stream equality is impossible across
  * engines; parity is distributional and asserted by the validation gates
  * V1–V8 (same contract as the reference's own tests,
  * `test_data_ingestion.py:33-47`).
  *
  * Scale: `spark.range(n)` partitions the id space; every draw is a
  * codegen'd expression over per-row `rand(seed)` streams — no driver-side
  * data, no UDFs (Poisson uses an inverse-CDF `when` chain). Generating
  * 10¹¹ rows is the same plan with more partitions.
  */
object DataGen {

  /** Inverse-CDF Poisson(lambda) from a uniform column — chained `when` on
    * precomputed cumulative probabilities (exact to k=20). */
  private def poissonFromUniform(u: org.apache.spark.sql.Column, lambda: Double) = {
    val probs = Iterator.iterate((0, math.exp(-lambda))) { case (k, p) =>
      (k + 1, p * lambda / (k + 1)) }.take(21).toSeq
    val cdf = probs.scanLeft(0.0)(_ + _._2).drop(1)
    cdf.zipWithIndex.drop(1).foldLeft(when(u < cdf.head, 0)) {
      case (acc, (c, k)) => acc.when(u < c, k)
    }.otherwise(21)
  }

  private def expFromUniform(u: org.apache.spark.sql.Column, scale: Double) =
    -lit(scale) * log(lit(1.0) - u)

  /** Generate n rows of the 9-column churn table (schema of
    * `data_ingestion.py:90-102`).
    *
    * RNG caveat baked in here: a Spark `Rand` expression instance advances
    * its stream per *evaluation*, so the same `rand(seed)` appearing in two
    * lazily-evaluated `CASE` branches desynchronizes. Every draw is
    * therefore materialized exactly once as a column before any branching
    * references it. */
  def generate(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    // materialize all uniform/normal draws first — one evaluation each
    val drawn = (1 to 7).foldLeft(spark.range(n).toDF()) { (d, i) =>
      d.withColumn(s"__u$i", rand(seed + i))
    }
    val df0 = (1 to 5).foldLeft(drawn) { (d, i) =>
      d.withColumn(s"__g$i", randn(seed + 100 + i))
    }
    def u(i: Int) = col(s"__u$i")
    def g(i: Int) = col(s"__g$i")

    val df = df0
      .withColumn("tenure",
        least(greatest(expFromUniform(u(1), 24.0), lit(1.0)), lit(72.0)).cast("int"))
      .withColumn("contract_type", when(u(2) < 0.50, "month-to-month")
        .when(u(2) < 0.80, "one-year").otherwise("two-year"))
      .withColumn("payment_method", when(u(3) < 0.35, "electronic_check")
        .when(u(3) < 0.55, "mailed_check")
        .when(u(3) < 0.80, "bank_transfer").otherwise("credit_card"))
      .withColumn("internet_service", when(u(4) < 0.45, "fiber_optic")
        .when(u(4) < 0.80, "dsl").otherwise("none"))
      .withColumn("monthly_charges",
        round(least(greatest(
          when(col("internet_service") === "fiber_optic", g(1) * 15.0 + 80.0)
            .when(col("internet_service") === "dsl", g(2) * 10.0 + 55.0)
            .otherwise(g(3) * 5.0 + 25.0), lit(18.0)), lit(120.0)), 2))
      .withColumn("total_charges",
        greatest(round(col("monthly_charges") * col("tenure") + g(4) * 50.0, 2), lit(0.0)))
      .withColumn("num_support_tickets", poissonFromUniform(u(5), 1.5))
      .withColumn("avg_monthly_usage_gb",
        when(col("internet_service") === "none", 0.0)
          .otherwise(round(least(greatest(expFromUniform(u(6), 15.0), lit(0.5)), lit(100.0)), 2)))
    // churn label model — logit coefficients from data_ingestion.py:76-88
    val logit = lit(-1.5) +
      when(col("contract_type") === "month-to-month", 0.8).otherwise(0.0) -
      when(col("contract_type") === "two-year", 0.5).otherwise(0.0) +
      when(col("payment_method") === "electronic_check", 0.4).otherwise(0.0) -
      col("tenure") * 0.02 + col("monthly_charges") * 0.01 +
      col("num_support_tickets") * 0.15 - col("avg_monthly_usage_gb") * 0.01 +
      g(5) * 0.3
    df.withColumn("churn",
        (u(7) < (lit(1.0) / (lit(1.0) + exp(-logit)))).cast("int"))
      .drop("id")
      .drop((1 to 7).map(i => s"__u$i") ++ (1 to 5).map(i => s"__g$i"): _*)
  }

  /** `validate_data` port (`data_ingestion.py:112-166`): every gate as an
    * aggregate; throws IllegalStateException naming the failed check
    * (reference raises ValueError with the check name). */
  def validate(df: DataFrame): Unit = {
    val cols = Seq("tenure", "contract_type", "payment_method", "internet_service",
      "monthly_charges", "total_charges", "num_support_tickets",
      "avg_monthly_usage_gb", "churn")
    val missing = cols.toSet -- df.columns.toSet
    require(missing.isEmpty, s"schema_check failed: missing $missing")
    val agg = df.agg(
      cols.map(c => count(when(col(c).isNull, 1))).reduce(_ + _).as("nulls"),
      count(lit(1)).as("n"),
      min("tenure").as("min_tenure"), max("tenure").as("max_tenure"),
      min("monthly_charges").as("min_mc"),
      avg("churn").as("churn_rate"),
      min("churn").as("min_churn"), max("churn").as("max_churn")).collect()(0)
    def fail(name: String) = throw new IllegalStateException(s"$name failed")
    if (agg.getAs[Long]("nulls") != 0L) fail("null_check")
    if (agg.getAs[Long]("n") < 100L) fail("min_rows")
    if (agg.getAs[Int]("min_tenure") < 0 || agg.getAs[Int]("max_tenure") > 100) fail("tenure_range")
    if (agg.getAs[Double]("min_mc") < 0) fail("charges_positive")
    val rate = agg.getAs[Double]("churn_rate")
    if (rate <= 0.05 || rate >= 0.95) fail("class_balance")
    // domain ⊆ {0,1} ⟺ min ≥ 0 ∧ max ≤ 1 for an int column — answered by
    // the ONE aggregate above (the previous distinct().collect() re-scanned
    // the whole table and shuffled, a second full job per validation)
    if (agg.getAs[Int]("min_churn") < 0 || agg.getAs[Int]("max_churn") > 1)
      fail("churn_domain")
  }
}
