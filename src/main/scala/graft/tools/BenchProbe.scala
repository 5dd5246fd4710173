package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{GraftExtensions, SparkEntry}

/** Diagnostic for the round-2 bench regression: times a set of light
  * queries (f2/x16/x10/m1/x22) in a fresh session, then re-times them after
  * the checkpoint-heavy queries (d15/d17/d28/d22/x17) have run, printing
  * the block-manager storage footprint at each step. Confirms or refutes
  * the "eager localCheckpoint blocks accumulate across a one-JVM bench
  * session and tax later queries" hypothesis before Bench.scala changes.
  */
object BenchProbe {
  private val light = Seq("f2_bucket_counts", "x16_moving_avg",
    "x10_pricing_summary", "m1_standard_scale", "x22_urgent_customers")
  private val heavy = Seq("d15_minhash_neardups", "d17_simhash_neardups",
    "d28_winnow_neardups", "d22_ivf_topk", "x17_price_quartiles")

  private def time(spark: SparkSession, sfDir: String, name: String): Double = {
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir).count()
    (System.nanoTime() - t0) / 1e9
  }

  private def storage(spark: SparkSession): String = {
    val rdds = spark.sparkContext.getPersistentRDDs
    val mem = spark.sparkContext.getExecutorMemoryStatus.values
      .map { case (max, free) => max - free }.sum
    s"persistentRDDs=${rdds.size} usedStorageBytes=$mem"
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC") // normalizeTs/Date contract
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    // warmup (same as Bench)
    SparkEntry.queries("x1_revenue_by_nation")(spark, sfDir).count()
    SparkEntry.queries("f8_sigmoid")(spark, sfDir).count()

    println(s"[probe] phase1 fresh: ${storage(spark)}")
    val fresh = light.map(q => q -> time(spark, sfDir, q))
    fresh.foreach { case (q, s) => println(f"[probe] fresh $q%-22s $s%.3f s") }

    heavy.foreach { q =>
      val s = time(spark, sfDir, q)
      println(f"[probe] heavy $q%-22s $s%.3f s  ${storage(spark)}")
    }

    println(s"[probe] phase2 after-heavy: ${storage(spark)}")
    val after = light.map(q => q -> time(spark, sfDir, q))
    after.foreach { case (q, s) => println(f"[probe] after $q%-22s $s%.3f s") }

    // phase 3: free persistent blocks, re-time
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    System.gc()
    println(s"[probe] phase3 after-unpersist: ${storage(spark)}")
    val cleaned = light.map(q => q -> time(spark, sfDir, q))
    cleaned.foreach { case (q, s) => println(f"[probe] clean $q%-22s $s%.3f s") }

    val f = fresh.map(_._2).sum; val a = after.map(_._2).sum; val c = cleaned.map(_._2).sum
    println(f"[probe] totals fresh=$f%.2f after=$a%.2f clean=$c%.2f ratio_after=${a / f}%.2f ratio_clean=${c / f}%.2f")
    spark.stop()
  }
}
