package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftExtensions, SparkEntry}

/** Dev-only single-query timing probe: runs one declared query (or a
  * comma-separated subsequence, replayed in one session) N times against
  * an SF dir and prints each wall time plus the formatted plan on
  * request. Usage:
  * `sbt "runMain graft.tools.QueryProbe <name[,name2,...]> [sfDir] [reps] [explain]"`.
  * Exists because Bench times the whole 113-query catalog — attributing a
  * regression to one query needs an isolated re-run on an otherwise idle
  * JVM. Session confs mirror Bench's shape and honor the same
  * `SPARK_GRAFT_CPUS` env var (set it to the bench run's value — the
  * driver uses 32 — or a probe under different parallelism will
  * mis-attribute parallelism-sensitive timings). */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    // tolerant parse: `... sf0.1 explain` (no reps) must not crash
    val reps = args.lift(2).flatMap(_.toIntOption).getOrElse(3)
    val explain = args.contains("explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
    // comma-separated names: replays a bench subsequence in ONE session,
    // for interactions a single-query run can't reproduce
    val qnames = name.split(',').toSeq
    (1 to reps).foreach { i =>
      qnames.foreach { qn =>
        val fn = SparkEntry.queries(qn)
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tPlan = System.nanoTime()
        val n = df.count()
        val t1 = System.nanoTime()
        println(f"[probe] $qn rep $i: build=${(tPlan - t0) / 1e9}%.3f s " +
          f"exec=${(t1 - tPlan) / 1e9}%.3f s rows=$n")
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
    }
    if (explain)
      println(SparkEntry.queries(qnames.last)(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.SimpleMode))
    spark.stop()
  }
}
