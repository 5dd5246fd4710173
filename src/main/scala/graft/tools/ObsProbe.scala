package graft.tools

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe: does a Dataset.localCheckpoint(eager = true) fire the
  * QueryExecutionListener that completes an Observation? If yes, the CC
  * loop's per-round changed-count job can ride the materialization job. */
object ObsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (1 to 1000).toDF("x")
      .withColumn("flag", col("x") % 7 === 0)
    val obs = Observation("probe")
    val ck = df.observe(obs, sum(when(col("flag"), 1L).otherwise(0L)).as("n"))
      .localCheckpoint(true)
    // get() blocks until a QueryExecutionListener completes the
    // observation; a timed wait distinguishes "fired during the eager
    // checkpoint" from "needs a later Dataset action"
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val got = scala.util.Try(Await.result(Future(obs.get), 5.seconds))
    println(s"[obsprobe] after localCheckpoint(true): get = $got")
    println(s"[obsprobe] checkpoint rows = ${ck.count()} (expect 1000; true flag count = ${1000 / 7})")
    // also probe a persist+count materialization (the 'disk' strategy)
    val obs2 = Observation("probe2")
    val p = df.observe(obs2, sum(when(col("flag"), 1L).otherwise(0L)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    p.count()
    val got2 = scala.util.Try(Await.result(Future(obs2.get), 5.seconds))
    println(s"[obsprobe] after persist+count: get = $got2")
    p.unpersist()
    // listener-free route (what the engine actually uses — see
    // connectedComponents): observe(name, ...) creates only a
    // CollectMetrics plan node (NO ObservationManager registration, which
    // matters: the manager is session-state that breaks closures
    // capturing the session once initialized — e.g. Spark ML training
    // summaries — and the listener route also waits on the async bus).
    // localCheckpoint(eager) executes the dataset's OWN QueryExecution,
    // so the metrics are readable synchronously from its accumulators.
    val od = df.observe("probe3", sum(when(col("flag"), 1L).otherwise(0L)).as("n"))
    od.localCheckpoint(true)
    println(s"[obsprobe] qe.observedMetrics after localCheckpoint(true): " +
      s"${od.queryExecution.observedMetrics}")
    // contrast: persist+count runs the COUNT's execution, not the
    // dataset's own — the original qe stays empty (why the disk-strategy
    // loop keeps its count job)
    val od2 = df.observe("probe4", sum(when(col("flag"), 1L).otherwise(0L)).as("n"))
    val p2 = od2.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    p2.count()
    println(s"[obsprobe] qe.observedMetrics after persist+count: " +
      s"${od2.queryExecution.observedMetrics}")
    p2.unpersist()
    spark.stop()
  }
}
