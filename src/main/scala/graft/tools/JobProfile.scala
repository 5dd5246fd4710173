package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.{GraftExtensions, SparkEntry}

/** Per-JOB wall-clock breakdown for one declared query — the measurement
  * tool for multi-job pipelines (eager stage materializations, driver
  * loops, streaming drains), where a single total hides which job eats
  * the time. Guide §1: decide whether time goes to shuffle, compute or
  * scheduling BEFORE changing anything.
  *
  * Usage: `runMain graft.tools.JobProfile <query>[,<query>...] [sfDir]
  * [reps]` — reps default 3; per-rep job table printed, plus stage-level
  * shuffle bytes. First rep is cold (codegen/JIT); read the later reps.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)

    final case class JobRec(id: Int, desc: String, start: Long,
                            var end: Long = -1L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val stageShuffle = new java.util.concurrent.atomic.AtomicLong(0L)
    val stageTasks = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val d = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(js.jobId, JobRec(js.jobId, d.take(90), js.time))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach(_.end = je.time)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stageShuffle.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        stageTasks.addAndGet(sc.stageInfo.numTasks.toLong)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    (1 to reps).foreach { rep =>
      names.foreach { qn =>
        jobs.clear(); stageShuffle.set(0L); stageTasks.set(0L)
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(qn)(spark, sfDir)
        val tPlan = System.nanoTime()
        val n = df.count()
        val t1 = System.nanoTime()
        Thread.sleep(200) // let the listener bus drain (private API in 4.x)
        val recs = {
          import scala.jdk.CollectionConverters._
          jobs.values.asScala.toSeq.sortBy(_.id)
        }
        println(f"[jobprofile] $qn rep $rep: build=${(tPlan - t0) / 1e9}%.3f s " +
          f"exec=${(t1 - tPlan) / 1e9}%.3f s rows=$n jobs=${recs.size} " +
          f"tasks=${stageTasks.get()} shufWriteMB=${stageShuffle.get() / 1e6}%.1f")
        recs.foreach { r =>
          val dur = if (r.end >= 0) (r.end - r.start) / 1e3 else -1.0
          println(f"[jobprofile]   job ${r.id}%3d ${dur}%8.3f s  ${r.desc}")
        }
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
    }
    spark.stop()
  }
}
