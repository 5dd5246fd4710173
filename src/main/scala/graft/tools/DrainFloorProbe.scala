package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the engine-fixed floor of ONE AvailableNow memory-sink drain
  * (r21 verdict item 3): after the r20 no-data-batch clamp and the r21
  * tmpfs checkpoint, what remains of the five declared drains'
  * ~0.8–1.5 s each is stream start/stop machinery — micro-batch
  * planning, offset/commit WAL, state-store provider init × width, sink
  * table build, query termination. This probe times, in one warm JVM:
  *
  *  1. `stateless`: a projection-only append drain of a tiny one-file
  *     parquet stream (NO stateful operator — no state stores at all);
  *  2. `stateful`: the same stream through a complete-mode count
  *     aggregate at the drain width (8) — one state-store provider per
  *     partition.
  *
  * The stateless figure is the irreducible per-drain floor of the
  * engine's AvailableNow machinery on this host; the stateful delta is
  * the state-store round. Both use the production drain shape (session
  * clone, width clamp, noDataMicroBatches off, tmpfs checkpoint) via the
  * same conf settings SparkEntry.drainToBatch applies.
  * Usage: `runMain graft.tools.DrainFloorProbe [reps]`. */
object DrainFloorProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.lift(0).flatMap(_.toIntOption).getOrElse(6)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // tiny fixture: one parquet file, 100 rows
    val dir = java.nio.file.Files.createTempDirectory("drainfloor").toFile
    val src = new java.io.File(dir, "tiny.parquet").getAbsolutePath
    spark.range(100).select(col("id"), (col("id") % 7).as("k"))
      .coalesce(1).write.mode("overwrite").parquet(src)
    val hp = new org.apache.hadoop.fs.Path(src)
    val glob = new org.apache.hadoop.fs.Path(hp.getParent, "{" + hp.getName + "}").toString
    var n = 0
    def drain(stateful: Boolean): Double = {
      val t0 = System.nanoTime()
      val s = spark.newSession()
      s.conf.set("spark.sql.shuffle.partitions", "8")
      s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      val base = s.readStream.schema(spark.read.parquet(src).schema)
        .option("basePath", hp.getParent.toString).parquet(glob)
      val df = if (stateful) base.groupBy(col("k")).count()
               else base.select(col("id"), (col("id") * 2).as("v"))
      n += 1
      val sink = s"floor_$n"
      val ckpt = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "drainfloor").toFile
      val q = df.writeStream.format("memory").queryName(sink)
        .outputMode(if (stateful) "complete" else "append")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      val rows = s.table(sink).count()
      s.catalog.dropTempView(sink)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(ckpt)
      assert(rows == (if (stateful) 7 else 100), s"rows=$rows")
      (System.nanoTime() - t0) / 1e9
    }
    (1 to reps).foreach { i =>
      val a = drain(stateful = false)
      val b = drain(stateful = true)
      println(f"[drainfloor] rep $i: stateless=$a%.3f s  stateful(w=8,complete)=$b%.3f s")
    }
    spark.stop()
  }
}
