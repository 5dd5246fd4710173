package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftExtensions, SparkEntry, Tables}

/** Per-query driver-floor breakdown (r21 verdict item 4): for the
  * sub-0.5 s tail (~80 queries ≈ 19 s of the bench) the cost is NOT the
  * data — it is per-query plan construction + scheduling. This probe
  * splits one query's wall into:
  *   - `load`: Tables loader construction (spark.read.parquet → schema
  *     inference → normalize projections), no action;
  *   - `build`: the full declared-query DataFrame construction
  *     (analysis of the whole operator chain);
  *   - `exec`: the `.count()` action.
  * plus a bare `spark.read.parquet(path)` timing per table, to size the
  * footer-read/schema-inference share. Reps in one warm JVM; read the
  * min. Usage: `runMain graft.tools.FloorProbe <q,...> [sfDir] [reps]`. */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
    // bare parquet-read construction per table: schema inference cost
    Tables.names.foreach { t =>
      val p = s"$sfDir/$t.parquet"
      if (new java.io.File(p).exists()) {
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          spark.read.parquet(p)
          (System.nanoTime() - t0) / 1e6
        }
        println(f"[floor] read.parquet($t%-10s) min=${times.min}%7.1f ms  med=${times.sorted.apply(reps / 2)}%7.1f ms")
        val cachedTimes = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          Tables.load(spark, sfDir, t)
          (System.nanoTime() - t0) / 1e6
        }
        println(f"[floor] Tables.load ($t%-10s) min=${cachedTimes.min}%7.1f ms  med=${cachedTimes.sorted.apply(reps / 2)}%7.1f ms")
      }
    }
    (1 to reps).foreach { i =>
      names.foreach { qn =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(qn)(spark, sfDir)
        val t1 = System.nanoTime()
        val n = df.count()
        val t2 = System.nanoTime()
        println(f"[floor] $qn%-28s rep $i: build=${(t1 - t0) / 1e6}%7.1f ms exec=${(t2 - t1) / 1e6}%7.1f ms rows=$n")
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
    }
    spark.stop()
  }
}
