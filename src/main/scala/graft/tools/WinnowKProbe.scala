package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftExtensions
import graft.operators.Corpus

/** Dev-only sweep: d47's winnowed pipeline at several (char-k, w)
  * granularities vs the exact d43 answer on the same SF dir, printing
  * packed-row counts and winner-set overlap. Usage:
  * `sbt "runMain graft.tools.WinnowKProbe [sfDir] [amp10x]"` — the
  * optional `amp10x` flag clones every doc 10× with distinct tails (the
  * ScaleProbe dup-dense shape) to surface the density-dependent costs
  * the fixture scale hides. */
object WinnowKProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val amp = args.contains("amp10x")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
    val docs0 = graft.Tables.documents(spark, sfDir)
    val docs = if (!amp) docs0 else docs0
      .withColumn("__i", explode(array((0 until 10).map(lit): _*)))
      .withColumn("doc_id", col("doc_id") * lit(16L) + col("__i"))
      .withColumn("text", when(col("__i") === 0, col("text"))
        .otherwise(concat(col("text"), lit(" dup"), col("__i").cast("string"))))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("__i")
      .localCheckpoint(true)
    val rates = Map("src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.1)
    def winners(rows: Array[org.apache.spark.sql.Row]): Set[Long] =
      rows.flatMap(_.getAs[String]("chunk_ids").split(","))
        .map(_.split(":")(0).toLong).toSet
    // snapshot AFTER the docs materialization: hygiene must never drop the
    // amplified base relation's own checkpoint blocks (rdd ids of a
    // checkpointed DataFrame differ per .rdd call — match by the set of
    // pre-existing ids, not identity)
    val baseRddIds = spark.sparkContext.getPersistentRDDs.keySet
    def hygiene(): Unit = {
      Corpus.releaseStages(spark)
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => baseRddIds.contains(id) }
        .values.foreach(_.unpersist(blocking = false))
    }
    val tE0 = System.nanoTime()
    val exact = Corpus.trainingSequences(docs, rates, minShared = 1).collect()
    val tE1 = System.nanoTime()
    hygiene()
    val exactW = winners(exact)
    println(f"[kprobe] d43 exact: rows=${exact.length} winners=${exactW.size} " +
      f"t=${(tE1 - tE0) / 1e9}%.1f s")
    val combos =
      if (amp) Seq((60, 4), (60, 9), (60, 19))
      else Seq((8, 4), (20, 4), (40, 4), (60, 4), (60, 9), (60, 14), (60, 19))
    for ((k, ww) <- combos; ms <- Seq(2)) {
      val t0 = System.nanoTime()
      val res = Corpus.trainingSequencesWinnowed(docs, rates,
        minShared = ms, k = k, w = ww).collect()
      val w = winners(res)
      val t1 = System.nanoTime()
      hygiene()
      println(f"[kprobe] k=$k%2d w=$ww%2d minShared=$ms rows=${res.length}%4d " +
        f"winners=${w.size}%5d overlap=${(w & exactW).size}%5d " +
        f"onlyWin=${(w -- exactW).size}%5d onlyExact=${(exactW -- w).size}%5d " +
        f"t=${(t1 - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
