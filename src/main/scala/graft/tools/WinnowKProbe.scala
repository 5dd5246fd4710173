package graft.tools

import org.apache.spark.sql.SparkSession

import graft.GraftExtensions
import graft.operators.Corpus

/** Dev-only sweep: d47's winnowed pipeline at several char-k
  * granularities vs the exact d43 answer on the same SF dir, printing
  * packed-row counts and winner-set overlap. Usage:
  * `sbt "runMain graft.tools.WinnowKProbe [sfDir]"`. */
object WinnowKProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
    val docs = graft.Tables.documents(spark, sfDir)
    val rates = Map("src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.1)
    def winners(rows: Array[org.apache.spark.sql.Row]): Set[Long] =
      rows.flatMap(_.getAs[String]("chunk_ids").split(","))
        .map(_.split(":")(0).toLong).toSet
    val exact = Corpus.trainingSequences(docs, rates, minShared = 1).collect()
    val exactW = winners(exact)
    println(s"[kprobe] d43 exact: rows=${exact.length} winners=${exactW.size}")
    for (k <- Seq(8, 20, 40, 60); ms <- Seq(1, 2)) {
      val t0 = System.nanoTime()
      val res = Corpus.trainingSequencesWinnowed(docs, rates,
        minShared = ms, k = k).collect()
      val w = winners(res)
      val t1 = System.nanoTime()
      println(f"[kprobe] k=$k%2d minShared=$ms rows=${res.length}%4d " +
        f"winners=${w.size}%5d overlap=${(w & exactW).size}%5d " +
        f"onlyWin=${(w -- exactW).size}%5d onlyExact=${(exactW -- w).size}%5d " +
        f"t=${(t1 - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
