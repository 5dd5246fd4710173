package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{GraftExtensions, Tables}
import graft.operators.Similarity

/** One-off measurement harness for the IVFADC `by_residual` decision:
  * mean/max relative ADC distance error and exact-top-1 recall of the
  * raw-vector and residual-coded IVF-PQ paths at the declared d66
  * parameters, on the real fixture corpora. Numbers recorded in the
  * DedupSimilaritySpec residual test and SURVEY §2.8. */
object ResidualProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = Tables.embeddings(spark, sf)
      val vecs = emb.collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
      def l2(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0; var j = 0
        while (j < a.length) { val t = a(j) - b(j); d += t * t; j += 1 }
        d
      }
      val exactTop1 = (0L until 20L).map { q =>
        q -> vecs.iterator.filter(_._1 != q)
          .minBy { case (id, v) => (l2(vecs(q), v), id) }._1
      }.toMap
      for ((label, byRes, nProbe) <- Seq(
          ("raw_p4", false, 4), ("res_p4", true, 4),
          ("raw_p16", false, 16), ("res_p16", true, 16))) {
        val res = Similarity.ivfPqTopK(emb, 64, 20, 5,
          nProbe = nProbe, byResidual = byRes).collect()
        val errs = res.map { r =>
          val e = l2(vecs(r.getAs[Long]("query_id")), vecs(r.getAs[Long]("nbr_id")))
          math.abs(r.getAs[Double]("adc_dist") - e) / e
        }
        val byQ = res.groupBy(_.getAs[Long]("query_id"))
          .map { case (q, rs) => q -> rs.map(_.getAs[Long]("nbr_id")).toSet }
        val hits = exactTop1.count { case (q, n) =>
          byQ.getOrElse(q, Set.empty).contains(n) }
        println(f"[residual] $sf%-26s $label%-8s meanErr=${errs.sum / errs.length}%.4f " +
          f"maxErr=${errs.max}%.4f recall@5(top1)=$hits/${exactTop1.size} rows=${res.length}")
      }
    }
    spark.stop()
  }
}
