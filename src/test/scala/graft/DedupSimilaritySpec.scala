package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

class DedupSimilaritySpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}
  import spark.implicits._

  private def docs = Tables.documents(spark, sfDir)
  private def emb = Tables.embeddings(spark, sfDir)

  private val synth = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again today"),
    (1L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near-dup of 0
    (2L, "completely different content about database engines and query planners"),
    (3L, "the quick brown fox jumps over the lazy dog again and again today")   // exact dup of 0
  ).toDF("doc_id", "text")

  test("D2 minhash: finds the exact and near duplicate, not the distinct doc") {
    val pairs = Dedup.minhashNearDups(synth, 0.5, w = 3, bands = 16, rowsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L)))   // exact dup — jaccard 1.0
    assert(pairs.contains((0L, 1L)))   // near dup — one word differs
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("D2 minhash: exact dup pair has jaccard 1.0") {
    val j = Dedup.minhashNearDups(synth, 0.5).filter(col("id_a") === 0 && col("id_b") === 3)
      .collect()(0).getAs[Double]("jaccard")
    assert(j == 1.0)
  }

  test("simhash: identical texts share signature; near-dups within hamming 8") {
    val sigs = Dedup.simhash(synth).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(0L) == sigs(3L))
    assert(java.lang.Long.bitCount(sigs(0L) ^ sigs(1L)) <= 8)
    assert(java.lang.Long.bitCount(sigs(0L) ^ sigs(2L)) > 8)
  }

  test("D4 brute force: sims bounded, no self-pairs, ranks contiguous") {
    val res = Similarity.bruteForceTopK(emb, 5, 3).collect()
    assert(res.forall(r => r.getAs[Double]("cos_sim") >= -1.0001 && r.getAs[Double]("cos_sim") <= 1.0001))
    assert(res.forall(r => r.getAs[Long]("nbr_id") != r.getAs[Long]("query_id")))
    val ranks = res.groupBy(_.getAs[Long]("query_id")).values
    assert(ranks.forall(_.map(_.getAs[Long]("rank")).sorted.toSeq == Seq(1L, 2L, 3L)))
  }

  test("D4 LSH: bucketed results are a subset of the full candidate space and self-consistent") {
    val lsh = Similarity.lshTopK(emb, 64, 5, 3, nPlanes = 4)
    val res = lsh.collect()
    // identical vector always lands in its own bucket → every query with
    // any bucket-mate gets results; sims must match brute-force values
    val bf = Similarity.bruteForceTopK(emb, 5, 50).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id")) -> r.getAs[Double]("cos_sim")).toMap
    res.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id"))
      bf.get(key).foreach(v => assert(v == r.getAs[Double]("cos_sim")))
    }
  }

  test("D4 LSH recall: top-1 neighbor recovered for most queries at 4 planes") {
    val bf1 = Similarity.bruteForceTopK(emb, 20, 1).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("nbr_id")).toMap
    val lsh = Similarity.lshTopK(emb, 64, 20, 5, nPlanes = 4).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("nbr_id")).toSet }
    val hits = bf1.count { case (q, n) => lsh.getOrElse(q, Set.empty).contains(n) }
    assert(hits >= bf1.size / 2, s"LSH recall too low: $hits/${bf1.size}")
  }

  test("D4 IVF: sims match brute force; recall reasonable with 4/16 probes") {
    val ivf = Similarity.ivfTopK(emb, 20, 5, nLists = 16, nProbe = 4).collect()
    val bf = Similarity.bruteForceTopK(emb, 20, 50).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id")) -> r.getAs[Double]("cos_sim")).toMap
    // any pair IVF returns must carry the exact brute-force similarity
    ivf.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id"))
      bf.get(key).foreach(v => assert(v == r.getAs[Double]("cos_sim")))
    }
    // top-1 recall over the probed fraction of cells
    val bf1 = Similarity.bruteForceTopK(emb, 20, 1).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("nbr_id")).toMap
    val ivfByQ = ivf.groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("nbr_id")).toSet }
    val hits = bf1.count { case (q, n) => ivfByQ.getOrElse(q, Set.empty).contains(n) }
    assert(hits >= bf1.size / 3, s"IVF recall too low: $hits/${bf1.size}")
  }

  test("D4: salted two-phase top-k is bit-identical to a single-window rank") {
    import org.apache.spark.sql.expressions.Window
    // rebuild the scored candidate relation exactly as bruteForceTopK does,
    // rank it with the one-window form, and compare against the salted path
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val joined = emb.select(col("vec_id").as("nbr_id"), col("embedding").as("n_emb"))
      .crossJoin(broadcast(q))
      .filter(col("nbr_id") =!= col("query_id"))
      .select(col("query_id"), col("nbr_id"),
        Features.pround(Similarity.cosineExpr("q_emb", "n_emb"), 6).as("cos_sim"))
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("nbr_id"))
    val oneWindow = joined
      .select(col("query_id"), col("nbr_id"), col("cos_sim"),
        row_number().over(w).cast("long").as("rank"))
      .filter(col("rank") <= 3)
      .orderBy(col("query_id"), col("rank")).collect().map(_.toSeq)
    val salted = Similarity.bruteForceTopK(emb, 5, 3).collect().map(_.toSeq)
    assert(salted.toSeq == oneWindow.toSeq)
  }

  test("D1 exact dedup groups: total copies equals row count") {
    val g = TextOps.dedupGroups(docs)
    assert(g.agg(sum("n_copies")).collect()(0).getLong(0) == docs.count())
  }

  test("language-id: deterministic and emits known codes") {
    val r1 = TextOps.languageId(docs.limit(50)).select("doc_id", "pred_lang").collect()
    val r2 = TextOps.languageId(docs.limit(50)).select("doc_id", "pred_lang").collect()
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq)
    val valid = Set("en", "es", "de", "fr", "zh", "und")
    assert(r1.forall(r => valid.contains(r.getString(1))))
  }
}
