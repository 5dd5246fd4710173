package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Corpus

/** End-to-end corpus pipeline (d43): planted-fixture semantics for each
  * stage boundary plus the no-rescan plan shape. The DuckDB oracle
  * (selfcheck) is the independent full-chain correctness check. */
class CorpusSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  test("planted: near-dups collapse to min-id winner, quality junk dropped, rest packed") {
    import spark.implicits._
    val shared = (0 until 12).map(i => s"tok$i").mkString(" ")
    val tailA = (0 until 8).map(i => s"aye$i").mkString(" ")
    val tailB = (0 until 8).map(i => s"bee$i").mkString(" ")
    val uniq = (0 until 20).map(i => s"solo$i").mkString(" ")
    val docs = Seq(
      (10L, s"$shared $tailA", "en", "srcX", 1L), // near-dup pair: one
      (11L, s"$shared $tailB", "en", "srcX", 1L), //   shared 12-shingle
      (12L, uniq, "en", "srcX", 1L),              // unrelated, kept
      (13L, "too short", "en", "srcX", 1L))       // fails quality (<10 tokens)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val res = Corpus.trainingSequences(docs, Map.empty)
      .collect().map(r => (r.getAs[Long]("seq_id"), r.getAs[String]("chunk_ids"),
        r.getAs[Long]("total_tokens")))
    // winner 10 (20 tokens) + doc 12 (20 tokens) pack into one sequence;
    // 11 lost to dedup, 13 to quality
    assert(res.toSeq == Seq((0L, "10:0,12:0", 40L)))
  }

  test("df cap: a boilerplate shingle shared corpus-wide creates no edges") {
    import spark.implicits._
    val boiler = (0 until 12).map(i => s"b$i").mkString(" ")
    // 25 docs all share one shingle; df = 25 > maxDf = 20 → no edges, all kept
    val docs = (0L until 25L).map(i =>
      (i, s"$boiler unique${i}a unique${i}b unique${i}c", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val res = Corpus.trainingSequences(docs, Map.empty)
    val refs = res.collect().flatMap(_.getAs[String]("chunk_ids").split(","))
    assert(refs.map(_.split(":")(0).toLong).distinct.sorted.toSeq == (0L until 25L))
  }

  test("decontaminate: planted benchmark overlap flagged with exact hit count, clean docs absent") {
    import spark.implicits._
    val leak = (0 until 9).map(i => s"q$i").mkString(" ") // 9 tokens → two 8-shingles
    val bench = Seq((100L, s"$leak padA padB padC")).toDF("doc_id", "text")
    val train = Seq(
      (1L, s"intro words here $leak trailing stuff"), // contains both leaked 8-shingles
      (2L, (0 until 20).map(i => s"c$i").mkString(" ")))   // clean
      .toDF("doc_id", "text")
    val res = Corpus.decontaminate(train, bench, shingleK = 8).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_hit_shingles")).toMap
    assert(res == Map(1L -> 2L))
  }

  test("winnowed scale path agrees with the exact-shingle pipeline on planted strong dups") {
    import spark.implicits._
    val shared = (0 until 30).map(i => s"common$i").mkString(" ") // long shared run
    val tailA = (0 until 8).map(i => s"aye$i").mkString(" ")
    val tailB = (0 until 8).map(i => s"bee$i").mkString(" ")
    val uniq = (0 until 20).map(i => s"solo$i").mkString(" ")
    val docs = Seq(
      (10L, s"$shared $tailA", "en", "srcX", 1L),
      (11L, s"$shared $tailB", "en", "srcX", 1L),
      (12L, uniq, "en", "srcX", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    def winners(res: Array[org.apache.spark.sql.Row]): Set[Long] =
      res.flatMap(_.getAs[String]("chunk_ids").split(","))
        .map(_.split(":")(0).toLong).toSet
    val exact = winners(Corpus.trainingSequences(docs, Map.empty).collect())
    val winnowed = winners(
      Corpus.trainingSequencesWinnowed(docs, Map.empty).collect())
    assert(exact == Set(10L, 12L))
    assert(winnowed == exact)
  }

  test("pipeline audit: monotone attrition, chunk==sequence token mass, matches d43 output") {
    val rates = Map("src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.1)
    val docs = Tables.documents(spark, sfDir)
    val audit = Corpus.pipelineAudit(docs, rates).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_rows"), r.getAs[Long]("n_tokens"))).toMap
    assert(audit.keySet == Set("00_raw", "01_quality", "02_dedup", "03_mixed",
      "04_chunks", "05_sequences"))
    assert(audit("00_raw")._1 >= audit("01_quality")._1)
    assert(audit("01_quality")._1 >= audit("02_dedup")._1)
    assert(audit("02_dedup")._1 >= audit("03_mixed")._1)
    // packing loses no chunk: token mass identical across the two stages
    assert(audit("04_chunks")._2 == audit("05_sequences")._2)
    // audit agrees with the declared materialization it describes
    assert(audit("05_sequences")._1 ==
      SparkEntry.queries("d43_training_sequences")(spark, sfDir).count())
  }

  test("declared d43 plan: everything derives from checkpoints — zero downstream file scans") {
    val plan = SparkEntry.queries("d43_training_sequences")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan parquet"), "base table re-scanned downstream")
  }
}
