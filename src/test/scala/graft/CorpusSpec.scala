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

  test("minShared: one shared rare shingle edges at 1 (default) but not at 2; two shared shingles edge at 2") {
    import spark.implicits._
    // docs 1,2 share exactly ONE 12-token shingle (a quoted sentence);
    // docs 3,4 share a 13-token run → exactly TWO 12-token shingles
    val quote = (0 until 12).map(i => s"q$i").mkString(" ")
    val run13 = (0 until 13).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (1L, s"$quote ${(0 until 15).map(i => s"aye$i").mkString(" ")}"),
      (2L, s"$quote ${(0 until 15).map(i => s"bee$i").mkString(" ")}"),
      (3L, s"$run13 ${(0 until 15).map(i => s"cee$i").mkString(" ")}"),
      (4L, s"$run13 ${(0 until 15).map(i => s"dee$i").mkString(" ")}"))
      .toDF("doc_id", "text")
    def edges(minShared: Int): Set[(Long, Long)] =
      Corpus.exactShingleEdges(docs, 12, 20, minShared).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges(1) == Set((1L, 2L), (3L, 4L)))
    // the precision knob: a single shared quote is no longer evidence
    assert(edges(2) == Set((3L, 4L)))
  }

  test("hot-shingle skew: boilerplate in 50% of docs yields zero edges; df agg is a pre-exchange partial_count") {
    import spark.implicits._
    // every even doc opens with the SAME 12-token boilerplate (df = 30 >
    // maxDf = 20 — the exact scenario the cap exists for); all other text
    // carries a per-doc two-letter signature inside every 8-char window,
    // so no cross-doc content survives except the capped boilerplate
    val boiler = (0 until 12).map(i => s"b$i").mkString(" ")
    val docs = (0L until 60L).map { i =>
      val sig = s"${('a' + i % 26).toChar}${('a' + i / 26).toChar}"
      val uniq = (0 until 14).map(j => s"${sig}z$j").mkString(" ")
      (i, if (i % 2 == 0) s"$boiler $uniq" else uniq)
    }.toDF("doc_id", "text")
    // exact path: the boilerplate shingle is dropped by the df cap
    assert(Corpus.exactShingleEdges(docs, 12, 20, 1).collect().isEmpty)
    // winnowed path (the 100 TB pipeline's evidence): same cap, same result
    assert(operators.Dedup.winnowNearDups(docs, minShared = 2, maxDf = 20)
      .collect().isEmpty)
    // the df aggregate combines the hot key map-side: partial_count BELOW
    // the exchange (a count-over-window would buffer the hot shingle's
    // whole row set in one unsplittable task)
    val sh0 = docs.select(col("doc_id"),
      explode(expr("shingle_md5s(text, 12)")).as("sh")).distinct()
    val plan = Corpus.shingleDfSurvivors(sh0, 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count"), plan)
    assert(!plan.contains("windowspecdefinition"), plan)
    val ex = plan.indexOf("Exchange hashpartitioning(sh")
    assert(ex >= 0 && plan.indexOf("partial_count", ex) > ex,
      s"partial_count not upstream of the sh exchange:\n$plan")
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

  test("winnowed decontamination agrees with exact d44 on planted leaks") {
    import spark.implicits._
    // a verbatim 12-token benchmark passage planted mid-document: exact
    // shingle overlap (k=8 tokens) and winnowed char-fingerprint overlap
    // (k=8, w=4 → any shared run of ≥ 11 chars collides) must both flag
    // doc 1 and only doc 1 — the CONTAMINATED verdict is the agreement
    // surface; hit magnitudes differ by design (shingles vs fingerprints)
    val leak = (0 until 12).map(i => s"leakword$i").mkString(" ")
    val bench = Seq((100L, s"$leak benchpad0 benchpad1")).toDF("doc_id", "text")
    val train = Seq(
      (1L, s"opening words go here $leak closing words"),
      (2L, (0 until 20).map(i => s"cw$i").mkString(" ")))
      .toDF("doc_id", "text")
    val exact = Corpus.decontaminate(train, bench, shingleK = 8).collect()
      .map(_.getLong(0)).toSet
    val winnowed = Corpus.decontaminateWinnowed(train, bench).collect()
      .map(_.getLong(0)).toSet
    assert(exact == Set(1L))
    assert(winnowed == exact)
    // the winnowed hit count reflects the shared run's fingerprint mass
    val hits = Corpus.decontaminateWinnowed(train, bench).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_hit_fps")).toMap
    assert(hits(1L) >= 1L)
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
