package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Empty-relation behavior: every operator either returns an empty result
  * or raises a documented precondition error — never crashes with an
  * internal error or returns garbage. At 100 TB an empty slice is an
  * everyday event (a new partition, a filtered shard), not an edge case. */
class EmptyInputSpec extends AnyFunSuite {
  import SparkFixture.spark
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String, String, Long)]
    .toDF("doc_id", "lang", "source", "n_chars")
    .withColumn("text", lit(""))
    .filter(lit(false))
    .select(col("doc_id"), col("lang"), col("source"), col("n_chars"), col("text"))

  private def emptyEmb = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")

  test("text ops on an empty documents relation return empty, not errors") {
    assert(TextOps.dedupGroups(emptyDocs).count() == 0)
    assert(TextOps.tokenStats(emptyDocs).count() == 0)
    assert(TextOps.tfidfTopTerms(emptyDocs, 5).count() == 0)
    assert(TextOps.unigramSurprisal(emptyDocs).count() == 0)
    assert(TextOps.repetitionRatio(emptyDocs).count() == 0)
    assert(TextOps.lexicalDiversity(emptyDocs).count() == 0)
    assert(TextOps.chunkDocs(emptyDocs).count() == 0)
  }

  test("dedup pipelines on an empty documents relation return empty") {
    assert(Dedup.minhashNearDups(emptyDocs, 0.5).count() == 0)
    assert(Dedup.simhashNearDups(emptyDocs, 8).count() == 0)
    assert(Dedup.winnowNearDups(emptyDocs, 2).count() == 0)
    val none = Dedup.connectedComponents(
      emptyDocs.select(col("doc_id").as("id")),
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
    assert(none.count() == 0)
  }

  test("similarity ops on an empty embeddings relation return empty or raise cleanly") {
    assert(Similarity.bruteForceTopK(emptyEmb, 5, 3).count() == 0)
    assert(Similarity.lshTopK(emptyEmb, 64, 5, 3).count() == 0)
    assert(Similarity.embeddingCentroids(emptyEmb).count() == 0)
    // IVF trains a quantizer — an empty corpus is a documented precondition error
    intercept[IllegalArgumentException] {
      Similarity.ivfTopK(emptyEmb, 5, 3)
    }
  }

  test("round-5 ops on empty relations return empty, not errors") {
    assert(TextOps.packChunks(
      Seq.empty[(Long, Long, Long)].toDF("doc_id", "chunk_id", "n_chunk_tokens"))
      .count() == 0)
    assert(TextOps.piiScrub(emptyDocs).count() == 0)
    assert(Corpus.decontaminate(emptyDocs, emptyDocs).count() == 0)
    assert(Corpus.trainingSequences(emptyDocs, Map.empty).count() == 0)
  }

  test("round-6 ops on empty relations return empty, not errors") {
    val someDocs = Seq((1L, "a real document with some words in it"))
      .toDF("doc_id", "text")
    // winnowed decontamination: empty train, empty benchmark, both empty
    assert(Corpus.decontaminateWinnowed(emptyDocs, someDocs).count() == 0)
    assert(Corpus.decontaminateWinnowed(someDocs, emptyDocs).count() == 0)
    assert(Corpus.decontaminateWinnowed(emptyDocs, emptyDocs).count() == 0)
    // round-8 companion: the mass-contamination audit on the same trio
    assert(Corpus.massContaminationSuspects(emptyDocs, someDocs).count() == 0)
    assert(Corpus.massContaminationSuspects(someDocs, emptyDocs).count() == 0)
    assert(Corpus.massContaminationSuspects(emptyDocs, emptyDocs).count() == 0)
    // BPE: empty corpus trains an empty merge table; an empty merge table
    // over a real corpus counts whitespace+punct pre-tokens unchanged;
    // empty corpus + empty merges is empty
    val emptyMerges = Vocab.bpeTrainMerges(emptyDocs, numMerges = 10)
    assert(emptyMerges.isEmpty)
    assert(Vocab.bpeTokenCounts(emptyDocs, emptyMerges).count() == 0)
    val unmerged = Vocab.bpeTokenCounts(someDocs, emptyMerges)
    assert(unmerged.count() == 1)
    // with zero merges every token stays fully split, so the count is
    // bounded below by the whitespace token count
    val n = unmerged.collect()(0).getAs[Long]("n_bpe_tokens")
    assert(n >= 8L)
  }

  test("exactMedian raises its documented precondition on an empty relation") {
    val e = intercept[IllegalArgumentException] {
      Metrics.exactMedian(Seq.empty[Double].map(Tuple1(_)).toDF("v"), "v")
    }
    assert(e.getMessage.contains("empty"))
  }

  test("language-id and PSI sweep on empty relations return empty, not errors") {
    assert(TextOps.languageId(emptyDocs).count() == 0)
    assert(TextOps.langConfusion(emptyDocs).count() == 0)
    val emptyNum = Seq.empty[(Double, String)].toDF("x", "d0")
      .select(col("x"), col("d0").cast("timestamp").as("t"))
    assert(Validation.psiByColumn(emptyNum, "t", "1998-01-01",
      Map("x" -> 1.0)).count() == 0)
  }

  test("duplicateRowCount: empty input yields 0 (not null); reserved-name columns survive") {
    val empty = Seq.empty[(Long, String)].toDF("a", "b")
    val row = Validation.duplicateRowCount(empty).collect()(0)
    assert(!row.isNullAt(0) && row.getLong(0) == 0L)
    // an input that already uses the internal count-column name family
    val clash = Seq((1L, 2L), (1L, 2L), (3L, 4L)).toDF("__n0", "__n1")
    assert(Validation.duplicateRowCount(clash).collect()(0).getLong(0) == 1L)
  }

  test("event analytics on an empty events relation return empty/zero, not errors") {
    // at 100 TB an empty time slice (new partition, filtered day) is
    // routine; the spine builder's bounds aggregate yields NULL lo/hi and
    // sequence(NULL, NULL) must collapse to zero spine rows, not raise
    val emptyEvents = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(EventOps.hourlyCounts(emptyEvents).count() == 0)
    assert(EventOps.sessionCounts(emptyEvents).count() == 0)
    assert(EventOps.gapFilledHourly(emptyEvents).count() == 0)
    // funnel: one output row per declared step, all zero — a report shape,
    // not a row-per-event shape
    val funnel = EventOps.funnelSteps(emptyEvents, Seq("signup", "click"))
      .collect()
    assert(funnel.length == 2 && funnel.forall(_.getAs[Long]("n_users") == 0L))
  }

  test("temporal joins with an empty side behave like their join semantics") {
    val left = Seq((1L, 10L, 100L)).toDF("k", "t", "probe_id")
    val noRight = Seq.empty[(Long, Long, Long, String)].toDF("k", "t2", "rk", "tag")
    val out = Temporal.asofJoin(left, noRight, "k", "t", "t2", Seq("rk", "tag"), "rk")
    assert(out.count() == 1 && out.filter(col("__asof").isNotNull).count() == 0)
    val outB = Temporal.asofJoinBucketed(left, noRight, "k", "t", "t2",
      Seq("rk", "tag"), "rk", t => floor(t / 4.0))
    assert(outB.count() == 1 && outB.filter(col("__asof").isNotNull).count() == 0)
    val noLeft = Seq.empty[(Long, Long, Long)].toDF("k", "t", "probe_id")
    val right = Seq((1L, 5L, 7L, "x")).toDF("k", "t2", "rk", "tag")
    assert(Temporal.asofJoin(noLeft, right, "k", "t", "t2", Seq("rk", "tag"), "rk").count() == 0)
  }
}
