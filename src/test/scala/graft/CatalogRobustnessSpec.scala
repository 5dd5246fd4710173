package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Whole-catalog robustness gates — the catalog-level companion to
  * [[EmptyInputSpec]]'s operator-level checks.
  *
  * At 100 TB two things are routine, not edge cases: an EMPTY slice (a
  * brand-new partition, a filtered day, a tenant with no data yet) and
  * HOSTILE-BUT-SCHEMA-VALID rows (a NULL document from a broken scraper,
  * an empty string, a truncated JSON payload, a zero or empty embedding
  * from a failed encoder, NaN from a bad ingest, a pre-epoch timestamp
  * from a corrupted clock). A pipeline that crashes on either is a paging
  * incident. This spec executes EVERY `SparkEntry.queries` entry against
  * both fixture shapes and requires each query to either evaluate cleanly
  * or raise one of the documented precondition errors pinned below — in
  * both directions (a documented precondition that silently stops firing
  * is also a behavior change we want to see). Anything undocumented — an
  * internal Spark error, a ClassCastException, an ANSI arithmetic crash —
  * fails the suite naming the query.
  */
class CatalogRobustnessSpec extends AnyFunSuite {
  import SparkFixture.spark

  /** Run the full declared catalog against `dir`; queries must evaluate or
    * raise an [[IllegalArgumentException]] whose message contains the
    * allowlisted fragment. Asserts the allowlist exactly (no undocumented
    * failure, no silently-dead precondition). */
  private def gateCatalog(dir: String, documented: Map[String, String]): Unit = {
    val outcomes: Seq[(String, Option[Throwable])] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, q) =>
        val r =
          try { q(spark, dir).count(); None }
          catch { case e: Throwable => Some(e) }
        name -> r
      }

    val failed = outcomes.collect { case (n, Some(e)) => n -> e }.toMap

    val undocumented = failed.filterNot { case (n, e) =>
      documented.get(n).exists { frag =>
        e.isInstanceOf[IllegalArgumentException] &&
          Option(e.getMessage).exists(_.contains(frag))
      }
    }
    assert(undocumented.isEmpty,
      s"\nqueries crashed without a documented precondition:\n" +
        undocumented.toSeq.sortBy(_._1).map { case (n, e) =>
          s"  $n: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(3).mkString(" | ").take(300)}"
        }.mkString("\n"))

    val silent = documented.keySet -- failed.keySet
    assert(silent.isEmpty,
      s"documented preconditions no longer fire: $silent " +
        "— if intentional, remove them from the allowlist")
  }

  // ---------------------------------------------------------------- empty

  /** Queries whose semantics genuinely require a non-empty input, each
    * raising a named precondition rather than an internal error. Two
    * families, both inherent to the computation, not robustness gaps:
    *  - the quantile-threshold consumers: `Metrics.exactPercentile` is the
    *    fit step that defines their decision threshold, and a quantile of
    *    zero observations has no value to return — same contract as
    *    sklearn's `np.quantile([])`;
    *  - IVF: training a quantizer needs at least one vector (`kmeans
    *    sample is empty`); the exact/LSH paths (d14/d16/d21) return empty.
    * First measured 2026-08-14: the remaining 107 declared queries all
    * evaluate cleanly to empty/zero-row reports on the zero-row fixture. */
  private val emptyPreconditions: Map[String, String] = Map(
    "f3_quantile_flag"     -> "exactPercentile over empty relation",
    "m15_binary_metrics"   -> "exactPercentile over empty relation",
    "m16_confusion_matrix" -> "exactPercentile over empty relation",
    "m17_champion_select"  -> "exactPercentile over empty relation",
    "m20_calibration_bins" -> "exactPercentile over empty relation",
    "d22_ivf_topk"         -> "kmeans sample is empty",
    "d59_semantic_dedup"   -> "kmeans sample is empty",
    // PQ trains k-means codebooks (d65: the PQ books; d66: the coarse
    // quantizer first) — same no-vectors-to-train precondition
    "d65_pq_topk"          -> "kmeans sample is empty",
    "d66_ivfpq_topk"       -> "kmeans sample is empty",
    "d67_ivfpq_residual_topk" -> "kmeans sample is empty",
    "d68_sdc_topk"         -> "kmeans sample is empty")

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_sf0").toString
    Tables.names.foreach { t =>
      spark.read.parquet(s"${SparkFixture.sfDir}/$t.parquet")
        .limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every declared query on a zero-row fixture evaluates or raises its documented precondition") {
    gateCatalog(emptyDir, emptyPreconditions)
  }

  // -------------------------------------------------------------- hostile

  /** Hostile-value generators per physical type, one per hostile row kind:
    *  - `nulls`: every column NULL (broken upstream record);
    *  - `zeros`: "" strings, 0 numerics, epoch timestamps, empty arrays
    *    (the degenerate-but-present record — empty doc, empty embedding);
    *  - `junk`: whitespace-only text, NaN measures, pre-epoch timestamps
    *    (the floor-sensitive side of the ns→µs contract), zero vectors
    *    (cosine's 0/0 case), truncated JSON;
    *  - `exotic`: multibyte/astral text with RTL + zero-width + combining
    *    marks + CRLF — the char-vs-byte / regex / hashing class. */
  private def hostileValue(dt: DataType, kind: String): Any = (dt, kind) match {
    case (_, "nulls")              => null
    case (StringType, "zeros")     => ""
    case (StringType, "junk")      => " \t\n {"
    case (StringType, "exotic")    => "مرحبا 𝔘𝔫​ é\r\nfin"
    case (other, "exotic")         => hostileValue(other, "zeros")
    case (LongType, "zeros")       => 0L
    case (LongType, "junk")        => -1L
    case (IntegerType, "zeros")    => 0
    case (IntegerType, "junk")     => -1
    case (DoubleType, "zeros")     => 0.0
    case (DoubleType, "junk")      => Double.NaN
    case (FloatType, "zeros")      => 0.0f
    case (FloatType, "junk")       => Float.NaN
    case (TimestampNTZType, "zeros") =>
      java.time.LocalDateTime.of(1970, 1, 1, 0, 0, 0)
    case (TimestampNTZType, "junk") =>
      java.time.LocalDateTime.of(1969, 12, 31, 23, 59, 59, 999999000)
    case (TimestampType, "zeros")  => java.time.Instant.EPOCH
    case (TimestampType, "junk")   => java.time.Instant.ofEpochMilli(-1L)
    case (ArrayType(FloatType, _), "zeros") => Seq.empty[Float]
    case (ArrayType(FloatType, _), "junk")  => Seq.fill(64)(0.0f)
    case (other, k) => fail(s"no hostile $k value for $other — extend hostileValue")
  }

  private lazy val hostileDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_hostile").toString
    Tables.names.foreach { t =>
      val real = spark.read.parquet(s"${SparkFixture.sfDir}/$t.parquet")
      val hostile = spark.createDataFrame(
        Seq("nulls", "zeros", "junk", "exotic")
          .map(k => Row.fromSeq(real.schema.fields.map(f => hostileValue(f.dataType, k)).toSeq))
          .asJava,
        real.schema)
      real.limit(4).unionByName(hostile)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  /** The hostile fixture is NON-empty (4 sane rows + 4 hostile per table),
    * so the empty-relation family doesn't fire; what can legitimately fire
    * are small-corpus preconditions (populated below from measurement).
    * Measured 2026-08-16 (round 18): the fixture's embeddings hold 5
    * USABLE vectors (4 sane + the junk zero-vector; nulls/empty excluded
    * by `indexable`), fewer than the declared k=16 (d22) / k=8 (d59)
    * quantizers — the r18 loud-failure contract fires BY DESIGN (a
    * quantizer that cannot seat k distinct seeds must not silently
    * train duplicate centroids; sklearn's KMeans raises here too).
    * Corpus-scale hostile replays (gate.sh's hostile arm appends the
    * same rows to the FULL 500-vector fixture) run clean. */
  private val hostilePreconditions: Map[String, String] = Map(
    "d22_ivf_topk"       -> "usable points",
    "d59_semantic_dedup" -> "usable points",
    // the PQ family's k-means (ksub=64 books / k=16 coarse) likewise
    // cannot seat its seeds on 5 usable vectors
    "d65_pq_topk"        -> "usable points",
    "d66_ivfpq_topk"     -> "usable points",
    "d67_ivfpq_residual_topk" -> "usable points",
    "d68_sdc_topk"       -> "usable points")

  test("every declared query tolerates NULL / degenerate / junk / exotic-unicode rows mixed into real data") {
    gateCatalog(hostileDir, hostilePreconditions)
  }

  test("m4's verify-time oracle regenerates from the fit-time category domain") {
    import graft.operators.Preprocess
    import spark.implicits._
    // domain rule = the encoder's own fit rule: distinct, non-null,
    // Java-string-sorted (so hostile "" sorts FIRST and becomes the
    // dropped category, growing an AUTOMOBILE column — sklearn semantics)
    val df = Seq(Option("B"), Option("A"), None, Option("B"), Option(""),
      Option("q'u\"o\nte")).toDF("c_mktsegment")
    val cats = Preprocess.observedCategories(df, "c_mktsegment")
    assert(cats == Seq("", "A", "B", "q'u\"o\nte"))
    val sql = SparkEntry.m4OracleFor(cats)
    // drop-first: "" is dropped, the other three get indicator columns
    assert(!sql.contains("c_mktsegment = ''"))
    assert(sql.contains("CASE WHEN c_mktsegment = 'A' THEN 1 ELSE 0 END AS \"c_mktsegment_A\""))
    // junk categories escape BOTH the string literal (''-doubling) and the
    // quoted identifier (""-doubling); raw control chars pass through
    assert(sql.contains("c_mktsegment = 'q''u\"o\nte'"))
    assert(sql.contains("AS \"c_mktsegment_q'u\"\"o\nte\""))
    // NULL segment reads 0, not NULL (CASE, not CAST(NULL = x)):
    assert(!sql.contains("CAST(c_mktsegment ="))
    // empty domain degrades to the key projection alone
    assert(SparkEntry.m4OracleFor(Nil) ==
      "SELECT c_custkey FROM customer ORDER BY c_custkey")
    // clean fixture: the dynamic overlay reproduces the static enumeration
    // (AUTOMOBILE dropped, four indicator columns)
    val dyn = SparkEntry.oracleSqlDynamic(spark, SparkFixture.sfDir)("m4_onehot")
    Seq("BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY").foreach { c =>
      assert(dyn.contains(s"c_mktsegment = '$c'"), s"missing $c in:\n$dyn")
    }
    assert(!dyn.contains("'AUTOMOBILE'"))
  }
}
