package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-catalog empty-fixture gate — the catalog-level companion to
  * [[EmptyInputSpec]]'s operator-level checks.
  *
  * At 100 TB an empty slice is routine (a brand-new partition, a filtered
  * day, a tenant with no data yet), and a pipeline that crashes on it
  * instead of producing an empty/zero report is a paging incident.
  * [[EmptyInputSpec]] proves individual operators behave; this spec proves
  * the DECLARED SURFACE does: every `SparkEntry.queries` entry is executed
  * against a zero-row fixture carrying the exact schemas of the real one
  * (footer-read from sf0.001, so the gate tracks fixture regenerations
  * automatically), and must either evaluate cleanly or raise one of the
  * documented precondition errors pinned below. Anything else — an
  * internal Spark error, an undeclared crash, a NEW precondition — fails
  * the suite, in both directions (a documented precondition that silently
  * stops firing is also a behavior change we want to see).
  */
class CatalogEmptyFixtureSpec extends AnyFunSuite {
  import SparkFixture.spark

  /** Queries whose semantics genuinely require a non-empty input, each
    * raising a named precondition (IllegalArgumentException with the
    * matching message fragment) rather than an internal error. Two
    * families, both inherent to the computation, not robustness gaps:
    *  - the quantile-threshold consumers: `Metrics.exactPercentile` is the
    *    fit step that defines their decision threshold, and a quantile of
    *    zero observations has no value to return — same contract as
    *    sklearn's `np.quantile([])`;
    *  - IVF: training a quantizer needs at least one vector (`kmeans
    *    sample is empty`); the exact/LSH paths (d14/d16/d21) return empty.
    * First measured 2026-08-14: the remaining 107 declared queries all
    * evaluate cleanly to empty/zero-row reports on the zero-row fixture. */
  private val documentedPreconditions: Map[String, String] = Map(
    "f3_quantile_flag"     -> "exactPercentile over empty relation",
    "m15_binary_metrics"   -> "exactPercentile over empty relation",
    "m16_confusion_matrix" -> "exactPercentile over empty relation",
    "m17_champion_select"  -> "exactPercentile over empty relation",
    "m20_calibration_bins" -> "exactPercentile over empty relation",
    "d22_ivf_topk"         -> "kmeans sample is empty")

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
    val outcomes: Seq[(String, Option[Throwable])] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, q) =>
        val r =
          try { q(spark, emptyDir).count(); None }
          catch { case e: Throwable => Some(e) }
        name -> r
      }

    val failed = outcomes.collect { case (n, Some(e)) => n -> e }.toMap

    val undocumented = failed.filterNot { case (n, e) =>
      documentedPreconditions.get(n).exists { frag =>
        e.isInstanceOf[IllegalArgumentException] &&
          Option(e.getMessage).exists(_.contains(frag))
      }
    }
    assert(undocumented.isEmpty,
      s"\nqueries crashed on an empty fixture without a documented precondition:\n" +
        undocumented.toSeq.sortBy(_._1).map { case (n, e) =>
          s"  $n: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(3).mkString(" | ").take(300)}"
        }.mkString("\n"))

    val silent = documentedPreconditions.keySet -- failed.keySet
    assert(silent.isEmpty,
      s"documented preconditions no longer fire on an empty fixture: $silent " +
        "— if intentional, remove them from the allowlist")
  }
}
