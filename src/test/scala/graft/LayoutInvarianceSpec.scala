package graft

import org.scalatest.funsuite.AnyFunSuite

/** Layout-invariance gate over EVERY declared query: executes the full
  * catalog at sf0.001 under two deliberately different physical layouts
  * and asserts each query's result is identical as a sorted row multiset.
  *
  * Why this is a 100 TB correctness gate and not a micro-test: on a real
  * cluster the physical layout is never stable — AQE re-coalesces shuffle
  * partitions from runtime stats, input splits follow file sizes and
  * `maxPartitionBytes`, and a re-run after adding one executor sees every
  * aggregation buffer fed in a different row order. Any result that
  * depends on that order (a float sum whose last ulp varies with
  * summation order, a top-k with a tie broken by arrival order, a `first`
  * without an ordering) is a silent nondeterminism bug at scale — the
  * DuckDB oracle gate cannot catch it because Verify runs one fixed
  * layout. The 100 oracle-checked queries get cross-ENGINE determinism
  * checked there; this gate adds cross-LAYOUT determinism for all 112,
  * including the 12 rows-only queries (engine-local hash families, HLL,
  * k-means, BPE) the oracle never sees.
  *
  * Layout A is the declared bench shape (32 shuffle partitions, default
  * 128 MB split packing, AQE coalescing on). Layout B forces a different
  * task decomposition everywhere: 5 shuffle partitions, 64 KB input
  * splits, zero file-open-cost packing (each small parquet file becomes
  * its own split instead of being bin-packed) — and AQE partition
  * coalescing OFF, because with it on both layouts' shuffle sides would
  * coalesce toward the same stats-driven effective partitioning at test
  * SF, collapsing the 32-vs-5 delta this gate exists to exercise;
  * disabling it in B pins the raw 5-partition decomposition. Row
  * multisets — not row arrays — are compared, because unordered queries
  * may legitimately emit rows in any order; rendering goes through
  * `toJSON` so arrays, structs, NaNs and binary columns all compare by
  * value.
  */
class LayoutInvarianceSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  private val layoutA = Map(
    "spark.sql.shuffle.partitions" -> "32",
    "spark.sql.files.maxPartitionBytes" -> "134217728",
    "spark.sql.files.openCostInBytes" -> "4194304",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true")
  private val layoutB = Map(
    "spark.sql.shuffle.partitions" -> "5",
    "spark.sql.files.maxPartitionBytes" -> "65536",
    "spark.sql.files.openCostInBytes" -> "0",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "false")

  /** Runs every declared query under `confs`, returning per query either
    * the failure message or (schema, sorted row multiset). */
  private def catalogFingerprints(
      confs: Map[String, String]): Map[String, Either[String, (String, Seq[String])]] = {
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        name -> (try {
          val df = fn(spark, sfDir)
          Right((df.schema.map(f => s"${f.name}:${f.dataType.sql}").mkString(","),
            df.toJSON.collect().sorted.toSeq))
        } catch {
          case e: Throwable =>
            Left(s"${e.getClass.getSimpleName}: ${e.getMessage}")
        })
      }.toMap
    } finally saved.foreach { case (k, vo) =>
      vo.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("every declared query is layout-invariant: identical result multiset " +
      "across shuffle-partition counts and input-split sizes") {
    val a = catalogFingerprints(layoutA)
    val b = catalogFingerprints(layoutB)
    val problems = a.keys.toSeq.sorted.flatMap { name =>
      (a(name), b(name)) match {
        case (Left(ea), _) => Some(s"$name failed under layout A: $ea")
        case (_, Left(eb)) => Some(s"$name failed under layout B: $eb")
        case (Right((sa, ra)), Right((sb, rb))) =>
          if (sa != sb) Some(s"$name schema differs:\n  A: $sa\n  B: $sb")
          else if (ra != rb) {
            val onlyA = ra.diff(rb).take(3)
            val onlyB = rb.diff(ra).take(3)
            Some(s"$name rows differ (${ra.size} vs ${rb.size}): " +
              s"only-in-A ${onlyA.mkString("; ")} | only-in-B ${onlyB.mkString("; ")}")
          } else None
      }
    }
    assert(problems.isEmpty, problems.mkString("\n"))
    // non-vacuity: the sweep really ran the whole catalog
    assert(a.size == SparkEntry.queries.size && a.values.forall(_.isRight))
  }
}
