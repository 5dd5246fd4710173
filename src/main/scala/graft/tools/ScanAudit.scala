package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftExtensions, SparkEntry}

/** Scan audit: for every declared query, counts FileScan occurrences per
  * parquet path in the physical plan and prints queries that read the same
  * file more than once. A repeated scan is either a deliberate two-pass
  * algorithm (documented) or the no-CSE-across-reuse bug class — this
  * tool finds candidates for review.
  *
  * Round-4 audit found and fixed two real instances: d36 funnelSteps
  * re-executed the entry chain per step count (O(steps²) scans → one
  * materialized scan) and v2 dup_count ran a separate total-count pass
  * (→ single groupBy-all-columns pass). The remaining multi-scan queries
  * are all justified:
  *  - d13/d21: documented BOUNDED self-pair cross joins (both sides id-capped);
  *  - d14/d16: the repeated "scans" are id-pruned query-side reads
  *    (PushedFilters: vec_id < nQueries) + ONE full bucket/verify pass each —
  *    re-fetching embeddings by scan beats shuffling vectors through distinct;
  *  - f5/m1–m3: fit + transform — the two-pass sklearn contract
  *    (fit statistics, then apply), inherent to the semantics (f3 left
  *    this list in round 5: its threshold now enters as a literal from
  *    the bounded-memory exactPercentile pass);
  *  - x21: scalar-subquery SQL surface (the subquery owns its scan);
  *  - x24: union-vs-union-all semantics demo, multi-branch by design;
  *  - x28: nation joined in two roles (cust-side + supp-side);
  *  - x8: INTERSECT of two filtered slices of the same table — each set
  *    operand owns its (filter-pushed) scan, a set-op semantics demo
  *    like x24;
  *  - x34: two-level bucketed as-of resolution (exists to hash-verify
  *    the hot-key rewrite; see SURVEY §7.5);
  *  - d44: documents read in two ROLES — train corpus vs benchmark suite
  *    (id-split proxy here; distinct tables in production), each side
  *    shingled from its own filter-pushed scan. */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC") // normalizeTs/Date contract
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
    val dir = "/root/testdata/sf0.001"
    val pathRe = "file:[^\\]\\s,]*?/(\\w+)\\.parquet".r
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val scans = plan.linesIterator.filter(_.contains("FileScan parquet"))
          .flatMap(l => pathRe.findFirstMatchIn(l).map(_.group(1))).toSeq
        val dups = scans.groupBy(identity).filter(_._2.size > 1)
        if (dups.nonEmpty)
          println(s"[scanaudit] $name: " + dups.map { case (t, s) => s"$t x${s.size}" }.mkString(", "))
      } catch { case e: Throwable => println(s"[scanaudit] $name ERROR ${e.getMessage}") }
    }
    spark.stop()
  }
}
