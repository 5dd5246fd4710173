package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-engineering utilities for the 100 TB deployment shape: skew-salted
  * joins, bucketed co-located joins, and partitioned-layout writers. These
  * are the knobs SURVEY.md §4.2's "Spark replacement" column promises —
  * exercised in tests on local data, designed for cluster layouts.
  */
object Scale {

  /** Salted equi-join for skewed keys: the skewed (large) side gets a
    * random salt in [0, salts); the small side is exploded `salts`× so
    * every (key, salt) pair finds its match. Turns one hot partition into
    * `salts` even ones at the cost of replicating the small side.
    *
    * AQE's skew-join handling (on by default) covers moderate skew
    * automatically; explicit salting is for the pathological long-tail key
    * whose single partition exceeds executor memory. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int, seed: Long = 42L): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      (rand(seed) * salts).cast("int"))
    val explodedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLarge.join(explodedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Write a DataFrame as a bucketed, sorted table: joins between tables
    * bucketed on the same key with the same bucket count need NO shuffle
    * (co-located) — the 100 TB answer to repeated fact-fact joins. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — shuffle-free when
    * layouts match (verify via the physical plan: no Exchange above the
    * scans). */
  def bucketedJoin(spark: SparkSession, tableA: String, tableB: String,
                   key: String): DataFrame =
    spark.table(tableA).join(spark.table(tableB), key)

  /** Write with hive-style partition pruning layout (dt=.../country=...):
    * the scan of a filtered read touches only matching directories. */
  /** Small-file compaction — the everyday maintenance job at corpus scale:
    * a directory of N fragment files (streaming micro-batch sinks, per-task
    * writers) rewritten as ceil(bytes / targetBytes) right-sized files.
    * Sizing reads the FILE FOOTPRINT from the filesystem (not a count())
    * and `repartition(k)` round-robins rows so outputs are even; content
    * is unchanged. Returns the output file count. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 128L * 1024 * 1024): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inDir), spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listStatus(new org.apache.hadoop.fs.Path(inDir))
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
      .map(_.getLen).sum
    val k = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir).repartition(k)
      .write.mode("overwrite").parquet(outDir)
    fs.listStatus(new org.apache.hadoop.fs.Path(outDir))
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
  }

  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Declared-query form of the bucketed co-located join: orders and
    * customer are laid out as bucketed-sorted tables on custkey (the
    * one-time layout cost a warehouse pays once), then joined with NO
    * shuffle on either side — the plan over the bucketed scans has no
    * Exchange below the join (asserted in ScaleSpec) — and aggregated to
    * spend per market segment. Only the O(groups) aggregate shuffles.
    * Integer-cent summation keeps group totals order-independent across
    * engines (same rationale as nationPairVolume). */
  /** Drop a managed table AND clear its warehouse directory: a fresh
    * session whose catalog has no entry for `table` cannot overwrite a
    * leftover location from a previous JVM (LOCATION_ALREADY_EXISTS). */
  private[graft] def dropManaged(s: SparkSession, table: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = java.nio.file.Paths.get(warehouse, table)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  /** Per-invocation unique suffix for bucketed-layout table names:
    * concurrent invocations — in this JVM or in ANOTHER JVM sharing the
    * warehouse directory (sbt test next to a Verify run) — must never
    * race on catalog entries or table locations. A monotonic counter is
    * JVM-local (two JVMs both start at 0, and one would delete the files
    * the other's in-flight scan is reading); a random token is unique
    * across processes. Same good-citizen isolation
    * `RelationalExt.withViews` gives temp views. */
  private def freshToken(): String =
    java.util.UUID.randomUUID().toString.replace("-", "").take(12)

  /** Clean crash-orphaned bucketed layouts: with per-invocation unique
    * names no later call ever reuses a stranded name, so a JVM killed
    * mid-invocation would leak its tables forever. Age-gated (default
    * 1 h) so a LIVE concurrent JVM's in-flight tables — necessarily
    * recent — are never swept. */
  private def sweepStale(s: SparkSession, maxAgeMs: Long = 60L * 60 * 1000): Unit = {
    val warehouse = new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath
    val root = java.nio.file.Paths.get(warehouse)
    if (!java.nio.file.Files.isDirectory(root)) return
    val cutoff = System.currentTimeMillis() - maxAgeMs
    val ds = java.nio.file.Files.newDirectoryStream(root, "graft_bucketed_*")
    try {
      import scala.jdk.CollectionConverters._
      ds.iterator().asScala.toSeq
        .filter(p => java.nio.file.Files.getLastModifiedTime(p).toMillis < cutoff)
        .foreach(p => dropManaged(s, p.getFileName.toString))
    } finally ds.close()
  }

  /** Lazy aggregate over two already-bucketed tables (orders side
    * `custkey`/`o_totalprice`, customer side `custkey`/`c_mktsegment`):
    * shuffle-free join (no Exchange on custkey — asserted in ScaleSpec),
    * only the O(segments) aggregate shuffles. Exposed separately so tests
    * can inspect the physical plan over a live layout. */
  def bucketedSegmentSpendPlan(s: SparkSession, ordersTable: String,
                               customerTable: String): DataFrame =
    bucketedJoin(s, ordersTable, customerTable, "custkey")
      .groupBy(col("c_mktsegment"))
      .agg((sum(Features.qlong(col("o_totalprice"), 100.0))
          .cast("double") / 100.0).as("spend"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("c_mktsegment"))

  def bucketedSegmentSpend(s: SparkSession, dir: String, buckets: Int = 8): DataFrame = {
    import graft.Tables
    // per-invocation unique names: no concurrent or future call — in any
    // JVM — can collide with these, so no pre-write drop is needed; the
    // age-gated sweep reclaims what a crashed JVM stranded
    sweepStale(s)
    val tok = freshToken()
    val ordersT = s"graft_bucketed_orders_$tok"
    val customerT = s"graft_bucketed_customer_$tok"
    // the two layout writes are independent Spark jobs — submit them
    // concurrently (the scheduler interleaves their stages across cores;
    // serial submission leaves the cluster half-idle per write)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val writes = Seq(
      Future(writeBucketed(Tables.orders(s, dir)
        .select(col("o_custkey").as("custkey"), col("o_totalprice")),
        ordersT, "custkey", buckets)),
      Future(writeBucketed(Tables.customer(s, dir)
        .select(col("c_custkey").as("custkey"), col("c_mktsegment")),
        customerT, "custkey", buckets)))
    writes.foreach(Await.result(_, Duration.Inf))
    try {
      // materialize the bounded O(market segments) result (≤ a handful of
      // rows) so the backing tables can be dropped before returning — the
      // caller's DataFrame must not depend on catalog state another
      // invocation could never see or this one is about to clean up
      val agg = bucketedSegmentSpendPlan(s, ordersT, customerT)
      val rows = agg.collect()
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.toSeq.asJava, agg.schema)
    } finally {
      dropManaged(s, ordersT); dropManaged(s, customerT)
    }
  }
}
