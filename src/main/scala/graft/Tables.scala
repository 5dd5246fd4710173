package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness testdata (TPC-H-ish star schema + events /
  * documents / embeddings — see FIXTURES.md §B).
  *
  * Scale note: plain parquet scans so Catalyst's scan-time column pruning and
  * predicate pushdown apply (verified via `.explain` — `PushedFilters` /
  * `ReadSchema`). At 100 TB the same code works against a partitioned
  * table root; no collect-side logic here.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read it as a nanosecond epoch long instead.
    * Session-conf caveat: `nanosAsLong` is a legacy session flag (no
    * per-reader option exists), so every later TIMESTAMP(NANOS) parquet
    * read in the session also yields longs — this dataset's sessions opt
    * into that globally (same contract as
    * [[graft.streaming.StreamMonitor.readEventsStream]]). */
  def eventsRaw(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
  }

  /** ns→µs epoch conversion matching DuckDB's TIMESTAMP_NS → TIMESTAMP
    * cast, which FLOORS: integer `div` truncates toward zero, so a bare
    * `ts div 1000` would round pre-epoch (negative) nanos UP by 1µs and
    * flip hour buckets / session gaps / as-of boundaries against the
    * oracle. Integer arithmetic throughout — a double `floor(ts/1000.0)`
    * would lose precision above 2^53 ns (~1974). */
  private[graft] val nsToUsFloor: String =
    "(ts div 1000) - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END)"

  /** Events with `ts` as a microsecond-precision TimestampType. */
  def eventsTs(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    eventsRaw(s, d).withColumn("ts", timestamp_micros(expr(nsToUsFloor)))
  }
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
