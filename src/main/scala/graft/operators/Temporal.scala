package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators — the as-of join a feature-engineering pipeline
  * needs ("latest dimension state at event time") that Spark has no built-in
  * operator for.
  *
  * Architecture (100 TB): the naive formulation is an inequality join
  * (`l.key = r.key AND r.t <= l.t` + argmax), which Spark plans as a
  * shuffled join with per-pair range filtering — O(|matches|) intermediate
  * rows, quadratic per hot key. This implementation instead UNIONs both
  * sides tagged, shuffles ONCE on the key, sorts per key by time, and
  * carries the latest right-side payload forward with a running
  * `last(ignoreNulls)` window — O(n log n) per key, no pair explosion,
  * no single-partition stage. This is the standard scale pattern for
  * point-in-time correctness in training-data generation (no leakage:
  * only rows with `r.t <= l.t` are visible to each left row).
  *
  * Skew ceiling: the window partitions by KEY, so one pathological key
  * (a single user with 10⁸ events) lands in one task — the same per-key
  * bound every key-partitioned operator has (cf. [[Scale.saltedJoin]]'s
  * escape hatch for joins). For hot keys, pre-aggregate the RIGHT side
  * into time buckets first (per (key, hour): keep only the latest payload
  * — a groupBy, fully parallel), then as-of join the left rows against the
  * bucketed relation: the window input per key shrinks from |events| to
  * |buckets|, at the cost of intra-bucket resolution handled by a second,
  * now-small, exact pass over the hot buckets only.
  */
object Temporal {

  /** As-of join: for each `left` row, attach the latest `right` payload with
    * `right(rightT) <= left(leftT)` in the same `key` group, as a struct
    * column `__asof` (null when no prior right row exists — filter for
    * inner-asof semantics).
    *
    * Ties: a right row exactly at the left row's time IS visible
    * (inclusive). Among right rows sharing the same time, the one with the
    * greatest `rightTieBreak` wins — deterministic across engines.
    *
    * Null keys follow join semantics: null never matches, so null-key right
    * rows are dropped and null-key left rows pass through with a null
    * `__asof` (they would otherwise co-group in the null window partition
    * and leak payloads to each other).
    *
    * Assumes left/right column names are disjoint from the `__`-prefixed
    * working columns. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftT: String, rightT: String,
               rightPayload: Seq[String], rightTieBreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadType = right.select(struct(rightPayload.map(col): _*)).schema.head.dataType
    val rowType = left.select(struct(leftCols.map(col): _*)).schema.head.dataType
    val tieType = right.schema(rightTieBreak).dataType
    val probes = left.select(
      col(key).as("__k"), col(leftT).as("__t"),
      lit(1).as("__kind"),
      lit(null).cast(tieType).as("__tie"),
      lit(null).cast(payloadType).as("__p"),
      struct(leftCols.map(col): _*).as("__row"))
    val updates = right.filter(col(key).isNotNull).select(
      col(key).as("__k"), col(rightT).as("__t"),
      lit(0).as("__kind"),
      col(rightTieBreak).as("__tie"),
      struct(rightPayload.map(col): _*).as("__p"),
      lit(null).cast(rowType).as("__row"))
    // updates sort before probes at equal time (__kind 0 < 1) → inclusive;
    // the frame ends at the current row, so `last` sees exactly the updates
    // at or before this probe, latest (time, tieBreak) wins
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__kind"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    probes.unionByName(updates)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__kind") === 1)
      .select(leftCols.map(c => col(s"__row.$c").as(c)) :+ col("__asof"): _*)
  }

  /** Attribution-window join (x31): per order, the customer's event count
    * and value mass within `days` after the order — the "activity in the N
    * days after a transaction" feature.
    *
    * Scale shape: an equi-join on the customer key with the time window as
    * a residual range predicate — Catalyst plans the shuffle/broadcast on
    * the EQUALITY key and evaluates the range as a post-join filter, so
    * there is no pair explosion beyond each customer's own rows (per-key
    * skew is the salted-join case, [[Scale.saltedJoin]]). Value mass sums
    * integer cents: per-row conversion is IEEE-identical across engines and
    * integer summation is order-independent. */
  def attributionWindow(s: SparkSession, dir: String, days: Int = 7): DataFrame = {
    val o = graft.Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val e = graft.Tables.eventsTs(s, dir)
      .select(col("user_id"), col("ts"), col("value"))
    o.join(e,
        e("user_id") === o("o_custkey") &&
          e("ts") >= o("o_orderdate") &&
          e("ts") < o("o_orderdate") + expr(s"INTERVAL $days DAYS"),
        "left")
      .groupBy(col("o_orderkey"))
      .agg(count(col("user_id")).as("n_events"),
        (sum(floor(col("value") * 100.0 + 0.5).cast("long")).cast("double") / 100.0)
          .as("value_mass"))
      .orderBy(col("o_orderkey"))
  }

  /** Declared-query form (x30): for each event, the customer's most recent
    * order at or before the event time — the point-in-time feature lookup.
    * Payload values pass through unrounded (no arithmetic → bit-identical
    * to any engine). */
  def asofLastOrder(s: SparkSession, dir: String): DataFrame = {
    val e = graft.Tables.eventsTs(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"))
    val o = graft.Tables.orders(s, dir)
      .select(col("o_custkey").as("user_id"), col("o_orderdate"),
        col("o_orderkey"), col("o_totalprice"))
    asofJoin(e, o, "user_id", "ts", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"), "o_orderkey")
      .filter(col("__asof").isNotNull)
      .select(col("event_id"), col("user_id"),
        col("__asof.o_orderkey").as("last_orderkey"),
        col("__asof.o_totalprice").as("last_price"))
      .orderBy(col("event_id"))
  }
}
