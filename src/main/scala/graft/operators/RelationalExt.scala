package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Second relational capability slice: window frames (running/moving
  * aggregates), ranking families, first/last value, full-outer joins,
  * scalar/IN subqueries — the latter two via the `spark.sql` interface over
  * registered views, demonstrating the engine's SQL surface alongside the
  * DataFrame API.
  *
  * Scale notes: all windows partition by a key (custkey / segment); the
  * monthly moving average windows over an already-aggregated series
  * (O(months) rows). Subquery forms compile to the same broadcast-joined
  * plans Catalyst produces for the DataFrame forms.
  */
object RelationalExt {

  private def viewsFor(s: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => Tables.load(s, dir, n).createOrReplaceTempView(n))

  /** Running total per customer (frame: unbounded preceding → current). */
  def runningTotal(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(w), 2).as("running_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Centered-trailing moving average (3-month window) over the monthly
    * revenue series — window over a pre-aggregated tiny relation. */
  def movingAvg(s: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(s, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month"))
      .agg(sum(col("o_totalprice")).as("rev"))
    val w = Window.orderBy(col("month")).rowsBetween(-2, 0)
    monthly.select(col("month"),
        round(col("rev"), 2).as("rev"),
        round(avg(col("rev")).over(w), 2).as("rev_ma3"))
      .orderBy(col("month"))
  }

  /** Quartile assignment + per-quartile stats (ntile). */
  def priceQuartiles(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, dir)
      .select(ntile(4).over(w).cast("long").as("quartile"), col("o_totalprice"))
      .groupBy(col("quartile"))
      .agg(count(lit(1)).as("n"), round(avg(col("o_totalprice")), 2).as("avg_price"))
      .orderBy(col("quartile"))
  }

  /** Ranking family within market segment: rank / dense_rank /
    * percent_rank over account balance. */
  def segmentRanks(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, dir)
      .select(col("c_mktsegment"), col("c_custkey"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        Features.pround(percent_rank().over(w), 6).as("prnk"))
      .filter(col("rnk") <= 5)
      .orderBy(col("c_mktsegment"), col("rnk"), col("c_custkey"))
  }

  /** First and last order price per customer (first_value/last_value over
    * the full partition frame). */
  def firstLastOrder(s: SparkSession, dir: String): DataFrame = {
    val wf = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir)
      .select(col("o_custkey"),
        first_value(col("o_totalprice")).over(wf).as("first_price"),
        last_value(col("o_totalprice")).over(wf).as("last_price"))
      .distinct()
      .orderBy(col("o_custkey"))
  }

  /** Full-outer join: per-nation customer vs supplier counts (sparse
    * supplier side exercises null rows on both legs). */
  def nationCoverage(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val sup = Tables.supplier(s, dir).groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(sup, Seq("nationkey"), "full_outer")
      .select(col("nationkey"), col("n_cust"), col("n_supp"))
      .orderBy(col("nationkey").asc_nulls_first)
  }

  /** Scalar subquery via the SQL interface: orders above the global
    * average price, per priority. */
  def aboveAvgOrders(s: SparkSession, dir: String): DataFrame = {
    viewsFor(s, dir, "orders")
    s.sql(
      """SELECT o_orderpriority, count(*) AS n,
        |       round(sum(o_totalprice), 2) AS sum_price
        |FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  /** IN-subquery via the SQL interface: customers holding an urgent order. */
  def urgentCustomers(s: SparkSession, dir: String): DataFrame = {
    viewsFor(s, dir, "orders", "customer")
    s.sql(
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders
        |                    WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Three-way fact-dimension join: revenue by part brand (broadcast both
    * dimensions). */
  def revenueByBrand(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir)
    val sup = Tables.supplier(s, dir)
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
      .groupBy(col("p_brand"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        countDistinct(col("s_suppkey")).as("n_suppliers"))
      .orderBy(col("p_brand"))
  }

  /** TPC-H Q3-shaped: shipping priority — top unshipped-revenue orders for
    * one market segment (3-way join, filter both sides, grouped top-k). */
  def shippingPriority(s: SparkSession, dir: String, k: Int): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"),
        col("o_orderdate").cast("timestamp_ntz").as("o_orderdate"),
        col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(k)
  }

  /** TPC-H Q5-shaped: revenue by nation within one region where the
    * supplying and ordering nations match (5-way join through region). */
  def localSupplierVolume(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    val sup = Tables.supplier(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey") &&
        c("c_nationkey") === sup("s_nationkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  /** TPC-H Q7-shaped: trade volume between (customer nation, supplier
    * nation) pairs — the same dimension joined twice under different
    * roles (both broadcast). */
  def nationPairVolume(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val sup = Tables.supplier(s, dir)
    val n1 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val n2 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n1), c("c_nationkey") === col("c_nk"))
      .join(broadcast(n2), sup("s_nationkey") === col("s_nk"))
      .filter(col("cust_nation") =!= col("supp_nation"))
      .groupBy(col("cust_nation"), col("supp_nation"))
      // sum in integer cents: per-row terms are IEEE-identical across
      // engines, and integer summation is order-independent — so the group
      // total is deterministic where a double sum differs in the last ulp
      // (observed: 4/600 groups split by round(·,2) at sf0.01)
      .agg((sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0 + 0.5)
          .cast("long")).cast("double") / 100.0).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("cust_nation"), col("supp_nation"))
  }

  /** Approximate distinct counts (HLL++) per language — values are
    * engine-specific (rows-only check); the exact form is d2_dedup_stats. */
  def approxDistinctTexts(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(col("lang"))
      .agg(approx_count_distinct(col("text"), 0.01).as("approx_unique"),
        count(lit(1)).as("n_total"))
      .orderBy(col("lang"))

  /** Explicit GROUPING SETS via the SQL interface (completes the grouped
    * aggregation family next to rollup/cube). */
  def groupingSets(s: SparkSession, dir: String): DataFrame = {
    viewsFor(s, dir, "orders")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |       round(sum(o_totalprice), 2) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
  }

  /** UNION vs UNION ALL semantics in one relation. */
  def unionSemantics(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    val p = o.filter(col("o_orderstatus") === "P").select(col("o_custkey"))
    val unionAllCnt = f.unionAll(p).agg(count(lit(1)).as("n_union_all"))
    val unionCnt = f.union(p).distinct().agg(count(lit(1)).as("n_union_distinct"))
    unionAllCnt.crossJoin(unionCnt)
  }
}
