package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scale

/** Scale utilities: salted joins preserve equi-join semantics; bucketed
  * joins execute without a shuffle; partitioned layouts prune. */
class ScaleSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  test("salted join returns exactly the plain join result") {
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("key"), col("o_totalprice"))
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("key"), col("c_mktsegment"))
    val plain = orders.join(cust, "key").count()
    val salted = Scale.saltedJoin(orders, cust, "key", salts = 8).count()
    assert(salted == plain)
  }

  test("bucketed join plan has no shuffle exchange") {
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_totalprice"))
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("o_custkey"), col("c_acctbal"))
    Scale.writeBucketed(orders, "b_orders", "o_custkey", 4)
    Scale.writeBucketed(cust, "b_cust", "o_custkey", 4)
    val joined = Scale.bucketedJoin(spark, "b_orders", "b_cust", "o_custkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should be shuffle-free:\n$plan")
    assert(joined.count() > 0)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_cust")
  }

  test("x29 declared bucketed query: custkey join shuffle-free, values match plain join") {
    val res = Scale.bucketedSegmentSpend(spark, sfDir)
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(custkey"),
      s"bucketed join side must not shuffle on custkey:\n$plan")
    val plain = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg((sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
          .cast("double") / 100.0).as("spend"), count(lit(1)).as("n_orders"))
      .orderBy(col("c_mktsegment")).collect().map(_.toSeq)
    assert(res.collect().map(_.toSeq).toSeq == plain.toSeq)
    spark.sql("DROP TABLE IF EXISTS graft_bucketed_orders")
    spark.sql("DROP TABLE IF EXISTS graft_bucketed_customer")
  }

  test("partitioned write prunes at scan time") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_part").toString
    Scale.writePartitioned(
      Tables.orders(spark, sfDir).withColumn("status", col("o_orderstatus")),
      tmp, Seq("status"))
    val pruned = spark.read.parquet(tmp).filter(col("status") === "F")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(status"),
      s"expected partition filter in:\n$plan")
    assert(pruned.count() > 0)
  }

  test("compaction: fragmented directory rewritten to sized files, content identical") {
    val ord = Tables.orders(spark, sfDir)
    val base = java.nio.file.Files.createTempDirectory("compact").toString
    val fragDir = s"$base/frag"; val outDir = s"$base/out"
    ord.repartition(40).write.parquet(fragDir)
    val fragFiles = new java.io.File(fragDir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(fragFiles == 40)
    val fragBytes = new java.io.File(fragDir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_")).map(_.length).sum
    val target = math.max(fragBytes / 4, 1L) // expect ~4 output files
    val outFiles = graft.operators.Scale.compact(spark, fragDir, outDir, target)
    assert(outFiles < 40 && outFiles >= 4, s"outFiles=$outFiles")
    val a = ord.orderBy("o_orderkey").collect().map(_.toSeq)
    val b = spark.read.parquet(outDir).orderBy("o_orderkey").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
