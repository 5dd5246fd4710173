package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  private def assets = Multimodal.assetsFromDocuments(Tables.documents(spark, sfDir))

  test("assets: schema carries binary payload + typed meta map") {
    val schema = assets.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "map")
    assert(assets.select("modality").distinct().count() == 3)
  }

  test("decode: deterministic pseudo-dims, one row per asset, no payload downstream") {
    val d1 = Multimodal.decodeAssets(assets).collect().map(_.toString).sorted
    val d2 = Multimodal.decodeAssets(assets).collect().map(_.toString).sorted
    assert(d1.sameElements(d2))
    assert(d1.length == assets.count())
    val dec = Multimodal.decodeAssets(assets)
    assert(!dec.columns.contains("payload"))
    assert(dec.filter(col("n_pixels") =!= col("width").cast("long") * col("height")).count() == 0)
  }

  test("features: fixed-dim embeddings, deterministic") {
    val f = Multimodal.extractFeatures(assets, dim = 16)
    assert(f.filter(size(col("embedding")) =!= 16).count() == 0)
    val a = f.orderBy("asset_id").limit(3).collect().map(_.toString)
    val b = Multimodal.extractFeatures(assets, dim = 16)
      .orderBy("asset_id").limit(3).collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("frame sampling: every k-th fixed-size chunk kept") {
    val sampled = Multimodal.sampleFrames(assets, frameBytes = 32, everyK = 2)
    val r = sampled.join(assets.select(col("asset_id"), length(col("payload")).as("len")), "asset_id")
      .select("asset_id", "n_frames", "len").collect()
    r.foreach { row =>
      val total = math.ceil(row.getAs[Int]("len").toDouble / 32).toInt
      val expected = (total + 1) / 2   // indices 0,2,4,...
      assert(row.getAs[Int]("n_frames") == expected, s"asset ${row.getLong(0)}")
    }
  }

  test("meta summary: totals consistent with source table") {
    val m = Multimodal.metaSummary(assets)
    val totalChars = m.agg(sum("total_chars")).collect()(0).getLong(0)
    val src = Tables.documents(spark, sfDir).agg(sum("n_chars")).collect()(0).getLong(0)
    assert(totalChars == src)
  }
}
