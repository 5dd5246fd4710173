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

  test("frame sampling rejects degenerate parameters loudly") {
    // frameBytes = 0 would silently yield n_frames = -1 (÷0 → NULL →
    // size(NULL)) and everyK = 0 would silently drop every frame (i % 0
    // is NULL) — both the silent-poison class, both named errors instead
    intercept[IllegalArgumentException] {
      Multimodal.sampleFrames(assets, frameBytes = 0, everyK = 2)
    }
    intercept[IllegalArgumentException] {
      Multimodal.sampleFrames(assets, frameBytes = 32, everyK = 0)
    }
  }

  test("decode: real PNG payload yields true width/height/channels") {
    import spark.implicits._
    // a real 7×5 RGB PNG written through the same codec family that reads it
    val img = new java.awt.image.BufferedImage(7, 5,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 7).foreach(x => (0 until 5).foreach(y =>
      img.setRGB(x, y, x * 40 + y)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val gifBos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", gifBos)
    val df = Seq(
      (1L, "image", bos.toByteArray, Map.empty[String, String]),
      (2L, "image", gifBos.toByteArray, Map.empty[String, String]))
      .toDF("asset_id", "modality", "payload", "meta")
    val rows = Multimodal.decodeAssets(df).orderBy("asset_id").collect()
    assert(rows(0).getAs[String]("codec") == "png")
    assert(rows(0).getAs[Int]("width") == 7 && rows(0).getAs[Int]("height") == 5)
    assert(rows(0).getAs[Int]("channels") == 3)
    assert(rows(0).getAs[Long]("n_pixels") == 35L)
    assert(rows(1).getAs[String]("codec") == "gif")
    assert(rows(1).getAs[Int]("width") == 7 && rows(1).getAs[Int]("height") == 5)
  }

  test("decode: real WAV payload yields channels/sample_rate/n_samples") {
    import spark.implicits._
    // hand-assembled 16-bit stereo 8kHz WAV with 100 samples per channel
    val channels = 2; val rate = 8000; val bps = 16; val nSamples = 100
    val blockAlign = channels * bps / 8
    val dataBytes = nSamples * blockAlign
    val buf = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(channels.toShort).putInt(rate)
      .putInt(rate * blockAlign).putShort(blockAlign.toShort).putShort(bps.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataBytes)
    (0 until dataBytes / 2).foreach(i => buf.putShort((i * 13).toShort))
    val df = Seq((9L, "audio", buf.array(), Map.empty[String, String]))
      .toDF("asset_id", "modality", "payload", "meta")
    val r = Multimodal.decodeAssets(df).collect()(0)
    assert(r.getAs[String]("codec") == "wav")
    assert(r.getAs[Int]("channels") == 2)
    assert(r.getAs[Int]("sample_rate") == 8000)
    assert(r.getAs[Long]("n_samples") == 100L)
    assert(r.isNullAt(r.fieldIndex("width")))
  }

  test("resize: real PNG rescaled to target dims and re-decodable; opaque passes through") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(16, 12,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 16).foreach(x => (0 until 12).foreach(y => img.setRGB(x, y, x * 17 + y)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val df = Seq(
      (1L, "image", bos.toByteArray),
      (2L, "text", "not an image at all".getBytes("UTF-8")))
      .toDF("asset_id", "modality", "payload")
    val out = Multimodal.resizeImages(df, 8, 6).orderBy("asset_id").collect()
    assert(out(0).getAs[Boolean]("resized"))
    assert(out(0).getAs[Int]("width") == 8 && out(0).getAs[Int]("height") == 6)
    // the resized payload is itself a decodable 8×6 PNG
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(0).getAs[Array[Byte]]("payload")))
    assert(back.getWidth == 8 && back.getHeight == 6)
    assert(!out(1).getAs[Boolean]("resized"))
    assert(new String(out(1).getAs[Array[Byte]]("payload"), "UTF-8") == "not an image at all")
    assert(out(1).isNullAt(out(1).fieldIndex("width")))
  }

  test("decode: truncated/garbage containers fall back to opaque, never throw") {
    import spark.implicits._
    val junk: Array[Byte] = Array(0x89.toByte, 'P', 'N', 'G', 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)
    val riffJunk = "RIFFxxxxWAVEgarbage".getBytes("US-ASCII")
    val df = Seq(
      (1L, "image", junk, Map.empty[String, String]),
      (2L, "audio", riffJunk, Map.empty[String, String]))
      .toDF("asset_id", "modality", "payload", "meta")
    val rows = Multimodal.decodeAssets(df).orderBy("asset_id").collect()
    assert(rows.forall(_.getAs[String]("codec") == "opaque"))
  }

  test("decode: a crafted WAV with a high-bit sample rate falls back to opaque") {
    import spark.implicits._
    // sample-rate bytes >= 0x80000000 read back as a NEGATIVE signed int —
    // a well-formed RIFF/WAVE container with corrupt metadata must reject
    // to the opaque pseudo-decode, not flow sample_rate < 0 into the audit
    val channels = 2; val bps = 16; val nSamples = 4
    val blockAlign = channels * bps / 8
    val dataBytes = nSamples * blockAlign
    val buf = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(channels.toShort).putInt(0x80000001)
      .putInt(8000 * blockAlign).putShort(blockAlign.toShort).putShort(bps.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataBytes)
    (0 until dataBytes / 2).foreach(i => buf.putShort((i * 13).toShort))
    val df = Seq((11L, "audio", buf.array(), Map.empty[String, String]))
      .toDF("asset_id", "modality", "payload", "meta")
    val r = Multimodal.decodeAssets(df).collect()(0)
    assert(r.getAs[String]("codec") == "opaque", s"got codec=${r.getAs[String]("codec")}")
    assert(r.isNullAt(r.fieldIndex("sample_rate")))
  }

  test("decode stats: per (modality, codec) totals cover every asset") {
    val stats = Multimodal.decodeStats(assets).collect()
    assert(stats.map(_.getAs[Long]("n")).sum == assets.count())
    // document-backed payloads are all opaque containers
    assert(stats.forall(_.getAs[String]("codec") == "opaque"))
    assert(stats.map(_.getAs[String]("modality")).distinct.sorted.toSeq ==
      Seq("audio", "image", "video"))
  }

  test("meta summary: totals consistent with source table") {
    val m = Multimodal.metaSummary(assets)
    val totalChars = m.agg(sum("total_chars")).collect()(0).getLong(0)
    val src = Tables.documents(spark, sfDir).agg(sum("n_chars")).collect()(0).getLong(0)
    assert(totalChars == src)
  }
}
