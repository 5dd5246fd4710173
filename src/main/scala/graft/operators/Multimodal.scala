package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** D6 — multimodal columns: opaque `binary` payloads with typed metadata,
  * and the partition-wise decode / feature-extract / frame-sample plumbing
  * a media pipeline needs.
  *
  * The decode step is REAL for the containers the JVM ships codecs for:
  * PNG / JPEG / GIF / BMP via `javax.imageio` (width × height × channels)
  * and WAV via a RIFF header parse (channels, sample rate, sample count).
  * Payloads that match no known magic fall back to a deterministic
  * pseudo-decode (`codec = 'opaque'`) so text-backed fixtures still flow;
  * a heavier codec (video, compressed audio) slots into `decodePayload`
  * without touching the Spark-side plumbing.
  *
  * Scale notes: payloads never pass through a shuffle here — decode and
  * feature extraction are `mapPartitions` (narrow, pipelined with the
  * scan); only small derived features (dims, embeddings) flow downstream.
  */
object Multimodal {

  // javax.imageio defaults to a DISK-backed stream cache: every
  // ImageIO.read/write materializes a temp file under java.io.tmpdir, so
  // the decode/resize hot path paid one file create+write+delete per
  // payload — pure overhead here, where payloads are already in-memory
  // byte arrays. Switch the JVM-global default to the memory-backed cache
  // once per executor JVM (this object initializes inside the task closure
  // before the first decode). Trade-off is explicit: peak heap grows by
  // one encoded payload per decode thread, which the executor already
  // budgets for because the byte[] itself is heap-resident.
  //
  // SCOPE WARNING for embedding applications: this is JVM-GLOBAL state —
  // it changes the default for EVERY ImageIO caller in the process,
  // driver and executors alike, including user code outside this library
  // that decodes images too large to buffer in heap (such code should
  // construct its own FileCacheImageInputStream explicitly rather than
  // rely on the process default, which any library may legitimately
  // flip). Within this engine every payload is a heap-resident byte[]
  // bounded by the task batch, so the memory-backed cache is always
  // correct here.
  javax.imageio.ImageIO.setUseCache(false)

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** Wrap the documents table as multimodal assets (text payloads standing
    * in for media blobs; modality assigned round-robin for plumbing tests).
    * `pmod`, not `%`: Spark's `%` keeps the dividend's sign, so a negative
    * id would index `element_at` at 0 (INVALID_INDEX_OF_ZERO) instead of
    * picking a modality; a NULL id yields a NULL modality, not an error. */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    // assetSchema declares asset_id non-nullable: a document with no id
    // cannot become an addressable asset — enforced here so EVERY
    // multimodal operator (aggregates included) sees the same relation
    // the partition-wise decode passes do
    docs.where(col("doc_id").isNotNull).select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("payload"),
      map(lit("lang"), col("lang"), lit("source"), col("source"),
          lit("n_chars"), col("n_chars").cast("string")).as("meta"))

  /** One decoded payload: container + the per-modality stats that apply
    * (image fields null for audio and vice versa). */
  final case class Decoded(codec: String, width: Integer, height: Integer,
                           channels: Integer, nPixels: java.lang.Long,
                           sampleRate: Integer, nSamples: java.lang.Long)

  /** Fallback pseudo-decode for payloads with no recognizable container:
    * deterministic dims derived from the bytes, so opaque fixtures still
    * exercise the full plumbing. */
  private def opaqueDecode(payload: Array[Byte]): Decoded = {
    if (payload == null || payload.isEmpty)
      Decoded("opaque", 0, 0, 0, 0L, null, null)
    else {
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
      val w = 64 + math.floorMod(h, 1024).toInt
      val ht = 64 + math.floorMod(h >> 10, 1024).toInt
      Decoded("opaque", w, ht, 1, w.toLong * ht, null, null)
    }
  }

  private def readLeShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def readLeInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** WAV (RIFF/WAVE) header parse: walk the chunk list for `fmt ` and
    * `data`; n_samples = data bytes / block align. Pure byte arithmetic —
    * no AudioSystem dependency, deterministic. */
  private def decodeWav(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 44) return None
    var channels = 0; var sampleRate = 0; var blockAlign = 0
    var dataBytes = -1L
    var off = 12
    while (off + 8 <= b.length) {
      val id = new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = readLeInt(b, off + 4).toLong & 0xffffffffL
      if (id == "fmt " && off + 24 <= b.length) {
        channels = readLeShort(b, off + 10)
        sampleRate = readLeInt(b, off + 12)
        blockAlign = readLeShort(b, off + 20)
      } else if (id == "data") {
        dataBytes = math.min(size, (b.length - off - 8).toLong)
      }
      val step = 8L + size + (size & 1L) // chunks are word-aligned
      off = if (off + step > b.length.toLong) b.length else (off + step).toInt
    }
    // sampleRate is read as a signed int: a crafted fmt chunk with the
    // high bit set would otherwise flow a NEGATIVE sample_rate into the
    // decode audit instead of falling back to the opaque pseudo-decode
    if (channels <= 0 || sampleRate <= 0 || blockAlign <= 0 || dataBytes < 0) None
    else Some(Decoded("wav", null, null, channels, null, sampleRate,
      dataBytes / blockAlign))
  }

  private def decodeImage(codec: String, b: Array[Byte]): Option[Decoded] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      if (img == null) None
      else Some(Decoded(codec, img.getWidth, img.getHeight,
        img.getColorModel.getNumComponents,
        img.getWidth.toLong * img.getHeight, null, null))
    } catch { case _: Exception => None }

  /** Sniff the container by magic bytes and decode. Real codecs: PNG,
    * JPEG, GIF, BMP (JDK ImageIO), WAV (RIFF parse). Unknown → opaque
    * pseudo-decode. */
  private[operators] def decodePayload(payload: Array[Byte]): Decoded = {
    if (payload == null || payload.length < 12) return opaqueDecode(payload)
    val b = payload
    val real =
      if ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
        decodeImage("png", b)
      else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff)
        decodeImage("jpeg", b)
      else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8')
        decodeImage("gif", b)
      else if (b(0) == 'B' && b(1) == 'M')
        decodeImage("bmp", b)
      else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')
        decodeWav(b)
      else None
    real.getOrElse(opaqueDecode(payload))
  }

  /** An asset with a NULL id (broken upstream record) is unaddressable —
    * nothing downstream could join its decode output back — and would
    * NPE the primitive `getLong` reads in the partition-wise passes, so
    * the RDD-backed operators drop such rows at their boundary. */
  private def keyed(assets: DataFrame): DataFrame =
    assets.where(col("asset_id").isNotNull)

  /** Partition-wise decode: binary payload → (codec, width, height,
    * channels, n_pixels, sample_rate, n_samples). One pass, no shuffle;
    * payload dropped after decode. */
  def decodeAssets(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType), StructField("modality", StringType),
      StructField("codec", StringType),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("n_pixels", LongType),
      StructField("sample_rate", IntegerType),
      StructField("n_samples", LongType)))
    val rdd = keyed(assets).select("asset_id", "modality", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val d = decodePayload(r.getAs[Array[Byte]]("payload"))
        Row(r.getLong(0), r.getString(1), d.codec, d.width, d.height,
          d.channels, d.nPixels, d.sampleRate, d.nSamples)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** STUB feature extractor: payload → dense float embedding (deterministic
    * rolling-hash projection; a real model inference call slots in here,
    * batched per partition exactly like this). */
  def extractFeatures(assets: DataFrame, dim: Int = 16): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    val rdd = keyed(assets).select("asset_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]]("payload")
        val emb = new Array[Float](dim)
        if (bytes != null) {
          var i = 0
          while (i < bytes.length) {
            val j = i % dim
            emb(j) = emb(j) + bytes(i) * (1.0f / 127.0f)
            i += 1
          }
        }
        Row(r.getLong(0), emb.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Partition-wise image resize: decode a recognized image container,
    * rescale to `targetW × targetH` (bilinear), re-encode as PNG; payloads
    * that are not decodable images pass through with `resized = false` and
    * the original bytes. Real pixels end-to-end via the JDK codec — the
    * standard thumbnail/normalize step before a vision encoder. One
    * narrow pass; only the (usually smaller) resized payload flows on. */
  def resizeImages(assets: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    require(targetW >= 1 && targetH >= 1, "target dims must be >= 1")
    val spark = assets.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType), StructField("modality", StringType),
      StructField("resized", BooleanType),
      StructField("payload", BinaryType),
      StructField("width", IntegerType), StructField("height", IntegerType)))
    val rdd = keyed(assets).select("asset_id", "modality", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]]("payload")
        val img =
          try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
            if (bytes == null) Array.emptyByteArray else bytes)))
          catch { case _: Exception => None }
        img match {
          case Some(src) =>
            val dst = new java.awt.image.BufferedImage(targetW, targetH,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(src, 0, 0, targetW, targetH, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", bos)
            Row(r.getLong(0), r.getString(1), true, bos.toByteArray, targetW, targetH)
          case None =>
            Row(r.getLong(0), r.getString(1), false, bytes, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling: split payload into fixed-size "frames" and keep every
    * k-th (the video-pipeline access pattern, as pure byte plumbing).
    * Null or empty payloads yield zero frames — without the guard,
    * `sequence(0, -1)` auto-descends and emits two phantom frames for an
    * empty blob, and a null payload propagates to `size(null) = -1`. */
  def sampleFrames(assets: DataFrame, frameBytes: Int, everyK: Int): DataFrame = {
    // frameBytes = 0 would make the floor() division NULL (non-ANSI ÷0),
    // so sequence(0, NULL) → NULL frames → n_frames = -1 — the same
    // silent-poison class the empty-payload guard below closes; everyK = 0
    // would make `i % 0` NULL and silently drop every frame
    require(frameBytes >= 1 && everyK >= 1,
      s"sampleFrames: frameBytes ($frameBytes) and everyK ($everyK) must be >= 1")
    assets.select(col("asset_id"),
        when(coalesce(length(col("payload")), lit(0)) === 0,
          expr("CAST(array() AS ARRAY<BINARY>)"))
          .otherwise(expr(
            s"transform(sequence(0, CAST(floor((length(payload) - 1) / $frameBytes) AS INT)), " +
              s"i -> substring(payload, i * $frameBytes + 1, $frameBytes))"))
          .as("frames"))
      .select(col("asset_id"),
        expr(s"filter(frames, (f, i) -> i % $everyK = 0)").as("sampled_frames"))
      .withColumn("n_frames", size(col("sampled_frames")))
  }

  /** Decoded-asset profile: per (modality, codec) counts and pixel/sample
    * mass — the query-able audit of the decode pass (one narrow decode
    * scan, one bounded-key aggregate). */
  def decodeStats(assets: DataFrame): DataFrame =
    decodeAssets(assets)
      .groupBy(col("modality"), col("codec"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_pixels")).as("total_pixels"),
        sum(col("n_samples")).as("total_samples"))
      .orderBy(col("modality"), col("codec"))

  /** Metadata aggregation over the typed meta map — the query-able side of
    * multimodal assets. */
  def metaSummary(assets: DataFrame): DataFrame =
    assets.groupBy(col("modality"))
      .agg(count(lit(1)).as("n"),
        sum(length(col("payload"))).as("total_bytes"),
        sum(element_at(col("meta"), "n_chars").cast("long")).as("total_chars"))
      .orderBy(col("modality"))
}
