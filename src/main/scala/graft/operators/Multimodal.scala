package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** D6 — multimodal columns: opaque `binary` payloads with typed metadata,
  * and the partition-wise decode / feature-extract / frame-sample plumbing
  * a media pipeline needs.
  *
  * The decode step itself is STUBBED (deterministic fake — image/audio
  * codecs are not in this environment); everything around it is real:
  * schema, batch shape, partition-wise execution, output contracts. Swap
  * `stubDecode` for a JNI/codec call and nothing else changes.
  *
  * Scale notes: payloads never pass through a shuffle here — decode and
  * feature extraction are `mapPartitions` (narrow, pipelined with the
  * scan); only small derived features (dims, embeddings) flow downstream.
  */
object Multimodal {

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** Wrap the documents table as multimodal assets (text payloads standing
    * in for media blobs; modality assigned round-robin for plumbing tests). */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("payload"),
      map(lit("lang"), col("lang"), lit("source"), col("source"),
          lit("n_chars"), col("n_chars").cast("string")).as("meta"))

  /** STUB decoder: derives deterministic pseudo-dimensions from the payload
    * bytes. Replace with a real codec; the signature (bytes → struct) and
    * the partition-wise batch execution are the production shape. */
  private def stubDecode(payload: Array[Byte]): (Int, Int, Long) = {
    if (payload == null || payload.isEmpty) (0, 0, 0L)
    else {
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
      val w = 64 + math.floorMod(h, 1024).toInt
      val ht = 64 + math.floorMod(h >> 10, 1024).toInt
      (w, ht, w.toLong * ht)
    }
  }

  /** Partition-wise decode: binary payload → (width, height, n_pixels).
    * One pass, no shuffle; payload dropped after decode. */
  def decodeAssets(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType), StructField("modality", StringType),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("n_pixels", LongType)))
    val rdd = assets.select("asset_id", "modality", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val (w, h, np) = stubDecode(r.getAs[Array[Byte]]("payload"))
        Row(r.getLong(0), r.getString(1), w, h, np)
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
    val rdd = assets.select("asset_id", "payload").rdd.mapPartitions { it =>
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

  /** Frame sampling: split payload into fixed-size "frames" and keep every
    * k-th (the video-pipeline access pattern, as pure byte plumbing). */
  def sampleFrames(assets: DataFrame, frameBytes: Int, everyK: Int): DataFrame =
    assets.select(col("asset_id"),
        expr(s"transform(sequence(0, CAST(floor((length(payload) - 1) / $frameBytes) AS INT)), " +
          s"i -> substring(payload, i * $frameBytes + 1, $frameBytes))").as("frames"))
      .select(col("asset_id"),
        expr(s"filter(frames, (f, i) -> i % $everyK = 0)").as("sampled_frames"))
      .withColumn("n_frames", size(col("sampled_frames")))

  /** Metadata aggregation over the typed meta map — the query-able side of
    * multimodal assets. */
  def metaSummary(assets: DataFrame): DataFrame =
    assets.groupBy(col("modality"))
      .agg(count(lit(1)).as("n"),
        sum(length(col("payload"))).as("total_bytes"),
        sum(element_at(col("meta"), "n_chars").cast("long")).as("total_chars"))
      .orderBy(col("modality"))
}
