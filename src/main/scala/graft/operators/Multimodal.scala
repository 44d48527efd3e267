package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, plus a partition-wise feature extractor.
  *
  * The Spark-side architecture is real and tested: schema (binary payload +
  * metadata struct), partitioning, and the batched per-partition UDF shape
  * (`mapPartitions` over an iterator — the JVM analog of `mapInPandas`:
  * the extractor sees a stream of rows per partition and can amortize model
  * or codec initialization across the batch).
  *
  * The DECODE STEP IS A STUB: this container has no image/audio codecs, so
  * `decodeStub` produces deterministic fake features from the raw bytes.
  * Swapping in a real decoder (JavaCV, TwelveMonkeys, a JNI codec) changes
  * only the function body — the distributed plumbing is unchanged.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaFeature(doc_id: Long, n_bytes: Int, checksum: Long,
                          width: Int, height: Int, brightness: Double)

  /** Wrap a text corpus as opaque binary payloads + metadata struct —
    * stand-in for image/audio bytes landed by an ingest job. */
  def payloads(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        octet_length(encode(col(textCol), "UTF-8")).as("n_bytes"),
        lit("utf8-blob").as("mime"),
        substring(col(textCol), 1, 8).as("head")).as("meta"))

  /** ??? real decode — STUB. Deterministic fake "decode" so tests exercise
    * the full distributed path: a Horner checksum over the bytes drives the
    * fake geometry/brightness. */
  private def decodeStub(bytes: Array[Byte]): (Int, Int, Double) = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) { acc = (acc * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
    val width = (acc % 640 + 64).toInt
    val height = ((acc / 640) % 480 + 48).toInt
    val brightness = (acc % 10000) / 10000.0
    (width, height, brightness)
  }

  /** Horner checksum (public for differential tests). */
  def checksum(bytes: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) { acc = (acc * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
    acc
  }

  case class Frame(doc_id: Long, frame_idx: Int, offset: Int, n_bytes: Int,
                   frame_checksum: Long)

  /** One-to-many frame sampling — the video analog of the decode seam: each
    * payload yields `nFrames` evenly-strided byte windows ("frames"),
    * checksummed. A real codec replaces the byte-window slice with actual
    * frame decode; the flatMap/iterator plumbing (and a resize = same
    * map-shaped seam as `extractFeatures`) is unchanged. */
  def frameSample(spark: SparkSession, media: DataFrame,
                  nFrames: Int = 3, frameLen: Int = 16): Dataset[Frame] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .flatMap { r =>
        val n = r.payload.length
        val stride = n / nFrames
        (0 until nFrames).iterator.map { k =>
          val from = k * stride
          val until = math.min(from + frameLen, n)
          val slice = java.util.Arrays.copyOfRange(r.payload, from, until)
          Frame(r.doc_id, k, from, until - from, checksum(slice))
        }
      }
  }

  /** Resize planning over extracted geometry: contain-fit each frame into
    * a `box`×`box` target (downscale only), floor-rounded — the pure
    * column-arithmetic half of a resize stage; the pixel work would ride
    * the same mapPartitions seam as the decode. floor (not round) keeps
    * the output engine-reproducible: half-way cases are never hit. */
  def resizePlan(features: DataFrame, box: Int = 224): DataFrame = {
    val scale = least(lit(1.0), lit(box.toDouble) / greatest(col("width"), col("height")))
    features.select(
      col("doc_id"), col("width"), col("height"),
      floor(col("width") * scale).cast("int").as("out_w"),
      floor(col("height") * scale).cast("int").as("out_h"))
  }

  case class MediaEmbedding(doc_id: Long, emb: Array[Float])

  /** ??? real encoder — STUB. Media-to-embedding through the SAME
    * partition-batched seam as `extractFeatures`: each payload splits into
    * `dims` byte-stride slices, each Horner-checksummed into a [0, 1)
    * float — a deterministic fake for an image/audio encoder's forward
    * pass. A real model replaces only the per-row body (and loads its
    * weights once per partition, where the comment sits); the output
    * column (`Array[Float]`) is exactly the embeddings-table shape, so
    * everything in `Similarity` composes downstream unchanged. */
  def encodeEmbedding(spark: SparkSession, media: DataFrame,
                      dims: Int = 8): Dataset[MediaEmbedding] = {
    import spark.implicits._
    require(dims > 0, s"dims must be positive, got $dims")
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        // per-partition init (encoder weights, ONNX session) would go here
        rows.map { r =>
          val n = r.payload.length
          val stride = math.max(1, n / dims)
          val emb = Array.tabulate(dims) { j =>
            val from = math.min(j * stride, n)
            val until = if (j == dims - 1) n else math.min(from + stride, n)
            val cs = checksum(java.util.Arrays.copyOfRange(r.payload, from, until))
            ((cs % 10000L) / 10000.0).toFloat
          }
          MediaEmbedding(r.doc_id, emb)
        }
      }
  }

  /** Partition-batched feature extraction — the mapInPandas-shaped seam.
    * One iterator per partition: codec/model init happens once per batch,
    * rows stream through without materializing the partition. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        // per-partition init would go here (codec handles, model weights)
        rows.map { r =>
          val (w, h, b) = decodeStub(r.payload)
          MediaFeature(r.doc_id, r.payload.length, checksum(r.payload), w, h, b)
        }
      }
  }
}
