package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** Multimodal-column plumbing: media as opaque `binary` payloads with a
  * typed metadata struct, processed by batched per-partition kernels —
  * the Spark-side shape (schema, partitioning, batch iteration) is real
  * and tested; the actual media decode is STUBBED with a deterministic
  * fake (this environment ships no image/audio codecs). Swapping the
  * stub for a real decoder (e.g. a JNI codec or an Arrow-batched Python
  * worker) changes only `decodeKernel`.
  */
object Multimodal {

  /** Deterministic fake "decode": derives pseudo width/height/channel
    * features from the payload bytes. STUB — replace with a real codec.
    */
  private def decodeKernel(payload: Array[Byte]): (Int, Int, Int, Double) = {
    val h = java.util.Arrays.hashCode(payload)
    val w = 64 + math.abs(h % 1024)          // fake width
    val ht = 64 + math.abs((h >> 10) % 1024) // fake height
    val c = 1 + math.abs(h % 3)              // fake channels
    val mean = (payload.take(1024).map(_ & 0xff).sum.toDouble /
      math.min(math.max(payload.length, 1), 1024))
    (w, ht, c, mean)
  }

  val featureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("mean_intensity", DoubleType)))

  /** documents → binary payload + metadata → per-partition batched
    * feature extraction (mapPartitions ≙ mapInPandas batch shape: the
    * kernel sees an iterator of rows per partition, amortizing any
    * per-batch model/codec setup).
    */
  def mediaFeatures(s: SparkSession, d: String): DataFrame = {
    val withPayload = documents(s, d)
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        struct(col("source"), col("lang"), col("n_chars")).as("meta"))
      .repartition(col("doc_id") % 8) // co-locate batches deterministically
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    withPayload.mapPartitions { it =>
      // per-batch setup would go here (codec init, model load)
      it.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val (w, h, c, m) = decodeKernel(payload)
        Row(r.getAs[Long]("doc_id"), payload.length, w, h, c, m)
      }
    }(enc)
  }

  /** Frame-sampling shape: explode a payload into N fixed-offset chunk
    * "frames" with per-frame hashes — the partition/explode plumbing of
    * video frame extraction, with the decoder stubbed.
    */
  def frameSample(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .withColumn("frame_idx", explode(sequence(lit(0), lit(3))))
      .select(col("doc_id"), col("frame_idx"),
        md5(concat(col("payload"),
          col("frame_idx").cast("string").cast("binary"))).as("frame_hash"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_features" -> (mediaFeatures _),
    "q_mm_frames" -> (frameSample _),
  )

  /** frame hashes are md5-mirrorable in SQL; features are stub-only. */
  val oracles: Map[String, String] = Map(
    "q_mm_frames" ->
      """SELECT doc_id, frame_idx,
        |  md5(text || frame_idx::VARCHAR) AS frame_hash
        |FROM documents, (SELECT unnest(range(4)) AS frame_idx) f""".stripMargin,
  )
}
