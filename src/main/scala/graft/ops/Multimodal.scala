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
    * features from an md5 of the payload bytes. STUB — replace with a
    * real codec; md5-derived so a SQL oracle can mirror the exact
    * values (the Spark-side plumbing is what's under test).
    */
  private def decodeKernel(md: java.security.MessageDigest,
      payload: Array[Byte]): (Int, Int, Int, Double) = {
    md.reset()
    val hex = md.digest(payload).map("%02x".format(_)).mkString
    def part(from: Int, len: Int): Long =
      java.lang.Long.parseLong(hex.substring(from, from + len), 16)
    val w = 64 + (part(0, 4) % 1024).toInt
    val h = 64 + (part(4, 4) % 1024).toInt
    val c = 1 + (part(8, 2) % 3).toInt
    val mean = (part(10, 6) % 25600) / 100.0
    (w, h, c, mean)
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
      // per-batch setup (codec init, model load) — here the digest
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val (w, h, c, m) = decodeKernel(md, payload)
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

  /** both the frame hashes and the stubbed decode features are
    * md5-mirrorable in SQL.
    */
  val oracles: Map[String, String] = Map(
    "q_mm_features" ->
      """SELECT doc_id, strlen(text)::INT AS n_bytes,
        |  (64 + ('0x' || substr(md5(text), 1, 4))::BIGINT % 1024)::INT AS width,
        |  (64 + ('0x' || substr(md5(text), 5, 4))::BIGINT % 1024)::INT AS height,
        |  (1 + ('0x' || substr(md5(text), 9, 2))::BIGINT % 3)::INT AS channels,
        |  (('0x' || substr(md5(text), 11, 6))::BIGINT % 25600) / 100.0
        |    AS mean_intensity
        |FROM documents""".stripMargin,
    "q_mm_frames" ->
      """SELECT doc_id, frame_idx,
        |  md5(text || frame_idx::VARCHAR) AS frame_hash
        |FROM documents, (SELECT unnest(range(4)) AS frame_idx) f""".stripMargin,
  )
}
