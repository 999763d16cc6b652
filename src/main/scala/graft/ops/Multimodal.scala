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

  /** Pluggable per-partition decode kernel — the seam between the
    * Spark-side plumbing (schema, partitioning, batch shape — real and
    * tested) and the media codec (environment-dependent). Implementations
    * must be deterministic per payload so replays converge.
    */
  sealed trait MediaDecoder extends Serializable {
    def name: String
    /** Open once per partition, map the batch, release on exhaustion —
      * the mapInPandas/mapInArrow batch contract expressed in Scala.
      */
    def decodePartition(batch: Iterator[Array[Byte]])
        : Iterator[(Int, Int, Int, Double)]
  }

  /** Deterministic fake "decode": derives pseudo width/height/channel
    * features from an md5 of the payload bytes. STUB for environments
    * without media codecs; md5-derived so a SQL oracle can mirror the
    * exact values (the Spark-side plumbing is what's under test).
    */
  case object StubDecoder extends MediaDecoder {
    val name = "stub"
    def decodePartition(batch: Iterator[Array[Byte]])
        : Iterator[(Int, Int, Int, Double)] = {
      val md = java.security.MessageDigest.getInstance("MD5") // per-batch setup
      batch.map { payload =>
        md.reset()
        val hex = md.digest(payload).map("%02x".format(_)).mkString
        def part(from: Int, len: Int): Long =
          java.lang.Long.parseLong(hex.substring(from, from + len), 16)
        (64 + (part(0, 4) % 1024).toInt, 64 + (part(4, 4) % 1024).toInt,
          1 + (part(8, 2) % 3).toInt, (part(10, 6) % 25600) / 100.0)
      }
    }
  }

  /** Real-codec seam: one external Python worker per partition, payloads
    * streamed as length-prefixed frames on stdin, features read back one
    * line per payload — the process-isolation shape of mapInArrow (batch
    * amortizes interpreter startup; executors never link the codec). The
    * worker tries PIL per frame when importable; without PIL it still
    * REALLY decodes 8-bit non-interlaced PNGs of color type 0/2/4/6 via
    * a pure-stdlib parser (zlib inflate + scanline unfilter, PIL's
    * exact fixed-point luma for the mean — for THAT PNG subset both
    * paths report identical features; palette/16-bit/interlaced PNGs
    * decode only under PIL and stub otherwise), and parses real
    * dimensions/components from JPEG SOF0/SOF2 frame headers (pixel
    * stats stay stub arithmetic — stdlib has no entropy decoder); any
    * other payload falls back to the SAME md5 arithmetic as StubDecoder
    * (under PIL too: a payload PIL refuses retries the stdlib parsers
    * before stubbing, so structurally-valid headers yield real metadata
    * on every node). That
    * per-frame fallback is load-bearing: it makes the decoder total (a
    * text corpus run in a codec-capable environment still succeeds and
    * still matches the md5 oracle) instead of dying on the first
    * non-image byte string.
    *
    * Payloads stream through in bounded chunks (never a whole-partition
    * buffer); chunk size is small enough that the result lines of one
    * chunk fit the OS pipe buffer, so writer and reader cannot deadlock.
    * Worker stderr is inherited (no unread pipe to fill and block on);
    * the process is destroyed on any failure path, and a
    * TaskContext completion listener destroys it even when the returned
    * iterator is never exhausted (limit/take, downstream failure) — the
    * paths where tail-based cleanup alone would leak the worker.
    *
    * If THIS executor cannot start the interpreter at all (heterogeneous
    * cluster where the driver-side probe passed but a worker node has no
    * python3), the partition falls back to the stub arithmetic — the
    * same md5 formula the worker itself uses for undecodable payloads —
    * so the task succeeds and non-media corpora stay bit-identical
    * across mixed fleets. Only genuinely decodable payloads can differ
    * per-executor in that degenerate deployment, which is the documented
    * trade for totality.
    */
  final case class PythonProcessDecoder(python: String = "python3")
      extends MediaDecoder {
    val name = "python"
    private val chunkRows = 64

    def decodePartition(batch: Iterator[Array[Byte]])
        : Iterator[(Int, Int, Int, Double)] = {
      if (!batch.hasNext) return Iterator.empty
      val pb = new ProcessBuilder(python, "-c", PythonProcessDecoder.worker)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val proc =
        try pb.start()
        catch { case _: java.io.IOException =>
          // executor-local fallback (see class doc): no interpreter on
          // this node — stub arithmetic instead of a task failure
          return StubDecoder.decodePartition(batch)
        }
      // destroy on EVERY task exit path — a partially consumed iterator
      // (limit/take, downstream exception) never reaches the tail below
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => proc.destroyForcibly()))
      val out = new java.io.DataOutputStream(
        new java.io.BufferedOutputStream(proc.getOutputStream))
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))
      def fail(msg: String): Nothing = {
        proc.destroyForcibly()
        throw new IllegalStateException(msg)
      }
      val decoded = batch.grouped(chunkRows).flatMap { chunk =>
        try {
          chunk.foreach { p => out.writeInt(p.length); out.write(p) }
          out.flush()
        } catch {
          case e: java.io.IOException => fail(s"$python worker write: $e")
        }
        chunk.map { _ =>
          val line =
            try in.readLine()
            catch { case e: java.io.IOException =>
              fail(s"$python worker read: $e") }
          if (line == null) fail(s"$python worker died mid-batch")
          // malformed output must hit fail() (process destroy), not
          // escape as a bare MatchError that leaks the worker
          line.trim.split(" ") match {
            case Array(w, h, c, m) =>
              try (w.toInt, h.toInt, c.toInt, m.toDouble)
              catch { case _: NumberFormatException =>
                fail(s"$python worker non-numeric line: '$line'") }
            case _ => fail(s"$python worker malformed line: '$line'")
          }
        }
      }
      // concluding step: close stdin, require a clean worker exit
      decoded ++ {
        out.close()
        proc.waitFor()
        if (proc.exitValue != 0) fail(s"$python worker exit ${proc.exitValue}")
        Iterator.empty
      }
    }
  }

  object PythonProcessDecoder {
    /** stdin: 4-byte big-endian length + payload per frame; stdout: one
      * "w h c mean" line per frame. %.17g round-trips IEEE doubles.
      * PIL is tried PER FRAME; undecodable payloads use the stub
      * arithmetic, so output is total and oracle-consistent for
      * non-media corpora regardless of installed codecs.
      */
    val worker: String =
      """import sys, struct, hashlib, zlib
        |try:
        |    import io
        |    from PIL import Image
        |    HAVE_PIL = True
        |except ImportError:
        |    HAVE_PIL = False
        |def feat_hash(b):
        |    x = hashlib.md5(b).hexdigest()
        |    return (64 + int(x[0:4], 16) % 1024,
        |            64 + int(x[4:8], 16) % 1024,
        |            1 + int(x[8:10], 16) % 3,
        |            (int(x[10:16], 16) % 25600) / 100.0)
        |def luma(r, g, b):
        |    # PIL convert('L') fixed-point coefficients, bit-exact, so a
        |    # PIL-capable node and this stdlib path report the same mean
        |    return (19595 * r + 38470 * g + 7471 * b + 0x8000) >> 16
        |def feat_png(b):
        |    # pure-stdlib PNG decode (8-bit, non-interlaced): real media
        |    # decode without PIL. Returns None for non-PNG payloads.
        |    if b[:8] != b'\x89PNG\r\n\x1a\n':
        |        return None
        |    pos, w, ctype, idat = 8, None, None, b''
        |    while pos + 8 <= len(b):
        |        (n,) = struct.unpack('>I', b[pos:pos + 4])
        |        tag = b[pos + 4:pos + 8]
        |        data = b[pos + 8:pos + 8 + n]
        |        pos += 12 + n
        |        if tag == b'IHDR':
        |            w, h, depth, ctype, _, _, inter = struct.unpack(
        |                '>IIBBBBB', data)
        |            if depth != 8 or inter != 0 or ctype not in (0, 2, 4, 6):
        |                return None
        |        elif tag == b'IDAT':
        |            idat += data
        |        elif tag == b'IEND':
        |            break
        |    if w is None or not idat:
        |        return None
        |    nch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
        |    try:
        |        raw = zlib.decompress(idat)
        |    except Exception:
        |        return None
        |    stride = w * nch
        |    if len(raw) != h * (stride + 1):
        |        return None
        |    prev, total = bytearray(stride), 0
        |    for y in range(h):
        |        f = raw[y * (stride + 1)]
        |        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        |        if f:
        |            for i in range(stride):
        |                a = line[i - nch] if i >= nch else 0
        |                u = prev[i]
        |                c = prev[i - nch] if i >= nch else 0
        |                if f == 1: line[i] = (line[i] + a) & 255
        |                elif f == 2: line[i] = (line[i] + u) & 255
        |                elif f == 3: line[i] = (line[i] + (a + u) // 2) & 255
        |                elif f == 4:
        |                    p = a + u - c
        |                    pa, pb, pc = abs(p - a), abs(p - u), abs(p - c)
        |                    pr = a if pa <= pb and pa <= pc else (u if pb <= pc else c)
        |                    line[i] = (line[i] + pr) & 255
        |        for x in range(w):
        |            o = x * nch
        |            if ctype in (0, 4):
        |                total += line[o]
        |            else:
        |                total += luma(line[o], line[o + 1], line[o + 2])
        |        prev = line
        |    return w, h, nch, total / (w * h)
        |def feat_jpeg(b):
        |    # JPEG SOF0/SOF2 header parse: REAL dimension/component
        |    # metadata from the frame header (the part a 100 TB metadata
        |    # sweep needs); pixel stats stay md5-stub — stdlib has no
        |    # entropy decoder. Returns None for non-JPEG payloads.
        |    if b[:2] != b'\xff\xd8':
        |        return None
        |    pos = 2
        |    while pos + 2 <= len(b):
        |        if b[pos] != 0xFF:
        |            return None
        |        m = b[pos + 1]
        |        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
        |            pos += 2
        |            continue
        |        if pos + 4 > len(b):
        |            return None
        |        (n,) = struct.unpack('>H', b[pos + 2:pos + 4])
        |        if m in (0xC0, 0xC2):
        |            d = b[pos + 4:pos + 2 + n]
        |            if len(d) < 6:
        |                return None
        |            h, w = struct.unpack('>HH', d[1:5])
        |            nc = d[5]
        |            if w == 0 or h == 0 or nc == 0:
        |                return None
        |            return w, h, nc, feat_hash(b)[3]
        |        if m == 0xDA:
        |            return None
        |        pos += 2 + n
        |    return None
        |def feat(b):
        |    if HAVE_PIL:
        |        try:
        |            im = Image.open(io.BytesIO(b)); im.load()
        |            w, h = im.size
        |            c = len(im.getbands())
        |            hist = im.convert('L').histogram()
        |            n = sum(hist) or 1
        |            return w, h, c, sum(i * v for i, v in enumerate(hist)) / n
        |        except Exception:
        |            pass
        |    # stdlib parsers run whenever PIL is absent OR refused the
        |    # payload, so a structurally-valid frame header still yields
        |    # real metadata on every node
        |    try:
        |        p = feat_png(b)
        |        if p is None:
        |            p = feat_jpeg(b)
        |        if p is not None:
        |            return p
        |    except Exception:
        |        pass
        |    return feat_hash(b)
        |inp = sys.stdin.buffer
        |while True:
        |    hdr = inp.read(4)
        |    if len(hdr) < 4:
        |        break
        |    (n,) = struct.unpack('>i', hdr)
        |    b = inp.read(n)
        |    w, h, c, m = feat(b)
        |    sys.stdout.write('%d %d %d %.17g\n' % (w, h, c, m))
        |    sys.stdout.flush()
        |""".stripMargin
  }

  /** Decoder dispatch: explicit `GRAFT_MM_DECODER` (stub|python) wins;
    * otherwise the python path is selected only when a codec-capable
    * interpreter (python3 with PIL) answers the probe — bare python3
    * without codecs adds process overhead for identical stub output, so
    * it is not auto-selected.
    */
  def resolveDecoder(env: Map[String, String] = sys.env): MediaDecoder =
    env.get("GRAFT_MM_DECODER") match {
      case Some("stub") => StubDecoder
      case Some("python") => PythonProcessDecoder()
      case Some(other) =>
        throw new IllegalArgumentException(s"unknown decoder: $other")
      case None => if (codecProbe()) PythonProcessDecoder() else StubDecoder
    }

  def codecProbe(python: String = "python3"): Boolean =
    try {
      val p = new ProcessBuilder(python, "-c", "import PIL").start()
      p.waitFor() == 0
    } catch { case _: java.io.IOException => false }

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
  def mediaFeatures(s: SparkSession, d: String): DataFrame =
    mediaFeaturesWith(s, d, resolveDecoder())

  def mediaFeaturesWith(s: SparkSession, d: String, decoder: MediaDecoder)
      : DataFrame = {
    val withPayload = documents(s, d)
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        struct(col("source"), col("lang"), col("n_chars")).as("meta"))
      // co-locate batches deterministically; modulus tracks the session
      // fan-out so the decode stage parallelizes with the cluster
      .repartition(col("doc_id") % fanout(s))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    withPayload.mapPartitions { it =>
      // one decoder session per partition (codec init amortized),
      // STREAMING: extract fields eagerly per row (UnsafeRow reuse makes
      // buffering raw rows unsafe), then duplicate the pair stream —
      // zip keeps decode output and ids aligned, and the duplicate
      // buffer holds only the decoder's read-ahead (1 row for the stub,
      // one chunk for the subprocess), never the partition
      val pairs = it.map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[Array[Byte]]("payload")))
      val (ids, payloads) = pairs.duplicate
      decoder.decodePartition(payloads.map(_._2)).zip(ids)
        .map { case ((w, h, c, m), (id, payload)) =>
          Row(id, payload.length, w, h, c, m)
        }
    }(enc)
  }

  /** Resize plumbing: fit each decoded frame into a 256x256 box
    * preserving aspect ratio — the thumbnail/normalize step between
    * decode and feature extraction. Pure integer arithmetic over the
    * decoded dimensions (row-local, zero shuffle beyond the decode
    * pass); the actual pixel resample lives behind the same decoder
    * seam as the decode itself. Upscaling is clamped (scale ≤ 1) like
    * production thumbnailers.
    */
  def thumbnail(s: SparkSession, d: String): DataFrame =
    mediaFeaturesWith(s, d, StubDecoder)
      .withColumn("long_side", greatest(col("width"), col("height")))
      .select(col("doc_id"), col("width"), col("height"),
        when(col("long_side") <= 256, col("width"))
          .otherwise(expr("(width * 256) DIV long_side")).as("thumb_w"),
        when(col("long_side") <= 256, col("height"))
          .otherwise(expr("(height * 256) DIV long_side")).as("thumb_h"))

  /** Deterministic augmentation plumbing: a reproducible random crop
    * per (doc, epoch) — box coordinates derived from md5(content,
    * epoch), so every rerun, retry, and engine draws the SAME "random"
    * crop (reproducible training without persisting augmentation
    * state). Integer arithmetic over the stub-decoded dims; the pixel
    * op itself lives behind the decoder seam.
    */
  def augment(s: SparkSession, d: String): DataFrame =
    mediaFeaturesWith(s, d, StubDecoder)
      .join(documents(s, d).select(col("doc_id"), col("text")), "doc_id")
      .withColumn("epoch", explode(sequence(lit(0), lit(1))))
      .withColumn("h1", expr(
        "CAST(conv(substring(md5(concat(text, '|', epoch)), 1, 8), 16, 10) AS BIGINT)"))
      .withColumn("h2", expr(
        "CAST(conv(substring(md5(concat(text, '|', epoch)), 9, 8), 16, 10) AS BIGINT)"))
      // crop to half the frame; offsets land inside the remaining half
      .select(col("doc_id"), col("epoch"),
        expr("CAST(h1 % (width DIV 2 + 1) AS INT)").as("crop_x"),
        expr("CAST(h2 % (height DIV 2 + 1) AS INT)").as("crop_y"),
        expr("width DIV 2").as("crop_w"),
        expr("height DIV 2").as("crop_h"))

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
    "q_mm_thumbnail" -> (thumbnail _),
    "q_mm_augment" -> (augment _),
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
    "q_mm_augment" ->
      """WITH dims AS (
        |  SELECT doc_id, text,
        |    (64 + ('0x' || substr(md5(text), 1, 4))::BIGINT % 1024)::INT AS width,
        |    (64 + ('0x' || substr(md5(text), 5, 4))::BIGINT % 1024)::INT AS height
        |  FROM documents),
        |e AS (SELECT dims.*, unnest(range(2)) AS epoch FROM dims),
        |h AS (
        |  SELECT doc_id, epoch::INT AS epoch, width, height,
        |    ('0x' || substr(md5(text || '|' || epoch::VARCHAR), 1, 8))::BIGINT AS h1,
        |    ('0x' || substr(md5(text || '|' || epoch::VARCHAR), 9, 8))::BIGINT AS h2
        |  FROM e)
        |SELECT doc_id, epoch,
        |  (h1 % (width // 2 + 1))::INT AS crop_x,
        |  (h2 % (height // 2 + 1))::INT AS crop_y,
        |  (width // 2)::BIGINT AS crop_w,
        |  (height // 2)::BIGINT AS crop_h
        |FROM h""".stripMargin,
    "q_mm_thumbnail" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |    (64 + ('0x' || substr(md5(text), 1, 4))::BIGINT % 1024)::INT AS width,
        |    (64 + ('0x' || substr(md5(text), 5, 4))::BIGINT % 1024)::INT AS height
        |  FROM documents),
        |g AS (SELECT *, greatest(width, height) AS long_side FROM dims)
        |SELECT doc_id, width, height,
        |  CASE WHEN long_side <= 256 THEN width
        |       ELSE (width * 256) // long_side END AS thumb_w,
        |  CASE WHEN long_side <= 256 THEN height
        |       ELSE (height * 256) // long_side END AS thumb_h
        |FROM g""".stripMargin,
  )
}
