package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed per-partition in batches.
  *
  * The actual media decode is STUBBED (this container has no image/audio
  * libraries): `decodeStub` derives deterministic pseudo-features from the
  * bytes. Everything around it — the schema, the binary column handling,
  * the per-partition batch shape, the partition-preserving feature
  * extraction — is the real Spark plumbing a decoder would plug into (swap
  * `decodeStub` for a JNI/FFI call; the plan does not change).
  */
object Multimodal {

  final case class Media(
      media_id: Long, kind: String, uri: String,
      width: Int, height: Int, duration_ms: Long, bytes: Array[Byte])

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      byte_mean: Double, byte_entropy: Double,
      feature: Array[Float])

  /** Build a media manifest from the documents table: each doc's text
    * bytes stand in for an encoded media payload (deterministic fake).
    * At scale this would instead be `spark.read.format("binaryFile")` or a
    * manifest parquet of (uri, metadata, bytes).
    */
  def manifestFromDocuments(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      concat(lit("synthetic://media/"), col(idCol)).as("uri"),
      (pmod(col(idCol) * 37L, lit(1920)) + 1).cast("int").as("width"),
      (pmod(col(idCol) * 53L, lit(1080)) + 1).cast("int").as("height"),
      (pmod(col(idCol) * 131L, lit(600000))).cast("long").as("duration_ms"),
      encode(col(textCol), "UTF-8").as("bytes"))

  /** Ingest raw media FILES into the manifest schema via Spark's
    * `binaryFile` source — the real on-ramp for a media corpus (the
    * synthetic `manifestFromDocuments` stands in when no files exist).
    * Kind is derived from the file extension; width/height/duration stay
    * 0 until the (stubbed) decoder fills them. `binaryFile` reads are
    * distributed file-splits like any other source, so this scales to a
    * bucket of millions of media files.
    */
  def ingestBinaryFiles(spark: SparkSession, dir: String,
      glob: String = "*"): DataFrame = {
    val kinds = Map(
      "jpg" -> "image", "jpeg" -> "image", "png" -> "image", "gif" -> "image",
      "wav" -> "audio", "mp3" -> "audio", "flac" -> "audio",
      "mp4" -> "video", "mkv" -> "video", "webm" -> "video")
    val kindExpr = kinds.foldLeft(lit("binary")) { case (acc, (ext, kind)) =>
      when(lower(col("path")).endsWith("." + ext), kind).otherwise(acc)
    }
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        xxhash64(col("path")).as("media_id"),
        kindExpr.as("kind"),
        col("path").as("uri"),
        lit(0).as("width"), lit(0).as("height"), lit(0L).as("duration_ms"),
        col("content").as("bytes"))
  }

  /** Write a deterministic media-file fixture from a documents frame: one
    * file per row named `media_<id>.<ext>` (extension cycles image/audio/
    * video), content = the text bytes standing in for an encoded payload.
    * The target dir is cleared first so re-runs at a different scale
    * factor can't leak stale files. Files are written from the executors
    * (`foreachPartition`) — on a cluster the same code writes to shared
    * storage; this exists so `ingestBinaryFiles` can be exercised against
    * real files wherever the corpus has none.
    */
  def writeMediaFixture(docs: DataFrame, idCol: String, textCol: String,
      dir: String): String = {
    val d = new java.io.File(dir)
    if (d.exists()) d.listFiles().foreach(f => { f.delete(); () })
    d.mkdirs()
    val exts = Array("png", "wav", "mp4")
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          val id = r.getLong(0)
          val ext = exts(((id % 3 + 3) % 3).toInt)
          java.nio.file.Files.write(
            new java.io.File(d, s"media_$id.$ext").toPath,
            r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          ()
        }
      }
    dir
  }

  /** STUB decode: deterministic per-record pseudo-features from raw bytes
    * (mean, entropy, an 8-dim "embedding" from rolling byte stats). Runs
    * per-partition over iterator batches — the exact shape a real decoder
    * (which needs per-partition library init) requires.
    */
  def extractFeatures(spark: SparkSession, manifest: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    manifest.select("media_id", "kind", "bytes").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // Real decoders initialize native contexts here, once per partition.
        it.map { case (id, kind, bytes) =>
          val n = bytes.length
          val hist = new Array[Long](256)
          var sum = 0L
          var i = 0
          while (i < n) { val b = bytes(i) & 0xff; hist(b) += 1; sum += b; i += 1 }
          val mean = if (n == 0) 0.0 else sum.toDouble / n
          var entropy = 0.0
          if (n > 0) {
            var j = 0
            while (j < 256) {
              if (hist(j) > 0) { val p = hist(j).toDouble / n; entropy -= p * math.log(p) / math.log(2) }
              j += 1
            }
          }
          val feat = Array.tabulate(8) { d =>
            val stride = 1 << d
            var acc = 0.0; var k = 0
            while (k < n) { acc += ((bytes(k) & 0xff) * ((k / stride) % 2 * 2 - 1)); k += stride }
            (acc / math.max(1, n)).toFloat
          }
          MediaFeatures(id, kind, n.toLong,
            math.rint(mean * 10000) / 10000, math.rint(entropy * 10000) / 10000, feat)
        }
      }
  }

  final case class ResizedMedia(
      media_id: Long, width: Int, height: Int, bytes: Array[Byte])

  /** Resize stub for image rows: scales the metadata to fit the target
    * box (aspect preserved) and downsamples the payload bytes by the area
    * ratio — a deterministic stand-in for a real scaler. The plumbing is
    * the production shape: typed per-partition batches, partition-
    * preserving, output schema carries the new dimensions + payload.
    */
  def resizeImages(spark: SparkSession, manifest: DataFrame,
      maxW: Int = 256, maxH: Int = 256): Dataset[ResizedMedia] = {
    import spark.implicits._
    manifest.filter(col("kind") === "image")
      .select("media_id", "width", "height", "bytes")
      .as[(Long, Int, Int, Array[Byte])]
      .mapPartitions { it =>
        // a real scaler initializes its native context here, per partition
        it.map { case (id, w, h, bytes) =>
          val scale = math.min(1.0,
            math.min(maxW.toDouble / math.max(1, w), maxH.toDouble / math.max(1, h)))
          val nw = math.max(1, math.rint(w * scale).toInt)
          val nh = math.max(1, math.rint(h * scale).toInt)
          val keepEvery = math.max(1, math.rint(1.0 / (scale * scale)).toInt)
          val out = new Array[Byte]((bytes.length + keepEvery - 1) / keepEvery)
          var i = 0
          while (i < out.length) { out(i) = bytes(i * keepEvery); i += 1 }
          ResizedMedia(id, nw, nh, out)
        }
      }
  }

  /** Frame-sampling stub for video rows: emits one row per sampled offset
    * (schema/explode plumbing real, frame decode fake).
    */
  def sampleFrames(manifest: DataFrame, everyMs: Long = 10000L): DataFrame =
    manifest.filter(col("kind") === "video")
      .withColumn("frame_ms", explode(sequence(lit(0L), col("duration_ms"), lit(everyMs))))
      .select(col("media_id"), col("frame_ms"),
        // stub "frame content hash": deterministic from id+offset
        xxhash64(col("media_id"), col("frame_ms")).as("frame_hash"))
}
