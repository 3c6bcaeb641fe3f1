package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed per-partition in batches.
  *
  * IMAGE decode is REAL: the JDK ships `javax.imageio` (PNG/JPEG/GIF/BMP,
  * no external libraries), so image rows get true decoded dimensions and
  * a true raster resize. AUDIO decode is REAL for WAV: the JDK ships
  * `javax.sound.sampled` (RIFF/WAVE PCM parsing, no external codecs), so
  * audio rows get true sample rate / channel count / frame-accurate
  * duration. VIDEO decode stays STUBBED (the JDK has no video codec):
  * deterministic pseudo-features from the bytes. Everything around the
  * stub — the schema, the binary column handling, the per-partition batch
  * shape, the partition-preserving feature extraction — is the real Spark
  * plumbing a codec would plug into (swap the stub for a JNI/FFI call;
  * the plan does not change).
  */
object Multimodal {

  /** Decode an image payload with the JDK's ImageIO; None when the bytes
    * are not a decodable image (audio/video payloads, corrupt files).
    * Pure raster work — safe on headless executors. NonFatal only: an
    * executor-fatal throwable (OutOfMemoryError from a decompression
    * bomb, InterruptedException) must fail the task, not silently route
    * the row down the undecodable path.
    */
  private def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Decode an audio payload's header with the JDK's sampled-audio stack:
    * (sampleRate, channels, frameLength). WAV/AIFF/AU parse out of the
    * box; None for anything the JDK cannot read (mp3/flac payloads,
    * corrupt files, non-audio bytes).
    */
  private def decodeAudio(bytes: Array[Byte]): Option[(Float, Int, Long)] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        Some((fmt.getSampleRate, fmt.getChannels, ais.getFrameLength))
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  final case class Media(
      media_id: Long, kind: String, uri: String,
      width: Int, height: Int, duration_ms: Long, bytes: Array[Byte])

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      byte_mean: Double, byte_entropy: Double,
      width: Int, height: Int,
      sample_rate: Int, channels: Int, audio_ms: Long,
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

  /** Deterministic REAL PNG payload for the fixture: dimensions and
    * pixels are pure functions of the id, encoded with the JDK's ImageIO —
    * so the decode path downstream exercises a genuine image codec.
    */
  private def pngBytes(id: Long): Array[Byte] = {
    val w = (math.abs(id) % 48 + 4).toInt
    val h = (math.abs(id) % 36 + 4).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          ((id * 2654435761L + x * 131L + y * 31L) % 0x1000000L).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic REAL WAV payload for the fixture: 16-bit mono PCM at
    * 8 kHz, frame count and samples pure functions of the id, encoded
    * with the JDK's AudioSystem — so the audio decode path downstream
    * parses a genuine RIFF/WAVE container.
    */
  private def wavBytes(id: Long): Array[Byte] = {
    val sampleRate = 8000f
    val nFrames = (math.abs(id) % 300 + 50).toInt
    val pcm = new Array[Byte](nFrames * 2) // little-endian s16
    var k = 0
    while (k < nFrames) {
      val s = (((id * 2654435761L + k * 104729L) % 65536L) - 32768L).toShort
      pcm(2 * k) = (s & 0xff).toByte
      pcm(2 * k + 1) = ((s >> 8) & 0xff).toByte
      k += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Write a deterministic media-file fixture from a documents frame: one
    * file per row named `media_<id>.<ext>` (extension cycles image/audio/
    * video). Image rows are REAL PNGs and audio rows REAL WAVs (decodable
    * dimensions / sample format derived from the id); video content = the
    * text bytes standing in for an encoded payload. The target dir is cleared first so
    * re-runs at a different scale factor can't leak stale files. Files
    * are written from the executors (`foreachPartition`) — on a cluster
    * the same code writes to shared storage; this exists so
    * `ingestBinaryFiles` can be exercised against real files wherever the
    * corpus has none.
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
          val payload =
            if (ext == "png") pngBytes(id)
            else if (ext == "wav") wavBytes(id)
            else r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
          java.nio.file.Files.write(
            new java.io.File(d, s"media_$id.$ext").toPath, payload)
          ()
        }
      }
    dir
  }

  /** Feature extraction over media payloads. IMAGE rows are REALLY
    * decoded (javax.imageio) and carry true width/height; AUDIO rows are
    * REALLY parsed (javax.sound.sampled) and carry true sample rate /
    * channels / frame-accurate duration; byte-level stats (mean, entropy,
    * an 8-dim rolling-stat "embedding") are the deterministic stand-in
    * for codec features on video, whose decode is stubbed (no JDK video
    * codec). Runs per-partition over iterator batches — the exact shape
    * a real codec (which needs per-partition library init) requires.
    */
  def extractFeatures(spark: SparkSession, manifest: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    manifest.select("media_id", "kind", "bytes").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // Real codecs initialize native contexts here, once per partition.
        it.map { case (id, kind, bytes) =>
          val (dw, dh) =
            if (kind == "image")
              decodeImage(bytes).map(i => (i.getWidth, i.getHeight)).getOrElse((0, 0))
            else (0, 0)
          val (sr, ch, ams) =
            if (kind == "audio")
              decodeAudio(bytes).map { case (rate, chans, frames) =>
                (math.rint(rate).toInt, chans,
                  if (rate > 0) math.rint(frames * 1000.0 / rate).toLong else 0L)
              }.getOrElse((0, 0, 0L))
            else (0, 0, 0L)
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
            math.rint(mean * 10000) / 10000, math.rint(entropy * 10000) / 10000,
            dw, dh, sr, ch, ams, feat)
        }
      }
  }

  final case class ResizedMedia(
      media_id: Long, width: Int, height: Int, bytes: Array[Byte])

  /** Resize image rows into a `maxW`×`maxH` box (aspect preserved, never
    * upscaled). Decodable payloads get a REAL raster resize: ImageIO
    * decode → bilinear Graphics2D scale → PNG re-encode. Payloads ImageIO
    * cannot read (the fixture's fake audio/video stand-ins routed here
    * with image metadata) fall back to the deterministic stub: metadata
    * dims scaled, payload bytes downsampled by the area ratio. The
    * plumbing is the production shape either way: typed per-partition
    * batches, partition-preserving, output schema carries the new
    * dimensions + payload.
    */
  def resizeImages(spark: SparkSession, manifest: DataFrame,
      maxW: Int = 256, maxH: Int = 256): Dataset[ResizedMedia] = {
    import spark.implicits._
    def fit(w: Int, h: Int): (Int, Int, Double) = {
      val scale = math.min(1.0,
        math.min(maxW.toDouble / math.max(1, w), maxH.toDouble / math.max(1, h)))
      (math.max(1, math.rint(w * scale).toInt),
        math.max(1, math.rint(h * scale).toInt), scale)
    }
    manifest.filter(col("kind") === "image")
      .select("media_id", "width", "height", "bytes")
      .as[(Long, Int, Int, Array[Byte])]
      .mapPartitions { it =>
        // a real scaler initializes its native context here, per partition
        it.map { case (id, w, h, bytes) =>
          decodeImage(bytes) match {
            case Some(img) =>
              val (nw, nh, scale) = fit(img.getWidth, img.getHeight)
              if (scale >= 1.0) ResizedMedia(id, img.getWidth, img.getHeight, bytes)
              else {
                val out = new java.awt.image.BufferedImage(
                  nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
                val g = out.createGraphics()
                g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g.drawImage(img, 0, 0, nw, nh, null)
                g.dispose()
                val bos = new java.io.ByteArrayOutputStream()
                javax.imageio.ImageIO.write(out, "png", bos)
                ResizedMedia(id, nw, nh, bos.toByteArray)
              }
            case None =>
              val (nw, nh, scale) = fit(w, h)
              val keepEvery = math.max(1, math.rint(1.0 / (scale * scale)).toInt)
              val out = new Array[Byte]((bytes.length + keepEvery - 1) / keepEvery)
              var i = 0
              while (i < out.length) { out(i) = bytes(i * keepEvery); i += 1 }
              ResizedMedia(id, nw, nh, out)
          }
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
