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
  * duration. VIDEO FRAME decode is REAL for BOTH containers' JPEG
  * codecs: AVI/MJPEG via the RIFF walk (parseAviMjpeg — each `00dc`
  * chunk's JPEG payload to ImageIO), and MP4 via the full ISO-BMFF
  * sample-table walk (parseMp4Samples — `moov/trak/mdia/minf/stbl`,
  * stsc×stsz×stco locating each sample, JPEG-codec samples to ImageIO).
  * MP4 container METADATA (`moov/mvhd` timescale+duration, `trak/tkhd`
  * track dimensions) parses for every MP4 regardless of codec — plain
  * big-endian byte parsing, the same class of work as the parquet thrift
  * footer read. The ONE remaining undecodable path is the H.264
  * BITSTREAM itself (avc1 sample entries): the container walk still
  * locates its samples, but no pure-JVM H.264 decoder exists on this
  * dependency-free classpath (and none may be added — won't-fix), so
  * those rows carry byte-stat stand-in features with
  * `frames_decoded=false` machine-visible in the schema; a JNI/FFI codec
  * call plugs into the same per-partition batch shape.
  */
object Multimodal {

  final case class Mp4Meta(durationMs: Long, width: Int, height: Int)

  /** A fully-decoded MJPEG video: real container header fields plus the
    * per-frame JPEG payloads, ready for ImageIO frame decode.
    */
  final case class AviVideo(durationMs: Long, width: Int, height: Int,
      frames: Array[Array[Byte]])

  /** Parse an AVI (RIFF) container and extract its MJPEG frame payloads:
    * `hdrl/avih` gives microseconds-per-frame, total frames and
    * dimensions; the `movi` LIST's `00dc`/`00db` chunks are the encoded
    * JPEG frames, which the JDK's ImageIO decodes for REAL — unlike
    * MP4/H.264, Motion-JPEG needs no codec beyond the JPEG decoder every
    * JDK ships. Little-endian RIFF walking, `rec ` sub-lists flattened.
    * None when the bytes are not a RIFF/AVI.
    */
  def parseAviMjpeg(bytes: Array[Byte]): Option[AviVideo] =
    try {
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(off: Int) = new String(bytes, off, 4, "ISO-8859-1")
      if (bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ")
        return None
      var usPerFrame = 0L; var totalFrames = 0L; var w = 0; var h = 0
      val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      // walk chunks in [start, end); LISTs recurse (hdrl, movi, rec )
      def walk(start: Int, end: Int): Unit = {
        var off = start
        var ok = true
        while (ok && off + 8 <= end) {
          val cc = fourcc(off)
          val size = bb.getInt(off + 4).toLong & 0xffffffffL
          val dataStart = off + 8
          if (dataStart + size > end) ok = false // truncated chunk: stop
          else {
            if (cc == "LIST" && size >= 4) {
              walk(dataStart + 4, dataStart + size.toInt)
            } else if (cc == "avih" && size >= 40) {
              usPerFrame = bb.getInt(dataStart).toLong & 0xffffffffL
              totalFrames = bb.getInt(dataStart + 16).toLong & 0xffffffffL
              w = bb.getInt(dataStart + 32)
              h = bb.getInt(dataStart + 36)
            } else if ((cc.endsWith("dc") || cc.endsWith("db")) && size > 0) {
              frames += java.util.Arrays.copyOfRange(
                bytes, dataStart, dataStart + size.toInt)
            }
            off = dataStart + size.toInt + (size.toInt & 1) // chunks pad to even
          }
        }
      }
      walk(12, bytes.length)
      if (usPerFrame == 0L && frames.isEmpty) None
      else Some(AviVideo(
        math.rint(usPerFrame * totalFrames / 1000.0).toLong,
        w, h, frames.toArray))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** First child box named `typ` inside [start, end): (contentStart,
    * boxEnd). 64-bit (size==1) headers handled; malformed sizes stop the
    * walk. The shared primitive under the metadata parse and the
    * sample-table walk.
    */
  private def findBox(bytes: Array[Byte], start: Int, end: Int,
      typ: String): Option[(Int, Int)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var off = start
    while (off + 8 <= end) {
      val size32 = bb.getInt(off)
      val t = new String(bytes, off + 4, 4, "ISO-8859-1")
      val (size, header) =
        if (size32 == 1 && off + 16 <= end) (bb.getLong(off + 8), 16)
        else (size32.toLong & 0xffffffffL, 8)
      if (size < header || off + size > end) return None
      if (t == typ) return Some((off + header, off + size.toInt))
      off += size.toInt
    }
    None
  }

  /** Parse MP4 container metadata by walking ISO-BMFF box headers:
    * `moov/mvhd` (version 0 or 1) gives timescale+duration,
    * `moov/trak/tkhd` gives the 16.16-fixed track width/height (always
    * the final 8 bytes of the tkhd box, version-independently); trak
    * boxes are scanned in order and the first tkhd with nonzero
    * dimensions wins (audio/hint tracks report 0x0 and may come first),
    * falling back to the first tkhd for all-audio files. Pure
    * big-endian byte walking — no codec. None when the bytes are not an
    * MP4 or the boxes are missing/truncated.
    */
  def parseMp4Metadata(bytes: Array[Byte]): Option[Mp4Meta] =
    try {
      val bb = java.nio.ByteBuffer.wrap(bytes) // big-endian
      def findBoxIn(start: Int, end: Int, typ: String): Option[(Int, Int)] =
        findBox(bytes, start, end, typ)
      // walk ALL trak boxes and keep the first tkhd with nonzero
      // dimensions: real-world files often carry a non-video (audio/hint)
      // track FIRST, whose tkhd reports 0x0 — stopping at the first trak
      // would mislabel such files. Falls back to the first tkhd found
      // (all-audio files legitimately have no sized track).
      def videoTkhdEnd(moovS: Int, moovE: Int): Option[Int] = {
        var off = moovS
        var first: Option[Int] = None
        var sized: Option[Int] = None
        while (off < moovE && sized.isEmpty) {
          findBoxIn(off, moovE, "trak") match {
            case None => off = moovE
            case Some((trakS, trakE)) =>
              findBoxIn(trakS, trakE, "tkhd").foreach { case (_, e) =>
                if (first.isEmpty) first = Some(e)
                if ((bb.getInt(e - 8) >>> 16) != 0 &&
                    (bb.getInt(e - 4) >>> 16) != 0) sized = Some(e)
              }
              off = trakE
          }
        }
        sized.orElse(first)
      }
      for {
        (moovS, moovE) <- findBoxIn(0, bytes.length, "moov")
        (mvhdS, _) <- findBoxIn(moovS, moovE, "mvhd")
        tkhdE <- videoTkhdEnd(moovS, moovE)
      } yield {
        val (timescale, duration) =
          if ((bytes(mvhdS) & 0xff) == 1)
            (bb.getInt(mvhdS + 20).toLong, bb.getLong(mvhdS + 24))
          else
            (bb.getInt(mvhdS + 12).toLong, bb.getInt(mvhdS + 16).toLong & 0xffffffffL)
        Mp4Meta(
          if (timescale > 0) math.rint(duration * 1000.0 / timescale).toLong else 0L,
          bb.getInt(tkhdE - 8) >>> 16, bb.getInt(tkhdE - 4) >>> 16)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** A video track's sample table, walked for real: the stsd
    * sample-entry fourcc plus every sample's raw bytes.
    */
  final case class Mp4Samples(codec: String, samples: Array[Array[Byte]])

  /** MP4 sample-entry codecs whose samples the JDK's ImageIO decodes:
    * QuickTime Motion-JPEG in MP4 ("jpeg", field-coded "mjpa"). H.264
    * ("avc1") is NOT here — no pure-JVM decoder exists on this
    * classpath, the one declared-unsupported codec (frames_decoded=false
    * in the feature schema keeps that machine-visible).
    */
  val JpegInMp4Codecs: Set[String] = Set("jpeg", "mjpa")

  /** Extract an MP4's video samples via the FULL ISO-BMFF sample-table
    * machinery (ISO 14496-12): `moov/trak/mdia/minf/stbl`, then
    * stsc (chunk→samples-per-chunk runs) × stco/co64 (chunk offsets) ×
    * stsz (per-sample or uniform sizes) locate each frame's byte range —
    * the container half of "MP4 frame decode", which needs no codec.
    * Returns the first trak with a non-empty sample table; None when the
    * bytes are not an MP4 or no trak carries samples. Whether the
    * samples then DECODE is the codec's business: [[extractFeatures]]
    * hands [[JpegInMp4Codecs]] samples to ImageIO and gets real pixels;
    * avc1/H.264 samples stay undecoded (declared limitation).
    */
  def parseMp4Samples(bytes: Array[Byte]): Option[Mp4Samples] =
    try {
      val bb = java.nio.ByteBuffer.wrap(bytes) // big-endian
      val moov = findBox(bytes, 0, bytes.length, "moov")
      if (moov.isEmpty) return None
      val (moovS, moovE) = moov.get
      var off = moovS
      while (off < moovE) {
        findBox(bytes, off, moovE, "trak") match {
          case None => return None
          case Some((trakS, trakE)) =>
            val parsed = for {
              (mdiaS, mdiaE) <- findBox(bytes, trakS, trakE, "mdia")
              (minfS, minfE) <- findBox(bytes, mdiaS, mdiaE, "minf")
              (stblS, stblE) <- findBox(bytes, minfS, minfE, "stbl")
              (stsdS, _) <- findBox(bytes, stblS, stblE, "stsd")
              (stszS, _) <- findBox(bytes, stblS, stblE, "stsz")
              (stscS, _) <- findBox(bytes, stblS, stblE, "stsc")
              co <- findBox(bytes, stblS, stblE, "stco").map((_, false))
                .orElse(findBox(bytes, stblS, stblE, "co64").map((_, true)))
            } yield {
              val ((stcoS, _), is64) = co
              // stsd: ver/flags(4) + entry_count(4) + first entry's
              // size(4) + fourcc(4)
              val codec = new String(bytes, stsdS + 12, 4, "ISO-8859-1")
              // stsz: ver/flags(4) + uniform_size(4) + count(4) [+ sizes]
              val uniform = bb.getInt(stszS + 4)
              val nSamples = bb.getInt(stszS + 8)
              val sizes = Array.tabulate(nSamples)(i =>
                if (uniform != 0) uniform else bb.getInt(stszS + 12 + 4 * i))
              val nChunks = bb.getInt(stcoS + 4)
              val chunkOff = Array.tabulate(nChunks)(i =>
                if (is64) bb.getLong(stcoS + 8 + 8 * i)
                else bb.getInt(stcoS + 8 + 4 * i).toLong & 0xffffffffL)
              // stsc: ver/flags(4) + entry_count(4) + runs of
              // (first_chunk, samples_per_chunk, desc_index), 1-based;
              // a run applies until the next run's first_chunk
              val nRuns = bb.getInt(stscS + 4)
              val runs = Array.tabulate(nRuns)(i =>
                (bb.getInt(stscS + 8 + 12 * i), bb.getInt(stscS + 12 + 12 * i)))
              val out = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
              var run = 0; var s = 0; var c = 0
              while (c < nChunks && s < nSamples) {
                while (run + 1 < nRuns && runs(run + 1)._1 <= c + 1) run += 1
                var inChunk = 0
                var pos = chunkOff(c)
                while (inChunk < runs(run)._2 && s < nSamples) {
                  val sz = sizes(s)
                  if (sz > 0 && pos >= 0 && pos + sz <= bytes.length)
                    out += java.util.Arrays.copyOfRange(
                      bytes, pos.toInt, (pos + sz).toInt)
                  pos += sz
                  inChunk += 1; s += 1
                }
                c += 1
              }
              Mp4Samples(codec, out.toArray)
            }
            parsed match {
              case Some(m) if m.samples.nonEmpty => return Some(m)
              case _ => off = trakE
            }
        }
      }
      None
    } catch { case scala.util.control.NonFatal(_) => None }

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
      sample_rate: Int, channels: Int, audio_ms: Long, video_ms: Long,
      n_frames: Int,
      // TRUE iff `feature` comes from decoded PIXELS (per-frame video
      // decode succeeded — AVI/MJPEG or jpeg-codec MP4). FALSE rows
      // carry byte-stat stand-in features — the avc1/H.264 bitstream,
      // which no pure-JVM decoder can read: the flag makes the declared
      // limitation machine-visible in the schema, so a consumer can
      // never mistake stand-ins for pixel features.
      frames_decoded: Boolean,
      feature: Array[Float])

  /** Mean luminance (0..255, ITU-R 601 weights) of a decoded frame. */
  private def meanLuma(img: java.awt.image.BufferedImage): Double = {
    val w = img.getWidth; val h = img.getHeight
    var sum = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    sum / math.max(1, w * h)
  }

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
      "mp4" -> "video", "mkv" -> "video", "webm" -> "video", "avi" -> "video")
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

  /** Deterministic REAL MP4 container for the fixture: a spec-shaped
    * ISO-BMFF tree with a FULL sample table —
    * `ftyp, moov[mvhd + trak[tkhd + mdia[mdhd + hdlr + minf[vmhd +
    * dinf[dref[url ]] + stbl[stsd + stts + stsc + stsz + stco]]]]], mdat`
    * — so the downstream frame-extraction path ([[parseMp4Samples]])
    * walks the real stsc/stsz/stco chunk-to-sample machinery. All fields
    * are pure functions of the id: box versions (mvhd/tkhd v0 vs v1)
    * alternate by (id/12)%2, and the chunk layout alternates by (id/24)%2
    * between one-chunk-per-sample and one-chunk-holding-all-samples, so
    * both stsc expansion shapes stay covered at the gate. `codec` is the
    * stsd sample-entry fourcc: "jpeg" samples are real ImageIO JPEGs
    * (QuickTime Motion-JPEG in MP4 — decodable by every JDK); "avc1"
    * samples are NAL-shaped stand-ins (H.264, the declared-unsupported
    * codec — no pure-JVM decoder on this classpath).
    */
  private[operators] def mp4Bytes(id: Long, codec: String, w: Int, h: Int,
      samples: Array[Array[Byte]]): Array[Byte] = {
    val a = math.abs(id)
    val ver = ((a / 12) % 2).toInt
    val timescale = (600 + (a % 3) * 200).toInt // 600 / 800 / 1000
    val durationUnits = a % 120000 + timescale // >= 1 second
    val onePerChunk = (a / 24) % 2 == 0
    def box(typ: String, content: Array[Byte]*): Array[Byte] = {
      val total = 8 + content.map(_.length).sum
      val bb = java.nio.ByteBuffer.allocate(total)
      bb.putInt(total)
      bb.put(typ.getBytes("ISO-8859-1"))
      content.foreach(bb.put)
      bb.array()
    }
    val matrix = { // identity: 0x10000, 0, 0 / 0, 0x10000, 0 / 0, 0, 0x40000000
      val m = java.nio.ByteBuffer.allocate(36)
      m.putInt(0x00010000).putInt(0).putInt(0)
      m.putInt(0).putInt(0x00010000).putInt(0)
      m.putInt(0).putInt(0).putInt(0x40000000)
      m.array()
    }
    val mvhd = {
      val b = java.nio.ByteBuffer.allocate(if (ver == 1) 112 else 100)
      b.putInt(ver << 24) // version + flags
      if (ver == 1) { b.putLong(0L); b.putLong(0L); b.putInt(timescale); b.putLong(durationUnits) }
      else { b.putInt(0); b.putInt(0); b.putInt(timescale); b.putInt(durationUnits.toInt) }
      b.putInt(0x00010000) // rate 1.0
      b.putShort(0x0100.toShort) // volume 1.0
      b.putShort(0); b.putLong(0L) // reserved
      b.put(matrix)
      (0 until 6).foreach(_ => b.putInt(0)) // pre_defined
      b.putInt(2) // next_track_ID
      b.array()
    }
    val tkhd = {
      val b = java.nio.ByteBuffer.allocate(if (ver == 1) 96 else 84)
      b.putInt((ver << 24) | 0x7) // version + flags (enabled|in-movie|in-preview)
      if (ver == 1) { b.putLong(0L); b.putLong(0L); b.putInt(1); b.putInt(0); b.putLong(durationUnits) }
      else { b.putInt(0); b.putInt(0); b.putInt(1); b.putInt(0); b.putInt(durationUnits.toInt) }
      b.putLong(0L) // reserved
      b.putShort(0); b.putShort(0); b.putShort(0); b.putShort(0) // layer/group/volume/reserved
      b.put(matrix)
      b.putInt(w << 16) // 16.16 fixed
      b.putInt(h << 16)
      b.array()
    }
    def be(i: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(4).putInt(i).array()
    val mdhd = {
      val b = java.nio.ByteBuffer.allocate(if (ver == 1) 36 else 24)
      b.putInt(ver << 24)
      if (ver == 1) { b.putLong(0L); b.putLong(0L); b.putInt(timescale); b.putLong(durationUnits) }
      else { b.putInt(0); b.putInt(0); b.putInt(timescale); b.putInt(durationUnits.toInt) }
      b.putShort(0x55C4.toShort) // packed ISO-639 language: 'und'
      b.putShort(0)
      b.array()
    }
    val hdlr = box("hdlr", be(0), be(0), "vide".getBytes("ISO-8859-1"),
      new Array[Byte](12), "GraftVideoHandler".getBytes("ISO-8859-1"), Array[Byte](0))
    val vmhd = box("vmhd", Array[Byte](0, 0, 0, 1), new Array[Byte](8))
    val dinf = box("dinf",
      box("dref", be(0), be(1), box("url ", Array[Byte](0, 0, 0, 1))))
    val n = samples.length
    val sizes = samples.map(_.length)
    // VisualSampleEntry (ISO 14496-12 §12.1.3); avc1 additionally carries
    // the avcC decoder-configuration box a conformant entry requires
    // (content inert for this fixture — nothing on the JVM consumes it)
    val sampleEntry = {
      val b = java.nio.ByteBuffer.allocate(78 + (if (codec == "avc1") 15 else 0))
      b.putInt(0); b.putShort(0) // reserved(6)
      b.putShort(1) // data_reference_index
      b.putShort(0); b.putShort(0) // pre_defined / reserved
      (0 until 3).foreach(_ => b.putInt(0)) // pre_defined[3]
      b.putShort(w.toShort); b.putShort(h.toShort)
      b.putInt(0x00480000); b.putInt(0x00480000) // 72 dpi
      b.putInt(0) // reserved
      b.putShort(1) // frame_count
      b.put(new Array[Byte](32)) // compressorname
      b.putShort(0x0018) // depth
      b.putShort(-1) // pre_defined
      if (codec == "avc1") {
        b.putInt(15); b.put("avcC".getBytes("ISO-8859-1"))
        b.put(Array[Byte](1, 66, 0, 30, -1, -31, 0)) // cfgVer/profile/compat/level...
      }
      b.array()
    }
    def stbl(chunkOffsets: Seq[Int]): Array[Byte] = {
      val stsd = box("stsd", be(0), be(1), box(codec, sampleEntry))
      val stts = box("stts", be(0), be(1), be(n),
        be(math.max(1, (durationUnits / math.max(1, n)).toInt)))
      val stsc = box("stsc", be(0), be(1),
        be(1), be(if (onePerChunk) 1 else n), be(1))
      val stsz = box("stsz", be(0), be(0), be(n),
        sizes.flatMap(be).toArray)
      val stco = box("stco", be(0), be(chunkOffsets.length),
        chunkOffsets.flatMap(be).toArray)
      box("stbl", stsd, stts, stsc, stsz, stco)
    }
    def moovBytes(chunkOffsets: Seq[Int]): Array[Byte] =
      box("moov", box("mvhd", mvhd),
        box("trak", box("tkhd", tkhd),
          box("mdia", box("mdhd", mdhd), hdlr,
            box("minf", vmhd, dinf, stbl(chunkOffsets)))))
    val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1"),
      Array[Byte](0, 0, 2, 0), "isomiso2".getBytes("ISO-8859-1"))
    // stco holds ABSOLUTE file offsets, which depend on moov's own size —
    // but that size is independent of the offset VALUES (fixed 4-byte
    // slots), so measure with zeros, then rebuild with the real offsets
    val nChunks = if (onePerChunk) n else math.min(1, n)
    val probe = moovBytes(Seq.fill(nChunks)(0))
    val payloadStart = ftyp.length + probe.length + 8
    val offsets: Seq[Int] =
      if (onePerChunk) sizes.scanLeft(payloadStart)(_ + _).init.toSeq
      else if (n > 0) Seq(payloadStart)
      else Seq.empty
    val moov = moovBytes(offsets)
    require(moov.length == probe.length, "stco offset fill changed moov size")
    ftyp ++ moov ++ box("mdat", samples.flatten.toArray[Byte])
  }

  /** One REAL JPEG-encoded frame of the synthetic video: a gradient
    * background with a white square that GROWS with the frame index, so
    * decoded-frame mean luminance strictly increases over the clip — a
    * brightness ramp any real frame-feature extractor must reproduce
    * (spec-asserted). Pixels are pure functions of (id, frame).
    */
  private def jpegFrame(id: Long, frame: Int, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val a = math.abs(id)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (((x * 255 / w) << 16) | ((y * 255 / h) << 8)
          | ((a % 256).toInt)).toInt)
        x += 1
      }
      y += 1
    }
    val sq = math.min(math.min(w, h) - 1, 2 + frame * math.max(1, math.min(w, h) / 8))
    var yy = 0
    while (yy < sq) {
      var xx = 0
      while (xx < sq) { img.setRGB(xx, yy, 0xffffff); xx += 1 }
      yy += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Deterministic REAL AVI/MJPEG container for the fixture: a RIFF tree
    * (`hdrl[avih + strl[strh,strf]]`, `movi[00dc…]`) whose `00dc` chunks
    * are genuine ImageIO-encoded JPEG frames — so the video FRAME decode
    * path downstream runs a real codec end-to-end (Motion-JPEG is the
    * video format a JDK can both write and decode; H.264/MP4 stays
    * container-metadata-only). Frame count, rate and dimensions are pure
    * functions of the id.
    */
  private def aviBytes(id: Long): Array[Byte] = {
    val a = math.abs(id)
    val w = (a % 48 + 16).toInt
    val h = (a % 32 + 16).toInt
    val nFrames = (a % 6 + 3).toInt
    val usPerFrame = (33333 + (a % 3) * 6667).toInt // ~30/25/20 fps
    val frames = Array.tabulate(nFrames)(f => jpegFrame(id, f, w, h))
    def le(i: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(i); b.array()
    }
    def chunk(cc: String, data: Array[Byte]): Array[Byte] = {
      val pad = if ((data.length & 1) == 1) Array[Byte](0) else Array.empty[Byte]
      cc.getBytes("ISO-8859-1") ++ le(data.length) ++ data ++ pad
    }
    def list(subtype: String, children: Array[Byte]*): Array[Byte] = {
      val body = subtype.getBytes("ISO-8859-1") ++ children.flatten
      "LIST".getBytes("ISO-8859-1") ++ le(body.length) ++ body
    }
    val avih = chunk("avih",
      le(usPerFrame) ++ le(0) ++ le(0) ++ le(0) ++ // usPerFrame/maxBytes/pad/flags
      le(nFrames) ++ le(0) ++ le(1) ++ le(0) ++    // totalFrames/initial/streams/bufSize
      le(w) ++ le(h) ++ le(0) ++ le(0) ++ le(0) ++ le(0))
    val strh = chunk("strh",
      "vids".getBytes("ISO-8859-1") ++ "MJPG".getBytes("ISO-8859-1") ++
      le(0) ++ le(0) ++ le(0) ++ le(usPerFrame) ++ le(1000000) ++ // flags/prio/frames/scale/rate
      le(0) ++ le(nFrames) ++ le(0) ++ le(-1) ++ le(0) ++ le(0) ++ le(0))
    val strf = chunk("strf",
      le(40) ++ le(w) ++ le(h) ++ le(1 | (24 << 16)) ++ // biSize/biWidth/biHeight/planes+bpp
      "MJPG".getBytes("ISO-8859-1") ++ le(w * h * 3) ++
      le(0) ++ le(0) ++ le(0) ++ le(0))
    val hdrl = list("hdrl", avih, list("strl", strh, strf))
    val movi = list("movi", frames.map(chunk("00dc", _)): _*)
    val body = "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ movi
    "RIFF".getBytes("ISO-8859-1") ++ le(body.length) ++ body
  }

  /** Write a deterministic media-file fixture from a documents frame: one
    * file per row named `media_<id>.<ext>` (extension cycles image/audio/
    * video). Image rows are REAL PNGs, audio rows REAL WAVs, video rows
    * alternate REAL AVI/MJPEG and REAL MP4 containers (full sample
    * tables; the MP4s alternate jpeg-codec decodable frames and
    * avc1/H.264 stand-in samples). Every file is a
    * PURE FUNCTION OF ITS ID — byte-identical however often and at
    * whatever scale factor the fixture is rewritten (`textCol` is kept
    * for signature stability but no longer shapes any payload), which is
    * what lets the mm_manifest oracle re-read the files after any later
    * run has rewritten the shared scratch dir. The target dir is cleared
    * first so re-runs can't leak stale files. Files are written from the
    * executors (`foreachPartition`) — on a cluster the same code writes
    * to shared storage; this exists so `ingestBinaryFiles` can be
    * exercised against real files wherever the corpus has none.
    */
  def writeMediaFixture(docs: DataFrame, idCol: String, textCol: String,
      dir: String): String = {
    val d = new java.io.File(dir)
    if (d.exists()) d.listFiles().foreach(f => { f.delete(); () })
    d.mkdirs()
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          val id = r.getLong(0)
          val m = ((id % 3) + 3) % 3
          // video rows alternate container: MP4 (full sample-table walk;
          // frames decode for the jpeg-codec half) and AVI/MJPEG (full
          // frame decode) both stay exercised
          val ext =
            if (m == 0) "png" else if (m == 1) "wav"
            else if ((id / 3) % 2 == 0) "mp4" else "avi"
          val payload = ext match {
            case "png" => pngBytes(id)
            case "wav" => wavBytes(id)
            case "avi" => aviBytes(id)
            case _ =>
              // every payload is a pure function of the id (NOT the doc
              // text): every fixture file is byte-identical however often
              // and at whatever scale factor the fixture is rewritten, so
              // a later bench/verify run at a different SF clobbering the
              // shared scratch dir cannot invalidate the mm_manifest
              // oracle's read of the files (the oracle replays bytes).
              // MP4 rows alternate codec by (id/6)%2: Motion-JPEG in MP4
              // (REAL decodable frames, same growing-square ramp family
              // as the AVI fixture) vs avc1/H.264 (NAL-shaped stand-in
              // samples — the declared-unsupported codec path stays
              // covered, frames_decoded=false)
              val a = math.abs(id)
              val n = (a % 5 + 3).toInt
              if ((a / 6) % 2 == 0) {
                val fw = (a % 48 + 16).toInt
                val fh = (a % 32 + 16).toInt
                // alternate the two JPEG-family fourccs the kernel
                // claims (JpegInMp4Codecs) so BOTH stay gate-exercised
                val cc = if ((a / 12) % 2 == 0) "jpeg" else "mjpa"
                mp4Bytes(id, cc, fw, fh,
                  Array.tabulate(n)(f => jpegFrame(id, f, fw, fh)))
              } else {
                val samples = Array.tabulate(n) { f =>
                  val len = (a % 400 + 80).toInt
                  val arr = Array.tabulate(len) { i =>
                    ((a * 2654435761L + f * 7919L + i.toLong * 104729L)
                      >>> (i % 13)).toByte
                  }
                  // Annex-B start code + an IDR NAL header lead each sample
                  arr(0) = 0; arr(1) = 0; arr(2) = 0; arr(3) = 1; arr(4) = 0x65
                  arr
                }
                mp4Bytes(id, "avc1",
                  (a % 1280 + 16).toInt, (a % 720 + 16).toInt, samples)
              }
          }
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
    * channels / frame-accurate duration. VIDEO rows get REAL FRAME
    * DECODE for both containers' JPEG codecs: the RIFF walk
    * (parseAviMjpeg) hands each AVI `00dc` JPEG to ImageIO, and the
    * ISO-BMFF sample-table walk (parseMp4Samples: stsc×stsz×stco) hands
    * each MP4 jpeg-codec sample to ImageIO — width/height/n_frames plus
    * the 8-dim feature (mean luminance of 8 evenly-sampled decoded
    * frames) all come from decoded pixels. Durations come from the
    * container clocks (avih rate × frames; mvhd timescale). The ONE
    * undecodable path left is the H.264 BITSTREAM (avc1 samples): the
    * sample table still walks for real, but no pure-JVM decoder exists
    * on this classpath, so those rows keep container metadata +
    * byte-stat stand-in features with `frames_decoded=false` in the
    * schema (machine-visible; a JNI/FFI codec call plugs into the same
    * per-partition batch shape). Runs per-partition over iterator
    * batches — the exact shape a real codec (which needs per-partition
    * library init) requires.
    */
  def extractFeatures(spark: SparkSession, manifest: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    manifest.select("media_id", "kind", "bytes").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // Real codecs initialize native contexts here, once per partition.
        it.map { case (id, kind, bytes) =>
          val avi = if (kind == "video") parseAviMjpeg(bytes) else None
          val aviFrames: Array[java.awt.image.BufferedImage] =
            avi.map(_.frames.flatMap(decodeImage)).getOrElse(Array.empty)
          val mp4 =
            if (kind == "video" && avi.isEmpty) parseMp4Metadata(bytes) else None
          // MP4 frame extraction: the sample-table walk locates every
          // sample; only JPEG-family codecs then DECODE (avc1/H.264 is
          // the declared-unsupported bitstream — samples stay undecoded)
          val mp4Frames: Array[java.awt.image.BufferedImage] =
            if (kind == "video" && avi.isEmpty)
              parseMp4Samples(bytes).filter(s => JpegInMp4Codecs(s.codec))
                .map(_.samples.flatMap(decodeImage)).getOrElse(Array.empty)
            else Array.empty
          val decodedFrames = if (aviFrames.nonEmpty) aviFrames else mp4Frames
          val (dw, dh) =
            if (kind == "image")
              decodeImage(bytes).map(i => (i.getWidth, i.getHeight)).getOrElse((0, 0))
            else if (decodedFrames.nonEmpty)
              (decodedFrames(0).getWidth, decodedFrames(0).getHeight)
            else avi.map(v => (v.width, v.height))
              .orElse(mp4.map(m => (m.width, m.height))).getOrElse((0, 0))
          val vms = avi.map(_.durationMs).orElse(mp4.map(_.durationMs)).getOrElse(0L)
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
          val feat =
            if (decodedFrames.nonEmpty) {
              // REAL frame features: mean luminance of 8 evenly-sampled
              // DECODED frames (normalized 0..1) — pixels, not bytes
              val lumas = decodedFrames.map(meanLuma)
              Array.tabulate(8) { d =>
                (lumas(d * (lumas.length - 1) / 7) / 255.0).toFloat
              }
            } else Array.tabulate(8) { d =>
              val stride = 1 << d
              var acc = 0.0; var k = 0
              while (k < n) { acc += ((bytes(k) & 0xff) * ((k / stride) % 2 * 2 - 1)); k += stride }
              (acc / math.max(1, n)).toFloat
            }
          MediaFeatures(id, kind, n.toLong,
            math.rint(mean * 10000) / 10000, math.rint(entropy * 10000) / 10000,
            dw, dh, sr, ch, ams, vms, decodedFrames.length,
            frames_decoded = decodedFrames.nonEmpty, feat)
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
