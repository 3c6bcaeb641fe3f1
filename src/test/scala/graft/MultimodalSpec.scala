package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val docs = Tables.load(spark, TestSpark.sf, "documents")

  test("manifest schema: binary payload + typed metadata") {
    val m = Multimodal.manifestFromDocuments(docs, "doc_id", "text")
    assert(m.schema("bytes").dataType.typeName == "binary")
    assert(m.schema("media_id").dataType.typeName == "long")
    val kinds = m.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
    assert(m.count() == docs.count())
  }

  test("binaryFile ingestion fills the manifest schema from real files") {
    val dir = TestSpark.scratch("mm_binary_files")
    new java.io.File(dir).mkdirs()
    def write(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name), bytes)
    write("a.jpg", Array[Byte](1, 2, 3, 4))
    write("b.wav", Array[Byte](9, 8, 7))
    write("c.mp4", Array.fill[Byte](64)(42))
    write("d.bin", Array[Byte](0))
    val m = Multimodal.ingestBinaryFiles(spark, dir)
    assert(m.count() == 4)
    val byKind = m.collect().map(r => r.getAs[String]("uri").split('.').last ->
      r.getAs[String]("kind")).toMap
    assert(byKind == Map("jpg" -> "image", "wav" -> "audio",
      "mp4" -> "video", "bin" -> "binary"))
    // payload bytes survive the ingestion; ids are deterministic
    val jpg = m.filter(org.apache.spark.sql.functions.col("uri").endsWith("a.jpg")).first()
    assert(jpg.getAs[Array[Byte]]("bytes").toSeq == Seq[Byte](1, 2, 3, 4))
    val ids1 = m.select("media_id").collect().map(_.getLong(0)).sorted
    val ids2 = Multimodal.ingestBinaryFiles(spark, dir)
      .select("media_id").collect().map(_.getLong(0)).sorted
    assert(ids1.sameElements(ids2))
    // and the ingested manifest feeds straight into the feature extractor
    assert(Multimodal.extractFeatures(spark, m).count() == 4)
  }

  test("media fixture writes one deterministic file per doc and clears stale files") {
    val dir = TestSpark.scratch("mm_fixture")
    // a stale file from a previous (larger) run must not survive
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "media_999999.png"),
      Array[Byte](1))
    val sample = docs.filter(col("doc_id") < 10)
    Multimodal.writeMediaFixture(sample, "doc_id", "text", dir)
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(files.length == sample.count())
    assert(!files.contains("media_999999.png"))
    assert(files.forall(_.matches("media_\\d+\\.(png|wav|mp4|avi)")))
    // the gate pipeline over the fixture: binaryFile ingest + name-derived
    // ids + stub features, fully deterministic across runs
    def run() = {
      val man = Multimodal.ingestBinaryFiles(spark, dir)
        .withColumn("media_id",
          regexp_extract(col("uri"), "media_(\\d+)\\.", 1).cast("long"))
      Multimodal.extractFeatures(spark, man).collect()
        .map(f => f.media_id -> (f.kind, f.n_bytes, f.byte_mean, f.byte_entropy))
        .toSeq.sortBy(_._1)
    }
    val r1 = run()
    Multimodal.writeMediaFixture(sample, "doc_id", "text", dir)
    val r2 = run()
    assert(r1 == r2 && r1.length == sample.count().toInt)
    assert(r1.map(_._1) == (0L until sample.count()).toSeq)
  }

  test("feature extraction is deterministic and partition-independent") {
    val m = Multimodal.manifestFromDocuments(docs, "doc_id", "text")
    val f1 = Multimodal.extractFeatures(spark, m).collect()
      .map(f => f.media_id -> (f.n_bytes, f.byte_mean, f.byte_entropy)).toMap
    val f2 = Multimodal.extractFeatures(spark, m.repartition(7)).collect()
      .map(f => f.media_id -> (f.n_bytes, f.byte_mean, f.byte_entropy)).toMap
    assert(f1 == f2)
    assert(f1.values.forall { case (n, mean, ent) => n > 0 && mean > 0 && ent > 0 })
    // 8-dim stub embedding present
    val feats = Multimodal.extractFeatures(spark, m).head(3)
    assert(feats.forall(_.feature.length == 8))
  }

  test("resize stub scales dims into the box, preserves aspect, shrinks payload") {
    val docs = Tables.load(spark, TestSpark.sf, "documents").limit(60)
    val manifest = Multimodal.manifestFromDocuments(docs, "doc_id", "text")
    val resized = Multimodal.resizeImages(spark, manifest, maxW = 256, maxH = 256)
      .collect().map(r => r.media_id -> r).toMap
    val originals = manifest.filter(org.apache.spark.sql.functions.col("kind") === "image")
      .select("media_id", "width", "height", "bytes").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getAs[Array[Byte]](3)))
    assert(originals.nonEmpty)
    originals.foreach { case (id, w, h, bytes) =>
      val r = resized(id)
      assert(r.width <= 256 && r.height <= 256)
      assert(r.width >= 1 && r.height >= 1)
      // aspect preserved within integer rounding
      if (w > 256 || h > 256)
        assert(math.abs(r.width.toDouble / r.height - w.toDouble / h) / (w.toDouble / h) < 0.05)
      else assert(r.width == w && r.height == h)
      assert(r.bytes.length <= bytes.length)
    }
    // deterministic across runs
    val again = Multimodal.resizeImages(spark, manifest, maxW = 256, maxH = 256)
      .collect().map(r => r.media_id -> r.bytes.toSeq).toMap
    assert(again == resized.map { case (k, v) => k -> v.bytes.toSeq })
  }

  test("image rows decode to real dimensions; resize re-encodes a true raster") {
    val dir = TestSpark.scratch("mm_realpng")
    val sample = docs.filter(col("doc_id") < 30)
    Multimodal.writeMediaFixture(sample, "doc_id", "text", dir)
    val man = Multimodal.ingestBinaryFiles(spark, dir)
      .withColumn("media_id",
        regexp_extract(col("uri"), "media_(\\d+)\\.", 1).cast("long"))
    val feats = Multimodal.extractFeatures(spark, man).collect()
    val images = feats.filter(_.kind == "image")
    assert(images.nonEmpty)
    // dims come from javax.imageio reading the PNG, and must equal the
    // generator's deterministic (id%48+4, id%36+4)
    images.foreach { f =>
      assert(f.width == (f.media_id % 48 + 4).toInt &&
        f.height == (f.media_id % 36 + 4).toInt,
        s"decoded dims must match the generated PNG: $f")
    }
    feats.filter(_.kind == "audio").foreach(f =>
      assert(f.width == 0 && f.height == 0, s"audio rows carry no dims: $f"))
    // video rows split by container. MP4 rows (id ≡ 2 mod 6) parse the
    // genuine box tree: mvhd timescale/duration always
    // (timescale=600+(id%3)*200, duration=id%120000+timescale; box
    // version alternates by (id/12)%2). The codec splits them by
    // (id/6)%2: Motion-JPEG-in-MP4 rows get REAL FRAME DECODE via the
    // stsc×stsz×stco sample-table walk (both chunk layouts, (id/24)%2);
    // avc1/H.264 rows keep tkhd dims + byte-stat stand-ins — the
    // declared-unsupported bitstream. AVI rows (id ≡ 5 mod 6) get REAL
    // FRAME DECODE below.
    val videos = feats.filter(_.kind == "video")
    assert(videos.nonEmpty)
    val (mp4s, avis) = videos.partition(_.media_id % 6 == 2)
    assert(mp4s.nonEmpty && avis.nonEmpty, "fixture must carry both containers")
    assert(mp4s.exists(f => (f.media_id / 12) % 2 == 0) &&
      mp4s.exists(f => (f.media_id / 12) % 2 == 1),
      "fixture must exercise both mvhd/tkhd versions")
    val (mjpegMp4s, avcMp4s) = mp4s.partition(f => (f.media_id / 6) % 2 == 0)
    assert(mjpegMp4s.nonEmpty && avcMp4s.nonEmpty,
      "fixture must carry both MP4 codecs")
    assert(mjpegMp4s.exists(f => (f.media_id / 24) % 2 == 0) &&
      mjpegMp4s.exists(f => (f.media_id / 24) % 2 == 1),
      "fixture must exercise both stsc chunk layouts")
    assert(mjpegMp4s.exists(f => (f.media_id / 12) % 2 == 0) &&
      mjpegMp4s.exists(f => (f.media_id / 12) % 2 == 1),
      "fixture must exercise BOTH JPEG-family fourccs (jpeg AND mjpa)")
    mp4s.foreach { f =>
      val ts = 600 + (f.media_id % 3) * 200
      val dur = f.media_id % 120000 + ts
      assert(f.video_ms == math.rint(dur * 1000.0 / ts).toLong,
        s"parsed mvhd duration must match the generated MP4: $f")
    }
    avcMp4s.foreach { f =>
      assert(f.width == (f.media_id % 1280 + 16).toInt &&
        f.height == (f.media_id % 720 + 16).toInt,
        s"parsed tkhd dims must match the generated MP4: $f")
      assert(f.n_frames == 0,
        s"no JVM H.264 codec: avc1 rows decode no frames: $f")
      assert(!f.frames_decoded,
        s"avc1 stand-in features must be flagged undecoded in the schema: $f")
    }
    // MJPEG-in-MP4: every sample located by the REAL sample-table walk
    // and decoded by ImageIO — frame count, decoded dims and the
    // brightness ramp all from pixels, exactly like the AVI path
    mjpegMp4s.foreach { f =>
      assert(f.frames_decoded, s"jpeg-codec MP4 features come from decoded pixels: $f")
      assert(f.n_frames == (f.media_id % 5 + 3).toInt,
        s"every generated MP4 sample must decode: $f")
      assert(f.width == (f.media_id % 48 + 16).toInt &&
        f.height == (f.media_id % 32 + 16).toInt,
        s"dims must come from DECODED frames: $f")
      assert(f.feature.length == 8 && f.feature.forall(v => v > 0f && v < 1f),
        s"luma features are normalized decoded-pixel means: $f")
      assert(f.feature(7) > f.feature(0) + 0.01f,
        s"decoded luminance must reproduce the brightness ramp: $f")
    }
    // AVI/MJPEG rows: every 00dc JPEG frame REALLY decoded by ImageIO —
    // frame count, decoded dims and duration match the generator
    // (w=id%48+16, h=id%32+16, frames=id%6+3, 46667 us/frame for
    // id ≡ 5 mod 6), and the decoded-pixel luminance features reproduce
    // the generator's growing-square brightness ramp
    avis.foreach { f =>
      assert(f.frames_decoded, s"AVI features come from decoded pixels: $f")
      assert(f.n_frames == (f.media_id % 6 + 3).toInt,
        s"every generated JPEG frame must decode: $f")
      assert(f.width == (f.media_id % 48 + 16).toInt &&
        f.height == (f.media_id % 32 + 16).toInt,
        s"dims must come from DECODED frames: $f")
      assert(f.video_ms ==
        math.rint(46667L * f.n_frames / 1000.0).toLong,
        s"duration must be avih rate x frames: $f")
      assert(f.feature.length == 8 && f.feature.forall(v => v > 0f && v < 1f),
        s"luma features are normalized decoded-pixel means: $f")
      // the growing white square makes mean luminance strictly ramp up:
      // JPEG is lossy, so assert the ramp's ends, not every step
      assert(f.feature(7) > f.feature(0) + 0.01f,
        s"decoded luminance must reproduce the brightness ramp: $f")
      assert((0 until 7).forall(i => f.feature(i + 1) >= f.feature(i) - 0.02f),
        s"luminance ramp is monotone up to JPEG noise: $f")
    }
    feats.filterNot(_.kind == "video").foreach(f =>
      assert(f.video_ms == 0, s"non-video rows carry no movie duration: $f"))
    // audio rows parse the genuine RIFF/WAVE container: sample rate and
    // channel count from the format chunk, duration from the frame count
    // (generator: 8 kHz mono, id%300+50 frames)
    val audio = feats.filter(_.kind == "audio")
    assert(audio.nonEmpty)
    audio.foreach { f =>
      val frames = f.media_id % 300 + 50
      assert(f.sample_rate == 8000 && f.channels == 1,
        s"decoded WAV format must match the generator: $f")
      assert(f.audio_ms == math.rint(frames * 1000.0 / 8000).toLong,
        s"decoded WAV duration must be frame-accurate: $f")
    }
    feats.filterNot(_.kind == "audio").foreach(f =>
      assert(f.sample_rate == 0 && f.channels == 0 && f.audio_ms == 0,
        s"non-audio rows stay unparsed: $f"))
    // real raster resize: the output payload is a PNG of exactly the new dims
    val resized = Multimodal.resizeImages(spark, man, maxW = 16, maxH = 16).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes))
      assert(img != null, s"resized payload must stay a decodable image: ${r.media_id}")
      assert(img.getWidth == r.width && img.getHeight == r.height)
      assert(r.width <= 16 && r.height <= 16)
    }
  }

  test("frame sampling emits one row per interval for video rows") {
    val m = Multimodal.manifestFromDocuments(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(m, everyMs = 60000L)
    val perVideo = frames.groupBy("media_id").agg(count(lit(1)).as("n"))
      .join(m.filter(col("kind") === "video").select("media_id", "duration_ms"), "media_id")
    val bad = perVideo.filter(col("n") =!= (col("duration_ms") / 60000L + 1).cast("long")).count()
    assert(bad == 0)
  }
}
