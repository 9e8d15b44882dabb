package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.Media._

/** Multimodal tests — image, audio AND video decode are REAL (JDK
  * imageio / javax.sound.sampled / the RIFF walk + per-frame imageio
  * of MjpegAviCodec — r11), spec'd sample/frame-exact below; only
  * inter-frame codecs (h264/vp9) remain behind the FakeCodec stub.
  * Also under test: the Spark surface — binary columns, metadata
  * schema, batch shape, fail-soft decode, and the Catalyst
  * frame-sampling plan.
  */
class MediaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Media.synthetic(spark, 200, partitions = 8).cache()

  test("synthetic corpus has binary + typed metadata schema") {
    val sch = corpus.toDF().schema
    assert(sch("bytes").dataType.typeName == "binary")
    assert(sch("meta").dataType.typeName == "struct")
    assert(corpus.count() == 200)
  }

  test("feature extraction: every row decoded, fixed dim, deterministic") {
    val f1 = extractFeatures(corpus, new FakeCodec, featureDim = 16)
      .collect().sortBy(_.media_id)
    val f2 = extractFeatures(corpus, new FakeCodec, featureDim = 16)
      .collect().sortBy(_.media_id)
    assert(f1.length == 200)
    assert(f1.forall(_.decoded_ok))
    assert(f1.forall(_.feature.length == 16))
    // pure function of bytes → identical across runs (task-retry safe)
    assert(f1.zip(f2).forall { case (a, b) => a.feature.sameElements(b.feature) })
  }

  test("corrupt media is fail-soft: decoded_ok=false, job continues") {
    val withCorrupt = corpus.map(r =>
      if (r.media_id % 10 == 0) r.copy(bytes = Array.empty[Byte]) else r)
    val f = extractFeatures(withCorrupt, new FakeCodec)
    assert(f.filter(!_.decoded_ok).count() == 20)
    assert(f.count() == 200)
  }

  test("resize rewrites metadata and shrinks payload proportionally") {
    val images = corpus.filter(_.kind == "image")
    val small = resize(images, new FakeCodec, 32, 24).collect()
    assert(small.forall(r => r.meta.width == 32 && r.meta.height == 24))
    val orig = images.collect().map(r => r.media_id -> r.bytes.length).toMap
    assert(small.forall(r => r.bytes.length <= orig(r.media_id)))
  }

  test("frame sampling is pure Catalyst and arithmetic is right") {
    val frames = sampleFrames(corpus.toDF(), everyN = 10)
    val videos = corpus.filter(_.kind == "video").collect()
    val expected = videos.map(v => (v.meta.nFrames + 9) / 10).sum
    assert(frames.count() == expected)
    // ts of frame 30 at 30 fps = 1000 ms
    val f30 = frames.filter(col("frame_idx") === 30).select("ts_ms")
      .as[Long].collect()
    assert(f30.forall(_ == 1000L))
    // no UDF/serialization stage in the plan — and over parquet the
    // binary column must be pruned out of the scan (ReadSchema)
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    corpus.write.mode("overwrite").parquet(dir)
    val fromParquet = sampleFrames(spark.read.parquet(dir), everyN = 10)
    val plan = fromParquet.queryExecution.executedPlan.toString
    assert(!plan.contains("SerializeFromObject"), "frame sampling should not deserialize rows")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("bytes"), s"binary column not pruned: $readSchema")
  }

  test("decode batches respect DecodeBatchSize (vectorized-UDF shape)") {
    val sizes = corpus.mapPartitions { it =>
      it.grouped(Media.DecodeBatchSize).map(_.size)
    }.collect()
    assert(sizes.forall(_ <= Media.DecodeBatchSize))
    assert(sizes.sum == 200)
  }

  test("imageNearDup finds planted duplicate images and no random pairs") {
    import spark.implicits._
    // plant: media 1000/1001 share identical bytes (identical decode →
    // hamming 0); everything else is distinct synthetic content
    val base = corpus.filter(_.kind == "image").collect().toSeq
    val dupOf = base.head
    val planted = base ++ Seq(
      dupOf.copy(media_id = 1000L),
      dupOf.copy(media_id = 1001L))
    val pairs = Media.imageNearDup(spark.createDataset(planted), new FakeCodec)
      .as[(Long, Long, Int)].collect()
    val ids = pairs.map(p => (p._1, p._2)).toSet
    assert(ids.contains((dupOf.media_id, 1000L)))
    assert(ids.contains((dupOf.media_id, 1001L)))
    assert(ids.contains((1000L, 1001L)))
    pairs.filter(p => Set(p._1, p._2).subsetOf(Set(dupOf.media_id, 1000L, 1001L)))
      .foreach(p => assert(p._3 == 0, s"identical bytes must hash identically: $p"))
    // the fake codec avalanches, so unrelated synthetic images should
    // essentially never land within hamming 7
    val falsePairs = pairs.filterNot(p =>
      Set(p._1, p._2).exists(Set(dupOf.media_id, 1000L, 1001L)))
    assert(falsePairs.length <= 2, s"too many accidental pairs: ${falsePairs.toSeq}")
  }

  test("phash banding pigeonhole: any pair within hamming 7 shares a band") {
    val rnd = new scala.util.Random(3)
    (0 until 500).foreach { _ =>
      val base = rnd.nextLong()
      val k = rnd.nextInt(8) // 0..7 bit flips
      val flipped = (0 until k).foldLeft(base) { (h, _) =>
        h ^ (1L << rnd.nextInt(64))
      }
      val shared = Media.phashBandKeys(base).zip(Media.phashBandKeys(flipped))
        .exists { case (a, b) => a == b }
      assert(shared, f"hamming<=7 pair with no shared band: $base%x vs $flipped%x")
    }
  }

  // ---- real decode via the JDK's javax.imageio (no stub) ----------

  private def encodeImage(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  /** deterministic 32×32 noise image — noise (not gradients) keeps the
    * pooled features of distinct images far apart, so the only phash
    * pairs are the planted ones
    */
  private def noiseImage(seed: Long): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rnd = new scala.util.Random(seed)
    for (y <- 0 until 32; x <- 0 until 32)
      img.setRGB(x, y, rnd.nextInt(0x1000000))
    img
  }

  private val pngMeta = MediaMeta("png", 32, 32, 1, 0)

  test("ImageIoCodec: real PNG decode is exact BT.601 luma, row-major") {
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000) // red
    img.setRGB(1, 0, 0x00ff00) // green
    img.setRGB(0, 1, 0x0000ff) // blue
    img.setRGB(1, 1, 0xffffff) // white
    val px = new ImageIoCodec()
      .decode(encodeImage(img, "png"), MediaMeta("png", 2, 2, 1, 0)).get
    // PNG is lossless, so the luma of each pixel is exact
    val want = Seq(0.299f, 0.587f, 0.114f, 1.0f)
    assert(px.length == 4)
    for ((p, w) <- px.zip(want)) assert(math.abs(p - w) < 1e-6f, s"$p vs $w")
  }

  test("ImageIoCodec: real JPEG bytes decode; corrupt/empty bytes fail soft") {
    val codec = new ImageIoCodec()
    val jpeg = encodeImage(noiseImage(7), "jpg")
    assert(jpeg.take(2).map(_ & 0xff).toSeq == Seq(0xff, 0xd8), "not a real JPEG")
    val px = codec.decode(jpeg, MediaMeta("jpeg", 32, 32, 1, 0))
    assert(px.exists(p => p.length == 32 * 32 && p.forall(v => v >= 0f && v <= 1f)))
    // determinism: same bytes, same buffer
    assert(px.get.sameElements(codec.decode(jpeg, pngMeta).get))
    assert(codec.decode("not an image".getBytes, pngMeta).isEmpty)
    assert(codec.decode(Array.empty[Byte], pngMeta).isEmpty)
    assert(codec.decode(null, pngMeta).isEmpty)
  }

  test("imageNearDup on real-encoded bytes finds exactly the planted pair") {
    // 30 distinct noise images + one near-identical copy of image 0
    // (a single pixel nudged by one bit in the blue channel)
    val distinct = (0L until 30L).map(i =>
      MediaRow(i, "image", encodeImage(noiseImage(i), "png"), pngMeta))
    val tweaked = noiseImage(0)
    tweaked.setRGB(5, 5, tweaked.getRGB(5, 5) ^ 0x1)
    val planted = MediaRow(100L, "image", encodeImage(tweaked, "png"), pngMeta)
    val ds = spark.createDataset(distinct :+ planted).repartition(4)
    val pairs = Media.imageNearDup(ds, new ImageIoCodec())
      .select("id1", "id2", "hamming").as[(Long, Long, Int)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((0L, 100L)),
      s"got ${pairs.mkString(",")}")
    assert(pairs.head._3 <= 2)
  }

  test("syntheticEncoded: image rows are real PNGs that decode for real") {
    val enc = Media.syntheticEncoded(spark, 30).collect()
    val images = enc.filter(_.kind == "image")
    assert(images.nonEmpty)
    // PNG magic bytes — these are real encoded files, not fakes
    images.foreach(r => assert(
      r.bytes.take(4).map(_ & 0xff).toSeq == Seq(0x89, 0x50, 0x4e, 0x47),
      s"media ${r.media_id} is not a PNG"))
    val codec = new ImageIoCodec()
    images.foreach { r =>
      val px = codec.decode(r.bytes, r.meta)
      assert(px.exists(_.length == 32 * 32), s"media ${r.media_id} failed decode")
    }
    // non-image rows carry their own real containers (WAV / AVI)
    assert(enc.filter(_.kind != "image").forall(_.bytes.nonEmpty))
    // deterministic across invocations (task-retry safe)
    val enc2 = Media.syntheticEncoded(spark, 30).collect()
      .map(r => r.media_id -> r.bytes).toMap
    enc.foreach(r => assert(r.bytes.sameElements(enc2(r.media_id))))
  }

  test("registered q58 path (real codec) recalls exactly the planted dups") {
    // mirror of the q58 construction at sf0.001 scale: 90 rows, images
    // at id%3==0, byte-identical plants at id%7==0 → pairs (id, id+1M)
    // for id%21==0
    val base = Media.syntheticEncoded(spark, 90)
    val planted = base.union(
      base.filter(r => r.kind == "image" && r.media_id % 7 == 0)
        .map(r => r.copy(media_id = r.media_id + 1000000L)))
    val pairs = Media.imageNearDup(planted, new ImageIoCodec())
      .as[(Long, Long, Int)].collect()
    val expected = (0L until 90L)
      .filter(id => id % 21 == 0).map(id => (id, id + 1000000L)).toSet
    val got = pairs.map(p => (p._1, p._2)).toSet
    assert(expected.subsetOf(got), s"missing planted pairs: ${expected.diff(got)}")
    expected.foreach { e =>
      val h = pairs.find(p => (p._1, p._2) == e).get._3
      assert(h == 0, s"byte-identical plant $e must hash identically")
    }
    assert((got -- expected).size <= 2, s"too many accidental pairs: ${got -- expected}")
  }

  test("WavCodec: real WAV bytes decode to the exact PCM samples") {
    // hand-build one deterministic WAV and check sample-exact decode
    val rnd = new scala.util.Random(7)
    val samples = Array.fill(400)((rnd.nextInt(65536) - 32768).toShort)
    val raw = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      raw(2 * i) = (s & 0xff).toByte
      raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val decoded = new WavCodec()
      .decode(bos.toByteArray, MediaMeta("wav", 0, 0, 0, 16000))
    assert(decoded.isDefined)
    val got = decoded.get
    assert(got.length == samples.length)
    samples.indices.foreach { i =>
      assert(got(i) == samples(i) / 32768.0f, s"sample $i")
    }
    // corrupt / non-audio bytes fail soft, like images
    assert(new WavCodec().decode(Array[Byte](1, 2, 3), MediaMeta("wav", 0, 0, 0, 0)).isEmpty)
    assert(new WavCodec().decode(Array.empty[Byte], MediaMeta("wav", 0, 0, 0, 0)).isEmpty)
  }

  test("syntheticEncoded audio rows are real WAVs that decode end-to-end") {
    val audio = Media.syntheticEncoded(spark, 90).filter(_.kind == "audio")
    // WAV container magic: RIFF....WAVE
    val heads = audio.map(r => new String(r.bytes.take(4), "US-ASCII") +
      new String(r.bytes.slice(8, 12), "US-ASCII")).distinct().collect()
    assert(heads.sameElements(Array("RIFFWAVE")), heads.mkString(","))
    // the real distributed decode path: every audio row decodes ok
    val feats = extractFeatures(audio, new WavCodec(), featureDim = 16).collect()
    assert(feats.nonEmpty && feats.forall(_.decoded_ok))
    assert(feats.forall(_.feature.length == 16))
    // deterministic: same id ⇒ same features across re-evaluation
    val again = extractFeatures(audio, new WavCodec(), featureDim = 16).collect()
    assert(feats.sortBy(_.media_id).map(_.feature.toSeq).toSeq ==
      again.sortBy(_.media_id).map(_.feature.toSeq).toSeq)
  }

  test("q181: audio fingerprints recall every planted near-dup and match " +
    "an independent LCG replica") {
    val out = graft.queries.Sources.queries("q181_audio_neardup")
      .fn(spark, sf0001)
      .select("id1", "id2", "fp1", "fp2", "hamming")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // every planted (i, i+1e6) pair must surface within hamming 1 —
    // the banding pigeonhole guarantee on the perturbed copy
    val planted = (0 until 90).filter(_ % 21 == 1).map(_.toLong)
    assert(planted.nonEmpty)
    planted.foreach { i =>
      val hit = out.find(p => p._1 == i && p._2 == i + 1000000L)
      assert(hit.nonEmpty, s"planted pair $i missing")
    }
    // emitted hamming is the true popcount of the emitted signatures
    out.foreach(p => assert(p._5 <= 1 &&
      java.lang.Long.bitCount(p._3 ^ p._4) == p._5, s"hamming wrong: $p"))
    // signature replica straight from the LCG definition (independent
    // of the WAV encode/decode path the engine exercises)
    def fpOf(seed: Long, zeroFirst: Boolean): Long = {
      val rnd = new scala.util.Random(seed)
      val s = Array.fill(1600)((rnd.nextInt(65536) - 32768).toLong)
      if (zeroFirst) s(0) = 0L
      val a = s.map(math.abs)
      val total = a.sum
      (0 until 8).map(i =>
        if (a.slice(i * 200, (i + 1) * 200).sum * 8 > total) 1L << i
        else 0L).sum
    }
    planted.foreach { i =>
      val pair = out.find(p => p._1 == i && p._2 == i + 1000000L).get
      assert(pair._3 == fpOf(i, zeroFirst = false),
        s"original fp mismatch for clip $i")
      assert(pair._4 == fpOf(i, zeroFirst = true),
        s"perturbed fp mismatch for clip $i")
    }
  }

  test("audioFingerprint covers every sample: remainder tails count and " +
    "n < segs degrades gracefully") {
    // 1601 samples (not divisible by 8): the final loud sample must be
    // counted in SOME segment, not silently dropped from all of them.
    // 1600 near-silent samples + one max-amplitude tail: the tail's
    // mass dominates, so exactly the last segment's bit sets.
    val tail = Array.fill(1601)(1f / 32768f)
    tail(1600) = 0.9f
    val (fpTail, totalTail) = audioFingerprint(tail)
    assert(totalTail == 1601L * 1 - 1 + math.round(0.9f * 32768f),
      s"total must include the tail sample, got $totalTail")
    assert((fpTail & (1L << 7)) != 0L,
      f"loud tail sample must land in the last segment: fp=$fpTail%x")
    // divisible n keeps the historical i·(n/segs) boundaries — the q181
    // oracle's p // 200 mirror stays in lockstep
    val even = Array.tabulate(1600)(i => if (i < 200) 0.5f else 0.001f)
    val (fpEven, _) = audioFingerprint(even)
    assert(fpEven == 1L, f"front-loaded clip sets exactly bit 0: $fpEven%x")
    // n < segs: no crash, every sample still assigned to one segment
    val tiny = Array(0.5f, -0.5f, 0.25f)
    val (fpTiny, totalTiny) = audioFingerprint(tiny)
    assert(totalTiny == 16384L + 16384L + 8192L)
    assert(fpTiny != 0L, "occupied segments must still compare their mass")
  }

  // ---- real VIDEO decode: MJPEG-in-AVI via the RIFF walk (r11) -----

  /** a real MJPEG-AVI: each frame a distinct noise image, JPEG-encoded
    * through javax.imageio, wrapped by Media.encodeMjpegAvi
    */
  private def noiseAvi(seed: Long, frames: Int = 3, tweakFrame: Int = -1): Array[Byte] = {
    val jpegs = (0 until frames).map { f =>
      val img = noiseImage(seed * 100 + f)
      if (f == tweakFrame) img.setRGB(5, 5, img.getRGB(5, 5) ^ 0x1)
      encodeImage(img, "jpg")
    }
    Media.encodeMjpegAvi(jpegs, 32, 32)
  }

  private val aviMeta = MediaMeta("mjpeg-avi", 32, 32, 3, 0)

  test("MjpegAviCodec: frames decode exactly as ImageIoCodec decodes each JPEG") {
    val jpegs = (0 until 3).map(f => encodeImage(noiseImage(900 + f), "jpg"))
    val avi = Media.encodeMjpegAvi(jpegs, 32, 32)
    assert(new String(avi.take(4), "US-ASCII") == "RIFF" &&
      new String(avi.slice(8, 12), "US-ASCII") == "AVI ", "not a RIFF AVI")
    val px = new MjpegAviCodec().decode(avi, aviMeta)
    assert(px.exists(_.length == 3 * 32 * 32))
    // frame f of the video ≡ the lone-image decode of frame f's JPEG —
    // the video path is REALLY the image decoder over container chunks
    val imgCodec = new ImageIoCodec()
    (0 until 3).foreach { f =>
      val lone = imgCodec.decode(jpegs(f), pngMeta).get
      assert(px.get.slice(f * 1024, (f + 1) * 1024).sameElements(lone),
        s"frame $f luminance differs from the standalone JPEG decode")
    }
  }

  test("MjpegAviCodec: corrupt bytes fail soft; a truncated tail keeps whole frames") {
    val codec = new MjpegAviCodec()
    assert(codec.decode("not a video".getBytes, aviMeta).isEmpty)
    assert(codec.decode(Array.empty[Byte], aviMeta).isEmpty)
    assert(codec.decode(null, aviMeta).isEmpty)
    // a WAV is RIFF but not AVI — must be rejected, not misparsed
    val wav = Media.syntheticEncoded(spark, 30).filter(_.kind == "audio")
      .head().bytes
    assert(codec.decode(wav, aviMeta).isEmpty)
    // chop mid-way through the last frame: the walk stops at the torn
    // chunk and keeps the complete frames before it
    val avi = noiseAvi(17)
    val truncated = avi.take(avi.length - 40)
    val px = codec.decode(truncated, aviMeta)
    assert(px.exists(_.length == 2 * 32 * 32),
      s"expected the 2 complete frames, got ${px.map(_.length)}")
  }

  test("syntheticEncoded video rows are real MJPEG-AVIs that decode end-to-end") {
    val videos = Media.syntheticEncoded(spark, 90).filter(_.kind == "video")
    val heads = videos.map(r => new String(r.bytes.take(4), "US-ASCII") +
      new String(r.bytes.slice(8, 12), "US-ASCII")).distinct().collect()
    assert(heads.sameElements(Array("RIFFAVI ")), heads.mkString(","))
    val feats = extractFeatures(videos, new MjpegAviCodec(), featureDim = 16)
      .collect()
    assert(feats.nonEmpty && feats.forall(_.decoded_ok))
    // nFrames metadata is honest: 3 frames of 16×16 luminance each
    val lens = videos.map(r =>
      new MjpegAviCodec().decode(r.bytes, r.meta).get.length).distinct().collect()
    assert(lens.sameElements(Array(3 * 16 * 16)), lens.mkString(","))
    // deterministic across invocations (task-retry safe)
    val again = extractFeatures(videos, new MjpegAviCodec(), featureDim = 16)
      .collect()
    assert(feats.sortBy(_.media_id).map(_.feature.toSeq).toSeq ==
      again.sortBy(_.media_id).map(_.feature.toSeq).toSeq)
  }

  test("videoNearDup recalls the planted frame-dups through the real codec") {
    // 25 distinct clips + a byte-identical clone of clip 0 + a
    // re-encode of clip 1 with ONE PIXEL of ONE FRAME nudged — the
    // video twin of the planted-image test: shared frames pool to a
    // nearby phash, so both plants surface within the banding's
    // hamming-7 pigeonhole guarantee
    val distinct = (0L until 25L).map(i =>
      MediaRow(i, "video", noiseAvi(i), aviMeta))
    val clone = MediaRow(1000L, "video", noiseAvi(0), aviMeta)
    val tweaked = MediaRow(1001L, "video", noiseAvi(1, tweakFrame = 2), aviMeta)
    val ds = spark.createDataset(distinct :+ clone :+ tweaked).repartition(4)
    val pairs = Media.videoNearDup(ds, new MjpegAviCodec())
      .as[(Long, Long, Int)].collect()
    val got = pairs.map(p => (p._1, p._2)).toSet
    assert(got.contains((0L, 1000L)), s"byte-identical clone missed: $got")
    assert(pairs.find(p => (p._1, p._2) == (0L, 1000L)).get._3 == 0,
      "identical bytes must hash identically")
    assert(got.contains((1L, 1001L)), s"single-pixel re-encode missed: $got")
    // noise clips keep accidental pairs essentially at zero
    assert((got -- Set((0L, 1000L), (1L, 1001L))).size <= 2,
      s"too many accidental pairs: $got")
  }

  test("sceneCuts: repeated frames are zero-delta even at threshold 0, " +
    "scene boundaries fire, and a one-scene clip stays cut-free") {
    def sceneAvi(seedA: Long, seedB: Long): Array[Byte] = {
      val a = encodeImage(noiseImage(seedA), "jpg")
      val b = encodeImage(noiseImage(seedB), "jpg")
      Media.encodeMjpegAvi(Seq(a, a, a, b, b, b), 32, 32)
    }
    val meta6 = MediaMeta("mjpeg-avi", 32, 32, 6, 0)
    val oneScene = {
      val a = encodeImage(noiseImage(42L), "jpg")
      Media.encodeMjpegAvi(Seq(a, a, a, a), 32, 32)
    }
    val ds = spark.createDataset(Seq(
      MediaRow(1L, "video", sceneAvi(10, 20), meta6),
      MediaRow(2L, "video", sceneAvi(30, 40), meta6),
      MediaRow(3L, "video", oneScene, MediaMeta("mjpeg-avi", 32, 32, 4, 0)),
      // audio row must be ignored (kind filter)
      MediaRow(4L, "audio", Array[Byte](1, 2, 3), MediaMeta("wav", 0, 0, 0, 16000))
    )).repartition(2)
    val cuts = Media.sceneCuts(ds, new MjpegAviCodec())
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2))
    assert(cuts.map(c => (c._1, c._2)).toSeq == Seq((1L, 3), (2L, 3)),
      s"expected exactly the two A->B boundaries: ${cuts.toSeq}")
    cuts.foreach { c => assert(c._3 > 100, s"boundary delta too small: $c") }
    // at threshold 0 the intra-scene transitions STILL stay silent:
    // byte-identical frames decode to identical luma planes, so their
    // delta is exactly zero — not merely below a tolerance
    val all = Media.sceneCuts(ds, new MjpegAviCodec(), thresholdMilli = 0)
      .as[(Long, Int, Long)].collect()
    assert(all.map(c => (c._1, c._2)).toSet == Set((1L, 3), (2L, 3)),
      s"intra-scene delta must be exactly 0: ${all.toSeq}")
  }

  test("features aggregate distributedly (per-kind mean norm)") {
    val agg = extractFeatures(corpus, new FakeCodec)
      .toDF()
      .select(col("kind"),
        sqrt(aggregate(col("feature").cast("array<double>"), lit(0.0),
          (a, x) => a + x * x)).as("norm"))
      .groupBy("kind").agg(avg("norm").as("avg_norm"), count(lit(1)).as("n"))
      .collect()
    assert(agg.length == 3)
    assert(agg.forall(_.getAs[Double]("avg_norm") > 0.0))
  }
}
