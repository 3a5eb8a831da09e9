package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.ops.MultimodalOps
import graft.streaming.EventStreams

class MultimodalStreamingSpec extends SparkSpec {
  import spark.implicits._

  private val jpegHeader = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte) ++ "fakejpegpayload".getBytes
  private val pngHeader = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47) ++ "fakepngpayload".getBytes
  private val junk = "not an image at all".getBytes

  private lazy val media = Seq(
    (1L, jpegHeader), (2L, pngHeader), (3L, junk)
  ).toDF("item_id", "content")

  test("sniffFormat detects containers from magic bytes") {
    val fmts = media.select(col("item_id"), MultimodalOps.sniffFormat(col("content")).as("f"))
      .as[(Long, String)].collect().toMap
    assert(fmts === Map(1L -> "jpeg", 2L -> "png", 3L -> "unknown"))
  }

  test("withBinaryMeta adds size, format, hash") {
    val row = MultimodalOps.withBinaryMeta(media, "content").filter(col("item_id") === 1).head
    assert(row.getAs[Long]("n_bytes") === jpegHeader.length.toLong)
    assert(row.getAs[String]("format") === "jpeg")
    assert(row.getAs[String]("content_md5").length === 32)
  }

  test("sampleChunks splits binary into bounded fixed-size chunks") {
    val out = MultimodalOps.sampleChunks(media.filter(col("item_id") === 1), "content",
      chunkBytes = 8, maxFrames = 2)
    val chunks = out.select("chunk_idx", "chunk").as[(Int, Array[Byte])].collect()
    assert(chunks.length === 2) // 19 bytes / 8 = 3 chunks, capped at 2
    assert(chunks(0)._2.length === 8)
    assert(chunks(0)._2.toSeq === jpegHeader.take(8).toSeq)
  }

  test("resizeStub produces fixed-size deterministic output, empty-safe") {
    val out = MultimodalOps.resizeStub(media, "content", targetW = 4, targetH = 2)
      .select("item_id", "resized").as[(Long, Array[Byte])].collect().toMap
    assert(out.values.forall(_.length === 8)) // 4x2 "pixels"
    val again = MultimodalOps.resizeStub(media, "content", 4, 2)
      .select("item_id", "resized").as[(Long, Array[Byte])].collect().toMap
    assert(out(1L).toSeq === again(1L).toSeq) // deterministic
    // empty payload -> empty resized, no crash
    val empty = Seq((9L, Array.emptyByteArray)).toDF("item_id", "content")
    val r = MultimodalOps.resizeStub(empty, "content", 4, 2)
      .select("resized").as[Array[Byte]].head
    assert(r.isEmpty)
  }

  test("decodeImage: mapPartitions plumbing with deterministic features") {
    // the fake jpeg/png headers are NOT valid images, so ImageIO rejects
    // them and the deterministic stub arm takes over — same as before
    val feats = MultimodalOps.decodeImage(media, "item_id", "content").collect()
      .map(f => f.item_id -> f).toMap
    assert(feats.size === 3)
    assert(feats(1L).format === "jpeg")
    assert(feats(1L).embedding.length === 16)
    assert(math.abs(feats(1L).embedding.sum - 1f) < 1e-5) // L1-normalized
    // deterministic: second run identical
    val again = MultimodalOps.decodeImage(media, "item_id", "content").collect()
      .map(f => f.item_id -> f).toMap
    assert(again(1L).width === feats(1L).width && again(1L).height === feats(1L).height)
  }

  private def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  test("decodeImage extracts REAL dimensions from actual PNG and JPEG bytes") {
    val real = Seq(
      (10L, encode("png", 37, 23)),
      (11L, encode("jpg", 64, 48)),
      (12L, junk)
    ).toDF("item_id", "content")
    val feats = MultimodalOps.decodeImage(real, "item_id", "content").collect()
      .map(f => f.item_id -> f).toMap
    assert(feats(10L).format === "png")
    assert((feats(10L).width, feats(10L).height) === (37, 23))
    assert(feats(11L).format === "jpeg")
    assert((feats(11L).width, feats(11L).height) === (64, 48))
    // junk still takes the stub arm deterministically
    assert(feats(12L).format === "unknown")
  }

  test("dHash64: near-dup images land within Hamming 2, unrelated images far apart, brightness-shift invariant") {
    import graft.ops.ImageFixtures.syntheticPng
    def ph(b: Array[Byte]): Long = MultimodalOps.dHash64(b).get
    val base = ph(syntheticPng(1, perturbed = false))
    val variant = ph(syntheticPng(1, perturbed = true))
    val other = ph(syntheticPng(2, perturbed = false))
    def hd(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(hd(base, variant) <= 2,
      s"one-cell perturbation must stay within Hamming 2, got ${hd(base, variant)}")
    assert(hd(base, other) > 10,
      s"different images must hash far apart, got ${hd(base, other)}")
    // dHash compares ADJACENT brightness — a global brightness shift
    // preserves every comparison (the property that makes it a
    // perceptual hash, not a checksum). Build the +40 shifted image
    // directly to dodge clamping asymmetries.
    val im = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(syntheticPng(3, perturbed = false)))
    val shifted = new java.awt.image.BufferedImage(
      im.getWidth, im.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until im.getHeight; x <- 0 until im.getWidth) {
      val g = math.min(255, ((im.getRGB(x, y) >> 8) & 0xff) / 2 + 40)
      shifted.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(shifted, "png", baos)
    assert(ph(syntheticPng(3, perturbed = false)) === ph(baos.toByteArray),
      "a monotone brightness remap must preserve the dHash")
    // undecodable bytes fall back deterministically
    assert(MultimodalOps.dHash64("not an image".getBytes).isEmpty)
    assert(MultimodalOps.dHash64(Array.emptyByteArray).isEmpty)
  }

  test("imageNearDupPairs finds exactly the planted variants; banding agrees with brute force") {
    import graft.ops.ImageFixtures.syntheticPng
    val rows = (0 until 20).map(i => (i.toLong, syntheticPng(i, perturbed = false))) ++
      (0 until 20).map(i => (i.toLong + 20, syntheticPng(i, perturbed = true)))
    val df = rows.toDF("img_id", "content").repartition(4)
    val pairs = MultimodalOps.imageNearDupPairs(df, "img_id", "content", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === (0L until 20L).map(i => (i, i + 20)).toSet,
      s"expected exactly the 20 planted (base, variant) pairs, got $pairs")
    // completeness check: banding candidates == brute-force pairs at the
    // same threshold (pigeonhole: Hamming <= 3 implies a shared 16-bit chunk)
    val sig = MultimodalOps.perceptualHash(df, "img_id", "content")
      .select(col("item_id"), col("phash"))
    val a = sig.select(col("item_id").as("ia"), col("phash").as("pa"))
    val b = sig.select(col("item_id").as("ib"), col("phash").as("pb"))
    val brute = a.crossJoin(b).filter(col("ia") < col("ib"))
      .filter(bit_count(col("pa").bitwiseXOR(col("pb"))) <= 3)
      .select(col("ia"), col("ib")).as[(Long, Long)].collect().toSet
    assert(pairs === brute, "banding must find every brute-force pair")
    // every PNG really decoded (no stub arm leaked into the image path)
    assert(sig.count() === 40L)
    assert(MultimodalOps.perceptualHash(df, "img_id", "content")
      .filter(!col("is_decoded")).count() === 0L)
  }

  test("audioHash64: near-dup WAVs within Hamming 2, unrelated far apart, VOLUME-invariant; non-WAV falls back") {
    import graft.ops.AudioFixtures.syntheticWav
    def ah(b: Array[Byte]): Long = MultimodalOps.audioHash64(b).get
    def hd(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val base = ah(syntheticWav(1, perturbed = false))
    val variant = ah(syntheticWav(1, perturbed = true))
    val other = ah(syntheticWav(2, perturbed = false))
    assert(hd(base, variant) <= 2,
      s"one-frame perturbation must stay within Hamming 2, got ${hd(base, variant)}")
    assert(hd(base, other) > 10,
      s"different audio must hash far apart, got ${hd(base, other)}")
    // the envelope hash compares ADJACENT frame energies — uniform gain
    // preserves every comparison (volume invariance, the property that
    // makes it a fingerprint, not a checksum)
    assert(ah(syntheticWav(3, perturbed = false, gain = 1)) ===
      ah(syntheticWav(3, perturbed = false, gain = 2)),
      "a uniform gain change must preserve the fingerprint")
    assert(MultimodalOps.audioHash64("not audio".getBytes).isEmpty)
    assert(MultimodalOps.audioHash64(Array.emptyByteArray).isEmpty)
  }

  test("audioNearDupPairs finds exactly the planted variants; banding agrees with brute force") {
    import graft.ops.AudioFixtures.syntheticWav
    val rows = (0 until 20).map(i => (i.toLong, syntheticWav(i, perturbed = false))) ++
      (0 until 20).map(i => (i.toLong + 20, syntheticWav(i, perturbed = true)))
    val df = rows.toDF("clip_id", "content").repartition(4)
    val pairs = MultimodalOps.audioNearDupPairs(df, "clip_id", "content", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === (0L until 20L).map(i => (i, i + 20)).toSet,
      s"expected exactly the 20 planted (base, variant) pairs, got $pairs")
    val sig = MultimodalOps.audioFingerprint(df, "clip_id", "content")
    assert(sig.filter(!col("is_decoded")).count() === 0L,
      "every synthetic WAV must really decode")
    val a = sig.select(col("item_id").as("ia"), col("phash").as("pa"))
    val b = sig.select(col("item_id").as("ib"), col("phash").as("pb"))
    val brute = a.crossJoin(b).filter(col("ia") < col("ib"))
      .filter(bit_count(col("pa").bitwiseXOR(col("pb"))) <= 3)
      .select(col("ia"), col("ib")).as[(Long, Long)].collect().toSet
    assert(pairs === brute, "banding must find every brute-force pair")
  }

  test("videoFrameHashes: per-frame dHashes off real animated GIFs; variants within Hamming 2 per frame") {
    import graft.ops.VideoFixtures.syntheticGif
    val base = MultimodalOps.videoFrameHashes(syntheticGif(1, perturbed = false)).get
    val variant = MultimodalOps.videoFrameHashes(syntheticGif(1, perturbed = true)).get
    val other = MultimodalOps.videoFrameHashes(syntheticGif(2, perturbed = false)).get
    assert(base.size === 8 && variant.size === 8)
    def hd(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    base.zip(variant).zipWithIndex.foreach { case ((a, b), i) =>
      assert(hd(a, b) <= 2, s"frame $i must stay within Hamming 2, got ${hd(a, b)}")
    }
    assert(base.zip(other).count { case (a, b) => hd(a, b) > 10 } >= 7,
      "different clips must be far apart on (almost) every frame")
    // frames differ WITHIN a clip (the frame axis is real)
    assert(base.distinct.size >= 7, "frames of one clip must not collapse")
    assert(MultimodalOps.videoFrameHashes("not a gif".getBytes).isEmpty)
    // maxFrames bounds the decode
    assert(MultimodalOps.videoFrameHashes(syntheticGif(3, perturbed = false), maxFrames = 3).get.size === 3)
  }

  test("videoNearDupPairs: aligned-frame voting finds exactly the planted variants; band candidates are exact") {
    import graft.ops.VideoFixtures.syntheticGif
    val rows = (0 until 10).map(i => (i.toLong, syntheticGif(i, perturbed = false))) ++
      (0 until 10).map(i => (i.toLong + 10, syntheticGif(i, perturbed = true)))
    val df = rows.toDF("clip_id", "content").repartition(4)
    val pairs = MultimodalOps.videoNearDupPairs(df, "clip_id", "content",
      maxHamming = 3, minMatchingFrames = 5)
      .select("id_a", "id_b", "matched_frames")
      .as[(Long, Long, Long)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet ===
      (0L until 10L).map(i => (i, i + 10)).toSet,
      s"expected exactly the 10 planted (base, variant) pairs, got ${pairs.toSeq}")
    assert(pairs.forall(_._3 === 8L),
      s"every aligned frame of a variant pair must match, got ${pairs.toSeq}")
    // distinct clips never pair: the base-only corpus yields nothing
    val basesOnly = rows.take(10).toDF("clip_id", "content")
    assert(MultimodalOps.videoNearDupPairs(basesOnly, "clip_id", "content",
      maxHamming = 3, minMatchingFrames = 1).isEmpty,
      "unrelated clips must not pair even at the loosest vote")
  }

  test("videoNearDupPairsShifted: a one-frame-trimmed copy re-aligns at offset -1; strict voting misses it; one offset must explain the match") {
    import graft.ops.VideoFixtures.syntheticGif
    val rows = (0 until 6).map(i => (i.toLong, syntheticGif(i, perturbed = false))) ++
      (0 until 6).map(i => (i.toLong + 10,
        syntheticGif(i, perturbed = false, startFrame = 1))) ++ // trimmed copies
      Seq((20L, syntheticGif(99, perturbed = false)))           // unrelated
    val df = rows.toDF("clip_id", "content").repartition(3).localCheckpoint()
    // the strict aligned-index voter sees different content at every
    // index of a trimmed pair — zero pairs
    assert(MultimodalOps.videoNearDupPairs(df, "clip_id", "content",
      maxHamming = 3, minMatchingFrames = 5).isEmpty,
      "strict voting must NOT find trimmed copies (that's the hole being closed)")
    val shifted = MultimodalOps.videoNearDupPairsShifted(df, "clip_id", "content",
      maxHamming = 3, minMatchingFrames = 5, maxOffset = 2)
      .select("id_a", "id_b", "matched_frames", "offset")
      .as[(Long, Long, Long, Int)].collect()
    assert(shifted.map(p => (p._1, p._2)).toSet ===
      (0L until 6L).map(i => (i, i + 10)).toSet,
      s"expected exactly the 6 trimmed pairs, got ${shifted.toSeq}")
    assert(shifted.forall(p => p._3 === 7L && p._4 === -1),
      s"every pair must align 7 shared frames at offset -1, got ${shifted.toSeq}")
    // shift past the tolerance refuses: a 3-frame trim at maxOffset=2
    val far = Seq((0L, syntheticGif(7, perturbed = false)),
      (1L, syntheticGif(7, perturbed = false, startFrame = 3)))
      .toDF("clip_id", "content")
    assert(MultimodalOps.videoNearDupPairsShifted(far, "clip_id", "content",
      maxHamming = 3, minMatchingFrames = 5, maxOffset = 2).isEmpty,
      "a trim beyond maxOffset must refuse")
    // the perturbed variant still pairs at offset 0 through the shifted voter
    val mixed = Seq((0L, syntheticGif(3, perturbed = false)),
      (1L, syntheticGif(3, perturbed = true)))
      .toDF("clip_id", "content")
    val atZero = MultimodalOps.videoNearDupPairsShifted(mixed, "clip_id", "content",
      maxHamming = 3, minMatchingFrames = 5, maxOffset = 2)
      .select("matched_frames", "offset").as[(Long, Int)].collect()
    assert(atZero.toSeq === Seq((8L, 0)),
      s"an untrimmed variant must win at offset 0 with all 8 frames, got ${atZero.toSeq}")
  }

  test("perceptualHash stub arm on non-image bytes equals the SQL md5-prefix formula") {
    val docs = Seq((1L, "hello world"), (2L, "spark engine"), (3L, ""))
      .toDF("doc_id", "t")
      .select(col("doc_id"), col("t").cast("binary").as("content"))
    val got = MultimodalOps.perceptualHash(docs, "doc_id", "content")
    assert(got.filter(col("is_decoded")).count() === 0L)
    val expected = docs.select(col("doc_id").as("item_id"),
      expr("CAST(conv(substring(md5(content), 1, 15), 16, 10) AS BIGINT)").as("phash"))
    assert(got.select("item_id", "phash").exceptAll(expected).isEmpty &&
      expected.exceptAll(got.select("item_id", "phash")).isEmpty)
  }

  test("left-outer interval join: matches emit on arrival, NULLs only after the watermark closes the window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val joined = EventStreams.leftOuterIntervalJoinStream(
      df, df, "user_id", "ts", "event_id", withinSeconds = 300L, watermarkDelay = "10 seconds")
    val query = joined.writeStream.format("memory").queryName("st4_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: follower within 300s (match); user 2: alone (future NULL)
      input.addData(
        (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "a", 0.0),
        (2L, Timestamp.valueOf("2024-01-01 10:02:00"), 1L, "b", 0.0),
        (3L, Timestamp.valueOf("2024-01-01 10:00:00"), 2L, "a", 0.0))
      query.processAllAvailable()
      val early = spark.table("st4_test")
        .select("user_id", "l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1), r.get(2)))
      assert(early.contains((1L, 1L, 2L)), "the inner match must emit without waiting")
      assert(!early.exists(t => t._1 == 2L),
        "user 2's NULL row must NOT emit while its window could still fill")
      // advance the watermark past 10:00:00 + 300s + 10s delay
      input.addData((9L, Timestamp.valueOf("2024-01-01 11:00:00"), 99L, "z", 0.0))
      query.processAllAvailable()
      val late = spark.table("st4_test")
        .select("user_id", "l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1), r.get(2)))
      assert(late.contains((2L, 3L, null)), "the closed window must emit NULL-padded")
      // the matched left row must not ALSO emit a NULL duplicate
      assert(late.count(t => t._2 == 1L) === 1)
    } finally query.stop()
  }

  test("sessionWindowStream: in-gap arrivals MERGE across micro-batches; sessions emit once on close") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val query = EventStreams.sessionWindowStream(df, gapMinutes = 10, watermarkDelay = "10 seconds")
      .writeStream.format("memory").queryName("st8_test").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "a", 1.0),
        (2L, Timestamp.valueOf("2024-01-01 10:05:00"), 1L, "a", 2.0))
      query.processAllAvailable()
      assert(spark.table("st8_test").isEmpty, "open sessions must not emit early")
      // batch 2 arrives IN-GAP (8 min after the last event): must merge
      // into the same session, not start a new one
      input.addData((3L, Timestamp.valueOf("2024-01-01 10:13:00"), 1L, "a", 4.0))
      query.processAllAvailable()
      // close everything: watermark past last event + gap + delay
      input.addData((9L, Timestamp.valueOf("2024-01-01 12:00:00"), 99L, "z", 0.0))
      query.processAllAvailable()
      val out = spark.table("st8_test")
        .filter($"user_id" === 1L)
        .select("session_start", "session_end", "n_events", "total_value")
        .as[(Timestamp, Timestamp, Long, Double)].collect().toSeq
      assert(out === Seq((Timestamp.valueOf("2024-01-01 10:00:00"),
        Timestamp.valueOf("2024-01-01 10:23:00"), 3L, 7.0)),
        s"cross-batch merge failed: $out")
    } finally query.stop()
  }

  test("streaming hourlyCounts matches the batch tumbling aggregate") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val query = EventStreams.hourlyCounts(df, "2 hours")
      .writeStream.format("memory").queryName("hourly_test").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, Timestamp.valueOf("2024-01-01 10:15:00"), 1L, "click", 2.0),
        (2L, Timestamp.valueOf("2024-01-01 10:45:00"), 1L, "click", 3.0),
        (3L, Timestamp.valueOf("2024-01-01 11:05:00"), 1L, "view", 5.0))
      query.processAllAvailable()
      // advance watermark far enough to close the 10:00 and 11:00 windows
      input.addData((4L, Timestamp.valueOf("2024-01-01 15:00:00"), 1L, "click", 1.0))
      query.processAllAvailable()
      val out = spark.table("hourly_test")
        .select("window_start", "event_type", "n_events", "total_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(out.contains((Timestamp.valueOf("2024-01-01 10:00:00"), "click", 2L, 5.0)))
      assert(out.contains((Timestamp.valueOf("2024-01-01 11:00:00"), "view", 1L, 5.0)))
    } finally query.stop()
  }

  private def wavBytes(channels: Int, rate: Int, bps: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dataLen = 8 // a few fake sample bytes
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * bps / 8) // byte rate
      .putShort((channels * bps / 8).toShort).putShort(bps.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    bb.array()
  }

  test("mp4Meta walks real ISO-BMFF boxes: brand, timescale, duration, track count") {
    import java.nio.ByteBuffer
    def box(tag: String, payload: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(tag.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    val ftyp = box("ftyp", "isom".getBytes ++ Array.fill[Byte](8)(0))
    // mvhd v0: version+flags, ctime, mtime, timescale=600, duration=1500 -> 2500 ms
    val mvhdPayload = ByteBuffer.allocate(20)
      .putInt(0).putInt(0).putInt(0).putInt(600).putInt(1500).array()
    val moov = box("moov",
      box("mvhd", mvhdPayload) ++ box("trak", Array.emptyByteArray) ++
        box("trak", Array.emptyByteArray))
    val mp4 = ftyp ++ moov
    assert(MultimodalOps.mp4Meta(mp4) === Some(("isom", 600, 2500L, 2)))
    // v1 layout: 64-bit times, timescale at payload offset 20
    val mvhdV1 = ByteBuffer.allocate(32)
      .putInt(1 << 24).putLong(0L).putLong(0L).putInt(1000).putLong(90000L).array()
    val mp4v1 = ftyp ++ box("moov", box("mvhd", mvhdV1) ++ box("trak", Array.emptyByteArray))
    assert(MultimodalOps.mp4Meta(mp4v1) === Some(("isom", 1000, 90000L, 1)))
    // the sniffing column agrees on real bytes, and the Dataset path works
    import spark.implicits._
    val df = Seq((1L, mp4), (2L, "just text".getBytes)).toDF("id", "payload")
    val out = MultimodalOps.decodeVideoMeta(df, "id", "payload").collect()
      .map(v => v.item_id -> v).toMap
    assert(out(1L).format === "mp4" && out(1L).major_brand === "isom" &&
      out(1L).duration_ms === 2500L && out(1L).n_tracks === 2)
    assert(out(2L).format === "unknown" && out(2L).n_tracks === 0)
  }

  test("mp4Meta survives adversarial boxes: truncation, zero and 64-bit sizes") {
    import java.nio.ByteBuffer
    def box(tag: String, payload: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(tag.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    val ftyp = box("ftyp", "isom".getBytes ++ Array.fill[Byte](8)(0))
    // no moov at all
    assert(MultimodalOps.mp4Meta(ftyp) === None)
    // box size larger than the buffer (classic truncation attack)
    val lying = ftyp ++ ByteBuffer.allocate(8).putInt(1 << 30).put("moov".getBytes).array()
    assert(MultimodalOps.mp4Meta(lying) === None)
    // box size smaller than its own header
    val tiny = ftyp ++ ByteBuffer.allocate(8).putInt(3).put("moov".getBytes).array()
    assert(MultimodalOps.mp4Meta(tiny) === None)
    // 64-bit extended size on moov (size==1 + 8-byte size after the tag)
    val mvhdPayload = ByteBuffer.allocate(20)
      .putInt(0).putInt(0).putInt(0).putInt(600).putInt(600).array()
    val inner = box("mvhd", mvhdPayload) ++ box("trak", Array.emptyByteArray)
    val moov64 = ByteBuffer.allocate(16 + inner.length)
      .putInt(1).put("moov".getBytes).putLong(16L + inner.length).put(inner).array()
    assert(MultimodalOps.mp4Meta(ftyp ++ moov64) === Some(("isom", 600, 1000L, 1)))
    // zero-size moov (extends to end of buffer)
    val moov0 = ByteBuffer.allocate(8 + inner.length)
      .putInt(0).put("moov".getBytes).put(inner).array()
    assert(MultimodalOps.mp4Meta(ftyp ++ moov0) === Some(("isom", 600, 1000L, 1)))
    // empty / non-bmff bytes
    assert(MultimodalOps.mp4Meta(Array.emptyByteArray) === None)
    assert(MultimodalOps.mp4Meta("plain old text data here".getBytes) === None)
  }

  test("decodeAudioMeta extracts real channels/rate/depth from actual WAV headers") {
    val real = Seq(
      (20L, wavBytes(2, 44100, 16)),
      (21L, wavBytes(1, 16000, 8)),
      (22L, junk)
    ).toDF("item_id", "content")
    val out = MultimodalOps.decodeAudioMeta(real, "item_id", "content").collect()
      .map(a => a.item_id -> a).toMap
    assert(out(20L).format === "riff")
    assert((out(20L).channels, out(20L).sample_rate, out(20L).bits_per_sample) === ((2, 44100, 16)))
    assert((out(21L).channels, out(21L).sample_rate, out(21L).bits_per_sample) === ((1, 16000, 8)))
    assert(out(22L).format === "unknown" && out(22L).channels === 0)
  }

  test("wavMeta survives adversarial chunk sizes (no crash, just None)") {
    // RIFF/WAVE container whose first chunk claims size 0xFFFFFFFF — an
    // Int offset would wrap negative and index out of bounds
    val evil = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(56)
      .put("WAVE".getBytes("US-ASCII"))
      .put("junk".getBytes("US-ASCII")).putInt(0xffffffff)
      .array()
    assert(MultimodalOps.wavMeta(evil) === None)
    assert(MultimodalOps.wavMeta(Array.emptyByteArray) === None)
    assert(MultimodalOps.wavMeta("RIFFxxxxWAVE".getBytes) === None)
  }

  test("append-mode aggregation DROPS genuinely late data once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val query = EventStreams.hourlyCounts(df, "2 hours")
      .writeStream.format("memory").queryName("late_drop_test").outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two events in the 01:00 window
      input.addData(
        (1L, Timestamp.valueOf("2024-01-01 01:00:00"), 1L, "click", 1.0),
        (2L, Timestamp.valueOf("2024-01-01 01:30:00"), 1L, "click", 1.0))
      query.processAllAvailable()
      // batch 2: advance event time so the NEXT batch's watermark
      // (05:00 − 2 h = 03:00) is past the 01:00 window
      input.addData((3L, Timestamp.valueOf("2024-01-01 05:00:00"), 1L, "click", 1.0))
      query.processAllAvailable()
      // batch 3: a genuinely late event for the already-closed 01:00
      // window (01:40 < watermark 03:00) — MUST be dropped, not appended
      // and not mutate the emitted row
      input.addData((4L, Timestamp.valueOf("2024-01-01 01:40:00"), 1L, "click", 99.0))
      query.processAllAvailable()
      // batch 4: close the 05:00 window too
      input.addData((5L, Timestamp.valueOf("2024-01-01 09:00:00"), 1L, "click", 1.0))
      query.processAllAvailable()
      val out = spark.table("late_drop_test")
        .select("window_start", "n_events", "total_value")
        .as[(Timestamp, Long, Double)].collect().toSet
      // the 01:00 window emitted exactly once, with ONLY the two on-time
      // events — the late 99.0 never entered the result
      assert(out.contains((Timestamp.valueOf("2024-01-01 01:00:00"), 2L, 2.0)))
      assert(!out.exists(r => r._1 == Timestamp.valueOf("2024-01-01 01:00:00") && r._2 != 2L))
      assert(out.contains((Timestamp.valueOf("2024-01-01 05:00:00"), 1L, 1.0)))
    } finally query.stop()
  }

  test("update-mode aggregation re-emits changed groups and still drops late data") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val query = EventStreams.hourlyCounts(df, "2 hours")
      .writeStream.format("memory").queryName("update_mode_test")
      .outputMode(OutputMode.Update()).start()
    try {
      // batch 1: two events in the 01:00 window -> first version emitted
      input.addData(
        (1L, Timestamp.valueOf("2024-01-01 01:00:00"), 1L, "click", 1.0),
        (2L, Timestamp.valueOf("2024-01-01 01:30:00"), 1L, "click", 1.0))
      query.processAllAvailable()
      // batch 2: a third on-time event for the SAME window — update mode
      // must re-emit the revised row (append mode emits nothing here)
      input.addData((3L, Timestamp.valueOf("2024-01-01 01:45:00"), 1L, "click", 1.0))
      query.processAllAvailable()
      // batch 3: advance event time; next batch's watermark (05:00 - 2h)
      // closes the 01:00 window
      input.addData((4L, Timestamp.valueOf("2024-01-01 05:00:00"), 1L, "click", 7.0))
      query.processAllAvailable()
      // batch 4: genuinely late event for 01:00 — dropped, NO new version
      input.addData((5L, Timestamp.valueOf("2024-01-01 01:50:00"), 1L, "click", 99.0))
      query.processAllAvailable()
      val versions = spark.table("update_mode_test")
        .select("window_start", "n_events", "total_value")
        .as[(Timestamp, Long, Double)].collect().toSeq
      val w1 = Timestamp.valueOf("2024-01-01 01:00:00")
      // the memory sink keeps every emitted update: exactly the two
      // versions of the 01:00 window, in growing order, and never a
      // version containing the late 99.0
      assert(versions.filter(_._1 == w1) === Seq((w1, 2L, 2.0), (w1, 3L, 3.0)))
      assert(versions.contains((Timestamp.valueOf("2024-01-01 05:00:00"), 1L, 7.0)))
      assert(!versions.exists(_._3 >= 99.0))
    } finally query.stop()
  }

  test("file-source streaming over real events parquet matches batch (closed windows)") {
    // the file stream source wants a directory; stage the single parquet file
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("part-0.parquet"))
    val query = EventStreams.runHourlyFromParquet(spark, dir.toString, "hourly_file_test")
    try {
      query.awaitTermination() // AvailableNow: drains all files then stops
      val streamed = spark.table("hourly_file_test")
        .select("window_start", "event_type", "n_events")
        .as[(Timestamp, String, Long)].collect().toSet
      val batch = graft.ops.EventOps.tumblingCounts(Tables.events(spark, "/root/testdata/sf0.001"), "hour")
        .select("window_start", "event_type", "n_events")
        .as[(Timestamp, String, Long)].collect().toSet
      // append mode only emits windows the watermark closed; the last ~2h
      // of windows stay open, so streamed ⊆ batch and covers most of it
      assert(streamed.subsetOf(batch))
      assert(streamed.size >= batch.size - 8, s"${streamed.size} vs ${batch.size}")
      assert(streamed.nonEmpty)
    } finally query.stop()
  }

  test("stream-stream interval join pairs events within the window, same semantics as batch rangeSelfJoin") {
    implicit val sqlCtx = spark.sqlContext
    val inL = MemoryStream[(Long, Timestamp, Long)]
    val inR = MemoryStream[(Long, Timestamp, Long)]
    val mk = (m: MemoryStream[(Long, Timestamp, Long)]) => m.toDF().toDF("event_id", "ts", "user_id")
    val joined = EventStreams.intervalJoinStream(
      mk(inL), mk(inR), "user_id", "ts", "event_id", withinSeconds = 300L, watermarkDelay = "10 minutes")
    val query = joined.writeStream.format("memory").queryName("ivj_test")
      .outputMode(OutputMode.Append()).start()
    try {
      inL.addData((1L, Timestamp.valueOf("2024-01-01 10:00:00"), 7L))
      inR.addData(
        (2L, Timestamp.valueOf("2024-01-01 10:03:00"), 7L), // within 5min -> pair
        (3L, Timestamp.valueOf("2024-01-01 10:06:00"), 7L), // outside -> no pair
        (4L, Timestamp.valueOf("2024-01-01 10:03:30"), 8L)) // other key -> no pair
      query.processAllAvailable()
      val out = spark.table("ivj_test").select("l_id", "r_id")
        .as[(Long, Long)].collect().toSet
      assert(out === Set((1L, 2L)))
    } finally query.stop()
  }

  test("streaming dedup drops within-watermark duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val df = input.toDF().toDF("event_id", "ts", "value")
    val query = EventStreams.dedupStream(df, Seq("event_id"), "1 hour")
      .writeStream.format("memory").queryName("dedup_test").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
        (2L, Timestamp.valueOf("2024-01-01 10:01:00"), 2.0),
        (1L, Timestamp.valueOf("2024-01-01 10:02:00"), 99.0)) // dup id within watermark
      query.processAllAvailable()
      input.addData((1L, Timestamp.valueOf("2024-01-01 10:03:00"), 98.0)) // still dup
      query.processAllAvailable()
      val out = spark.table("dedup_test").select("event_id", "value")
        .as[(Long, Double)].collect().toSet
      assert(out === Set((1L, 1.0), (2L, 2.0))) // first arrival wins, dups dropped
    } finally query.stop()
  }

  test("streaming sessionization emits closed sessions like the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, Double)]
    val df = input.toDF().toDF("event_id", "ts", "user_id", "value")
    val out = EventStreams.sessionizeStream(spark, df, gapMinutes = 30, watermarkDelay = "10 minutes")
    val query = out.writeStream.format("memory").queryName("sessions_test")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 10L, 1.0),
        (2L, Timestamp.valueOf("2024-01-01 10:20:00"), 10L, 2.0))
      query.processAllAvailable()
      // a later event for the same user, > 30min gap: closes session 1
      input.addData((3L, Timestamp.valueOf("2024-01-01 12:00:00"), 10L, 4.0))
      query.processAllAvailable()
      val sessions = spark.table("sessions_test")
        .select("user_id", "session_start", "n_events", "total_value")
        .as[(Long, Timestamp, Long, Double)].collect().toSet
      assert(sessions.contains((10L, Timestamp.valueOf("2024-01-01 10:00:00"), 2L, 3.0)))
    } finally query.stop()
  }

  test("streaming sessionization groups multiple disjoint late events within one batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, Double)]
    val df = input.toDF().toDF("event_id", "ts", "user_id", "value")
    val out = EventStreams.sessionizeStream(spark, df, gapMinutes = 30, watermarkDelay = "6 hours")
    val query = out.writeStream.format("memory").queryName("sessions_batchlate_test")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, Timestamp.valueOf("2024-01-01 12:00:00"), 10L, 1.0))
      query.processAllAvailable()
      // two late events, disjoint from the open session but within the gap
      // of EACH OTHER: must close as ONE session of 2 events, not two singletons
      input.addData(
        (2L, Timestamp.valueOf("2024-01-01 08:00:00"), 10L, 2.0),
        (3L, Timestamp.valueOf("2024-01-01 08:20:00"), 10L, 4.0))
      query.processAllAvailable()
      val sessions = spark.table("sessions_batchlate_test")
        .select("session_start", "n_events", "total_value")
        .as[(Timestamp, Long, Double)].collect().toSet
      assert(sessions === Set((Timestamp.valueOf("2024-01-01 08:00:00"), 2L, 6.0)))
    } finally query.stop()
  }

  test("streaming sessionization merges late events that extend the open session backwards") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, Double)]
    val df = input.toDF().toDF("event_id", "ts", "user_id", "value")
    val out = EventStreams.sessionizeStream(spark, df, gapMinutes = 30, watermarkDelay = "2 hours")
    val query = out.writeStream.format("memory").queryName("sessions_late_test")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, Timestamp.valueOf("2024-01-01 10:00:00"), 10L, 1.0))
      query.processAllAvailable()
      // late event 10 minutes BEFORE the open session start: within gap -> merge
      input.addData((2L, Timestamp.valueOf("2024-01-01 09:50:00"), 10L, 2.0))
      query.processAllAvailable()
      // close the session with a far-future event
      input.addData((3L, Timestamp.valueOf("2024-01-01 15:00:00"), 10L, 4.0))
      query.processAllAvailable()
      val sessions = spark.table("sessions_late_test")
        .select("session_start", "n_events", "total_value")
        .as[(Timestamp, Long, Double)].collect().toSet
      // the closed session starts at the LATE event's time and contains both
      assert(sessions.contains((Timestamp.valueOf("2024-01-01 09:50:00"), 2L, 3.0)))
    } finally query.stop()
  }

  test("sessionization state is evicted when the watermark passes (bounded under churn)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, Double)]
    val df = input.toDF().toDF("event_id", "ts", "user_id", "value")
    val out = EventStreams.sessionizeStream(spark, df, gapMinutes = 30, watermarkDelay = "10 minutes")
    val query = out.writeStream.format("memory").queryName("sessions_evict_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // 200 users open one session each
      input.addData((1 to 200).map(i => (i.toLong, Timestamp.valueOf("2024-01-01 10:00:00"), i.toLong, 1.0)): _*)
      query.processAllAvailable()
      // advance the watermark far past every session's gap timeout, then
      // one more batch so the timeouts fire
      input.addData((900L, Timestamp.valueOf("2024-01-01 13:00:00"), 900L, 1.0))
      query.processAllAvailable()
      input.addData((901L, Timestamp.valueOf("2024-01-01 13:30:00"), 901L, 1.0))
      query.processAllAvailable()
      // every aged session was emitted...
      val emitted = spark.table("sessions_evict_test")
        .filter(col("session_start") === Timestamp.valueOf("2024-01-01 10:00:00")).count()
      assert(emitted === 200L)
      // ...and EVICTED: state holds only the still-open future sessions,
      // not one row per user ever seen — the bounded-state contract that
      // keeps a 100 TB/day stream viable
      val stateRows = query.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 3, s"state not evicted: $stateRows rows retained")
      // adversarial straggler far behind the watermark: silently dropped,
      // no resurrected session
      input.addData((999L, Timestamp.valueOf("2024-01-01 10:05:00"), 42L, 7.0))
      query.processAllAvailable()
      val resurrected = spark.table("sessions_evict_test")
        .filter(col("total_value") === 7.0).count()
      assert(resurrected === 0L)
    } finally query.stop()
  }
}
