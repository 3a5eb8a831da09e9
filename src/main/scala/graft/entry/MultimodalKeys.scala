package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{ClassifyOps, ContaminationOps, DedupOps, EventOps, LakeOps, PackOps, QuantizeOps, SampleOps, SimilarityOps, TextOps}
import graft.EntryHelpers._

/** Driver-contract keys — multimodal binary plumbing: decode stubs, frame sampling, perceptual hashes, image/audio/video near-dup.
  *
  * Mechanically split out of SparkEntry (round 15) with ZERO behavior
  * change: entries are verbatim; [[SparkEntry.queries]] /
  * [[SparkEntry.oracleSql]] concatenate the families. Shared helper
  * builders live in [[EntryHelpers]].
  */
private[graft] object MultimodalKeys {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm1_binary_meta" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        md5(col("text").cast("binary")).as("content_md5"))),

    "mm2_decode_stub" -> ((s, dir) => {
      // mapPartitions decode plumbing under the oracle: text bytes can
      // never sniff as png/jpeg, so they deterministically hit the stub
      // arm whose dims are SQL-expressible arithmetic — format/bytes/dims
      // are hash-checked (real PNG/JPEG header decode is spec-pinned in
      // MultimodalStreamingSpec with actual image bytes); the
      // byte-histogram embedding (array column) stays out of the driver
      // projection — the driver compare can't sort rows on an array column
      import s.implicits._
      val media = t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("content"))
      graft.ops.MultimodalOps.decodeImage(media, "doc_id", "content").toDF()
        .select("item_id", "format", "n_bytes", "width", "height")
    }),

    "mm4_perceptual_hash" -> ((s, dir) => {
      // image-content dedup tier 1 — the perceptual-hash signature pass
      // under the oracle: text bytes can never sniff as png/jpeg, so
      // every row deterministically takes the SQL-expressible stub arm
      // (15 md5 nibbles as a 60-bit integer) and the whole plumbing —
      // mapPartitions decode boundary, stub coalesce, format sniff — is
      // hash-checked; REAL dHash on actual pixels is spec-pinned with
      // constructed PNGs (MultimodalStreamingSpec) and gated end-to-end
      // by mm5.
      val media = t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("content"))
      graft.ops.MultimodalOps.perceptualHash(media, "doc_id", "content")
        .select(col("item_id"), col("format"), col("phash"), col("is_decoded"))
    }),

    "mm5_image_neardup" -> ((s, dir) => {
      // image-content dedup tier 2, END TO END on REAL pixels: 20
      // deterministic synthetic PNGs + 20 one-cell-perturbed variants
      // (ImageFixtures — integer pixel math, lossless PNG roundtrip, so
      // every dHash bit reproduces on any JVM), near-dup pairs via
      // 4×16-bit Hamming banding. The pair set is SF-independent and
      // DERIVED, not golden: exactly the planted (i, i+20) variants at
      // Hamming ≤ 3, which the oracle states as a range join. A decode
      // regression, a hash drift, or a banding gap all break the row set.
      import s.implicits._
      val rows = (0 until 20).map(i =>
        (i.toLong, graft.ops.ImageFixtures.syntheticPng(i, perturbed = false))) ++
        (0 until 20).map(i =>
          (i.toLong + 20, graft.ops.ImageFixtures.syntheticPng(i, perturbed = true)))
      val df = rows.toDF("img_id", "content").repartition(4)
      graft.ops.MultimodalOps.imageNearDupPairs(df, "img_id", "content", maxHamming = 3)
        .select(col("id_a"), col("id_b"))
    }),

    "mm6_audio_neardup" -> ((s, dir) => {
      // audio-content dedup END TO END on REAL PCM: 20 deterministic
      // synthetic WAVs + 20 one-frame-perturbed variants (AudioFixtures
      // — hand-built RIFF header, integer square waves, no codec, so
      // every envelope bit reproduces on any JVM), near-dup pairs via
      // the same 4×16-bit Hamming banding as mm5. The fingerprint is
      // the dHash idea on the ENERGY ENVELOPE (65 frames, Σ|sample|,
      // adjacent comparisons — volume-invariant by construction). The
      // pair set is SF-independent and DERIVED: exactly the planted
      // (i, i+20) variants at Hamming ≤ 3.
      import s.implicits._
      val rows = (0 until 20).map(i =>
        (i.toLong, graft.ops.AudioFixtures.syntheticWav(i, perturbed = false))) ++
        (0 until 20).map(i =>
          (i.toLong + 20, graft.ops.AudioFixtures.syntheticWav(i, perturbed = true)))
      val df = rows.toDF("clip_id", "content").repartition(4)
      graft.ops.MultimodalOps.audioNearDupPairs(df, "clip_id", "content", maxHamming = 3)
        .select(col("id_a"), col("id_b"))
    }),

    "mm7_video_neardup" -> ((s, dir) => {
      // video-content dedup END TO END on REAL multi-frame decode: 10
      // deterministic animated GIFs + 10 variants perturbed inside one
      // dHash cell IN EVERY FRAME (VideoFixtures — GIF's palette is
      // lossless for grayscale, so per-frame hashes reproduce on any
      // JVM). Near-dup = ALIGNED-FRAME VOTING: ≥5 of 8 same-index
      // frames within Hamming 3, candidates from per-(frame, band)
      // buckets (pigeonhole-complete per frame ⇒ the matched count is
      // exact, never all-pairs). Pair set DERIVED (i, i+10) with every
      // aligned frame matching — SF-independent.
      import s.implicits._
      val rows = (0 until 10).map(i =>
        (i.toLong, graft.ops.VideoFixtures.syntheticGif(i, perturbed = false))) ++
        (0 until 10).map(i =>
          (i.toLong + 10, graft.ops.VideoFixtures.syntheticGif(i, perturbed = true)))
      val df = rows.toDF("clip_id", "content").repartition(4)
      graft.ops.MultimodalOps.videoNearDupPairs(df, "clip_id", "content",
        maxHamming = 3, minMatchingFrames = 5)
        .select(col("id_a"), col("id_b"), col("matched_frames"))
    }),

    "mm8_video_shifted" -> ((s, dir) => {
      // TEMPORAL-SHIFT-tolerant video dedup: copies trimmed by one
      // leading frame (VideoFixtures startFrame=1 — same content
      // stream, every index shifted) DEFEAT aligned-index voting
      // (pinned: the strict voter finds zero pairs) but the
      // sliding-offset vote re-aligns them at offset −1 with all 7
      // shared frames matching. One offset must explain the match, so
      // unrelated clips still refuse. Candidates stay banded per
      // (aligned frame, band) — the offset fan-out is a constant
      // (2·maxOffset+1) factor, never all-pairs. Pair set DERIVED
      // (i, i+10, 7 frames, offset −1) — SF-independent.
      import s.implicits._
      val rows = (0 until 8).map(i =>
        (i.toLong, graft.ops.VideoFixtures.syntheticGif(i, perturbed = false))) ++
        (0 until 8).map(i => (i.toLong + 10,
          graft.ops.VideoFixtures.syntheticGif(i, perturbed = false, startFrame = 1))) ++
        (0 until 4).map(i => (i.toLong + 20,
          graft.ops.VideoFixtures.syntheticGif(100 + i, perturbed = false)))
      val df = rows.toDF("clip_id", "content").repartition(4).localCheckpoint()
      val strictEmpty = graft.ops.MultimodalOps.videoNearDupPairs(
        df, "clip_id", "content", maxHamming = 3, minMatchingFrames = 5).count() == 0L
      graft.ops.MultimodalOps.videoNearDupPairsShifted(df, "clip_id", "content",
        maxHamming = 3, minMatchingFrames = 5, maxOffset = 2)
        .select(lit(strictEmpty).as("strict_finds_none"),
          col("id_a"), col("id_b"), col("matched_frames"),
          col("offset").cast("long").as("shift"))
    }),

    "mm3_frame_sample" -> ((s, dir) => {
      // frame/chunk sampling under the oracle (sampleChunks was spec-only
      // before): bounded-fan-out posexplode — at most maxFrames rows per
      // item regardless of payload size, the shape a video frame-sampler
      // emits. Chunk identity rides as md5 (the raw binary stays out of
      // the driver projection — the compare can't sort on binary)
      val media = t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("content"))
      graft.ops.MultimodalOps.sampleChunks(media, "content", chunkBytes = 64, maxFrames = 4)
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          md5(col("chunk")).as("chunk_md5"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "mm1_binary_meta" ->
      "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, md5(text) AS content_md5 FROM documents",

    "mm2_decode_stub" ->
      // sniffFormat's jpeg/png arms check bytes (FFD8, 89504E47) that can't
      // begin valid UTF-8 text, so only the ASCII-prefix arms are
      // reachable here; dims replicate the stub's formula BYTE-exactly
      // (first/last raw byte via hex, not ascii() code points — those
      // diverge on multi-byte characters)
      ("""WITH b AS (
         |  SELECT doc_id, text, octet_length(encode(text)) AS n, hex(encode(text)) AS h FROM documents
         |)
         |SELECT doc_id AS item_id,
         |  CASE WHEN starts_with(text, 'GIF8') THEN 'gif'
         |       WHEN starts_with(text, 'RIFF') THEN 'riff'
         |       WHEN starts_with(text, '%PDF') THEN 'pdf'
         |       WHEN substring(text, 5, 4) = 'ftyp' THEN 'mp4'
         |       ELSE 'unknown' END AS format,
         |  CAST(n AS BIGINT) AS n_bytes,
         |  CAST(16 + (n * 31 + CASE WHEN n = 0 THEN 0 ELSE ('0x' || substring(h, 1, 2))::INTEGER END) % 1024 AS INTEGER) AS width,
         |  CAST(16 + (n * 17 + CASE WHEN n = 0 THEN 0 ELSE ('0x' || substring(h, n * 2 - 1, 2))::INTEGER END) % 1024 AS INTEGER) AS height
         |FROM b""").stripMargin,

    "mm4_perceptual_hash" -> // text bytes always take the stub arm, whose
      // 60-bit md5-prefix fingerprint is the same formula in both engines
      ("""SELECT doc_id AS item_id,
         |  CASE WHEN starts_with(text, 'GIF8') THEN 'gif'
         |       WHEN starts_with(text, 'RIFF') THEN 'riff'
         |       WHEN starts_with(text, '%PDF') THEN 'pdf'
         |       WHEN substring(text, 5, 4) = 'ftyp' THEN 'mp4'
         |       ELSE 'unknown' END AS format,
         |  ('0x' || substring(md5(text), 1, 15))::BIGINT AS phash,
         |  FALSE AS is_decoded
         |FROM documents""").stripMargin,

    "mm5_image_neardup" -> // the planted (base, variant) pairs — derived
      // from the construction (one perturbed dHash cell ⇒ Hamming ≤ 3;
      // distinct seeds ⇒ far apart), SF-independent
      ("""SELECT CAST(range AS BIGINT) AS id_a, CAST(range + 20 AS BIGINT) AS id_b
         |FROM range(0, 20)""").stripMargin,

    "mm6_audio_neardup" -> // same derivation for the audio envelope:
      // one perturbed frame ⇒ Hamming ≤ 2; distinct seeds ⇒ far apart
      ("""SELECT CAST(range AS BIGINT) AS id_a, CAST(range + 20 AS BIGINT) AS id_b
         |FROM range(0, 20)""").stripMargin,

    "mm7_video_neardup" -> // the video derivation: per-frame Hamming ≤ 2
      // by construction ⇒ ALL 8 aligned frames of a variant pair match
      ("""SELECT CAST(range AS BIGINT) AS id_a, CAST(range + 10 AS BIGINT) AS id_b,
         |       CAST(8 AS BIGINT) AS matched_frames
         |FROM range(0, 10)""").stripMargin,

    "mm8_video_shifted" -> // a one-frame-trimmed copy re-aligns at
      // offset −1 with all 7 shared frames matching; the strict
      // aligned-index voter sees none of it (pinned by the probe)
      ("""SELECT TRUE AS strict_finds_none,
         |       CAST(range AS BIGINT) AS id_a, CAST(range + 10 AS BIGINT) AS id_b,
         |       CAST(7 AS BIGINT) AS matched_frames, CAST(-1 AS BIGINT) AS shift
         |FROM range(0, 8)""").stripMargin,

    "mm3_frame_sample" -> // ASCII text: char offsets = byte offsets, so
      // substr over VARCHAR replays the binary slicing byte-exactly
      ("""WITH c AS (
         |  SELECT doc_id, text, least(CAST(ceil(len(text) / 64.0) AS INT), 4) AS n_chunks
         |  FROM documents
         |), u AS (
         |  SELECT doc_id, text, unnest(generate_series(1, n_chunks)) AS i FROM c
         |)
         |SELECT doc_id, CAST(i - 1 AS BIGINT) AS chunk_idx,
         |       md5(substr(text, (i - 1) * 64 + 1, 64)) AS chunk_md5
         |FROM u""").stripMargin
  )
}
