package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal binary-column plumbing: header parse, stub decode,
  * corrupt-payload tolerance, frame sampling. */
class MultimodalSpec extends SparkSpec {

  private def mediaDf(rows: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    rows.toDF("media_id", "content")
  }

  test("payloadStats reports size and magic validity declaratively") {
    import spark.implicits._
    val good = Multimodal.syntheticPayload(4, 2, seed = 0)
    val df = mediaDf(Seq(
      (1L, good),
      (2L, "nonsense".getBytes("UTF-8")),
      (3L, null)))
    val got = Multimodal.payloadStats(df, "media_id", "content")
      .as[(Long, Option[Int], Option[Boolean])].collect().toSet
    assert(got === Set(
      (1L, Some(12 + 8), Some(true)),
      (2L, Some(8), Some(false)),
      (3L, None, None)))
  }

  test("decodeFeatures parses dimensions and byte stats; corrupt rows yield nulls") {
    import spark.implicits._
    // 2×2 seed=0 body bytes: (x+y)%251 → 0,1,1,2 → mean 1.0, max 2
    // hostile header: width = Int.MaxValue overflows w*h in Int space
    val hostile = {
      val bb = java.nio.ByteBuffer.allocate(12)
      bb.put(Multimodal.MagicBytes).putInt(Int.MaxValue).putInt(2)
      bb.array()
    }
    val df = mediaDf(Seq(
      (1L, Multimodal.syntheticPayload(2, 2, seed = 0)),
      (2L, Array[Byte](1, 2, 3)),
      (3L, Multimodal.MagicBytes ++ Array[Byte](0, 0, 0, 9, 0, 0, 0, 9, 1)), // truncated body
      (4L, hostile)))
    val got = Multimodal.decodeFeatures(df, "media_id", "content")
      .as[Multimodal.MediaFeatures].collect().map(f => f.media_id -> f).toMap
    assert(got(1L) === Multimodal.MediaFeatures(1L, Some(2), Some(2), Some(1.0), Some(2)))
    assert(got(2L) === Multimodal.MediaFeatures(2L, None, None, None, None))
    assert(got(3L) === Multimodal.MediaFeatures(3L, None, None, None, None))
    assert(got(4L) === Multimodal.MediaFeatures(4L, None, None, None, None),
      "overflowing header must be treated as corrupt, not decoded")
  }

  test("sampleFrames emits every stride-th row with width-sized frames") {
    import spark.implicits._
    val df = mediaDf(Seq((7L, Multimodal.syntheticPayload(5, 6, seed = 1))))
    val frames = Multimodal.sampleFrames(df, "media_id", "content", stride = 2)
      .as[(Long, Int, Array[Byte])].collect().sortBy(_._2)
    assert(frames.map(_._2).toSeq === Seq(0, 2, 4))
    assert(frames.forall(_._3.length === 5))
    // frame content matches the synthetic generator: byte(x,y) = (x+y+1)%251
    assert(frames.head._3.toSeq === (0 until 5).map(x => ((x + 0 + 1) % 251).toByte))
  }

  test("resizeNearest: aspect-preserving floor dims, exact NN bytes, no upscale, corrupt→null") {
    import spark.implicits._
    val df = mediaDf(Seq(
      (1L, Multimodal.syntheticPayload(8, 4, seed = 0)),   // 2:1 → fits after halving
      (2L, Multimodal.syntheticPayload(3, 2, seed = 5)),   // already fits: passthrough
      (3L, "junk".getBytes("UTF-8"))))                     // corrupt
    val got = Multimodal.resizeNearest(df, "media_id", "content", maxW = 4, maxH = 2)
      .as[Multimodal.ResizedMedia].collect().map(r => r.media_id -> r).toMap
    // 8×4 → binding height: oh=2, ow=8*2/4=4; NN source pixel (x*8/4, y*4/2)
    assert(got(1L).out_w.contains(4) && got(1L).out_h.contains(2))
    val expected = for (y <- 0 until 2; x <- 0 until 4)
      yield (((x * 8 / 4) + (y * 4 / 2) + 0) % 251).toByte
    assert(got(1L).resized.get.toSeq === expected)
    assert(got(1L).sum_bytes.contains(expected.map(_ & 0xFF).sum.toLong))
    // smaller than the box: untouched dims (never upscaled)
    assert(got(2L).out_w.contains(3) && got(2L).out_h.contains(2))
    assert(got(2L).resized.get.length === 6)
    assert(got(3L).out_w.isEmpty && got(3L).resized.isEmpty)
  }

  test("avgHash: constant image hashes to 0, duplicates pair at hamming 0, corrupt→null") {
    import spark.implicits._
    // constant body: no byte is STRICTLY above the mean → hash 0
    val const = {
      val buf = java.nio.ByteBuffer.allocate(12 + 8 * 4)
      buf.put(Multimodal.MagicBytes).putInt(8).putInt(4)
      (0 until 32).foreach(_ => buf.put(7.toByte))
      buf.array()
    }
    val rows = Seq(
      (1L, Multimodal.syntheticPayload(10, 6, seed = 3)),
      (2L, Multimodal.syntheticPayload(10, 6, seed = 3)), // exact dup of 1
      (3L, const),
      (4L, "junk".getBytes("UTF-8"))).toDF("media_id", "content")
    val hashes = Multimodal.avgHash(rows, "media_id", "content", gw = 8, gh = 4)
    val hm = hashes.as[(Long, Option[Long])].collect().toMap
    assert(hm(1L) == hm(2L) && hm(1L).nonEmpty)
    assert(hm(3L).contains(0L))
    assert(hm(4L).isEmpty) // corrupt → null, dropped by the pair stage
    val pairs = Multimodal.hashNearDupPairs(hashes.select("media_id", "ahash"),
      totalBits = 32, bands = 4, maxHamming = 0)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L, 0L)))
    assert(pairs.forall { case (a, b, h) => h == 0 && a < b && a != 4L && b != 4L })
    intercept[IllegalArgumentException](
      Multimodal.avgHash(rows, "media_id", "content", gw = 9, gh = 8))
  }

  test("hashAdmit: re-ingest rejected, near-dup rejected, new admitted, undecodable rejected") {
    import spark.implicits._
    val path = ScratchDirs.scratch("t_phash_admit")
    Fs.deleteRecursive(spark, path)
    val corpus = Seq(
      (1L, Multimodal.syntheticPayloadMixed(10, 6, seed = 3)),
      (2L, Multimodal.syntheticPayloadMixed(12, 6, seed = 40))
    ).toDF("media_id", "content")
    val idxHashes = Multimodal.avgHash(corpus, "media_id", "content",
      gw = 8, gh = 4).select(col("media_id").as("id"), col("ahash"))
    Multimodal.writeHashIndex(idxHashes, path)
    val batch = Seq(
      (10L, Multimodal.syntheticPayloadMixed(10, 6, seed = 3)), // dup of 1
      (11L, Multimodal.syntheticPayloadMixed(16, 6, seed = 500)), // new
      (12L, "junk".getBytes("UTF-8")) // undecodable
    ).toDF("media_id", "content")
    val bh = Multimodal.avgHash(batch, "media_id", "content", gw = 8, gh = 4)
      .select(col("media_id").as("id"), col("ahash"))
    val admitted = Multimodal.hashAdmit(spark, path, bh,
      totalBits = 32, bands = 4, maxHamming = 1)
      .select("id").as[Long].collect().toSet
    assert(!admitted.contains(10L), "exact re-ingest must self-match and reject")
    assert(admitted.contains(11L), "a fresh pattern must be admitted")
    assert(!admitted.contains(12L), "undecodable (null hash) must not pass the gate")
  }

  test("syntheticPayloadMixed: seed changes the pattern, not just the offset") {
    // the additive family is aHash-degenerate; the mixed family must not be
    import spark.implicits._
    val rows = (0 until 8).map(s =>
      (s.toLong, Multimodal.syntheticPayloadMixed(10, 6, seed = s * 37 + 1)))
      .toDF("media_id", "content")
    val hs = Multimodal.avgHash(rows, "media_id", "content", gw = 8, gh = 4)
      .as[(Long, Option[Long])].collect().flatMap(_._2).toSet
    assert(hs.size >= 6, s"mixed payload hashes must be diverse, got $hs")
  }
}
