package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: media (image/audio/
  * video) travels as an opaque `binary` payload plus a typed metadata
  * struct, exactly like a production lakehouse layout (content-addressed
  * blob + sidecar metadata row).
  *
  * The actual codec work (JPEG decode, resampling, frame extraction) is
  * STUBBED — the image/audio libraries aren't in this environment — but
  * deterministic: payloads carry a tiny fake header this module parses.
  * Everything Spark-side is real and tested: schemas, partition-aware
  * `mapPartitions` batching (the natural seam where a codec JNI/native
  * call goes, amortizing per-batch setup), and declarative byte-level
  * ops that stay in codegen.
  *
  * Scale notes: payload bytes dominate I/O, so every op here prunes to
  * (id, content) before the heavy stage, keeps outputs narrow (features
  * only, payload dropped), and never collects. Decode parallelism =
  * partition count; a 100 TB corpus decodes embarrassingly parallel.
  */
object Multimodal {

  /** Fake 12-byte header: magic "GFT0" + width int32 BE + height int32
    * BE; body = the raw "pixels" (one byte per pixel, row-major). */
  val MagicBytes: Array[Byte] = "GFT0".getBytes("UTF-8")

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))), nullable = true)))

  /** Deterministic synthetic payload for tests/fixtures: header + a
    * width×height body whose byte (x,y) = (x + y + seed) mod 251. */
  def syntheticPayload(width: Int, height: Int, seed: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(12 + width * height)
    buf.put(MagicBytes).putInt(width).putInt(height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { buf.put(((x + y + seed) % 251).toByte); x += 1 }
      y += 1
    }
    buf.array()
  }

  /** Declarative (codegen'd) byte-level stats — no decode, runs in the
    * scan stage: payload size and header validity. */
  def payloadStats(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.select(col(idCol), col(contentCol))
      .withColumn("n_bytes", octet_length(col(contentCol)))
      .withColumn("is_valid",
        octet_length(col(contentCol)) >= 12 &&
          substring(col(contentCol), 1, 4) === lit(MagicBytes))
      .select(col(idCol), col("n_bytes"), col("is_valid"))

  /** Parses and VALIDATES the header: negative dimensions or a body
    * larger than the payload (checked in Long space — w*h can overflow
    * Int on hostile headers) are corrupt, not decodable. */
  private def readHeader(bytes: Array[Byte]): Option[(Int, Int)] =
    if (bytes == null || bytes.length < 12 ||
      !bytes.take(4).sameElements(MagicBytes)) None
    else {
      val bb = java.nio.ByteBuffer.wrap(bytes, 4, 8)
      val w = bb.getInt
      val h = bb.getInt
      if (w < 0 || h < 0 || 12L + w.toLong * h.toLong > bytes.length) None
      else Some((w, h))
    }

  final case class MediaFeatures(media_id: Long, width: Option[Int],
      height: Option[Int], mean_byte: Option[Double], max_byte: Option[Int])

  /** "Decode" + feature-extract via mapPartitions — the seam where a
    * real codec goes (per-partition setup amortized across rows, like a
    * vectorized UDF's batch shape). Output per row: parsed dimensions +
    * simple luminance-style statistics of the body bytes. Invalid or
    * truncated payloads yield null features, never exceptions (at 100 TB
    * some blobs are always corrupt). */
  def decodeFeatures(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup happens HERE once (codec init in real life)
        it.map { case (id, bytes) =>
          readHeader(bytes) match {
            case Some((w, h)) if bytes.length >= 12 + w * h =>
              var sum = 0L; var max = 0
              var i = 12
              val end = 12 + w * h
              while (i < end) {
                val b = bytes(i) & 0xFF
                sum += b; if (b > max) max = b
                i += 1
              }
              val mean = if (w * h == 0) 0.0 else sum.toDouble / (w * h)
              MediaFeatures(id, Some(w), Some(h),
                Some(math.rint(mean * 10000) / 10000), Some(max))
            case _ => MediaFeatures(id, None, None, None, None)
          }
        }
      }
      .toDF()
  }

  final case class ResizedMedia(media_id: Long, out_w: Option[Int],
      out_h: Option[Int], sum_bytes: Option[Long], resized: Option[Array[Byte]])

  /** Resize plumbing: nearest-neighbor downscale to fit within
    * (maxW, maxH) PRESERVING aspect ratio — the thumbnail/normalize
    * pass an image corpus runs before feature extraction. Never
    * upscales. All arithmetic is integer floor division
    * (out dims from the binding axis, source pixel = (x·w)/outW), so
    * the stub is bit-reproducible across engines and the closed-form
    * oracle can replay every output byte. Emits the resized body plus
    * its byte-sum so downstream checks never re-scan the blob. A real
    * resampler (SIMD/JNI) swaps in at the marked loop; degenerate
    * (zero-area) or corrupt payloads yield nulls, never exceptions. */
  def resizeNearest(df: DataFrame, idCol: String, contentCol: String,
      maxW: Int, maxH: Int): DataFrame = {
    require(maxW > 0 && maxH > 0)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          readHeader(bytes) match {
            case Some((w, h)) if w > 0 && h > 0 && bytes.length >= 12 + w * h =>
              val (ow, oh) =
                if (w <= maxW && h <= maxH) (w, h)
                else if (w.toLong * maxH <= h.toLong * maxW) {
                  val t = math.min(h, maxH)
                  (math.max(1, (w.toLong * t / h).toInt), t)
                } else {
                  val t = math.min(w, maxW)
                  (t, math.max(1, (h.toLong * t / w).toInt))
                }
              val out = new Array[Byte](ow * oh)
              var sum = 0L
              var y = 0
              while (y < oh) { // STUB: a real resampler goes here
                // Long products: x·w / y·h can exceed Int for extreme
                // aspect ratios (w=10⁶, h=1 passes the w·h size check
                // but x*w wraps negative and indexes out of bounds)
                val sy = (y.toLong * h / oh).toInt
                var x = 0
                while (x < ow) {
                  val b = bytes(12 + sy * w + (x.toLong * w / ow).toInt)
                  out(y * ow + x) = b
                  sum += b & 0xFF
                  x += 1
                }
                y += 1
              }
              ResizedMedia(id, Some(ow), Some(oh), Some(sum), Some(out))
            case _ => ResizedMedia(id, None, None, None, None)
          }
        }
      }
      .toDF()
  }

  final case class MediaHash(media_id: Long, ahash: Option[Long])

  /** Perceptual average-hash (aHash) — the image near-dup
    * fingerprint: nearest-neighbor sample the body onto a fixed
    * gw×gh grid (classic aHash squashes, no aspect preservation),
    * take the grid mean, and set bit (y·gw + x) when the sampled
    * byte is STRICTLY above the mean. Runs in the same mapPartitions
    * codec seam as [[decodeFeatures]] (a real pipeline hashes the
    * decoded luma plane here); integer sampling arithmetic and the
    * strict-> threshold make the hash bit-reproducible, so the
    * DuckDB oracle replays it from the generator's closed form.
    * Corrupt payloads yield null, never exceptions. gw·gh ≤ 64. */
  def avgHash(df: DataFrame, idCol: String, contentCol: String,
      gw: Int = 8, gh: Int = 4): DataFrame = {
    require(gw > 0 && gh > 0 && gw * gh <= 64, "aHash needs gw*gh <= 64 bits")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          readHeader(bytes) match {
            case Some((w, h)) if w > 0 && h > 0 && bytes.length >= 12 + w * h =>
              val v = new Array[Int](gw * gh)
              var sum = 0L
              var y = 0
              while (y < gh) {
                val sy = (y.toLong * h / gh).toInt
                var x = 0
                while (x < gw) {
                  val b = bytes(12 + sy * w + (x.toLong * w / gw).toInt) & 0xFF
                  v(y * gw + x) = b
                  sum += b
                  x += 1
                }
                y += 1
              }
              val mean = sum.toDouble / (gw * gh)
              var hash = 0L
              var i = 0
              while (i < gw * gh) {
                if (v(i) > mean) hash |= (1L << i)
                i += 1
              }
              MediaHash(id, Some(hash))
            case _ => MediaHash(id, None)
          }
        }
      }
      .toDF()
  }

  /** Media near-dup pairs from [[avgHash]] fingerprints — same banded
    * shape as the text SimHash path (dedup.Dedup.simhashPairs): hashes
    * agreeing on ≥1 of `bands` contiguous bit-bands become candidates
    * (one (band, bits)-keyed shuffle — never all-pairs), then the
    * exact Hamming distance bit_count(xor) ≤ maxHamming verifies each.
    * Output: (id_a, id_b, hamming), id_a < id_b. */
  def hashNearDupPairs(hashes: DataFrame, totalBits: Int, bands: Int,
      maxHamming: Int): DataFrame = {
    require(totalBits % bands == 0)
    val rows = totalBits / bands
    val mask = (1L << rows) - 1
    val hk = graft.Caches.cached(hashes.toDF("id", "ahash")
      .filter(col("ahash").isNotNull))
    val banded = hk.select(col("id"), col("ahash"),
      posexplode(array((0 until bands).map(b =>
        shiftrightunsigned(col("ahash"), b * rows).bitwiseAND(mask)): _*))
        .as(Seq("band", "bh")))
    banded.toDF("id_a", "h_a", "band", "bh")
      .join(banded.toDF("id_b", "h_b", "band", "bh"), Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "h_a", "h_b").distinct()
      .withColumn("hamming",
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Second deterministic payload family (mm06): byte(x,y) =
    * ((x+1)·(y+2)·(seed+1)) mod 251 — MULTIPLICATIVE in the seed, so
    * distinct seeds change the pattern, not just its brightness. The
    * additive gradient [[syntheticPayload]] is aHash-degenerate by
    * construction (mean-threshold bits are translation-invariant, so
    * every seed hashes alike) — exactly what mm05's near-dup mining
    * wants, and exactly what an admission gate must not be tested on. */
  def syntheticPayloadMixed(width: Int, height: Int, seed: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(12 + width * height)
    buf.put(MagicBytes).putInt(width).putInt(height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        buf.put((((x + 1) * (y + 2) * (seed + 1)) % 251).toByte)
        x += 1
      }
      y += 1
    }
    buf.array()
  }

  /** Persist an aHash fingerprint index (mm06) — the serving artifact
    * of a media dedup/admission gate: (id, ahash) rows only, payload
    * bytes never leave the build job. Undecodable media (null hash)
    * are not indexable and are dropped here. */
  def writeHashIndex(hashes: DataFrame, path: String): Unit =
    hashes.toDF("id", "ahash").filter(col("ahash").isNotNull)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)

  /** ADMISSION against the persisted perceptual-hash index (mm06) —
    * the media twin of the text-side SimHash gate (dedup.Dedup
    * .simhashAdmit): a batch fingerprint is rejected when ANY indexed
    * fingerprint shares a bit-band with it AND verifies at Hamming ≤
    * `maxHamming` (a re-ingested indexed media self-matches at 0 —
    * re-ingest is a duplicate). Band-keyed equi-join batch×index,
    * never all-pairs; at 100 TB the index side is bucketed by (band,
    * bits) so admission probes touch one bucket per band. Undecodable
    * batch media (null hash) are REJECTED — unverifiable content does
    * not pass a dedup gate. Returns the admitted (id, ahash) rows. */
  def hashAdmit(spark: org.apache.spark.sql.SparkSession, path: String,
      batchHashes: DataFrame, totalBits: Int, bands: Int,
      maxHamming: Int): DataFrame = {
    require(totalBits % bands == 0)
    val rows = totalBits / bands
    val mask = (1L << rows) - 1
    def banded(df: DataFrame, idAs: String, hAs: String) =
      df.select(col("id").as(idAs), col("ahash").as(hAs),
        posexplode(array((0 until bands).map(b =>
          shiftrightunsigned(col("ahash"), b * rows).bitwiseAND(mask)): _*))
          .as(Seq("band", "bh")))
    val batch = graft.Caches.cached(
      batchHashes.toDF("id", "ahash").filter(col("ahash").isNotNull))
    val idx = banded(spark.read.parquet(path), "id_i", "h_i")
    val rejected = banded(batch, "id_b", "h_b")
      .join(idx, Seq("band", "bh"))
      .filter(bit_count(col("h_b").bitwiseXOR(col("h_i"))) <= maxHamming)
      .select(col("id_b")).distinct()
    batch.join(rejected, col("id") === col("id_b"), "left_anti")
  }

  /** Frame sampling plumbing: every `stride`-th body row, emitted as
    * (media_id, frame_no, frame bytes) — the video-to-frames exploder.
    * A real decoder swaps in at the marked line. */
  def sampleFrames(df: DataFrame, idCol: String, contentCol: String,
      stride: Int): DataFrame = {
    require(stride > 0)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          readHeader(bytes) match {
            case Some((w, h)) if bytes.length >= 12 + w * h =>
              // STUB: body rows stand in for decoded frames; a real
              // codec would seek + decode here.
              (0 until h by stride).iterator.map { y =>
                (id, y, java.util.Arrays.copyOfRange(bytes, 12 + y * w, 12 + (y + 1) * w))
              }
            case _ => Iterator.empty
          }
        }
      }
      .toDF("media_id", "frame_no", "frame")
  }
}
