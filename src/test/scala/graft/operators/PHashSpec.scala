package graft.operators

import org.apache.spark.sql.functions._

import graft.operators.Multimodal.ImageCodec

/** Perceptual image hashing (E132): 64-bit DCT pHash on the guarded
  * raster path, banded-Hamming pairing via the generalized L3
  * machinery. Exact-hash dedup misses re-encodes by construction;
  * pHash pairs them and keeps distinct content apart. */
class PHashSpec extends graft.SparkSpec {
  import spark.implicits._

  test("a lossy JPEG re-encode stays within a tight Hamming ball; distinct images stay far") {
    val hashes = ImageCodec.patternSeeds(24).map { seed =>
      val png = ImageCodec.pHash(ImageCodec.encodePattern(96, 96, seed, "png")).get
      val jpg = ImageCodec.pHash(ImageCodec.encodePattern(96, 96, seed, "jpeg")).get
      (seed, png, jpg)
    }
    hashes.foreach { case (seed, png, jpg) =>
      val d = java.lang.Long.bitCount(png ^ jpg)
      assert(d <= 6, s"seed $seed: png↔jpeg Hamming $d — re-encode must be near")
    }
    for {
      (sa, pa, _) <- hashes
      (sb, pb, _) <- hashes if sa < sb
    } {
      val d = java.lang.Long.bitCount(pa ^ pb)
      assert(d > 10, s"seeds $sa/$sb: Hamming $d — distinct content must be far")
    }
  }

  test("corrupt bytes and oversized headers hash to None — data, never a failure") {
    assert(ImageCodec.pHash(Array[Byte](1, 2, 3)).isEmpty)
    assert(ImageCodec.pHash(Array.empty[Byte]).isEmpty)
    // A real image refused by the pixel guard BEFORE any raster work.
    val img = ImageCodec.encodePattern(64, 64, 7L, "png")
    assert(ImageCodec.pHash(img, maxPixels = 100).isEmpty,
      "the maxPixels guard must refuse before rasterizing")
    assert(ImageCodec.pHash(img).isDefined)
  }

  test("hammingPairs generalizes the banded machinery: exact at maxHamming < bands, null sigs drop") {
    val sigs = Seq(
      (1L, Some(0x0F0F0F0F0F0F0F0FL)),
      (2L, Some(0x0F0F0F0F0F0F0F0EL)), // Hamming 1 from id 1
      (3L, Some(0x7777000011110000L)), // far from both
      (4L, None)                       // undecodable media
    ).toDF("media_id", "phash")
    val pairs = Dedup.hammingPairs(sigs, col("media_id"), col("phash"),
      bands = 16, maxHamming = 3).collect()
    assert(pairs.length == 1)
    assert(pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 2L &&
      pairs(0).getInt(2) == 1)
  }

  test("hammingPairs refuses non-positive band counts loudly — never a silently empty pair set") {
    val sigs = Seq((1L, Some(1L)), (2L, Some(3L))).toDF("media_id", "phash")
    val e = intercept[IllegalArgumentException](
      Dedup.hammingPairs(sigs, col("media_id"), col("phash"), bands = -4))
    assert(e.getMessage.contains("bands"))
    val e2 = intercept[IllegalArgumentException](
      Dedup.hammingPairs(sigs, col("media_id"), col("phash"), bands = 0))
    assert(e2.getMessage.contains("bands"))
  }

  test("the DC coefficient never reaches the signature — bit 63 is structurally 0") {
    // DC is ~constant-1 across any corpus; hashing it would waste a
    // bit and halve chunk-0 bucket selectivity.
    ImageCodec.patternSeeds(12).foreach { seed =>
      val h = ImageCodec.pHash(ImageCodec.encodePattern(64, 64, seed, "png")).get
      assert((h >>> 63) == 0L, s"seed $seed: top bit set: ${h.toBinaryString}")
    }
  }

  test("flat images hash to None — solid black and solid white must not pair at Hamming 0") {
    // A structureless image has ~zero AC energy; '> median' over
    // all-zero coefficients would hash EVERY solid frame to sig=0,
    // pairing black with white as perceptual near-dups. The
    // low-variance guard drops them like undecodable bytes.
    val black = ImageCodec.encode(64, 64, 0x000000, "png")
    val white = ImageCodec.encode(64, 64, 0xFFFFFF, "png")
    val gray = ImageCodec.encode(64, 64, 0x808080, "png")
    assert(ImageCodec.pHash(black).isEmpty, "solid black must hash None")
    assert(ImageCodec.pHash(white).isEmpty, "solid white must hash None")
    assert(ImageCodec.pHash(gray).isEmpty, "solid gray must hash None")
    // Patterned content still hashes.
    assert(ImageCodec.pHash(ImageCodec.encodePattern(64, 64, 3L, "png")).isDefined)
  }

  test("band the 63-bit signature as 63 bits: 64-bit banding has a structurally skewed chunk") {
    val sigs = ImageCodec.patternSeeds(24).map(seed =>
      ImageCodec.pHash(ImageCodec.encodePattern(96, 96, seed, "png")).get)
    // 64-bit banding at bands=16: chunk 15 covers bits 60..63, and
    // bit 63 never varies — at most 2^3 distinct buckets instead of
    // 2^4, a systematically 2× more collision-prone band.
    val top16 = sigs.map(s => (s >>> 60) & 0xFL).distinct
    assert(top16.forall(c => (c & 0x8L) == 0L),
      s"bit 63 must be constant 0 in every 64-bit top chunk: $top16")
    // 63-bit banding at bands=21 (3-bit chunks): every chunk is pure
    // AC signs — no position is structurally constant across content
    // (the pattern code flips ~half the blocks between seeds).
    val varied = (0 until 21).count { b =>
      sigs.map(s => (s >>> (b * 3)) & 0x7L).distinct.size > 1
    }
    assert(varied == 21,
      s"all 21 3-bit chunks must vary across distinct content, got $varied")
    // And the exactness contract carries over: identical pair sets
    // from both bandings at a threshold below both band counts.
    import spark.implicits._
    val df = sigs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("media_id", "phash")
    def pairSet(bits: Int, bands: Int) =
      Dedup.hammingPairs(df, col("media_id"), col("phash"),
        bits = bits, bands = bands, maxHamming = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet(63, 21) == pairSet(64, 16),
      "pigeonhole-exact bandings must agree on the pair set")
  }

  test("perceptualHashes: the DataFrame boundary — nulls surface as null hashes") {
    val media = Seq(
      (10L, ImageCodec.encodePattern(64, 64, 1L, "png")),
      (11L, Array[Byte](9, 9, 9))
    ).toDF("media_id", "content")
    val got = Multimodal.perceptualHashes(media).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got(10L).isDefined && got(11L).isEmpty)
  }
}
