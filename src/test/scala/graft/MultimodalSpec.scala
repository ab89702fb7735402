package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.Media
import org.apache.spark.sql.functions.col

/** Pins the multimodal plumbing: the pure-JVM BMP codec round trip,
  * dispatch between real decode and the stub fallback, schema, batch
  * shape, determinism, frame sampling, and the pooling kernel. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media(id: Long, text: String, w: Int, h: Int, f: Int) =
    Media(id, "audio", text.getBytes("UTF-8"), w, h, f)

  test("BMP codec round-trips pixels exactly, including padded strides") {
    // w = 3 and w = 5 exercise nonzero stride padding (9→12, 15→16)
    for ((w, h) <- Seq((3, 2), (5, 4), (4, 4), (16, 1), (1, 7))) {
      val src = (x: Int, y: Int) => (x * 31 + y * 17 + 5) % 256
      val img = Multimodal.bmpDecode(Multimodal.bmpEncode(w, h, src))
        .getOrElse(fail(s"decode failed for ${w}x$h"))
      assert(img.width == w && img.height == h)
      val expected = for (y <- 0 until h; x <- 0 until w) yield src(x, y).toByte
      assert(img.gray.toSeq == expected, s"pixel mismatch at ${w}x$h")
    }
  }

  test("BMP decode rejects non-BMP payloads (stub dispatch signal)") {
    assert(Multimodal.bmpDecode("not a bitmap at all".getBytes).isEmpty)
    assert(Multimodal.bmpDecode(Array[Byte]('B', 'M')).isEmpty)
    // truncated: valid header, missing pixel rows
    val full = Multimodal.bmpEncode(8, 8, (x, y) => x + y)
    assert(Multimodal.bmpDecode(full.take(60)).isEmpty)
  }

  test("frameFeatures real-decodes BMP media and stub-decodes the rest") {
    val bmp = Multimodal.bmpEncode(4, 2, (x, y) => 64) // constant gray 64
    val ds = Seq(
      Media(1L, "image", bmp, 4, 2, 1),
      media(2L, "abcdefgh", 4, 4, 1)).toDS()
    val out = Multimodal.frameFeatures(ds).collect().sortBy(_.media_id)
    assert(out.length == 2)
    // real path: 8 pixels, exact mean 64/256
    assert(out(0).n_pixels == 8 && out(0).mean_intensity == 0.25)
    // stub path: 16 pixels of text bytes
    assert(out(1).n_pixels == 16)
  }

  test("frame features: stride sampling and deterministic stub decode") {
    val ds = Seq(
      media(1L, "abcdefgh", 4, 4, 5),
      media(2L, "zyxwvuts", 4, 4, 1),
    ).toDS()
    val out = Multimodal.frameFeatures(ds, frameStride = 2, batchSize = 1)
      .collect().sortBy(r => (r.media_id, r.frame_idx))
    // media 1: frames 0,2,4 sampled; media 2: frame 0
    assert(out.map(r => (r.media_id, r.frame_idx)).toSeq ==
      Seq((1L, 0), (1L, 2), (1L, 4), (2L, 0)))
    assert(out.forall(_.n_pixels == 16))
    // determinism: second run bit-identical
    val again = Multimodal.frameFeatures(ds, frameStride = 2, batchSize = 1)
      .collect().sortBy(r => (r.media_id, r.frame_idx))
    assert(out.map(_.mean_intensity).toSeq == again.map(_.mean_intensity).toSeq)
  }

  test("decode is a narrow map: partition count preserved") {
    val ds = Seq.tabulate(8)(i => media(i.toLong, s"payload$i", 2, 2, 1))
      .toDS().repartition(3)
    val out = Multimodal.frameFeatures(ds)
    assert(out.rdd.getNumPartitions == 3)
  }

  test("poolHalf averages 2x2 blocks") {
    val px = Array(0f, 1f, 2f, 3f,
                   4f, 5f, 6f, 7f) // 4x2
    val out = Multimodal.poolHalf(px, 4, 2)
    assert(out.toSeq == Seq((0f + 1f + 4f + 5f) / 4, (2f + 3f + 6f + 7f) / 4))
  }

  test("resize halves dims and reproduces the closed-form downsampled grid") {
    val resized = Multimodal.multimodalResize(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4))).toMap
    val dims = Multimodal.multimodalDecode(spark, sf0001)
      .select("media_id", "width", "height")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(resized.keySet == dims.keySet && resized.nonEmpty)
    resized.foreach { case (id, (ow, oh, graySum, chk)) =>
      val (w, h) = dims(id)
      assert(ow == w / 2 && oh == h / 2, s"media $id dims")
      // recompute from the same closed form the BMP was generated from
      var s = 0L; var c = 0L; var i = 0
      while (i < ow * oh) {
        val g = ((i % ow) * 2 * 7 + (i / ow) * 2 * 13 + id) % 256
        s += g; c += g * ((i % 97) + 1); i += 1
      }
      assert(graySum == s && chk == c, s"media $id: ($graySum,$chk) vs ($s,$c)")
    }
  }

  test("harness media table round-trips and features aggregate") {
    val feats = Multimodal.multimodalFeatures(spark, sf0001)
    assert(feats.count() > 0)
    assert(feats.filter(col("avg_intensity") < 0 || col("avg_intensity") > 1).count() == 0)
  }

  test("video corpus is pure ASCII — the byte==char premise of the frames oracle") {
    // q_multimodal_frames' DuckDB oracle slices VARCHAR text while the
    // engine slices UTF-8 payload BYTES; they agree only while every
    // video doc is single-byte-per-char. A generator change introducing
    // a multi-byte character would silently desynchronize frame
    // boundaries and digests downstream — this guard fails loudly
    // instead (char length == octet length ⟺ pure ASCII for UTF-8).
    import org.apache.spark.sql.functions.{length, octet_length}
    val nonAscii = graft.Tables.documents(spark, sf0001)
      .filter(col("n_chars") % 3 === 0) // the video slice of the corpus
      .filter(length(col("text")) =!= octet_length(col("text")))
      .count()
    assert(nonAscii == 0,
      s"$nonAscii video docs contain multi-byte chars — the frames " +
        "oracle's VARCHAR slicing no longer matches byte slicing")
  }

  test("image dedup: a 1-bit perturbation clusters, a distinct image doesn't") {
    // 16×16 images, so the 8×8 aHash grid samples even coordinates.
    // A = left half bright: 32 samples at 255 (bits 1), 32 at 0.
    // B = A with ONE sampled dark pixel (x=8, y=0) flipped bright:
    // the new sum (33·255) still sits strictly between 0·64 and
    // 255·64, so exactly that one bit flips → Hamming 1, and by the
    // pigeonhole band argument the pair MUST be found via some
    // identical band. C = the mirror image (right half bright): its
    // bit vector is A's complement → Hamming 64/63, no shared band.
    def half(bright: Int => Boolean)(x: Int, y: Int): Int =
      if (bright(x)) 255 else 0
    def perturbed(x: Int, y: Int): Int =
      if (x == 8 && y == 0) 255 else half(_ < 8)(x, y)
    val media = Seq(
      Media(1L, "image", Multimodal.bmpEncode(16, 16, half(_ < 8)), 16, 16, 1),
      Media(2L, "image", Multimodal.bmpEncode(16, 16, perturbed), 16, 16, 1),
      Media(3L, "image", Multimodal.bmpEncode(16, 16, half(_ >= 8)), 16, 16, 1))
    val pairs = Multimodal.dedupImageCore(spark.createDataset(media))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 1)),
      s"expected exactly the planted near-dup pair at Hamming 1, got ${pairs.toSeq}")
  }

  test("image dedup on the harness corpus: pairs are exact-Hamming-verified and band-complete") {
    val hashes = Multimodal.imageHashes(
      Multimodal.mediaTable(spark, sf0001).filter(_.kind == "image"))
      .collect().map(h => h.media_id -> Seq(h.b0, h.b1, h.b2, h.b3)).toMap
    def ham(a: Seq[Int], b: Seq[Int]): Int =
      a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    val got = Multimodal.dedupImage(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // every emitted pair's Hamming distance is exact and <= 3
    got.foreach { case (a, b, d) =>
      assert(d == ham(hashes(a), hashes(b)) && d <= Multimodal.ImageHamMax)
    }
    // completeness: brute-force over the small corpus finds no pair
    // within the radius that the banded join missed
    val ids = hashes.keys.toSeq.sorted
    val brute = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      d = ham(hashes(ids(i)), hashes(ids(j))) if d <= Multimodal.ImageHamMax
    } yield (ids(i), ids(j), d)).toSet
    assert(got == brute,
      s"banded pairs diverge from brute force: missing=${brute -- got} extra=${got -- brute}")
  }
}
