package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.Media
import org.apache.spark.sql.functions.col

/** Pins the multimodal plumbing: schema, batch shape, determinism,
  * frame sampling, and the pooling kernel. The decode itself is a
  * documented stub (no codecs in the container). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media(id: Long, text: String, w: Int, h: Int, f: Int) =
    Media(id, "image", text.getBytes("UTF-8"), w, h, f)

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

  test("harness media table round-trips and features aggregate") {
    val feats = Multimodal.multimodalFeatures(spark, sf0001)
    assert(feats.count() > 0)
    assert(feats.filter(col("avg_intensity") < 0 || col("avg_intensity") > 1).count() == 0)
  }
}
