package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal plumbing tests: binary payload schema, per-partition decode
  * batch shape, and stub determinism. */
class MultimodalSpec extends SparkSpec {

  test("media table carries a real BINARY payload column") {
    val m = Multimodal.mediaTable(spark, sf)
    assert(m.schema("payload").dataType.typeName === "binary")
    val r = m.orderBy("doc_id").limit(1).collect().head
    val payload = r.getAs[Array[Byte]]("payload")
    assert(payload.nonEmpty)
    assert(Set("image/png", "audio/wav", "video/mp4").contains(r.getAs[String]("mime")))
  }

  test("decodeFeatures preserves row count and is deterministic") {
    val feats1 = Multimodal.decodeFeatures(Multimodal.media(spark, sf)).collect()
    val feats2 = Multimodal.decodeFeatures(Multimodal.media(spark, sf)).collect()
    assert(feats1.length === Multimodal.mediaTable(spark, sf).count())
    assert(feats1.map(_.toString).sorted.toSeq === feats2.map(_.toString).sorted.toSeq)
    feats1.foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.width >= 64 && f.width <= 176 && f.height >= 64 && f.height <= 176)
    }
  }

  test("stub decode matches a direct invocation (plumbing adds nothing)") {
    val row = Multimodal.media(spark, sf).filter(col("doc_id") === 7).collect().head
    val (w, h, sum) = Multimodal.decodeStub(row.payload)
    val viaPlumbing = Multimodal.decodeFeatures(Multimodal.media(spark, sf))
      .filter(col("doc_id") === 7).collect().head
    assert((viaPlumbing.width, viaPlumbing.height, viaPlumbing.checksum) === ((w, h, sum)))
  }

  test("metadata query never exceeds limit and derives stable pseudo-dims") {
    val out = Multimodal.qMultimodalMeta(spark, sf).collect()
    assert(out.length === 200)
    assert(out.forall { r =>
      val w = r.getAs[Long]("width"); w >= 64 && w <= 176 && w % 16 === 0
    })
  }
}
