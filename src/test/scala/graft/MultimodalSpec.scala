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

  test("sampleFrames fans each video row out to its stride-sampled frames") {
    import graft.multimodal.Multimodal
    val m = Multimodal.media(spark, sf).filter(_.payload.length >= 100)
    val frames = Multimodal.sampleFrames(m, frameBytes = 100, stride = 10).collect()
    assert(frames.nonEmpty)
    val byDoc = frames.groupBy(_.doc_id)
    val lens = m.collect().map(x => x.doc_id -> x.payload.length).toMap
    byDoc.foreach { case (doc, fs) =>
      val expected = (0 until lens(doc) / 100 by 10).toSeq
      assert(fs.map(_.frame_idx).sorted.toSeq === expected)
      assert(fs.forall(_.frame_bytes.length == 100))
    }
    // the relational frames query agrees on (doc, frame) membership
    val rel = Multimodal.qMultimodalFrames(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("frame_idx"))).toSet
    val typedSet = frames.filter(f => f.doc_id % 3 == 2).map(f => (f.doc_id, f.frame_idx)).toSet
    assert(rel.subsetOf(typedSet)) // rel is LIMITed; typed covers all videos
  }

  test("resizeStub shrinks payloads by the factor, deterministically") {
    import graft.multimodal.Multimodal
    val m = Multimodal.media(spark, sf).limit(20)
    val r1 = Multimodal.resizeStub(m, 4).collect().sortBy(_.doc_id)
    val r2 = Multimodal.resizeStub(m, 4).collect().sortBy(_.doc_id)
    val orig = m.collect().sortBy(_.doc_id)
    r1.zip(orig).foreach { case (r, o) => assert(r.payload.length === o.payload.length / 4) }
    r1.zip(r2).foreach { case (a, b) => assert(a.payload.toSeq === b.payload.toSeq) }
  }
}
