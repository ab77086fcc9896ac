package graft

import org.apache.spark.sql.functions._

import graft.operators.{Codecs, MultimodalOps}

/** Multimodal plumbing: binary schema, frame math, and the per-partition
  * decode batch shape (with the stub codec). */
class MultimodalSpec extends SparkSpec {

  test("media table carries opaque BINARY payloads with typed metadata") {
    val m = MultimodalOps.media(spark, SfDir)
    val schema = m.schema
    assert(schema("payload").dataType.typeName === "binary")
    assert(schema("meta").dataType.typeName === "struct")
    val r = m.filter(col("doc_id") === 0).select("meta.n_bytes", "payload").collect()(0)
    assert(r.getLong(0) === r.getAs[Array[Byte]](1).length.toLong)
  }

  test("decodeFeatures produces fixed-dim deterministic vectors partition-independently") {
    import spark.implicits._
    val ds = MultimodalOps.media(spark, SfDir)
      .select(col("doc_id"), col("payload")).as[MultimodalOps.MediaRow]
    val once = MultimodalOps.decodeFeatures(ds).collect().map(f => f.doc_id -> f.feature.toSeq).toMap
    // repartitioning must not change any feature (stub is pure per-row)
    val again = MultimodalOps.decodeFeatures(ds.repartition(7))
      .collect().map(f => f.doc_id -> f.feature.toSeq).toMap
    assert(once === again)
    assert(once.values.forall(_.length === MultimodalOps.FeatureDim))
  }

  test("stub codec is deterministic and byte-sensitive") {
    val a = Codecs.imageFeaturesStub("hello world".getBytes)
    val b = Codecs.imageFeaturesStub("hello world".getBytes)
    val c = Codecs.imageFeaturesStub("hello worle".getBytes)
    assert(a.toSeq === b.toSeq)
    assert(a.toSeq !== c.toSeq)
  }

  test("frame sampling math matches a direct computation") {
    val rows = MultimodalOps.queries("mm_frame_sample")(spark, SfDir)
      .select("n_bytes", "n_frames", "n_sampled").collect()
    rows.foreach { r =>
      val nb = r.getLong(0); val nf = r.getLong(1); val ns = r.getLong(2)
      assert(nf === math.ceil(nb.toDouble / MultimodalOps.FrameBytes).toLong)
      assert(ns === math.ceil(nf.toDouble / MultimodalOps.SampleEvery).toLong)
    }
  }
}
