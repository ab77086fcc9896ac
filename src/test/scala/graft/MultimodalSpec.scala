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

  test("mm_frame_dedup equals a brute frame-hash replay") {
    val got = graft.operators.MultimodalOps.queries("mm_frame_dedup")(spark, SfDir)
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_occurrences"), r.getAs[Long]("first_doc")))
      .sortBy(_._1)
    val fb = graft.operators.MultimodalOps.FrameBytes
    def md5hex(b: Array[Byte]) = java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString
    val frames = Tables.documents(spark, SfDir).select("doc_id", "text").collect()
      .flatMap { r =>
        r.getString(1).getBytes("UTF-8").grouped(fb).map(f =>
          md5hex(f) -> r.getLong(0))
      }
    val want = frames.groupBy(_._1).toSeq.map { case (h, xs) =>
      (h, xs.map(_._2).distinct.length.toLong, xs.length.toLong, xs.map(_._2).min)
    }.filter(_._2 > 1).sortBy(_._1)
    assert(got === want)
    assert(got.nonEmpty, "fixture must share at least one frame across docs")
  }

  test("frame explode emits zero frames for an empty payload (sequence " +
      "descending-range guard)") {
    // Spark's sequence(0, nf - 1) at nf = 0 is the DESCENDING [0, -1] —
    // without the n_bytes > 0 guard an empty blob would emit two phantom
    // frames where the oracle's range(0, 0) emits none. Replays the
    // query's exact generator chain over a corpus with an empty payload.
    import org.apache.spark.sql.functions._
    val fb = graft.operators.MultimodalOps.FrameBytes
    val docs = Seq((1L, ""), (2L, "x" * (fb + 1)), (3L, "y" * fb))
    val media = spark.createDataFrame(docs).toDF("doc_id", "text")
      .select(col("doc_id"),
        to_binary(col("text"), lit("utf-8")).as("payload"),
        struct(octet_length(to_binary(col("text"), lit("utf-8")))
          .cast("long").as("n_bytes")).as("meta"))
    val nf = ceil(col("meta.n_bytes").cast("double") / fb).cast("int")
    val frames = media
      .filter(col("meta.n_bytes") > 0)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), nf - 1),
          i => md5(col("payload").substr(i * fb + 1, lit(fb)))))
          .as("frame_md5"))
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(frames.get(1L).isEmpty, s"empty payload produced frames: $frames")
    assert(frames(2L) === 2L)
    assert(frames(3L) === 1L)
  }

  test("mm_channel_stats equals a brute per-byte replay") {
    import org.apache.spark.sql.functions.col
    def pin(x: Double, d: Int) = {
      val p = math.pow(10, d); math.floor(x * p + 0.5) / p
    }
    val got = graft.operators.MultimodalOps.queries("mm_channel_stats")(spark, SfDir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bytes"),
        r.getAs[Int]("b_min"), r.getAs[Int]("b_max"),
        r.getAs[Double]("b_mean"), r.getAs[Double]("hot_frac"),
        r.getAs[Double]("silence_frac")))
      .toSeq
    val want = Tables.documents(spark, SfDir).select("doc_id", "text").collect()
      .filter(_.getString(1).getBytes("UTF-8").nonEmpty)
      .map { r =>
        val b = r.getString(1).getBytes("UTF-8").map(_.toInt & 0xff)
        (r.getLong(0), b.length.toLong, b.min, b.max,
          pin(b.map(_.toLong).sum.toDouble / b.length, 4),
          pin(b.count(_ >= 120).toDouble / b.length, 6),
          pin(b.count(_ == 32).toDouble / b.length, 6))
      }.sortBy(_._1).toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("mm_shard_manifest equals a sequential pack and conserves bytes") {
    val got = MultimodalOps.queries("mm_shard_manifest")(spark, SfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_assets"), r.getAs[Long]("shard_bytes"))).toMap
    // replay: order by (md5 key, id), cumulative start offset DIV budget
    val assets = MultimodalOps.media(spark, SfDir)
      .select(col("doc_id"), col("meta.n_bytes"),
        md5(concat(lit("shard:"), col("doc_id").cast("string"))).as("k"))
      .collect().map(r => (r.getString(2), r.getLong(0), r.getLong(1)))
      .sortBy(t => (t._1, t._2))
    var cum = 0L
    val brute = scala.collection.mutable.Map[Long, (Long, Long)]()
    assets.foreach { case (_, _, nb) =>
      val sid = cum / MultimodalOps.ShardBytes
      val (n, b) = brute.getOrElse(sid, (0L, 0L))
      brute(sid) = (n + 1, b + nb)
      cum += nb
    }
    assert(got === brute.toMap)
    // conservation; contiguity holds whenever every asset fits a budget
    // (an asset larger than ShardBytes legitimately skips shard ids)
    assert(got.values.map(_._2).sum === assets.map(_._3).sum)
    if (assets.map(_._3).max < MultimodalOps.ShardBytes)
      assert(got.keySet === (0L until got.size.toLong).toSet,
        "with all assets under budget, shard ids cannot skip")
  }
}
