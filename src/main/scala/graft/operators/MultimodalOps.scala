package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Num

/** Multimodal-column suite (north-star: treat image/audio/video as opaque
  * BINARY columns with typed metadata; decode / feature-extract /
  * frame-sample over them).
  *
  * The container has no media codecs, so the DECODE step is a
  * clearly-marked deterministic stub ([[Codecs]]); everything Spark-side —
  * the binary column + metadata schema, the per-partition batch shape a
  * real codec plugs into, partitioning, and the declared query surface —
  * is real and tested (MultimodalSpec + DuckDB oracles on the byte-level
  * plumbing).
  *
  * Scale notes: payloads stay opaque BINARY end to end — no
  * driver-side materialization, no row-by-row JVM<->native churn; a real
  * deployment swaps [[Codecs.imageFeaturesStub]] for a codec invoked in
  * [[MultimodalOps.decodeFeatures]]'s `mapPartitions` (one codec init per
  * partition, streaming batches through it). Frame sampling is pure byte
  * arithmetic pushed into the scan projection.
  */
object MultimodalOps {

  /** Bytes per synthetic "frame" of a payload. */
  val FrameBytes = 16
  /** Keep every k-th frame when sampling. */
  val SampleEvery = 4
  /** Fake feature-vector dimension produced by the stub decoder. */
  val FeatureDim = 8
  /** Keep every k-th byte when resizing (stands in for pixel decimation). */
  val ResizeEvery = 4

  /** The media table: documents re-ingested as (id, opaque payload bytes,
    * metadata struct). In production this is `spark.read.format("binaryFile")`
    * or a Parquet table with a real BINARY column; the fixture derives the
    * payload from `text` so every byte is deterministic. */
  def media(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        to_binary(col("text"), lit("utf-8")).as("payload"),
        struct(
          lit("text/plain").as("format"),
          col("source").as("origin"),
          octet_length(to_binary(col("text"), lit("utf-8"))).cast("long").as("n_bytes")).as("meta"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact media dedup by content hash: one hash-shuffle over 128-bit
    // digests (never the payloads — the md5 computes scan-side, so a
    // 100 TB blob column contributes 16 bytes/row to the exchange),
    // canonical copy = min doc_id. The binary twin of `dedup_exact`.
    "mm_dedup" -> ((s, dir) =>
      media(s, dir)
        .groupBy(md5(col("payload")).as("content_md5"))
        .agg(min("doc_id").as("canonical_doc"), count(lit(1)).as("n_copies"))
        .orderBy("canonical_doc")),

    // Metadata projection over opaque payloads: size, format, content hash.
    "mm_meta" -> ((s, dir) =>
      media(s, dir)
        .select(col("doc_id"),
          col("meta.format").as("format"),
          col("meta.n_bytes").as("n_bytes"),
          md5(col("payload")).as("content_md5"))
        .orderBy("doc_id")),

    // Frame sampling as byte arithmetic: 16-byte frames, keep every 4th;
    // emit counts and the hash of the first sampled frame — all of it
    // plain scan-side projection (verifiable byte-level in DuckDB).
    "mm_frame_sample" -> ((s, dir) =>
      media(s, dir)
        .select(col("doc_id"), col("meta.n_bytes").as("n_bytes"),
          ceil(col("meta.n_bytes").cast("double") / FrameBytes).as("n_frames"),
          substring(col("payload"), 1, FrameBytes).as("frame0"))
        .select(col("doc_id"), col("n_bytes"), col("n_frames"),
          ceil(col("n_frames").cast("double") / SampleEvery).cast("long").as("n_sampled"),
          md5(col("frame0")).as("frame0_md5"))
        .orderBy("doc_id")),

    // Cross-media shared-FRAME detection — the sub-asset dedup a video/
    // image pipeline runs to find repeated intros, watermarks, and
    // boilerplate segments that whole-payload `mm_dedup` cannot see
    // (the binary twin of `dedup_paragraph`). Every payload explodes
    // into FrameBytes-sized frames scan-side and ONLY the 128-bit frame
    // digests ride the shuffle (a 100 TB blob column contributes 32
    // hex chars per frame to the exchange); map-side combine collapses
    // repeats before the exchange and the output is bounded by the
    // shared-frame set.
    "mm_frame_dedup" -> ((s, dir) => {
      val nf = ceil(col("meta.n_bytes").cast("double") / FrameBytes).cast("int")
      media(s, dir)
        // an empty payload has ZERO frames: Spark's sequence(0, nf - 1)
        // at nf = 0 is the DESCENDING [0, -1] — two phantom frames per
        // empty blob — where the oracle's range(0, 0) is empty; the
        // pushed-down filter makes the generator domain nf >= 1 so the
        // two engines agree on any corpus, not just non-empty fixtures
        .filter(col("meta.n_bytes") > 0)
        .select(col("doc_id"),
          explode(transform(sequence(lit(0), nf - 1),
            i => md5(col("payload").substr(i * FrameBytes + 1, lit(FrameBytes)))))
            .as("frame_md5"))
        .groupBy("frame_md5")
        .agg(countDistinct("doc_id").as("n_docs"),
          count(lit(1)).as("n_occurrences"),
          min("doc_id").as("first_doc"))
        .filter(col("n_docs") > 1)
        .orderBy("frame_md5")
    }),

    // Decode-free per-asset SIGNAL statistics over the opaque payload
    // bytes — the audio/image triage pass (level histogramming, clip
    // and silence detection) a media pipeline runs BEFORE paying for a
    // real decode: byte min/max/mean plus the fraction of "hot" (≥ 120)
    // and "silent" (= 32) bytes. All arithmetic runs scan-side inside
    // one codegen'd higher-order-function chain per row — no explode,
    // so a 100 TB blob column contributes one bounded stats row per
    // asset to the shuffle-free projection. The ASCII fixture makes
    // byte i = char i, so DuckDB replays the byte walk over text (the
    // mm_frame_sample equivalence); empty payloads are excluded by the
    // pushed-down filter (the sequence(1, 0) descending-range hazard,
    // cf. mm_frame_dedup).
    "mm_channel_stats" -> ((s, dir) => {
      val arr = transform(sequence(lit(1), length(col("text"))),
        i => ascii(col("text").substr(i, lit(1))))
      Tables.documents(s, dir)
        .filter(octet_length(to_binary(col("text"), lit("utf-8"))) > 0)
        .select(col("doc_id"),
          octet_length(to_binary(col("text"), lit("utf-8"))).cast("long")
            .as("n_bytes"),
          arr.as("a"))
        .select(col("doc_id"), col("n_bytes"),
          array_min(col("a")).as("b_min"),
          array_max(col("a")).as("b_max"),
          Num.pin(aggregate(col("a"), lit(0L), (acc, x) => acc + x)
            .cast("double") / col("n_bytes"), 4).as("b_mean"),
          Num.pin(size(filter(col("a"), x => x >= 120)).cast("double") /
            col("n_bytes"), 6).as("hot_frac"),
          Num.pin(size(filter(col("a"), x => x === 32)).cast("double") /
            col("n_bytes"), 6).as("silence_frac"))
        .orderBy("doc_id")
    }),

    // Resize through the per-partition codec-batch shape: binary in ->
    // binary out, payloads never leave the executors. The stub decimates
    // bytes (keep every 4th) standing in for decode -> downscale ->
    // re-encode; because the fixture payload is ASCII the byte decimation
    // IS expressible in DuckDB, so unlike the feature stub this one has a
    // full hash oracle on the resized payload.
    "mm_resize" -> ((s, dir) => {
      import s.implicits._
      resize(media(s, dir).select(col("doc_id"), col("payload")).as[MediaRow])
        .select(col("doc_id"),
          octet_length(col("resized")).cast("long").as("n_bytes_out"),
          md5(col("resized")).as("resized_md5"))
        .orderBy("doc_id")
    }),

    // Stub decode -> fixed-dim feature vector; scalar-reduced projection
    // of the vector for the declared surface. No oracle (the stub decoder
    // is impl-specific); MultimodalSpec pins shape + determinism.
    "mm_decode_features" -> ((s, dir) => {
      import s.implicits._
      decodeFeatures(media(s, dir).select(col("doc_id"), col("payload")).as[MediaRow])
        .select(col("doc_id"),
          size(col("feature")).as("dim"),
          round(element_at(col("feature"), 1).cast("double"), 4).as("f0"),
          round(aggregate(col("feature"), lit(0.0d),
            (acc, x) => acc + x.cast("double")) / FeatureDim, 4).as("f_mean"))
        .orderBy("doc_id")
    }),

    // Shard-manifest build — the WebDataset/tar-shard step every
    // multimodal training pipeline runs: assets in a deterministic
    // shuffled order (md5 key, the `pipe_shuffle` contract) packed into
    // ~ShardBytes shards, assets atomic (a shard may overrun by at most
    // one asset — maxsize-is-advisory, exactly WebDataset's behavior):
    // shard = START offset DIV budget over the global byte cumsum.
    // The cumsum uses the range-partition + per-partition byte-offset
    // discipline (`pipe_shuffle`), so the manifest of a billion assets
    // never funnels through one task; only (id, n_bytes, key) ride the
    // exchanges — payload bytes stay in the scan. Output is
    // shard-cardinality: per shard the asset count, byte total, and the
    // key range a fetcher needs.
    "mm_shard_manifest" -> ((s, dir) => {
      val nParts = s.conf.get("spark.sql.shuffle.partitions").toInt
      val keyed = media(s, dir)
        .select(col("doc_id"), col("meta.n_bytes").as("nb"),
          md5(concat(lit("shard:"), col("doc_id").cast("string"))).as("skey"))
        .repartitionByRange(nParts, col("skey"), col("doc_id"))
        // no pre-persist sort — the cum window re-sorts above the cache,
        // offs is order-free (r18 opt: the agg_weighted_median trim)
        .withColumn("pid", spark_partition_id())
        .persist()
      val offs = keyed.groupBy("pid").agg(sum(col("nb")).as("pb"))
        .withColumn("offset", coalesce(
          sum(col("pb")).over(Window.orderBy("pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("pid", "offset")
      val cw = Window.partitionBy("pid").orderBy("skey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      keyed.join(broadcast(offs), "pid")
        .withColumn("cum_before",
          coalesce(sum(col("nb")).over(cw), lit(0L)) + col("offset"))
        .withColumn("shard_id", expr(s"cum_before DIV $ShardBytes"))
        .groupBy("shard_id")
        .agg(count(lit(1)).as("n_assets"), sum(col("nb")).as("shard_bytes"),
          min(col("skey")).as("first_key"), max(col("skey")).as("last_key"))
        .orderBy("shard_id")
    })
  )

  /** Target shard size for `mm_shard_manifest` (advisory, WebDataset
    * maxsize semantics; small so the fixture yields multiple shards). */
  val ShardBytes = 16384L

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class FeatureRow(doc_id: Long, feature: Array[Float])
  case class ResizedRow(doc_id: Long, resized: Array[Byte])

  /** The batch resize shape: binary in -> binary out through a
    * per-partition codec context (same contract as [[decodeFeatures]]). */
  def resize(ds: Dataset[MediaRow]): Dataset[ResizedRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // real deployment: codec init HERE, once per partition
      rows.map(r => ResizedRow(r.doc_id, Codecs.resizeStub(r.payload, ResizeEvery)))
    }
  }

  /** The batch decode shape: one codec context per partition, payloads
    * streamed through it. The stub stands in for the native decode call. */
  def decodeFeatures(ds: Dataset[MediaRow]): Dataset[FeatureRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // real deployment: initialize the codec (libjpeg/ffmpeg/...) HERE,
      // once per partition, then decode each payload through it
      rows.map(r => FeatureRow(r.doc_id, Codecs.imageFeaturesStub(r.payload)))
    }
  }

  // DuckDB's md5/substring take VARCHAR; the fixture text is ASCII, so the
  // varchar forms are byte-identical to Spark's binary forms.
  def oracles: Map[String, String] = Map(
    "mm_dedup" ->
      """SELECT md5(text) AS content_md5, min(doc_id) AS canonical_doc,
                count(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY canonical_doc""",
    "mm_meta" ->
      """SELECT doc_id, 'text/plain' AS format,
                octet_length(encode(text)) AS n_bytes,
                md5(text) AS content_md5
         FROM documents ORDER BY doc_id""",
    // per-char ascii() walk = the byte walk on the ASCII fixture; same
    // pinned divisions
    "mm_channel_stats" ->
      """SELECT doc_id, nb AS n_bytes,
                list_min(a) AS b_min, list_max(a) AS b_max,
                floor(CAST(list_sum(a) AS DOUBLE) / nb * 1e4 + 0.5) / 1e4
                  AS b_mean,
                floor(CAST(len(list_filter(a, x -> x >= 120)) AS DOUBLE)
                      / nb * 1e6 + 0.5) / 1e6 AS hot_frac,
                floor(CAST(len(list_filter(a, x -> x = 32)) AS DOUBLE)
                      / nb * 1e6 + 0.5) / 1e6 AS silence_frac
         FROM (
           SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS nb,
                  list_transform(range(1, len(text) + 1), i -> ascii(text[i]))
                    AS a
           FROM documents WHERE octet_length(encode(text)) > 0
         ) ORDER BY doc_id""",
    "mm_resize" ->
      s"""SELECT doc_id, CAST(length(resized) AS BIGINT) AS n_bytes_out,
                 md5(resized) AS resized_md5
         FROM (SELECT doc_id,
                 array_to_string(list_transform(range(1, length(text) + 1, $ResizeEvery),
                                                i -> text[i]), '') AS resized
               FROM documents)
         ORDER BY doc_id""",
    "mm_frame_sample" ->
      s"""SELECT doc_id, n_bytes,
                 CAST(ceil(CAST(n_bytes AS DOUBLE) / $FrameBytes) AS BIGINT) AS n_frames,
                 CAST(ceil(ceil(CAST(n_bytes AS DOUBLE) / $FrameBytes) / $SampleEvery) AS BIGINT) AS n_sampled,
                 md5(substring(text, 1, $FrameBytes)) AS frame0_md5
         FROM (SELECT doc_id, octet_length(encode(text)) AS n_bytes, text FROM documents)
         ORDER BY doc_id""",
    // byte i == char i on the ASCII fixture payload (the mm_frame_sample
    // equivalence), so the frame digests replay off text substrings
    "mm_frame_dedup" ->
      s"""WITH d AS (
           SELECT doc_id, text, octet_length(encode(text)) AS nb FROM documents
         ), fr AS (
           SELECT doc_id, text,
                  unnest(range(0, CAST(ceil(CAST(nb AS DOUBLE) / $FrameBytes)
                                       AS BIGINT))) AS i
           FROM d
         ), fh AS (
           SELECT doc_id,
                  md5(substring(text, CAST(i * $FrameBytes + 1 AS INT),
                                $FrameBytes)) AS frame_md5
           FROM fr
         )
         SELECT frame_md5, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                CAST(count(*) AS BIGINT) AS n_occurrences,
                min(doc_id) AS first_doc
         FROM fh GROUP BY frame_md5 HAVING count(DISTINCT doc_id) > 1
         ORDER BY frame_md5""",
    // the plain global cumsum window replays the range-partition + offset
    // discipline; // = integer division (Spark DIV)
    "mm_shard_manifest" ->
      s"""WITH k AS (
           SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS nb,
                  md5('shard:' || CAST(doc_id AS VARCHAR)) AS skey
           FROM documents
         ), c AS (
           SELECT *, coalesce(sum(nb) OVER (ORDER BY skey, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS cum_before
           FROM k
         )
         SELECT CAST(cum_before // $ShardBytes AS BIGINT) AS shard_id,
                count(*) AS n_assets,
                CAST(sum(nb) AS BIGINT) AS shard_bytes,
                min(skey) AS first_key, max(skey) AS last_key
         FROM c GROUP BY 1 ORDER BY shard_id"""
  )
}

/** STUB CODECS — the container ships no image/audio/video libraries.
  * Each function documents the real implementation it stands in for and
  * produces deterministic output so tests and the verify harness are
  * stable. Swap these for real codec calls in deployment; nothing else in
  * the pipeline changes. */
object Codecs {

  /** Stands in for: decode image bytes -> pixels -> pooled embedding
    * (e.g. via a JNI-wrapped libjpeg + a vision model). Deterministic
    * fake: k floats derived from a rolling FNV-1a hash over the bytes. */
  /** Stands in for: decode image -> downscale (2x2 pooling / bilinear) ->
    * re-encode. Deterministic fake: keep every `every`-th byte. */
  def resizeStub(payload: Array[Byte], every: Int): Array[Byte] = {
    val out = new Array[Byte]((payload.length + every - 1) / every)
    var i = 0
    while (i < out.length) { out(i) = payload(i * every); i += 1 }
    out
  }

  def imageFeaturesStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](MultimodalOps.FeatureDim)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < payload.length) {
      h = (h ^ (payload(i) & 0xffL)) * 0x100000001b3L
      out(i % MultimodalOps.FeatureDim) += ((h >>> 40).toInt & 0xffff) / 65536.0f
      i += 1
    }
    out
  }
}
