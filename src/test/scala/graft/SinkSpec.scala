package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Partitioned parquet sink + partition pruning (SURVEY §2 B2 / 100 TB
  * design). At cluster scale the events table is laid out as
  * `day=YYYY-MM-DD/` Hive partitions; a query with a day predicate must
  * prune at PLANNING time (PartitionFilters on the scan) so a one-day
  * query over a 3-year table touches 1/1000th of the files — pruning at
  * the row level instead would still list and open every file. */
class SinkSpec extends SparkSpec {

  private def withTempDir(f: String => Unit): Unit = {
    val dir = Files.createTempDirectory("graft-sink").toFile
    try f(dir.getAbsolutePath)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(dir)
    }
  }

  test("partitionBy sink lays out day= directories; day predicate prunes partitions") {
    withTempDir { out =>
      val events = Tables.events(spark, SfDir)
        .withColumn("day", to_date(col("ts")))
      events.write.mode("overwrite").partitionBy("day").parquet(out)

      // physical layout: one directory per day
      val dayDirs = new java.io.File(out).listFiles
        .filter(f => f.isDirectory && f.getName.startsWith("day="))
      assert(dayDirs.length > 1, s"expected >1 day= partitions under $out")

      val someDay = dayDirs.head.getName.stripPrefix("day=")
      val pruned = spark.read.parquet(out).filter(col("day") === lit(someDay))

      // the day predicate must appear as a PartitionFilter on the scan,
      // NOT as a post-scan row Filter
      val plan = pruned.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(plan.contains("PartitionFilters"), plan)
      val pf = plan.linesIterator.find(_.contains("PartitionFilters")).get
      assert(pf.contains("day"), s"day predicate not pushed to partitions:\n$plan")

      // pruning reads only that day's files
      val filesRead = pruned.select(input_file_name()).distinct().collect()
      assert(filesRead.forall(_.getString(0).contains(s"day=$someDay")),
        "scan touched files outside the pruned partition")

      // and the result matches the unpartitioned row-filter count
      val expected = events.filter(col("day") === lit(someDay)).count()
      assert(pruned.count() === expected)
    }
  }

  test("z-order layout narrows per-row-group stats on BOTH dimensions (data skipping)") {
    // the payoff of zorder_layout: written in zval order with small row
    // groups, every row group's footer min/max covers a narrow slice of
    // EACH interleaved dimension, so a reader with a predicate on either
    // column skips most groups. Footer stats are read directly — this is
    // exactly the metadata a scan prunes on.
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    // both dimensions are NORMALIZED to the full 16-bit range before
    // interleaving — with raw values a dimension that uses fewer bits
    // (custkey ~11 bits vs day ~12 here) loses the high-bit interleave
    // and the curve degenerates toward a single-dimension sort; real
    // z-order writers always scale by the observed min/max first
    val raw = Tables.orders(spark, "/root/testdata/sf0.01")
      .select(col("o_custkey").cast("bigint").as("ck"),
        datediff(col("o_orderdate"), lit("1992-01-01")).cast("bigint").as("day"))
    val Array(maxCk, maxDay) =
      raw.agg(max("ck"), max("day")).collect()(0).toSeq.toArray.map {
        case l: Long => l
      }
    val x = col("ck") * 65535L / maxCk
    val y = col("day") * 65535L / maxDay
    val zval = (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .plus(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ plus _)
    val base = raw.withColumn("zval", zval)
    def avgSpanFraction(dir: String, column: String): Double = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      val spans = files.flatMap { f =>
        val rd = ParquetFileReader.open(HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath),
          spark.sparkContext.hadoopConfiguration))
        try rd.getFooter.getBlocks.asScala.map { b =>
          val c = b.getColumns.asScala
            .find(_.getPath.toDotString == column).get
          val st = c.getStatistics
          (st.genericGetMin.asInstanceOf[Long].toDouble,
            st.genericGetMax.asInstanceOf[Long].toDouble)
        }.toSeq
        finally rd.close()
      }
      val lo = spans.map(_._1).min
      val hi = spans.map(_._2).max
      assert(spans.length >= 8, s"need many row groups, got ${spans.length}")
      spans.map { case (a, b) => (b - a) / math.max(hi - lo, 1.0) }
        .sum / spans.length
    }
    withTempDir { plain =>
      withTempDir { zsorted =>
        val opts = Map("parquet.block.size" -> "16384",
          "parquet.page.size" -> "4096")
        // "plain" = the natural arrival order (by key), "zsorted" = the
        // layout zorder_layout computes; same rows, same row-group size
        base.orderBy("ck").coalesce(1).write.options(opts)
          .mode("overwrite").parquet(plain)
        base.orderBy("zval").coalesce(1).write.options(opts)
          .mode("overwrite").parquet(zsorted)
        val dayPlain = avgSpanFraction(plain, "day")
        val dayZ = avgSpanFraction(zsorted, "day")
        val ckZ = avgSpanFraction(zsorted, "ck")
        // key-ordered layout leaves the date dimension unclustered: each
        // row group spans ~the whole date range; z-order narrows both
        assert(dayPlain > 0.6, s"unsorted day span $dayPlain should be wide")
        assert(dayZ < dayPlain / 2, s"z-sorted day span $dayZ vs $dayPlain")
        assert(ckZ < 0.6, s"z-sorted custkey span $ckZ should stay clustered")
      }
    }
  }

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at runtime") {
    withTempDir { out =>
      val events = Tables.events(spark, SfDir)
        .withColumn("day", to_date(col("ts")))
      events.write.mode("overwrite").partitionBy("day").parquet(s"$out/fact")
      // a dim table keyed on the partition column, with a selective flag —
      // the static plan cannot know which days survive the dim filter, so
      // partition pruning must happen at RUNTIME from the broadcast side
      // NB: the flag must be a comparison, not a bare boolean column —
      // PartitionPruning only injects the subquery for predicates its
      // isLikelySelective heuristic recognizes (EqualTo/In/Like/...)
      events.select("day").distinct()
        .withColumn("flag",
          when(col("day") === events.agg(min("day")).head.getDate(0),
            lit("keep")).otherwise(lit("drop")))
        .write.mode("overwrite").parquet(s"$out/dim")

      // fixture-size stats make the benefit estimate a wash, so pin the
      // heuristic the way a real deployment with a selective dim would
      // resolve it (the file-touch assertion below is the real proof)
      withConfs(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
        "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "1000") {
        // NB: no input_file_name() here — a non-deterministic projection
        // between scan and join also blocks the pruning rule
        val fact = spark.read.parquet(s"$out/fact")
        val dim = spark.read.parquet(s"$out/dim").filter(col("flag") === "keep")
        val joined = fact.join(dim, "day")

        val plan = joined.queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        assert(plan.toLowerCase.contains("dynamicpruning"),
          s"expected a dynamic pruning subquery on the fact scan:\n$plan")

        // run it and read the fact scan's own metric: with >1 day on disk,
        // the runtime-pruned scan must have touched exactly 1 partition
        val expected = Tables.events(spark, SfDir)
          .withColumn("day", to_date(col("ts")))
          .groupBy("day").count().orderBy("day").head.getLong(1)
        // collect() (not count()) so the metrics land on THIS plan's
        // QueryExecution rather than a fresh aggregate plan
        assert(joined.collect().length.toLong === expected)
        val scans = joined.queryExecution.executedPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.relation.location.rootPaths.exists(_.toString.contains("/fact")) => f
        }
        assert(scans.nonEmpty, "fact FileSourceScanExec not found")
        val parts = scans.head.metrics("numPartitions").value
        assert(parts === 1, s"runtime pruning read $parts partitions, expected 1")
      }
    }
  }

  test("small-file compaction: rewrite to target file count with content parity") {
    // the operational twin of merge_compact: streaming/incremental writes
    // leave hundreds of KB-sized files per partition; reading pays a
    // file-open per file, so periodic compaction is how a 100 TB table
    // keeps its scan cost proportional to bytes, not file count. The
    // rewrite is one repartition to ceil(bytes / targetFileSize) — here
    // pinned by file count — and must be byte-for-byte content-preserving.
    withTempDir { out =>
      val events = Tables.events(spark, SfDir)
      // simulate the incremental-writer fragmentation: 64 tiny files
      events.repartition(64).write.mode("overwrite").parquet(s"$out/frag")
      val fragFiles = new java.io.File(s"$out/frag").listFiles
        .count(_.getName.endsWith(".parquet"))
      assert(fragFiles >= 32, s"expected many fragments, got $fragFiles")

      val frag = spark.read.parquet(s"$out/frag")
      frag.repartition(4).write.mode("overwrite").parquet(s"$out/compact")
      val compactFiles = new java.io.File(s"$out/compact").listFiles
        .count(_.getName.endsWith(".parquet"))
      assert(compactFiles === 4, s"expected 4 compacted files, got $compactFiles")

      // content parity: same multiset of rows
      val a = spark.read.parquet(s"$out/compact")
      assert(a.count() === events.count())
      assert(a.exceptAll(frag).count() === 0 && frag.exceptAll(a).count() === 0)
    }
  }

  test("schema evolution: mergeSchema unions columns across file generations") {
    // data-lake reality: yesterday's files lack the column added today.
    // A reader over both generations must see the union schema with
    // nulls for the missing column — not fail, not silently drop it.
    withTempDir { out =>
      val v1 = Tables.events(spark, SfDir).select("event_id", "user_id", "value")
      v1.write.parquet(s"$out/gen=1")
      val v2 = Tables.events(spark, SfDir)
        .select(col("event_id"), col("user_id"), col("value"),
          col("event_type").as("etype"))
      v2.write.parquet(s"$out/gen=2")

      val merged = spark.read.option("mergeSchema", "true").parquet(out)
      assert(merged.columns.toSet === Set("event_id", "user_id", "value", "etype", "gen"))
      // old generation null-extends the new column; new generation keeps it
      assert(merged.filter(col("gen") === 1 && col("etype").isNotNull).count() === 0)
      assert(merged.filter(col("gen") === 2 && col("etype").isNull).count() === 0)
      assert(merged.count() === v1.count() * 2)
    }
  }

  test("dynamic partition overwrite replaces only the written day") {
    withTempDir { out =>
      val events = Tables.events(spark, SfDir)
        .withColumn("day", to_date(col("ts")))
      events.write.mode("overwrite").partitionBy("day").parquet(out)
      val before = spark.read.parquet(out).count()

      val days = events.select("day").distinct().orderBy("day")
        .collect().map(_.getDate(0))
      val target = days.head

      // backfill ONE day with a single sentinel row; static overwrite
      // would wipe every other partition — dynamic must keep them
      val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
      try {
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        events.filter(col("day") === target).limit(1)
          .write.mode("overwrite").partitionBy("day").parquet(out)
      } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

      val after = spark.read.parquet(out)
      val untouched = after.filter(col("day") =!= target).count()
      val rewritten = after.filter(col("day") === target).count()
      val othersBefore = before - events.filter(col("day") === target).count()
      assert(untouched === othersBefore, "dynamic overwrite clobbered sibling partitions")
      assert(rewritten === 1L)
    }
  }
}
