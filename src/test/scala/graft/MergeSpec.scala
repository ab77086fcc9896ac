package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.operators.MergeOps

/** Merge / CDC suite semantics + plan shape (values are oracle-checked via
  * `graft.Verify`; these pin the properties the row hash can't see). */
class MergeSpec extends SparkSpec {

  test("merge_upsert exercises all three MERGE branches and keeps keys unique") {
    val out = MergeOps.queries("merge_upsert")(spark, SfDir).cache()
    try {
      val statuses = out.select("status").distinct().collect().map(_.getString(0)).toSet
      assert(statuses === Set("updated", "inserted", "unchanged"), statuses)
      assert(out.count() === out.select("custkey").distinct().count(),
        "merge output must have one row per key")
      // inserted rows come only from the source (odd keys with orders)
      assert(out.filter(col("status") === "inserted" && col("custkey") % 2 === 0).count() === 0)
    } finally out.unpersist()
  }

  test("merge_upsert pre-aggregates the source before a single sort-merge full outer join") {
    val plan = MergeOps.queries("merge_upsert")(spark, SfDir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(plan.contains("FullOuter"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    // partial+final HashAggregate around the source's shuffle (map-side combine)
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan)
  }

  test("merge_scd2 versions are non-overlapping per user with exactly one current row") {
    val out = MergeOps.queries("merge_scd2")(spark, SfDir).cache()
    try {
      val users = out.select("user_id").distinct().count()
      assert(out.filter(col("is_current")).count() === users,
        "exactly one open-ended version per user")
      // valid_to of each closed version equals the next version's valid_from
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("valid_from")
      val bad = out
        .withColumn("next_from", lead("valid_from", 1).over(w))
        .filter(col("valid_to").isNotNull && col("valid_to") =!= col("next_from"))
        .count()
      assert(bad === 0, s"$bad gapped/overlapping versions")
      // consecutive versions always change the attribute
      val rep = out.withColumn("prev_attr", lag("attr", 1).over(w))
        .filter(col("prev_attr") === col("attr")).count()
      assert(rep === 0, s"$rep uncollapsed consecutive versions")
    } finally out.unpersist()
  }

  test("merge_scd2 plans one exchange for both window passes") {
    val plan = MergeOps.queries("merge_scd2")(spark, SfDir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx === 1, s"change-collapse and validity windows should share one shuffle:\n$plan")
  }

  test("merge_compact keeps exactly the latest record per key") {
    val out = MergeOps.queries("merge_compact")(spark, SfDir)
    val events = Tables.events(spark, SfDir)
    assert(out.count() === events.select("user_id").distinct().count())
    // spot-check: every kept ts is the max ts for that user
    val maxTs = events.groupBy("user_id").agg(max("ts").as("mx"))
    val mismatched = out.join(maxTs, "user_id").filter(col("last_ts") =!= col("mx")).count()
    assert(mismatched === 0)
  }

  test("merge_pit_lookup picks exactly the interval-valid version") {
    val dim = MergeOps.queries("merge_scd2")(spark, SfDir).collect()
      .groupBy(_.getLong(0))
    val got = MergeOps.queries("merge_pit_lookup")(spark, SfDir).collect()
    val purchases = Tables.events(spark, SfDir)
      .filter(col("event_type") === "purchase").count()
    assert(got.length.toLong === purchases,
      "every purchase resolves exactly one version")
    got.foreach { r =>
      val (u, ts) = (r.getLong(1), r.getTimestamp(2))
      val hit = dim(u).filter { v =>
        !v.getTimestamp(2).after(ts) &&
          (v.isNullAt(3) || ts.before(v.getTimestamp(3)))
      }
      assert(hit.length === 1, s"versions must tile: user $u at $ts")
      assert(hit.head.getString(1) === r.getString(3), s"user $u at $ts attr")
    }
  }

  test("merge_pit_lookup breaks tied valid_from deterministically " +
      "(non-zero-width version wins)") {
    // two change events at the SAME timestamp create a zero-width
    // [t, t) version; the oracle's from <= ts < to predicate excludes
    // it, so the as-of window must too — the fixture has no (user, ts)
    // ties, so this synthetic frame pins the latent case
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = Timestamp.valueOf("2024-01-01 01:00:00")
    val tmp = java.nio.file.Files.createTempDirectory("pit-tie").toString
    import spark.implicits._
    Seq(
      (10L, t0, 1L, "view", 1.0, "{}"),
      (11L, t1, 1L, "click", 1.0, "{}"),
      (12L, t1, 1L, "scroll", 1.0, "{}"),
      (14L, t1, 1L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = MergeOps.queries("merge_pit_lookup")(spark, tmp).collect()
    assert(out.length === 1, out.mkString("; "))
    val r = out.head
    // click[t1,t1) and scroll[t1,t1) are zero-width; only purchase[t1,∞)
    // contains t1 under [from, to) — any other pick is the r8 latent bug
    assert(r.getString(3) === "purchase", r)
    assert(r.getTimestamp(4) === t1, r)
  }
}
