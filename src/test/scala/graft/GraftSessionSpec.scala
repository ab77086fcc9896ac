package graft

import org.apache.spark.sql.SparkSession

/** The one-call library entry point: extensions + catalog + defaults. */
class GraftSessionSpec extends SparkSpec {

  test("GraftSession.install retrofits a session that predates graft") {
    // the getOrCreate trap: withExtensions is ignored for a pre-existing
    // session — install() must wire functions, strategy, and catalog into
    // the LIVE session (idempotently)
    val s = spark // the shared fixture session, built without extensions
    GraftSession.install(s)
    GraftSession.install(s) // idempotent
    assert(s.sql("SELECT sorted_jaccard(array(1L, 2L), array(2L)) AS j")
      .head.getDouble(0) === (1.0 / 2.0))
    assert(s.sql("SELECT count(*) AS n FROM graft.docs.docs_42").head.getLong(0) === 42)
    assert(s.experimental.extraStrategies
      .count(_.isInstanceOf[graft.plans.SelfPairwiseStrategy]) === 1)
  }

  test("GraftSession.local wires extensions, the graft catalog, and defaults") {
    val spark0 = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // shares the JVM's SparkContext with the suite fixture; master is
    // fixed by the running context, everything session-scoped applies
    val s2 = GraftSession.local(cores = 2, appName = "graft-session-spec")
    try {
      // SQL functions from GraftExtensions resolve
      val j = s2.sql("SELECT sorted_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j")
        .head.getDouble(0)
      assert(j === 0.5)
      // the graft catalog resolves generated tables from pure SQL
      assert(s2.sql("SELECT count(*) AS n FROM graft.docs.docs_123").head.getLong(0) === 123)
      // ... including the bucket-layout table and the catalog FUNCTION
      // surface the storage-partitioned join resolves transforms through
      assert(s2.sql("SELECT count(*) AS n FROM graft.docs.docs_123_4_bucket")
        .head.getLong(0) === 123)
      assert(s2.sql("SELECT graft.docs.bucket(4, 10L) AS b").head.getInt(0) === 2)
      // scale defaults: shuffle parallelism = cores, UTC, AQE on
      assert(s2.conf.get("spark.sql.shuffle.partitions") === "2")
      assert(s2.conf.get("spark.sql.session.timeZone") === "UTC")
      assert(s2.conf.get("spark.sql.adaptive.enabled") === "true")
    } finally {
      SparkSession.setDefaultSession(spark0)
      SparkSession.setActiveSession(spark0)
    }
  }
}
