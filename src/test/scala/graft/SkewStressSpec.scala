package graft

import org.apache.spark.sql.functions._

import graft.operators.StreamingOps

/** Key-skew stress for the per-user fold family (`ts_ewma`,
  * `ts_cusum_control`, `ts_mad_anomaly`) — r12 verdict item 4.
  *
  * These operators deliberately carry each user's FULL history as one row
  * of per-key state (`groupBy(user).sort_array(collect_list(...))`): the
  * documented contract is that state is KEY-bounded — a user's series
  * fits one task — not corpus-bounded. The oracle replays average-shaped
  * keys only, so nothing before this spec exercised the contract's edge:
  * one pathological power user concentrating ~100× the median event
  * count in a single task's row. The generated corpus here has 200
  * normal users × 40 events and one user with 4,000 (100× the median);
  * each query must COMPLETE and match a driver-side brute replay of its
  * fold bit-for-bit (same double ops in the same order, same 4dp
  * floor-chain pin). If a future fixture makes this stress spill, the
  * per-user medians should move to the `agg_mad` two-pass value-domain
  * discipline — this spec is the tripwire that decides when. */
class SkewStressSpec extends SparkSpec {

  private val NormalUsers  = 200
  private val NormalEvents = 40
  private val PowerUser    = 999L
  private val PowerEvents  = NormalEvents * 100

  /** Deterministic value stream — no RNG, same corpus every run: a
    * uniform-ish [0, 100) base (MAD ≈ 25 per user) plus rare +500 spikes
    * (~2.4% of events) that sit far past every user's 3·MAD gate, plus
    * recurring 100-event +90 DRIFT segments (only reachable by the power
    * user's long history) so sustained-shift detectors (the Western
    * Electric run rules) have something real to fire on. */
  private def valueOf(u: Long, i: Int): Double = {
    val base =
      (((u * 1315423911L + i * 2654435761L) % 1000L + 1000L) % 1000L).toDouble / 10.0
    val drift = if ((i / 100) % 7 == 3) 90.0 else 0.0
    if ((u + i) % 41 == 0) base + drift + 500.0 else base + drift
  }

  private case class Ev(eventId: Long, userId: Long, tsMs: Long, value: Double)

  /** Event times are MONOTONE in the per-user index (so the fold tests'
    * (ts, event_id) replay order is untouched) but jump 2 h every 13
    * events and 26 h every 120 — real session breaks (> SessionGapSec)
    * and multi-day gaps, so the windowed replays below exercise genuine
    * break/island structure instead of one degenerate run per user. */
  private def tsOf(i: Int): Long =
    1704067200000L /* 2024-01-01T00:00:00Z */ +
      i * 1000L + (i / 13) * 7200000L + (i / 120) * 93600000L

  private lazy val events: Seq[Ev] = {
    val normal = for {
      u <- 1L to NormalUsers.toLong
      i <- 0 until NormalEvents
    } yield (u, i)
    (normal ++ (0 until PowerEvents).map(i => (PowerUser, i)))
      .zipWithIndex.map { case ((u, i), eid) =>
        Ev(eid.toLong, u, tsOf(i), valueOf(u, i))
      }
  }

  /** The generated corpus written as an events.parquet fixture dir so the
    * DECLARED queries run against it unmodified. */
  private lazy val skewDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_skew").toString
    import spark.implicits._
    events.map(e => (e.eventId, e.userId, new java.sql.Timestamp(e.tsMs), e.value))
      .toDF("event_id", "user_id", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** Per-user series in the folds' exact order: sort_array over
    * struct(ts, event_id, value) = (ts, event_id) ascending. */
  private lazy val byUser: Map[Long, Seq[Ev]] =
    events.groupBy(_.userId).view
      .mapValues(_.sortBy(e => (e.tsMs, e.eventId))).toMap

  private def pin4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  test("ts_mad_anomaly completes and is exact under 100x key skew") {
    val got = StreamingOps.queries("ts_mad_anomaly")(spark, skewDir)
      .collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[Double]("value"), r.getAs[Double]("med"), r.getAs[Double]("mad")))
      .toSeq
    val want = byUser.toSeq.flatMap { case (u, es) =>
      val vals = es.map(_.value).sorted
      val n = vals.length
      val med = vals((n + 1) / 2 - 1) // lower median, a SELECTED input value
      val mad = es.map(e => math.abs(e.value - med)).sorted.apply((n + 1) / 2 - 1)
      es.filter(e => math.abs(e.value - med) > 3.0 * mad)
        .map(e => (e.eventId, u, e.value, pin4(med), pin4(mad)))
    }.sortBy(_._1)
    assert(got === want)
    assert(want.nonEmpty, "stress corpus must actually flag anomalies")
  }

  test("ts_ewma completes and is exact under 100x key skew") {
    val got = StreamingOps.queries("ts_ewma")(spark, skewDir)
      .collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[Double]("value"), r.getAs[Double]("ewma")))
      .toSeq
    val want = byUser.toSeq.flatMap { case (u, es) =>
      var prev = 0.0
      var has = false
      es.map { e =>
        val y =
          if (has) StreamingOps.EwmaAlpha * e.value + StreamingOps.EwmaBeta * prev
          else e.value
        prev = y; has = true
        (e.eventId, u, e.value, pin4(y))
      }
    }.sortBy(_._1)
    assert(got === want)
    assert(got.length === events.length, "every event keeps its smoothed row")
  }

  test("ts_kalman completes and is exact under 100x key skew; gain " +
      "settles monotonically") {
    val got = StreamingOps.queries("ts_kalman")(spark, skewDir)
      .collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[Double]("value"), r.getAs[Double]("estimate"),
        r.getAs[Double]("gain")))
      .toSeq
    val want = byUser.toSeq.flatMap { case (u, es) =>
      var x = 0.0; var p = 0.0; var has = false
      es.map { e =>
        val pp = p + StreamingOps.KalmanQ
        val k = pp / (pp + StreamingOps.KalmanR)
        val (nx, np, nk) =
          if (has) (x + k * (e.value - x), (1.0 - k) * pp, k)
          else (e.value, 1.0, 1.0)
        x = nx; p = np; has = true
        (e.eventId, u, e.value, pin4(nx), pin4(nk))
      }
    }.sortBy(_._1)
    assert(got === want)
    // the adaptive gain must DECREASE toward the steady-state Riccati
    // fixpoint from step 2 on (constant Q/R, no restarts)
    got.groupBy(_._2).values.foreach { rows =>
      val ks = rows.sortBy(_._1).map(_._5).drop(1)
      assert(ks.zip(ks.drop(1)).forall { case (a, b) => b <= a + 1e-12 },
        "gain must be non-increasing after the first update")
    }
  }

  test("win_sessionize completes and is exact under 100x key skew") {
    import graft.operators.WindowOps
    val got = WindowOps.queries("win_sessionize")(spark, skewDir)
      .collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[Long]("session_idx"), r.getAs[Int]("pos_in_session")))
      .toSeq
    val want = byUser.toSeq.flatMap { case (u, es) =>
      var prevEs = Long.MinValue
      var sessionIdx = 0L
      var sessionStartRn = 1L
      es.zipWithIndex.map { case (e, idx) =>
        val rn = idx + 1L
        val sec = e.tsMs / 1000L
        val brk = prevEs == Long.MinValue || sec - prevEs > WindowOps.SessionGapSec
        if (brk) { sessionIdx += 1L; sessionStartRn = rn }
        prevEs = sec
        (e.eventId, u, sessionIdx, (rn - sessionStartRn + 1L).toInt)
      }
    }.sortBy(_._1)
    assert(got === want)
    // the stress corpus must contain REAL break structure, and the
    // power user's whole multi-session history must ride one partition
    assert(want.filter(_._2 == PowerUser).map(_._3).max >= 10,
      "power user should break into many sessions")
  }

  test("win_gap_islands completes and is exact under 100x key skew") {
    import graft.operators.WindowOps
    val zone = java.time.ZoneId.of(spark.conf.get("spark.sql.session.timeZone"))
    def dayOf(tsMs: Long): java.time.LocalDate =
      java.time.Instant.ofEpochMilli(tsMs).atZone(zone).toLocalDate
    val got = WindowOps.queries("win_gap_islands")(spark, skewDir)
      .collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Date]("start_day").toLocalDate,
        r.getAs[java.sql.Date]("end_day").toLocalDate,
        r.getAs[Int]("n_days")))
      .toSeq
    val want = byUser.toSeq.flatMap { case (u, es) =>
      val days = es.map(e => dayOf(e.tsMs)).distinct.sortBy(_.toEpochDay)
      // split the ascending day list into maximal consecutive runs
      days.foldLeft(Vector.empty[Vector[java.time.LocalDate]]) { (runs, d) =>
        if (runs.nonEmpty && runs.last.last.plusDays(1) == d)
          runs.init :+ (runs.last :+ d)
        else runs :+ Vector(d)
      }.map(run => (u, run.head, run.last, run.length))
    }.sortBy(t => (t._1, t._2.toEpochDay))
    assert(got === want)
    assert(want.count(_._4 >= 2) > 0,
      "stress corpus must contain multi-day islands")
    assert(want.groupBy(_._1).values.exists(_.size >= 2),
      "stress corpus must contain broken streaks (gaps between islands)")
  }

  test("ts_spc_rules completes and is exact under 100x key skew") {
    val got = StreamingOps.queries("ts_spc_rules")(spark, skewDir)
      .collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[Double]("value"), r.getAs[Double]("z"),
        r.getAs[Boolean]("r1"), r.getAs[Boolean]("r2"),
        r.getAs[Boolean]("r3"), r.getAs[Boolean]("r4")))
      .toSeq
    def dsum(xs: Seq[Double]): Double =
      xs.map(x => BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
    val want = byUser.toSeq.flatMap { case (u, es) =>
      val n = es.length.toDouble
      val sv = dsum(es.map(_.value))
      val svv = dsum(es.map(e => e.value * e.value))
      val varE = (n * svv - sv * sv) / (n * (n - 1.0))
      if (es.length < 2 || !(varE > 0)) Seq.empty
      else {
        val mu = sv / n
        val sigma = math.sqrt(varE)
        val zs = es.map(e => (e.value - mu) / sigma)
        def sameSide(win: Seq[Double], width: Int, bound: Double, need: Int) =
          win.length == width &&
            (win.count(_ > bound) >= need || win.count(_ < -bound) >= need)
        es.indices.flatMap { i =>
          val z = zs(i)
          def frame(k: Int) = zs.slice(math.max(0, i - k + 1), i + 1)
          val r1 = math.abs(z) > 3.0
          val r2 = sameSide(frame(3), 3, 2.0, 2)
          val r3 = sameSide(frame(5), 5, 1.0, 4)
          val r4 = sameSide(frame(8), 8, 0.0, 8)
          if (r1 || r2 || r3 || r4)
            Some((es(i).eventId, u, es(i).value, pin4(z), r1, r2, r3, r4))
          else None
        }
      }
    }.sortBy(_._1)
    assert(got === want)
    assert(want.exists(_._5) && want.exists(t => t._6 || t._7 || t._8),
      "stress corpus must fire both the 3-sigma rule and a run rule")
  }

  test("ts_sax completes and is exact under 100x key skew") {
    val got = StreamingOps.queries("ts_sax")(spark, skewDir)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[String]("sax_word"), r.getAs[Long]("motif_support")))
      .toSeq
    val S = StreamingOps.SaxSegments
    def dsum(xs: Seq[Double]): Double =
      xs.map(x => BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
    val words = byUser.toSeq.flatMap { case (u, es) =>
      val n = es.length
      val nd = n.toDouble
      val sv = dsum(es.map(_.value))
      val svv = dsum(es.map(e => e.value * e.value))
      val varE = (nd * svv - sv * sv) / (nd * (nd - 1.0))
      if (n < S || !(varE > 0)) None
      else {
        val mu = sv / nd
        val sigma = math.sqrt(varE)
        // seg(i) = ((rn−1)·S) div n over the (ts, event_id) order; PAA
        // mean and z replay the identical double chains
        val bySeg = es.zipWithIndex.groupBy { case (_, i) => i * S / n }
        val word = (0 until S).map { j =>
          val seg = bySeg(j)
          val paa = dsum(seg.map(_._1.value)) / seg.length
          val z = (paa - mu) / sigma
          if (z < -0.6745) 'a' else if (z < 0.0) 'b'
          else if (z < 0.6745) 'c' else 'd'
        }.mkString
        Some((u, n.toLong, word))
      }
    }
    val support = words.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val want = words.map(w => (w._1, w._2, w._3, support(w._3))).sortBy(_._1)
    assert(got === want)
    assert(want.nonEmpty, "stress corpus must produce SAX words")
    assert(want.exists(_._4 > 1),
      "the 200 same-shaped normal users must share at least one motif")
    // the power user's 100×-long series must produce a word, in one task
    assert(want.exists(_._1 == PowerUser))
  }

  test("ts_dtw completes and is exact under 100x key skew (r16)") {
    val got = StreamingOps.queries("ts_dtw")(spark, skewDir)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Double]("dtw_dist")))
      .toSeq
    val S = StreamingOps.SaxSegments
    val probe = StreamingOps.DtwProbe
    val band = StreamingOps.DtwBand
    def dsum(xs: Seq[Double]): Double =
      xs.map(x => BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
    def pin6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    // brute banded-DTW over the same PAA z chain the ts_sax replay uses
    val dists = byUser.toSeq.flatMap { case (u, es) =>
      val n = es.length
      val nd = n.toDouble
      val sv = dsum(es.map(_.value))
      val svv = dsum(es.map(e => e.value * e.value))
      val varE = (nd * svv - sv * sv) / (nd * (nd - 1.0))
      if (n < S || !(varE > 0)) None
      else {
        val mu = sv / nd
        val sigma = math.sqrt(varE)
        val bySeg = es.zipWithIndex.groupBy { case (_, i) => i * S / n }
        val zs = (0 until S).map { j =>
          val seg = bySeg(j)
          (dsum(seg.map(_._1.value)) / seg.length - mu) / sigma
        }
        val d = Array.fill(S, S)(Double.NaN)
        for (i <- 0 until S; j <- 0 until S if math.abs(i - j) <= band) {
          val cost = math.abs(zs(i) - probe(j))
          val prev = Seq((i - 1, j), (i, j - 1), (i - 1, j - 1))
            .filter { case (pi, pj) =>
              pi >= 0 && pj >= 0 && math.abs(pi - pj) <= band }
            .map { case (pi, pj) => d(pi)(pj) }
          d(i)(j) = if (prev.isEmpty) cost else cost + prev.min
        }
        Some((u, n.toLong, pin6(d(S - 1)(S - 1))))
      }
    }
    val want = dists.sortBy(t => (t._3, t._1)).take(StreamingOps.DtwTopK)
    assert(got === want)
    assert(want.size === StreamingOps.DtwTopK,
      "stress corpus must fill the full top-k")
    // the elastic distance is finite and nonnegative for every winner
    assert(want.forall(_._3 >= 0.0))
  }

  test("ts_cusum_control completes and is exact under 100x key skew") {
    val got = StreamingOps.queries("ts_cusum_control")(spark, skewDir)
      .collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[Double]("value"), r.getAs[Double]("cusum_hi"),
        r.getAs[Double]("cusum_lo"), r.getAs[Boolean]("drift")))
      .toSeq
    val want = byUser.toSeq.flatMap { case (u, es) =>
      // exact-DECIMAL sufficient sums, replayed with the same
      // double->decimal(28,10) HALF_UP cast the Spark fold uses
      def dsum(xs: Seq[Double]): Double =
        xs.map(x => BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble
      val n = es.length.toDouble
      val sv = dsum(es.map(_.value))
      val svv = dsum(es.map(e => e.value * e.value))
      val varE = (n * svv - sv * sv) / (n * (n - 1.0))
      if (es.length < 2 || !(varE > 0)) Seq.empty
      else {
        val mu = sv / n
        val sigma = math.sqrt(varE)
        var sp = 0.0
        var sn = 0.0
        es.map { e =>
          val z = (e.value - mu) / sigma
          sp = math.max(0.0, sp + z - 0.5)
          sn = math.max(0.0, sn - z - 0.5)
          (e.eventId, u, e.value, pin4(sp), pin4(sn), sp > 4.0 || sn > 4.0)
        }
      }
    }.sortBy(_._1)
    assert(got === want)
    assert(got.length === events.length,
      "no user series is degenerate in the stress corpus")
  }
}
