package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpecBase {

  test("funnelCounts: order-sensitive chaining on a hand event log") {
    val s = spark; import s.implicits._
    // u1 completes in order; u2 clicks BEFORE its view (click must not
    // count — no click after t1); u3 views only; u4 has view>click but
    // its purchase precedes the click
    val e = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "click", 5L), (2L, "view", 10L),
      (3L, "view", 10L),
      (4L, "view", 10L), (4L, "purchase", 15L), (4L, "click", 20L))
      .toDF("user_id", "event_type", "uts")
    val rows = Funnel.funnelCounts(e, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows === Array(
      (1, "view", 4L, 1.0),
      (2, "view>click", 2L, 0.5),          // u1, u4
      (3, "view>click>purchase", 1L, 0.25) // u1 only — u4's purchase too early
    ))
  }

  test("funnelCounts: greedy earliest-completion finds any valid assignment") {
    val s = spark; import s.implicits._
    // u1: view@10, view@50, click@20, purchase@30 — the SECOND view would
    // miss the funnel; greedy takes view@10 and completes. A user
    // completes iff ANY in-order assignment exists.
    val e = Seq(
      (1L, "view", 10L), (1L, "view", 50L), (1L, "click", 20L), (1L, "purchase", 30L))
      .toDF("user_id", "event_type", "uts")
    val rows = Funnel.funnelCounts(e, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(rows === Array((1, 1L), (2, 1L), (3, 1L)))
  }

  test("funnelCounts: equal timestamps do not chain (strictly-after rule)") {
    val s = spark; import s.implicits._
    val e = Seq((1L, "view", 10L), (1L, "click", 10L))
      .toDF("user_id", "event_type", "uts")
    val rows = Funnel.funnelCounts(e, Seq("view", "click"))
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(rows === Array((1, 1L), (2, 0L)))
  }

  test("funnelCounts equals a driver-side reference on randomized event logs") {
    val s = spark; import s.implicits._
    val stages = Seq("a", "b", "c")
    def reference(events: Seq[(Long, String, Long)]): Map[Int, Long] = {
      val byUser = events.groupBy(_._1)
      val reachedCounts = byUser.values.map { evs =>
        // greedy earliest-completion chain, mirroring the operator's rule
        var prev = Long.MinValue
        var reached = 0
        var done = false
        for (st <- stages if !done) {
          val next = evs.filter(e => e._2 == st && e._3 > prev).map(_._3)
          if (next.isEmpty) done = true
          else { prev = next.min; reached += 1 }
        }
        reached
      }.toSeq
      (1 to stages.size).map(i =>
        i -> reachedCounts.count(_ >= i).toLong).toMap
    }
    for (seed <- Seq(3, 19)) {
      val rnd = new scala.util.Random(seed)
      val evs = (1 to 300).map { _ =>
        (rnd.nextInt(25).toLong, Seq("a", "b", "c", "x")(rnd.nextInt(4)),
          rnd.nextInt(50).toLong)
      }
      // reference chains strictly-after, so equal timestamps matter:
      // keep them — that's exactly the edge worth fuzzing
      val want = reference(evs)
      val got = Funnel.funnelCounts(
          evs.toDF("user_id", "event_type", "uts"), stages)
        .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
      assert(got === want, s"seed=$seed")
    }
  }

  test("sessionize: gap rule, ties share a session, ids unique across users") {
    val s = spark; import s.implicits._
    // user 1: events at 10, 20, 100 with gap 50 -> sessions {10,20}, {100};
    // user 2: tie at 10,10 then 200 -> {10,10}, {200}
    val e = Seq(
      (1L, 10L), (1L, 20L), (1L, 100L),
      (2L, 10L), (2L, 10L), (2L, 200L))
      .toDF("user_id", "uts")
    val rows = Funnel.sessionize(e, gapUs = 50L)
      .select("user_id", "uts", "session", "session_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byUser = rows.groupBy(_._1)
    assert(byUser(1L).map(t => (t._2, t._3)).toSet ===
      Set((10L, 0L), (20L, 0L), (100L, 1L)))
    assert(byUser(2L).map(t => (t._2, t._3)).toSet ===
      Set((10L, 0L), (200L, 1L)))
    assert(byUser(2L).filter(_._2 == 10L).forall(_._3 == 0L), "ties share a session")
    // session_id unique across users even for equal session ordinals
    val ids = rows.map(_._4).toSet
    assert(rows.groupBy(t => (t._1, t._3)).size === ids.size)
  }

  test("sessionize equals a driver-side reference on randomized event logs") {
    val s = spark; import s.implicits._
    // reference: per user, sort by ts; a new session starts when the
    // gap since the PREVIOUS event exceeds gapUs; ties share a session
    def reference(events: Seq[(Long, Long)], gap: Long): Map[(Long, Long), Long] = {
      events.groupBy(_._1).flatMap { case (u, evs) =>
        val ts = evs.map(_._2).sorted
        var session = 0L
        var prev = ts.head
        // each DISTINCT timestamp gets one session label; duplicates share it
        val labels = scala.collection.mutable.Map[(Long, Long), Long]()
        for (t <- ts) {
          if (t - prev > gap) session += 1
          labels((u, t)) = session
          prev = t
        }
        labels
      }
    }
    for (seed <- Seq(7, 23)) {
      val rnd = new scala.util.Random(seed)
      val evs = (1 to 400).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(200).toLong))
      val want = reference(evs, gap = 15L)
      val got = Funnel.sessionize(evs.toDF("user_id", "uts"), gapUs = 15L)
        .select("user_id", "uts", "session")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      // EVERY row (including duplicate timestamps) must carry the
      // reference label for its (user, ts)
      got.foreach { case (k, v) =>
        assert(v === want(k), s"seed=$seed at $k")
      }
      assert(got.map(_._1).toSet === want.keySet, s"seed=$seed coverage")
    }
  }

  test("topPaths: session gaps cut paths; counts hand-computed") {
    val s = spark; import s.implicits._
    // user 1 session A: a,b,c,b (paths a>b>c, b>c>b); the gap to event 5
    // starts session B: c,a (too short for n=3 — no path); user 2: a,b,c
    val e = Seq(
      (1L, 1L, "a", 10L), (2L, 1L, "b", 20L), (3L, 1L, "c", 30L), (4L, 1L, "b", 40L),
      (5L, 1L, "c", 1000L), (6L, 1L, "a", 1010L),
      (7L, 2L, "a", 10L), (8L, 2L, "b", 20L), (9L, 2L, "c", 30L))
      .toDF("event_id", "user_id", "event_type", "uts")
    val rows = Funnel.topPaths(e, gapUs = 100L, n = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows === Array(("a>b>c", 2L), ("b>c>b", 1L)),
      "a>b>c counted in both users' first sessions; the gap cut c,a off")
  }

  test("cohortRetention: hand-computed cohorts, k=0 equals cohort size") {
    val s = spark; import s.implicits._
    // bucket=10: u1 first in b0, active b0/b1/b2; u2 first b0, active b0;
    // u3 first b1, active b1 and b2. Duplicate events in one bucket
    // count once (distinct).
    val e = Seq(
      (1L, 5L), (1L, 7L), (1L, 15L), (1L, 25L),
      (2L, 9L),
      (3L, 12L), (3L, 22L))
      .toDF("user_id", "uts")
    val rows = Funnel.cohortRetention(e, bucketUs = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows === Array(
      (0L, 0L, 2L, 2L, 1.0),
      (0L, 1L, 1L, 2L, 0.5),
      (0L, 2L, 1L, 2L, 0.5),
      (1L, 0L, 1L, 1L, 1.0),
      (1L, 1L, 1L, 1L, 1.0)))
  }

  test("rateAnomalies: hand-computed z-scores; zero-variance and singleton corpora yield NULL z") {
    val s = spark
    import s.implicits._
    // buckets of width 10: counts 4, 1, 1 -> mean 2, var_samp 3; the
    // null timestamp must be EXCLUDED, not folded into a pseudo-bucket
    val events = (Seq(0L, 1L, 2L, 3L, 10L, 20L).map(Option(_)) :+ None).toDF("uts")
    val out = Funnel.rateAnomalies(events, bucketUs = 10L, zThreshold = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2), r.getBoolean(3)))
    val s3 = math.sqrt(3.0)
    def z(x: Long) = BigDecimal((x - 2.0) / s3)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out === Array(
      (0L, 4L, z(4), true), (10L, 1L, z(1), false), (20L, 1L, z(1), false)))

    // all buckets equal: zero variance -> z NULL, nothing flagged
    val flat = Funnel.rateAnomalies(
      Seq(0L, 10L, 20L).toDF("uts"), bucketUs = 10L).collect()
    assert(flat.forall(r => r.isNullAt(2) && !r.getBoolean(3)))

    // a single bucket: no sample variance -> z NULL
    val one = Funnel.rateAnomalies(Seq(1L, 2L).toDF("uts"), bucketUs = 10L).collect()
    assert(one.length === 1 && one.head.isNullAt(2) && !one.head.getBoolean(3))
  }

  test("attribution: hand-computed journeys, credit models, unconverted tail drops") {
    val s = spark; import s.implicits._
    // user 1: ad(t1) email(t2) BUY(t3) ad(t4) BUY(t5) ad(t6)   <- t6 unattributed
    // user 2: email(t1) BUY(t2)
    // user 3: ad(t1)                                            <- never converts
    val events = Seq(
      (10L, 1L, "ad", 1L), (11L, 1L, "email", 2L), (12L, 1L, "buy", 3L),
      (13L, 1L, "ad", 4L), (14L, 1L, "buy", 5L), (15L, 1L, "ad", 6L),
      (20L, 2L, "email", 1L), (21L, 2L, "buy", 2L),
      (30L, 3L, "ad", 1L)
    ).toDF("event_id", "user_id", "event_type", "uts")
    val got = Funnel.attribution(events, "buy").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    // journeys: u1#1 = {ad, email}, u1#2 = {ad}, u2#1 = {email}
    assert(got("ad") === ((2L, 2L, 2L, 1L, 1.5)),
      "ad: opens u1#1 and u1#2, closes u1#2, linear 0.5 + 1.0")
    assert(got("email") === ((2L, 2L, 1L, 2L, 1.5)),
      "email: opens u2#1, closes u1#1 and u2#1, linear 0.5 + 1.0")
    assert(!got.contains("buy"), "conversions are never touches")
    // total linear credit = number of credited journeys
    assert(got.values.map(_._5).sum === 3.0)
  }

  test("transitionMatrix: hand-computed cells; session boundaries never fabricate a pair") {
    val s = spark; import s.implicits._
    // session 1: a b a b  -> a>b ×2, b>a ×1
    // session 2: a c      -> a>c ×1   (no pair across the boundary)
    // session 3: x        -> nothing (singleton)
    val events = Seq(
      (1L, 10L, "a", 1L), (2L, 10L, "b", 2L), (3L, 10L, "a", 3L), (4L, 10L, "b", 4L),
      (5L, 20L, "a", 1L), (6L, 20L, "c", 2L),
      (7L, 30L, "x", 1L)
    ).toDF("event_id", "session_id", "event_type", "uts")
    val got = Funnel.transitionMatrix(events).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(("a", "b")) === ((2L, round4t(2.0 / 3))))
    assert(got(("a", "c")) === ((1L, round4t(1.0 / 3))))
    assert(got(("b", "a")) === ((1L, 1.0)))
    assert(got.size === 3, "singleton sessions and boundaries add no cells")
  }

  private def round4t(d: Double): Double =
    BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("associationRules: hand-computed support/confidence/lift; support cut prunes") {
    val s = spark; import s.implicits._
    // sessions (itemsets): {a,b}, {a,b}, {a,c}, {b}, {a}
    val events = Seq(
      (1L, "a"), (1L, "b"), (1L, "a"),  // duplicates inside a session collapse
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"),
      (4L, "b"), (5L, "a"))
      .toDF("session_id", "event_type")
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Funnel.associationRules(events).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    // n=5 sessions; a in 4, b in 3, c in 1; {a,b} in 2, {a,c} in 1
    assert(got(("a", "b")) === ((2L, 0.4, 0.5, r6(0.5 / 0.6))))
    assert(got(("b", "a")) === ((2L, 0.4, r6(2.0 / 3), r6((2.0 / 3) / 0.8))))
    assert(got(("a", "c")) === ((1L, 0.2, 0.25, r6(0.25 / 0.2))),
      "lift > 1: c occurs only with a")
    assert(got(("c", "a")) === ((1L, 0.2, 1.0, 1.25)))
    assert(got.size === 4, "both directions of both pairs, nothing else")
    // support cut: 0.3 keeps only the {a,b} pair
    val cut = Funnel.associationRules(events, minSupport = 0.3).collect()
    assert(cut.map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("a", "b"), ("b", "a")))
  }

  test("attribution: ts ties break on the id total order, deterministically") {
    val s = spark; import s.implicits._
    val events = Seq(
      (1L, 1L, "a", 100L), (2L, 1L, "b", 100L), (3L, 1L, "buy", 200L)
    ).toDF("event_id", "user_id", "event_type", "uts")
    val got = Funnel.attribution(events, "buy").collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(got("a") === ((1L, 0L)), "lower event_id opens the tied journey")
    assert(got("b") === ((0L, 1L)), "higher event_id closes it")
  }

  test("kaplanMeier: the textbook product-limit curve with censoring") {
    val sp = spark
    import sp.implicits._
    // bucketUs=1: ts IS the day. frontier = 5
    def span(u: Long, a: Long, b: Long) = (a to b).map(d => (u, d))
    val ev = (span(1, 0, 2) ++ span(2, 0, 2) ++ span(3, 0, 3) ++
      span(4, 0, 5) ++ span(5, 1, 5) ++ span(6, 0, 4)).toDF("u", "ts")
    val out = Funnel.kaplanMeier(ev, "u", "ts", bucketUs = 1L)
      .orderBy("t").collect()
      .map(r => (r.getAs[Long]("t"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("n_churned"), r.getAs[Long]("n_censored"),
        r.getAs[Double]("survival")))
    // t=3: 6 at risk, 2 churn -> 2/3; t=4: 4 at risk, 1 churn -> 1/2
    // t=5: 3 at risk, 1 churn 1 censored -> 1/3; t=6: 1 censored -> 1/3
    assert(out.toSeq === Seq(
      (3L, 6L, 2L, 0L, 0.666667), (4L, 4L, 1L, 0L, 0.5),
      (5L, 3L, 1L, 1L, 0.333333), (6L, 1L, 0L, 1L, 0.333333)))
  }

  test("kaplanMeier: cohort extinction pins survival to exact 0") {
    val sp = spark
    import sp.implicits._
    // both users churn at t=2 (frontier day 9 set by another cohort)
    val ev = Seq((1L, 0L), (1L, 1L), (2L, 0L), (2L, 1L),
      (9L, 7L), (9L, 9L)).toDF("u", "ts")
    val out = Funnel.kaplanMeier(ev, "u", "ts", bucketUs = 1L)
      .collect().map(r => (r.getAs[Long]("cohort"), r.getAs[Long]("t")) ->
        r.getAs[Double]("survival")).toMap
    assert(out((0L, 2L)) === 0.0, "d = n extinguishes the cohort")
    assert(out((1L, 3L)) === 1.0, "the censored-only cohort stays at 1")
  }

  test("kaplanMeier: censored users never count as churn; naive rate disagrees") {
    val sp = spark
    import sp.implicits._
    // one churner at t=2, three censored at t=3: KM S(2) = 3/4 while the
    // naive "still here at the end / total" rate is also 3/4 here, but
    // S(3) stays 3/4 (censoring is not death)
    val ev = Seq((1L, 0L), (1L, 1L),
      (2L, 0L), (2L, 2L), (3L, 0L), (3L, 2L), (4L, 0L), (4L, 2L))
      .toDF("u", "ts")
    val out = Funnel.kaplanMeier(ev, "u", "ts", bucketUs = 1L)
      .orderBy("t").collect()
    assert(out.map(_.getAs[Double]("survival")).toSeq === Seq(0.75, 0.75))
    assert(out(1).getAs[Long]("n_censored") === 3L)
  }
}
