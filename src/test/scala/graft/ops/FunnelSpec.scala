package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Funnel depth: earliest-match greedy, strict ordering, equal-ts
  * and out-of-order edges. Timestamps are epoch-nano longs. */
class FunnelSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  private def ns(s: Long) = s * 1000000000L

  test("greedy earliest-match per step, strictly after the previous") {
    val ev = Seq(
      ("a", ns(10), "view"), ("a", ns(5), "click"),  // pre-view click ignored
      ("a", ns(20), "click"), ("a", ns(15), "purchase"), // pre-click purchase ignored
      ("a", ns(30), "purchase"),
      ("b", ns(5), "click"), ("b", ns(10), "view"),  // no click after view
      ("c", ns(1), "error"),                          // depth 0
      ("d", ns(10), "view"), ("d", ns(10), "click")   // equal ts: NOT after
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.depth(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))
      .toMap
    assert(out("a") == ((3L, Some(ns(10)), Some(ns(20)), Some(ns(30)))))
    assert(out("b") == ((1L, Some(ns(10)), None, None)))
    assert(out("c") == ((0L, None, None, None)))
    assert(out("d") == ((1L, Some(ns(10)), None, None)))
  }

  test("conversion window bounds later steps to the first match") {
    val ev = Seq(
      ("a", ns(0), "view"), ("a", ns(50), "click"), ("a", ns(200), "purchase"),
      ("b", ns(0), "view"), ("b", ns(50), "click"), ("b", ns(90), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.depth(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), maxSpanSeconds = Some(100L))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("a") == 2L) // purchase at +200 s falls out of the window
    assert(out("b") == 3L) // completes inside 100 s
  }

  test("random event streams match a scalar greedy reference") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def samples[A](g: Gen[A], n: Int): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(23L + i)))
    val steps = Seq("s1", "s2", "s3")
    val genEvents = for {
      n <- Gen.choose(1, 25)
      evs <- Gen.listOfN(n, for {
        k <- Gen.choose(0, 2)
        sec <- Gen.choose(0L, 40L) // small range forces collisions
        ty <- Gen.oneOf("s1", "s2", "s3", "zz")
      } yield (k.toString, sec, ty))
    } yield evs

    def ref(evs: Seq[(String, Long, String)])
        : Map[String, (Long, Seq[Option[Long]])] =
      evs.groupBy(_._1).map { case (k, es) =>
        var prev = Long.MinValue
        val ts = steps.map { st =>
          val cands = es.filter(e => e._3 == st && e._2 * 1000000000L > prev)
          if (cands.isEmpty) { prev = Long.MaxValue; None }
          else {
            val t = cands.map(_._2 * 1000000000L).min
            prev = t
            Some(t)
          }
        }
        k -> (ts.count(_.isDefined).toLong, ts)
      }

    samples(genEvents, 6).foreach { evs =>
      val df = evs.map { case (k, sec, ty) => (k, ns(sec), ty) }
        .toDF("user_id", "ts", "event_type")
      val got = Funnel.depth(df, "user_id", "ts", "event_type", steps)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), Seq(Option(r.get(2)).map(_.asInstanceOf[Long]),
            Option(r.get(3)).map(_.asInstanceOf[Long]),
            Option(r.get(4)).map(_.asInstanceOf[Long]))))).toMap
      assert(got == ref(evs), s"mismatch for $evs")
    }
  }

  test("cap engagement: a hub key over maxEventsPerKey takes the " +
      "spill path and matches the bounded-collect result exactly") {
    // hub key "h": 40 step-typed events (far over cap=8), built so
    // the greedy chain needs events deep in the time order; "a" is a
    // normal key; "z" has no step events at all (depth 0 via keys).
    val hub = (0 until 12).flatMap(i => Seq(
      ("h", ns(100 + i), "view"), ("h", ns(200 + i), "click"))) ++
      Seq(("h", ns(50), "click"),        // pre-view click ignored
        ("h", ns(300), "purchase"), ("h", ns(299), "purchase"),
        ("h", ns(100), "purchase"),      // pre-click purchase ignored
        ("h", ns(150), "error"), ("h", ns(151), "error"))
    val ev = (hub ++ Seq(
      ("a", ns(1), "view"), ("a", ns(2), "click"), ("a", ns(3), "purchase"),
      ("z", ns(9), "error")))
      .toDF("user_id", "ts", "event_type")
    def run(cap: Int) = Funnel.depth(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), maxEventsPerKey = cap)
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    val bounded = run(100000)   // everything on the collect path
    val spilled = run(8)        // hub key forced onto the spill path
    assert(spilled == bounded)
    // and the expected chain: view@100, click@200, purchase@299
    val h = spilled.find(_.head == "h").get
    assert(h == Seq("h", 3L, ns(100), ns(200), ns(299)))
    // engagement proof: cap=8 really routes the hub key off the
    // collect path (27 step events > 8), not just the same plan twice
    assert(hub.count(e => Set("view", "click", "purchase")(e._3)) > 8)
  }

  test("cap engagement with a conversion window: spill path applies " +
      "the span anchor identically") {
    val ev = ((0 until 30).map(i => ("h", ns(10 + i), "view")) ++ Seq(
      ("h", ns(50), "click"), ("h", ns(200), "purchase"),
      ("b", ns(0), "view"), ("b", ns(50), "click"), ("b", ns(90), "purchase")))
      .toDF("user_id", "ts", "event_type")
    def run(cap: Int) = Funnel.depth(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), maxSpanSeconds = Some(100L),
        maxEventsPerKey = cap)
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    assert(run(4) == run(100000))
    // h anchors at ns(10): click@50 in-window, purchase@200 out
    assert(run(4).find(_.head == "h").get ==
      Seq("h", 2L, ns(10), ns(50), null))
  }

  test("option validation") {
    val ev = Seq(("a", ns(1), "x")).toDF("user_id", "ts", "event_type")
    assert(intercept[IllegalArgumentException] {
      Funnel.depth(ev, "user_id", "ts", "event_type", Seq.empty)
    }.getMessage.contains("non-empty"))
    assert(intercept[IllegalArgumentException] {
      Funnel.depth(ev, "user_id", "ts", "event_type", Seq("x", "x"))
    }.getMessage.contains("duplicate"))
  }
}
