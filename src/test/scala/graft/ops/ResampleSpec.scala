package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Time-grid resample + forward fill: hand-computed grids, gap fill,
  * slot-representative tie-break, per-key independence. Timestamps
  * are epoch-NANOS longs (the integral-column contract). */
class ResampleSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  private def ns(sec: Long): Long = sec * 1000000000L

  test("dense grid over [min,max] slots; gaps carry the last value") {
    val df = Seq(
      ("u", ns(10), 1.0),   // slot 0
      ("u", ns(130), 2.0),  // slot 120; slot 60 is a gap
      ("v", ns(70), 9.0)    // v: single slot 60, no gaps
    ).toDF("k", "ts", "value")
    val out = Resample.forwardFill(df, "k", "ts", "value", 60L)
      .orderBy("k", "slot_start")
      .as[(String, Long, Double, Long)].collect().toSeq
    assert(out == Seq(
      ("u", 0L, 1.0, 1L),
      ("u", 60L, 1.0, 0L),   // forward-filled gap
      ("u", 120L, 2.0, 1L),
      ("v", 60L, 9.0, 1L)))  // v's grid starts at ITS min slot
  }

  test("slot representative: latest second wins; same-second ties by max value") {
    val df = Seq(
      ("u", ns(5), 8.0), ("u", ns(30), 3.0),   // later sec 30 wins
      ("w", ns(40), 5.0), ("w", ns(40), 7.0)   // tie at sec 40 -> 7.0
    ).toDF("k", "ts", "value")
    val out = Resample.forwardFill(df, "k", "ts", "value", 60L)
      .as[(String, Long, Double, Long)].collect().toSeq.sortBy(_._1)
    assert(out == Seq(("u", 0L, 3.0, 2L), ("w", 0L, 7.0, 2L)))
  }

  test("random event streams match a scalar reference") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def samples[A](g: Gen[A], n: Int): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(11L + i)))

    val genEvents = for {
      nKeys <- Gen.choose(1, 3)
      n <- Gen.choose(1, 20)
      evs <- Gen.listOfN(n, for {
        k <- Gen.choose(0, nKeys - 1)
        // negative seconds included: pre-1970 events must FLOOR to
        // the earlier slot (truncating div would snap them up)
        sec <- Gen.choose(-500L, 500L)
        v <- Gen.choose(-5, 5).map(_.toDouble)
      } yield (k.toString, sec, v))
    } yield evs

    def ref(evs: Seq[(String, Long, Double)], step: Long)
        : Set[(String, Long, Double, Long)] = {
      evs.groupBy(_._1).flatMap { case (k, es) =>
        val bySlot = es.groupBy(e => Math.floorDiv(e._2, step) * step)
        val reps = bySlot.map { case (slot, xs) =>
          val rep = xs.maxBy(e => (e._2, e._3)) // latest sec, tie max v
          slot -> (rep._3, xs.size.toLong)
        }
        val lo = reps.keys.min
        val hi = reps.keys.max
        var last = 0.0
        (lo to hi by step).map { slot =>
          reps.get(slot) match {
            case Some((v, n)) => last = v; (k, slot, v, n)
            case None => (k, slot, last, 0L)
          }
        }
      }.toSet
    }

    samples(genEvents, 6).foreach { evs =>
      val df = evs.map { case (k, sec, v) => (k, ns(sec), v) }
        .toDF("k", "ts", "value")
      val got = Resample.forwardFill(df, "k", "ts", "value", 60L)
        .as[(String, Long, Double, Long)].collect().toSet
      assert(got == ref(evs, 60L), s"mismatch for $evs")
    }
  }

  test("pre-1970 nanos floor to the earlier second and slot") {
    // -5 ns is second -1 (floor), slot -60 — truncating div would
    // put it at second 0 / slot 0 and diverge from the `//` oracle
    val df = Seq(("u", -5L, 1.0), ("u", ns(70), 2.0))
      .toDF("k", "ts", "value")
    val out = Resample.forwardFill(df, "k", "ts", "value", 60L)
      .orderBy("slot_start")
      .as[(String, Long, Double, Long)].collect().toSeq
    assert(out == Seq(
      ("u", -60L, 1.0, 1L),
      ("u", 0L, 1.0, 0L),
      ("u", 60L, 2.0, 1L)))
  }

  test("native timestamp columns resolve through TimeCols") {
    val df = Seq(("u", 10L, 1.0), ("u", 200L, 4.0))
      .toDF("k", "sec", "value")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_seconds($"sec"))
    val out = Resample.forwardFill(df, "k", "ts", "value", 60L)
      .orderBy("slot_start")
      .as[(String, Long, Double, Long)].collect().toSeq
    assert(out.map(_._2) == Seq(0L, 60L, 120L, 180L))
    assert(out.map(_._3) == Seq(1.0, 1.0, 1.0, 4.0))
    assert(out.map(_._4) == Seq(1L, 0L, 0L, 1L))
    val err = intercept[IllegalArgumentException] {
      Resample.forwardFill(df, "k", "ts", "value", 0L)
    }
    assert(err.getMessage.contains("positive"))
  }
}
