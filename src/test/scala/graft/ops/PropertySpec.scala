package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Property-based checks pinning the algorithmic cores to reference
  * computations on randomized inputs — edges the fixture rows can't
  * enumerate. Uses scalacheck Gens sampled with a FIXED seed (no
  * scalatestplus bridge in the offline cache), so failures reproduce.
  * Sizes are kept small: each case runs Spark jobs. */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  /** Deterministic samples from a Gen. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("clusterPairs equals brute-force union-find on random graphs") {
    import spark.implicits._
    val genGraph = for {
      n <- Gen.choose(2, 14)
      nEdges <- Gen.choose(0, 12)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(0, n - 1)
        b <- Gen.choose(0, n - 1)
      } yield (a, b))
    } yield (n, edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2).toLong, math.max(e._1, e._2).toLong))
      .distinct)

    samples(genGraph, 8).foreach { case (n, edges) =>
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = (0 until n).map(i => i.toLong -> find(i).toLong).toMap

      val nodes = (0 until n).map(_.toLong).toDF("id")
      val pairs = edges.toDF("id_a", "id_b")
      val got = Dedup.clusterPairs(nodes, "id", pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"n=$n edges=$edges")
    }
  }

  test("SortedLongJaccard equals set jaccard for random token sets") {
    import spark.implicits._
    val genSets = for {
      a <- Gen.listOf(Gen.choose(0, 30)).map(_.map("tok" + _).toSet)
      b <- Gen.listOf(Gen.choose(0, 30)).map(_.map("tok" + _).toSet)
    } yield (a, b)

    samples(genSets, 12).filter { case (a, b) => (a ++ b).nonEmpty }
      .foreach { case (a, b) =>
        val expect = (a & b).size.toDouble / (a ++ b).size
        val got = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
          .select(graft.expressions.SortedLongJaccard.sorted_long_jaccard(
            array_sort(transform(col("a"), x => xxhash64(x))),
            array_sort(transform(col("b"), x => xxhash64(x)))).as("j"))
          .collect()(0).getDouble(0)
        assert(math.abs(got - expect) < 1e-12, s"a=$a b=$b")
      }
  }

  test("exactInterpolated matches Spark percentile() incl. NULL values/keys") {
    import spark.implicits._
    // keys are Options too: a NULL key is a legal GROUP BY group, and
    // the key-restoring join must be null-safe for it to keep its
    // computed percentiles
    val genRows = Gen.listOfN(30, for {
      g <- Gen.option(Gen.choose(0, 2).map(i => s"g$i"))
      v <- Gen.option(Gen.choose(-1000, 1000).map(_.toDouble / 10))
    } yield (g, v))

    def cell(r: org.apache.spark.sql.Row, i: Int): Option[Double] =
      if (r.isNullAt(i)) None else Some(r.getDouble(i))

    samples(genRows, 6).foreach { rows =>
      val df = rows.toDF("k", "v")
      val mine = Percentiles.exactInterpolated(df, Seq("k"), "v",
          Seq("p50" -> 0.5, "p90" -> 0.9))
        .collect().map(r => r.getString(0) -> (cell(r, 1), cell(r, 2))).toMap
      val sel = Percentiles.exactInterpolatedBySelection(df, Seq("k"), "v",
          Seq("p50" -> 0.5, "p90" -> 0.9), numPartitions = 7)
        .collect().map(r => r.getString(0) -> (cell(r, 1), cell(r, 2))).toMap
      val ref = df.groupBy("k").agg(
          expr("percentile(v, 0.5)").as("p50"),
          expr("percentile(v, 0.9)").as("p90"))
        .collect().map(r => r.getString(0) -> (cell(r, 1), cell(r, 2))).toMap
      assert(mine.keySet == ref.keySet)
      assert(sel.keySet == ref.keySet)
      def close(x: Option[Double], y: Option[Double]) = (x, y) match {
        case (None, None) => true
        case (Some(a), Some(b)) => math.abs(a - b) < 1e-9
        case _ => false
      }
      mine.foreach { case (k, (m50, m90)) =>
        val (r50, r90) = ref(k)
        assert(close(m50, r50), s"p50 group $k: $m50 vs $r50 rows=$rows")
        assert(close(m90, r90), s"p90 group $k: $m90 vs $r90 rows=$rows")
        // the distributed-selection path must agree with the window path
        val (s50, s90) = sel(k)
        assert(close(s50, m50) && close(s90, m90),
          s"selection path diverges for group $k: ($s50,$s90) vs ($m50,$m90)")
      }
    }
  }

  test("probeMasks covers exactly the Hamming ball") {
    for (planes <- 1 to 6; bits <- 0 to planes) {
      val masks = Similarity.probeMasks(planes, bits)
      val expect = (0L until (1L << planes))
        .count(m => java.lang.Long.bitCount(m) <= bits)
      assert(masks.size == expect)
      assert(masks.forall(m => java.lang.Long.bitCount(m) <= bits))
      assert(masks.distinct.size == masks.size)
    }
  }
}
