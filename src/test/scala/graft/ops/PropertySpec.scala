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

  test("boilerplate removal is idempotent and reference-equal on random docs") {
    import spark.implicits._
    // small vocab + short lines → real cross-doc line collisions
    val genDoc = Gen.listOfN(4,
      Gen.listOfN(2, Gen.oneOf("aa", "bb", "cc")).map(_.mkString(" ")))
      .map(_.mkString("\n"))
    val docs = samples(genDoc, 24).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val out = Dedup.removeBoilerplateLines(df, "doc_id", "text", minDocs = 3)
      .select("doc_id", "clean_text", "n_lines_removed").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // reference computation in plain Scala
    val lineDocs = docs.flatMap { case (id, t) =>
      t.split("\n", -1).distinct.map(_ -> id)
    }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val bl = lineDocs.filter(_._2 >= 3).keySet
    docs.foreach { case (id, t) =>
      val lines = t.split("\n", -1)
      val kept = lines.filterNot(bl)
      assert(out(id) == (kept.mkString("\n"), (lines.length - kept.length).toLong),
        s"doc $id mismatch")
    }
    // idempotence: a second pass over cleaned docs removes nothing new —
    // every surviving line was in < 3 docs, and removal only shrinks
    // line-to-doc counts. (Fully-emptied docs are excluded: their ""
    // IS a line, and 3+ emptied docs legitimately make "" boilerplate.)
    val cleaned = out.toSeq.collect {
      case (id, (t, _)) if t.nonEmpty => (id, t)
    }.toDF("doc_id", "text")
    val second = Dedup.removeBoilerplateLines(cleaned, "doc_id", "text", minDocs = 3)
    assert(second.agg(coalesce(sum("n_lines_removed"), lit(0L)))
      .head().getLong(0) == 0L)
  }

  test("PQ ADC score equals dot(query, reconstructed vector) on random input") {
    import spark.implicits._
    import graft.expressions.ProductQuantizer._
    val dim = 8; val m = 4; val ksub = 3
    val genVec = Gen.listOfN(dim, Gen.choose(-4, 4).map(_.toDouble / 4))
      .map(_.toArray)
    val train = samples(genVec, 24).toArray
    val cb = Similarity.trainPqCodebooks(train, m, ksub)
    val vecs = samples(genVec, 12).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val rows = vecs.toDF("id", "v")
      .select(col("id"), col("v"),
        pq_encode(col("v"), cb).as("code"),
        pq_adc_score(pq_encode(col("v"), cb),
          pq_adc_table(col("v"), cb)).as("adc"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](1).toArray
      val code = r.getAs[Array[Byte]]("code")
      // reconstruct from codes and dot with the ORIGINAL vector
      val recon = code.zipWithIndex.flatMap { case (c, sub) => cb(sub)(c & 0xff) }
      val dot = v.zip(recon).map { case (a, b) => a * b }.sum
      assert(math.abs(r.getAs[Double]("adc") - dot) < 1e-9,
        s"ADC ${r.getAs[Double]("adc")} != reconstructed dot $dot")
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

  test("int8 quantization: dequantization error bounded by scale/2") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val genVec = for {
      d <- Gen.choose(1, 24)
      xs <- Gen.listOfN(d, Gen.choose(-100.0, 100.0))
    } yield xs.map(_.toFloat)
    val vecs = samples(genVec, 30) :+ Seq.fill(8)(3.5f) // constant edge
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
      .toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(df, "embedding")
    val err = q.select(col("vec_id"), col("q_scale"),
        zip_with(col("embedding").cast("array<double>"),
          Similarity.dequantizeInt8(col("emb_q"), col("q_min"), col("q_scale")),
          (a, b) => abs(a - b)).as("errs"))
      .select(col("q_scale"), array_max(col("errs")).as("maxerr"))
      .as[(Double, Double)].collect()
    err.foreach { case (scale, maxerr) =>
      assert(maxerr <= scale / 2 + 1e-9, s"err $maxerr > half-step ${scale / 2}")
    }
    // int8 range respected
    val bounds = q.select(explode(col("emb_q"))).as[Int].collect()
    assert(bounds.forall(v => v >= -128 && v <= 127))
  }

  test("chunking conserves tokens and reconstructs documents") {
    import spark.implicits._
    val genDoc = for {
      n <- Gen.choose(0, 60)
      toks <- Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "x9"))
    } yield toks
    val genCfg = for {
      size <- Gen.choose(1, 12)
      stride <- Gen.choose(1, size)
    } yield (size, stride)

    samples(genCfg, 5).foreach { case (size, stride) =>
      val docs = samples(genDoc, 12).zipWithIndex
        .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
      val df = docs.toDF("doc_id", "text")
      val chunks = Chunking.slidingWindow(df, "doc_id", "text", size, stride)
        .select("doc_id", "chunk_id", "chunk_text")
        .as[(Long, Long, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
      docs.foreach { case (id, text) =>
        val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
        if (toks.isEmpty) assert(!chunks.contains(id))
        else {
          val got = chunks(id)
          // expected windows from a scalar reference
          val want = (0 until toks.size by stride)
            .map(s => toks.slice(s, s + size).mkString(" "))
          assert(got == want, s"size=$size stride=$stride doc=$id")
          // stride == size ⇒ chunks partition the token stream exactly
          if (stride == size)
            assert(got.flatMap(_.split(" ")).filter(_.nonEmpty) == toks)
        }
      }
    }
  }

  test("BM25 matches a scalar reference implementation on random corpora") {
    import spark.implicits._
    val word = Gen.oneOf("cat", "dog", "fish", "bird", "cow", "ant")
    val genCorpus = for {
      nDocs <- Gen.choose(2, 8)
      docs <- Gen.listOfN(nDocs, Gen.choose(1, 6)
        .flatMap(len => Gen.listOfN(len, word)))
    } yield docs.map(_.mkString(" "))

    samples(genCorpus, 6).zipWithIndex.foreach { case (texts, _) =>
      val query = Seq("cat", "fish")
      val n = texts.length
      val dls = texts.map(_.split(" ").length.toDouble)
      val avgdl = dls.sum / n
      def tf(doc: String, t: String) =
        doc.split(" ").count(_ == t).toDouble
      val dfm = query.map(t =>
        t -> texts.count(_.split(" ").contains(t)).toDouble).toMap
      val expect = texts.zipWithIndex.flatMap { case (doc, i) =>
        val s = query.map { t =>
          val f = tf(doc, t)
          if (f == 0 || dfm(t) == 0) 0.0
          else math.log(1 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5)) *
            f * 2.2 / (f + 1.2 * (0.25 + 0.75 * dls(i) / avgdl))
        }.sum
        if (s > 0) Some(i.toLong -> s) else None
      }.toMap

      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Bm25.topK(df, "doc_id", "text",
          Seq(("q", "cat fish")), k = 100)
        .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
      assert(got.keySet == expect.keySet, s"texts=$texts")
      got.foreach { case (id, s) =>
        assert(math.abs(s - expect(id)) < 1e-9, s"doc $id texts=$texts")
      }
    }
  }

  test("fuzzy pairs: every emitted pair verifies; high-recall on 1-edit typos") {
    import spark.implicits._
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta")
    val genNames = for {
      n <- Gen.choose(2, 8)
      names <- Gen.listOfN(n, for {
        a <- word; b <- word
      } yield s"$a $b")
    } yield names.distinct

    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }

    samples(genNames, 6).foreach { names =>
      val df = names.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "name")
      val got = FuzzyJoin.selfFuzzyPairs(df, "id", "name", 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
      // soundness: every emitted distance is the true edit distance <= 2
      got.foreach { case (a, b, d) =>
        assert(a < b)
        assert(d == lev(names(a.toInt), names(b.toInt)).toLong)
        assert(d <= 2)
      }
      // recall on single-token matches: pairs sharing first or last
      // token with distance <= 2 MUST be found (the blocking promise)
      for (i <- names.indices; j <- names.indices if i < j) {
        val (x, y) = (names(i), names(j))
        val shares = x.split(" ").head == y.split(" ").head ||
          x.split(" ").last == y.split(" ").last
        if (shares && lev(x, y) <= 2)
          assert(got.exists(p => p._1 == i.toLong && p._2 == j.toLong),
            s"missed ($x, $y)")
      }
    }
  }

  test("n-gram counts conserve: sum over grams = sum of per-doc windows") {
    import spark.implicits._
    val word = Gen.oneOf("a", "b", "c")
    val genDocs = for {
      n <- Gen.choose(1, 6)
      docs <- Gen.listOfN(n, Gen.choose(0, 5)
        .flatMap(len => Gen.listOfN(len, word)))
    } yield docs.map(_.mkString(" "))

    samples(genDocs, 6).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Ngrams.topNgrams(df, "doc_id", "text", n = 2, k = 1000)
        .collect()
      val totalGot = got.map(_.getLong(2)).sum
      val expect = texts.map { t =>
        val toks = t.split(" ").filter(_.nonEmpty)
        math.max(0, toks.length - 1)
      }.sum
      assert(totalGot == expect.toLong, s"texts=$texts")
      // ranks are 1..m with counts non-increasing
      val ranks = got.map(_.getLong(0)).sorted.toSeq
      assert(ranks == (1L to got.length).toSeq)
      assert(got.sortBy(_.getLong(0)).map(_.getLong(2)).toSeq
        .sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    }
  }

  test("percentile band: kept set equals the scalar rank computation") {
    import spark.implicits._
    val genVals = for {
      n <- Gen.choose(1, 12)
      vs <- Gen.listOfN(n, Gen.choose(0, 9))
    } yield vs

    samples(genVals, 8).foreach { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toLong) }
        .toDF("id", "v")
      val (lo, hi) = (0.25, 0.75)
      val got = Percentiles.filterByBand(df, Seq.empty, "v", lo, hi)
        .collect().map(_.getLong(0)).toSet
      val n = vs.length
      val expect = vs.zipWithIndex.filter { case (v, _) =>
        val rank = vs.count(_ < v) + 1 // min rank among ties
        val pr = if (n == 1) 0.0 else (rank - 1).toDouble / (n - 1)
        pr >= lo && pr <= hi
      }.map(_._2.toLong).toSet
      assert(got == expect, s"vs=$vs")
    }
  }
}
