package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.expressions._

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL FUNCTIONS, so they are callable from
  * `spark.sql(...)` — including the config-driven `sql` transform
  * plugin — not only from the Scala Column API:
  *
  *   SELECT simhash64(split(text, ' ')) FROM docs
  *   SELECT sorted_long_jaccard(a, b) ...
  *
  * Install via `.withExtensions(new GraftExtensions)` (done by
  * [[graft.core.Session]]) or externally with
  * `--conf spark.sql.extensions=graft.GraftExtensions` — the standard
  * mechanism for shipping engine extensions to an existing cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be an integer literal, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of an array<string>"),
      (args: Seq[Expression]) => SimHash64(args.head)))

    ext.injectFunction((FunctionIdentifier("minhash_signature64"),
      info("minhash_signature64",
        "minhash_signature64(text, shingle_k, num_hashes) - MinHash signature array<long>"),
      (args: Seq[Expression]) => MinHashSignature64(args.head,
        intArg(args(1), "minhash_signature64", 1),
        intArg(args(2), "minhash_signature64", 2))))

    ext.injectFunction((FunctionIdentifier("char_shingles"),
      info("char_shingles",
        "char_shingles(text, k) - distinct character k-shingles"),
      (args: Seq[Expression]) => CharShingles(args.head,
        intArg(args(1), "char_shingles", 1))))

    ext.injectFunction((FunctionIdentifier("sorted_long_jaccard"),
      info("sorted_long_jaccard",
        "sorted_long_jaccard(a, b) - exact Jaccard of two SORTED array<long>"),
      (args: Seq[Expression]) => SortedLongJaccard(args.head, args(1))))

    ext.injectFunction((FunctionIdentifier("lane_agreement"),
      info("lane_agreement",
        "lane_agreement(sig_a, sig_b) - fraction of agreeing minhash lanes"),
      (args: Seq[Expression]) => LaneAgreement(args.head, args(1))))

    ext.injectFunction((FunctionIdentifier("hyperplane_signature64"),
      info("hyperplane_signature64",
        "hyperplane_signature64(vec, planes) - random-hyperplane LSH bucket of array<double>"),
      (args: Seq[Expression]) => HyperplaneSignature64(args.head,
        intArg(args(1), "hyperplane_signature64", 1))))

    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two array<double>"),
      (args: Seq[Expression]) => VectorKernels.DotProductDouble(args.head, args(1))))

    ext.injectFunction((FunctionIdentifier("vec_l2_normalize"),
      info("vec_l2_normalize",
        "vec_l2_normalize(a) - L2-normalized copy of an array<double>"),
      (args: Seq[Expression]) => VectorKernels.L2NormalizeDouble(args.head)))
  }
}
