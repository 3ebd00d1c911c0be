package graft.ops

/** Driver-side Lloyd's k-means over a bounded training sample — the
  * FAISS-style IVF training shape: clustering quality only needs a
  * few thousand representative vectors, so train locally on a sample
  * and broadcast the centroid matrix; the cluster never runs
  * per-iteration jobs. Deterministic: seeded k-means++ init.
  */
object KMeansLite {

  def fit(sample: Array[Array[Double]], k: Int, iters: Int = 10,
          seed: Long = 42L): Array[Array[Double]] = {
    require(sample.nonEmpty, "empty k-means training sample")
    val n = sample.length
    val dim = sample.head.length
    val kk = math.min(k, n)
    val rnd = new scala.util.Random(seed)

    def dist2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }

    // k-means++ seeding
    val centroids = new Array[Array[Double]](kk)
    centroids(0) = sample(rnd.nextInt(n)).clone()
    val minD = Array.fill(n)(Double.MaxValue)
    var c = 1
    while (c < kk) {
      var i = 0
      while (i < n) {
        val d = dist2(sample(i), centroids(c - 1))
        if (d < minD(i)) minD(i) = d
        i += 1
      }
      val total = minD.sum
      var pick = rnd.nextDouble() * total
      var j = 0
      while (j < n - 1 && pick > minD(j)) { pick -= minD(j); j += 1 }
      centroids(c) = sample(j).clone()
      c += 1
    }

    // Lloyd iterations
    val assign = new Array[Int](n)
    var it = 0
    while (it < iters) {
      var i = 0
      while (i < n) {
        var best = 0; var bestD = Double.MaxValue
        var cc = 0
        while (cc < kk) {
          val d = dist2(sample(i), centroids(cc))
          if (d < bestD) { bestD = d; best = cc }
          cc += 1
        }
        assign(i) = best
        i += 1
      }
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      i = 0
      while (i < n) {
        val a = assign(i)
        counts(a) += 1
        var d = 0
        while (d < dim) { sums(a)(d) += sample(i)(d); d += 1 }
        i += 1
      }
      var cc = 0
      while (cc < kk) {
        if (counts(cc) > 0) {
          var d = 0
          while (d < dim) { centroids(cc)(d) = sums(cc)(d) / counts(cc); d += 1 }
        }
        cc += 1
      }
      it += 1
    }
    centroids
  }
}
