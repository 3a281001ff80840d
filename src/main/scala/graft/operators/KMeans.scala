package graft.operators

/** Deterministic driver-side Lloyd k-means over a bounded training
  * sample.
  *
  * Quantizer training is the one index-build step that must NOT scan the
  * full corpus at 100 TB: FAISS trains its coarse quantizers and PQ
  * codebooks single-node on a bounded sample and only the ENCODE pass is
  * distributed. This is that trainer: callers collect a deterministic
  * sample ([[Sampling.exactSample]] — md5-coordinate order, so the same
  * rows arrive in the same order on every run and every JVM) and get
  * centroids whose doubles are bit-identical across runs — sequential
  * accumulation order, strict `<` argmin (ties keep the lower index),
  * empty clusters keep their previous centroid.
  *
  * Replacing the former distributed Lloyd loop (one argmin shuffle + one
  * means shuffle + a driver collect PER ROUND, and m× that for PQ's
  * subspaces) with one sample collect + in-memory iteration also removes
  * the dominant cold-build cost measured at sf0.1 (x_sim_ivfpq cold
  * ≈21 s was almost entirely training jobs over a 2000-row corpus).
  */
private[operators] object KMeans {

  /** `iters` Lloyd rounds over `points`; initial centroids are the first
    * `k` points (callers pass sample-coordinate order, which is as
    * arbitrary-but-deterministic as the previous hash-smallest init).
    * Returns `min(k, points.length)` centroids. */
  def lloyd(points: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    require(points.nonEmpty, "k-means requires a non-empty training sample")
    val dim = points.head.length
    var cents: Array[Array[Double]] = points.take(k).map(_.clone)
    for (_ <- 1 to iters) {
      val sums = Array.ofDim[Double](cents.length, dim)
      val counts = new Array[Long](cents.length)
      var i = 0
      while (i < points.length) {
        val p = points(i)
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < cents.length) {
          val cv = cents(c)
          var d = 0.0
          var j = 0
          while (j < dim) { val t = p(j) - cv(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        val s = sums(best)
        var j = 0
        while (j < dim) { s(j) += p(j); j += 1 }
        counts(best) += 1
        i += 1
      }
      cents = Array.tabulate(cents.length) { c =>
        if (counts(c) == 0) cents(c)
        else {
          val v = new Array[Double](dim)
          var j = 0
          while (j < dim) { v(j) = sums(c)(j) / counts(c); j += 1 }
          v
        }
      }
    }
    cents
  }
}
