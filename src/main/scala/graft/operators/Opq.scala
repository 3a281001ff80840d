package graft.operators

/** OPQ-lite rotation for product quantization: PCA + balanced
  * eigenvalue allocation (the non-parametric initialization of the OPQ
  * paper — Ge, He, Ke, Sun, "Optimized Product Quantization", CVPR 2013
  * §4; the same init FAISS's `OPQMatrix` starts from).
  *
  * PQ quantizes each subspace independently, so its loss is worst when
  * variance (or correlation) concentrates inside single subspaces. The
  * fix is one orthonormal rotation applied before the subspace split:
  * rotate into the PCA basis (decorrelates dimensions), then permute the
  * principal directions so every subspace receives a balanced share of
  * the spectrum — greedily assign each direction (descending eigenvalue)
  * to the non-full subspace with the smallest accumulated log-eigenvalue
  * sum (balancing the PRODUCT of variances, which is what the per-
  * subspace quantizer MSE tracks).
  *
  * Everything is driver-side over the bounded training sample (the same
  * sample the codebooks train on) and fully deterministic: covariance
  * accumulated in fixed order, cyclic Jacobi sweeps in fixed order,
  * ties in the eigen-sort broken by original index. The returned matrix
  * is SCALED-INTEGER (entries × 1e6, |entry| ≤ 1e6): applying it to a
  * 1e-6-quantized query is exact 64-bit integer arithmetic, so any
  * engine — Spark or the DuckDB oracle — derives bit-identical rotated
  * queries from the stored artifact (floating-point sums would differ
  * by summation order across engines). The ~1e-6 departure from exact
  * orthonormality is irrelevant: candidates are selected in rotated
  * space consistently, and the exact re-rank uses original vectors.
  */
private[operators] object Opq {

  /** Train a rotation for `m` subspaces from `sample`; returns the
    * dim×dim matrix scaled by 1e6 (row i = output dimension i). */
  def trainRotation(sample: Array[Array[Double]], m: Int): Array[Array[Long]] = {
    require(sample.nonEmpty, "OPQ rotation requires a non-empty sample")
    val dim = sample.head.length
    require(dim % m == 0, s"dim ($dim) must divide into m ($m) subspaces")
    val subDim = dim / m
    val n = sample.length

    // centered covariance, fixed accumulation order
    val mean = new Array[Double](dim)
    sample.foreach { x => var j = 0; while (j < dim) { mean(j) += x(j); j += 1 } }
    var j = 0
    while (j < dim) { mean(j) /= n; j += 1 }
    val cov = Array.ofDim[Double](dim, dim)
    sample.foreach { x =>
      var a = 0
      while (a < dim) {
        val da = x(a) - mean(a)
        var b = a
        while (b < dim) { cov(a)(b) += da * (x(b) - mean(b)); b += 1 }
        b = 0
        a += 1
      }
    }
    var a = 0
    while (a < dim) {
      var b = a
      while (b < dim) { cov(a)(b) /= n; cov(b)(a) = cov(a)(b); b += 1 }
      a += 1
    }

    val (eigVals, eigVecs) = jacobiEigen(cov) // eigenvector i = column i
    // descending eigenvalue, ties by index — a total, deterministic order
    val order = eigVals.indices.sortBy(i => (-eigVals(i), i))

    // balanced allocation: each principal direction goes to the non-full
    // subspace with the smallest log-eigenvalue sum so far
    val logSum = new Array[Double](m)
    val fill = new Array[Int](m)
    val slots = Array.ofDim[Int](m, subDim)
    order.foreach { e =>
      var best = -1
      var bestSum = Double.MaxValue
      var s = 0
      while (s < m) {
        if (fill(s) < subDim && logSum(s) < bestSum) { best = s; bestSum = logSum(s) }
        s += 1
      }
      slots(best)(fill(best)) = e
      fill(best) += 1
      logSum(best) += math.log(math.max(eigVals(e), 1e-12))
    }

    // R row (s*subDim + t) = eigenvector slots(s)(t), transposed so
    // y = R·x projects x onto the allocated principal directions
    val rot = Array.ofDim[Long](dim, dim)
    var s = 0
    while (s < m) {
      var t = 0
      while (t < subDim) {
        val e = slots(s)(t)
        val row = rot(s * subDim + t)
        var i = 0
        while (i < dim) { row(i) = math.round(eigVecs(i)(e) * 1e6); i += 1 }
        t += 1
      }
      s += 1
    }
    rot
  }

  /** Apply a scaled-integer rotation to a double vector via exact
    * fixed-point arithmetic: component and matrix entries quantized to
    * 1e-6, products ≤ 1e12 and 64-term sums ≤ 2^53 — exact in Long, so
    * the result is engine-reproducible from the stored matrix. */
  def apply(rot: Array[Array[Long]], x: Array[Double]): Array[Double] = {
    val dim = x.length
    val xq = new Array[Long](dim)
    var j = 0
    // HALF_UP (away from zero), matching SQL round(): math.round is
    // floor(x+0.5), which disagrees on negative .5 boundaries
    while (j < dim) {
      xq(j) = BigDecimal(x(j) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      j += 1
    }
    val out = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      val row = rot(i)
      var acc = 0L
      var k = 0
      while (k < dim) { acc += row(k) * xq(k); k += 1 }
      out(i) = acc / 1e12
      i += 1
    }
    out
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix —
    * deterministic sweep order, O(dim³) per sweep, ample at dim ≤ a few
    * hundred. Returns (eigenvalues, eigenvectors-as-columns). */
  private def jacobiEigen(sym: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = sym.length
    val aM = sym.map(_.clone)
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def offDiag(): Double = {
      var s = 0.0
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) { s += aM(p)(q) * aM(p)(q); q += 1 }
        p += 1
      }
      s
    }
    var sweep = 0
    while (offDiag() > 1e-18 && sweep < 64) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          if (math.abs(aM(p)(q)) > 1e-15) {
            val theta = (aM(q)(q) - aM(p)(p)) / (2 * aM(p)(q))
            val t =
              if (theta == 0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1))
            val c = 1 / math.sqrt(t * t + 1)
            val s = t * c
            var k = 0
            while (k < n) {
              val akp = aM(k)(p); val akq = aM(k)(q)
              aM(k)(p) = c * akp - s * akq
              aM(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = aM(p)(k); val aqk = aM(q)(k)
              aM(p)(k) = c * apk - s * aqk
              aM(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < n) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => aM(i)(i)), v)
  }
}
