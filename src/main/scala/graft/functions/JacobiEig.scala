package graft.functions

/** Symmetric eigendecomposition by cyclic Jacobi rotations — driver-side
  * math for small (≤ a few hundred dims) matrices such as embedding
  * second-moment matrices. Classic algorithm (Golub & Van Loan §8.5):
  * repeatedly zero the largest-magnitude off-diagonal entry with a Givens
  * rotation until the off-diagonal Frobenius mass is negligible. The
  * accumulated rotations form an orthonormal eigenbasis.
  *
  * This is deliberately NOT distributed: the input is a d×d moment matrix
  * (d = embedding dim, 64 here) that was itself produced by a distributed
  * aggregation — the O(d³) eigensolve is microseconds and belongs on the
  * driver, exactly like the KMeans centroid state it complements.
  */
object JacobiEig {

  /** Eigendecomposition of symmetric `a` (not mutated).
    * Returns (eigenvalues, eigenvectors) where eigenvectors(i) is the
    * unit eigenvector for eigenvalues(i), NOT sorted. */
  def decompose(a: Array[Array[Double]], maxSweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val d = a.length
    val m = Array.tabulate(d, d)((i, j) => a(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(m)
    val tol = 1e-12 * math.max(1.0, frobenius(m))
    while (off > tol && sweep < maxSweeps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = m(p)(q)
          if (math.abs(apq) > tol / (d * d)) {
            // Givens rotation zeroing m(p)(q): standard stable formulas
            val theta = (m(q)(q) - m(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val tEff = if (theta == 0.0) 1.0 else t
            val c = 1.0 / math.sqrt(tEff * tEff + 1.0)
            val s = tEff * c
            var k = 0
            while (k < d) {
              val mkp = m(k)(p); val mkq = m(k)(q)
              m(k)(p) = c * mkp - s * mkq
              m(k)(q) = s * mkp + c * mkq
              k += 1
            }
            k = 0
            while (k < d) {
              val mpk = m(p)(k); val mqk = m(q)(k)
              m(p)(k) = c * mpk - s * mqk
              m(q)(k) = s * mpk + c * mqk
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
      off = offDiag(m)
      sweep += 1
    }
    val evals = Array.tabulate(d)(i => m(i)(i))
    // columns of v are the eigenvectors; return them as rows
    val evecs = Array.tabulate(d)(i => Array.tabulate(d)(r => v(r)(i)))
    (evals, evecs)
  }

  private def offDiag(m: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < m.length) {
      var j = i + 1
      while (j < m.length) { s += m(i)(j) * m(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  private def frobenius(m: Array[Array[Double]]): Double = {
    var s = 0.0
    for (r <- m; x <- r) s += x * x
    math.sqrt(s)
  }
}
