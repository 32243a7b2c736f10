package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Closed-form eigensolver for 3×3 tensors — the B1 derived-quantity
  * operator (SURVEY.md §2.B; reference README.md:28,31: the stored
  * `epsilon_*_eig` arrays equal eigvals of `epsilon_*`, i.e. *general*
  * eigenvalues of the raw — possibly slightly asymmetric — tensor).
  *
  * Solves the characteristic cubic of the trace-shifted matrix
  * B = M − (tr/3)·I, whose polynomial is the depressed y³ + a·y + b with
  * a = Σ principal minors of B and b = −det(B). Computing a, b from B's
  * entries (magnitude ≈ eigenvalue spread, not eigenvalue magnitude)
  * avoids the tr³-scale cancellation that loses ~1e-3 absolute on large
  * ionic tensors. Three real roots come from the trigonometric method;
  * a tiny asymmetry that pushes the discriminant positive yields one real
  * root + a conjugate pair whose real part (−y₁/2) is taken, matching
  * numpy's eigvals-then-real-part convention used to build the corpus.
  * Reproduces the stored eigenvalues to ≤1e-4 on every record, degenerate
  * (cubic/tetragonal) spectra included — verified in MaterialsSpec.
  *
  * Exposed as a scalar UDF (breaks codegen — acceptable: one narrow
  * projection per row, embarrassingly parallel, zero shuffle at any scale).
  */
object Eig3x3 {

  /** Real parts of the eigenvalues of a 3×3 matrix, ascending. */
  def eigenvalues(m: Array[Array[Double]]): Array[Double] = {
    val shift = (m(0)(0) + m(1)(1) + m(2)(2)) / 3
    val b00 = m(0)(0) - shift; val b11 = m(1)(1) - shift; val b22 = m(2)(2) - shift
    val b01 = m(0)(1); val b10 = m(1)(0)
    val b02 = m(0)(2); val b20 = m(2)(0)
    val b12 = m(1)(2); val b21 = m(2)(1)

    // depressed cubic y^3 + a y + b for the traceless shifted matrix
    val a = b00 * b11 - b01 * b10 + b00 * b22 - b02 * b20 + b11 * b22 - b12 * b21
    val det = b00 * (b11 * b22 - b12 * b21) -
      b01 * (b10 * b22 - b12 * b20) +
      b02 * (b10 * b21 - b11 * b20)
    val b = -det
    val disc = b * b / 4 + a * a * a / 27

    val roots: Array[Double] =
      if (a == 0.0 && b == 0.0) Array(0.0, 0.0, 0.0)
      else if (disc <= 0) {
        // three real roots (every symmetric matrix lands here)
        val r = math.sqrt(-a / 3)
        val arg = math.max(-1.0, math.min(1.0, 3 * b / (2 * a) * math.sqrt(-3 / a)))
        val theta = math.acos(arg)
        Array.tabulate(3)(k => 2 * r * math.cos((theta - 2 * math.Pi * k) / 3))
      } else {
        // one real root + conjugate pair: take real parts (tiny asymmetry)
        val sd = math.sqrt(disc)
        val u = math.cbrt(-b / 2 + sd)
        val v = math.cbrt(-b / 2 - sd)
        val y1 = u + v
        Array(y1, -y1 / 2, -y1 / 2) // pair real part; Im = ±(u−v)√3/2, dropped
      }

    val out = roots.map(_ + shift)
    java.util.Arrays.sort(out)
    out
  }

  /** Column form: 3×3 array-of-arrays → ascending eigenvalue array. */
  val eig3x3 = udf((m: Seq[Seq[Double]]) =>
    if (m == null) null
    else eigenvalues(m.map(_.toArray).toArray))

  def apply(tensor: Column): Column = eig3x3(tensor)
}
