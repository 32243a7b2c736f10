package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** VASP POSCAR reader — the A3 file-scan operator (SURVEY.md §2.A;
  * reference main.py:30-31 `Structure.from_file`).
  *
  * Parses the POSCAR format (VASP 5.x, with the element-symbols line):
  * comment / scale / 3 lattice vectors / symbols / counts /
  * [Selective dynamics] / Direct|Cartesian / coordinates.
  *
  * Exposed two ways: a driver-side parse for single CLI inputs, and a
  * distributed `read` built on wholeTextFiles for directories of POSCARs
  * (each file is one row — the same small-file story as the JSON corpus:
  * compact to parquet after landing).
  */
object Poscar {

  final case class PoscarStructure(
      comment: String, lattice: Array[Array[Double]],
      elements: Array[String], counts: Array[Int],
      cartesian: Boolean, coords: Array[Array[Double]]) {
    /** Element of each site, expanded from the counts line. */
    def siteElements: Array[String] =
      elements.zip(counts).flatMap { case (e, n) => Array.fill(n)(e) }
    def nsites: Int = counts.sum
  }

  def parse(text: String): PoscarStructure = {
    val lines = text.linesIterator.map(_.trim).filter(_.nonEmpty).toArray
    require(lines.length >= 8, "POSCAR too short")
    val comment = lines(0)
    val rawScale = lines(1).toDouble
    val lat0 = (2 to 4).map(i =>
      lines(i).split("\\s+").take(3).map(_.toDouble)).toArray
    // VASP semantics: a negative "scale" is a target cell VOLUME — the
    // factor is (|scale| / det)^(1/3) of the unscaled lattice
    val scale =
      if (rawScale >= 0) rawScale
      else math.cbrt(-rawScale / math.abs(graft.materials.Geometry.det3(lat0)))
    val lattice = lat0.map(_.map(_ * scale))
    val elements = lines(5).split("\\s+")
    require(elements.forall(e => e.nonEmpty && e.head.isLetter),
      "POSCAR without element-symbols line (VASP 4 format) is not supported")
    val counts = lines(6).split("\\s+").map(_.toInt)
    var idx = 7
    if (lines(idx).toLowerCase.startsWith("s")) idx += 1 // Selective dynamics
    val cartesian = lines(idx).toLowerCase.startsWith("c") ||
      lines(idx).toLowerCase.startsWith("k")
    idx += 1
    val n = counts.sum
    // Cartesian coordinates are in the same scaled frame as the lattice —
    // multiply by the universal scale factor (Direct coords are unitless)
    val coords = (idx until idx + n).map { i =>
      val c = lines(i).split("\\s+").take(3).map(_.toDouble)
      if (cartesian) c.map(_ * scale) else c
    }.toArray
    PoscarStructure(comment, lattice, elements, counts, cartesian, coords)
  }

  /** Fractional coordinates of a parsed POSCAR (converts cartesian). */
  def toFractional(p: PoscarStructure): Array[Array[Double]] =
    if (!p.cartesian) p.coords
    else {
      val inv = invert3(p.lattice)
      p.coords.map(c => Array(
        c(0) * inv(0)(0) + c(1) * inv(1)(0) + c(2) * inv(2)(0),
        c(0) * inv(0)(1) + c(1) * inv(1)(1) + c(2) * inv(2)(1),
        c(0) * inv(0)(2) + c(1) * inv(1)(2) + c(2) * inv(2)(2)))
    }

  /** Distributed scan of a directory of POSCAR files → one structured row
    * per file: (path, comment, lattice, elements[], counts[], frac[]). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.wholeTextFiles(dir)
      .map { case (path, text) =>
        val p = parse(text)
        // normalize to fractional coords for a uniform downstream schema
        val frac = toFractional(p)
        (path, p.comment, p.lattice.map(_.toSeq).toSeq, p.siteElements.toSeq,
          frac.map(_.toSeq).toSeq)
      }
      .toDF("path", "comment", "matrix", "elems", "abc")
  }

  /** Inverse of a 3×3 (row-vector lattice) matrix. */
  private def invert3(m: Array[Array[Double]]): Array[Array[Double]] = {
    val d = graft.materials.Geometry.det3(m)
    require(math.abs(d) > 1e-300, "singular lattice")
    val c = Array.ofDim[Double](3, 3)
    for (i <- 0 until 3; j <- 0 until 3) {
      val (a, b) = ((i + 1) % 3, (i + 2) % 3)
      val (x, y) = ((j + 1) % 3, (j + 2) % 3)
      // cofactor transpose / det
      c(j)(i) = (m(a)(x) * m(b)(y) - m(a)(y) * m(b)(x)) / d
    }
    c
  }
}
