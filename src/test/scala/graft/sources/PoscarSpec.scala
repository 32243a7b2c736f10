package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class PoscarSpec extends SparkSpec {

  val poscar: String =
    """Quartz SiO2
      |1.0
      |  4.916  0.000  0.000
      | -2.458  4.257  0.000
      |  0.000  0.000  5.405
      |Si O
      |3 6
      |Direct
      | 0.470 0.000 0.000
      | 0.000 0.470 0.667
      | 0.530 0.530 0.333
      | 0.413 0.266 0.119
      | 0.734 0.147 0.786
      | 0.853 0.587 0.452
      | 0.266 0.413 0.881
      | 0.147 0.734 0.214
      | 0.587 0.853 0.548
      |""".stripMargin

  test("poscar: parses lattice, species expansion, direct coords") {
    val p = Poscar.parse(poscar)
    assert(p.nsites == 9)
    assert(p.siteElements.toSeq == Seq.fill(3)("Si") ++ Seq.fill(6)("O"))
    assert(math.abs(p.lattice(0)(0) - 4.916) < 1e-12)
    assert(!p.cartesian)
    assert(math.abs(p.coords(3)(1) - 0.266) < 1e-12)
  }

  test("poscar: scale factor multiplies the lattice") {
    val scaled = poscar.replace("1.0\n", "2.0\n")
    val p = Poscar.parse(scaled)
    assert(math.abs(p.lattice(0)(0) - 9.832) < 1e-12)
  }

  test("poscar: cartesian coords are converted to fractional on read") {
    val dir = java.nio.file.Files.createTempDirectory("poscar").toString
    // cubic cell, one atom at cartesian (2, 2, 2) in a=4 box → frac (.5,.5,.5)
    val cart =
      """cubic
        |1.0
        |4.0 0.0 0.0
        |0.0 4.0 0.0
        |0.0 0.0 4.0
        |Mg
        |1
        |Cartesian
        |2.0 2.0 2.0
        |""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/POSCAR1"), cart)
    val df = Poscar.read(spark, dir)
    val row = df.head()
    val abc = row.getSeq[Seq[Double]](row.fieldIndex("abc"))
    assert(abc.head.forall(v => math.abs(v - 0.5) < 1e-12))
    assert(row.getSeq[String](row.fieldIndex("elems")) == Seq("Mg"))
  }

  test("poscar: cartesian coords are multiplied by the scale factor") {
    // a=4 box under scale 2.0 → 8 Å box; cartesian (2,2,2) also scales
    // to (4,4,4) → frac (.5,.5,.5). Unscaled coords would give .25.
    val cart =
      """cubic
        |2.0
        |4.0 0.0 0.0
        |0.0 4.0 0.0
        |0.0 0.0 4.0
        |Mg
        |1
        |Cartesian
        |2.0 2.0 2.0
        |""".stripMargin
    val p = Poscar.parse(cart)
    assert(math.abs(p.lattice(0)(0) - 8.0) < 1e-12)
    assert(math.abs(p.coords(0)(0) - 4.0) < 1e-12)
    val frac = Poscar.toFractional(p)
    assert(frac(0).forall(v => math.abs(v - 0.5) < 1e-12))
  }

  test("poscar: negative scale is a target cell volume") {
    // |det| of the raw lattice is 64 Å³; scale -512 → factor (512/64)^(1/3)=2
    val cart =
      """cubic
        |-512.0
        |4.0 0.0 0.0
        |0.0 4.0 0.0
        |0.0 0.0 4.0
        |Mg
        |1
        |Direct
        |0.5 0.5 0.5
        |""".stripMargin
    val p = Poscar.parse(cart)
    assert(math.abs(p.lattice(0)(0) - 8.0) < 1e-9)
  }

  test("poscar: selective dynamics line is skipped") {
    val sel = poscar.replace("Direct\n", "Selective dynamics\nDirect\n")
    assert(Poscar.parse(sel).nsites == 9)
  }
}
