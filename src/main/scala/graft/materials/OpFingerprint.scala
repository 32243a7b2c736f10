package graft.materials

/** Structure-exact reimplementation of the matminer OPSiteFingerprint
  * machinery (Zimmermann, Horton, Jain & Haranczyk 2017, "Assessing local
  * structure motifs using order parameters...") — the featurizer behind
  * the reference's "tetrahedral CN_4", "octahedral CN_6", ... descriptor
  * components (reference ml_prediction.py:186,203-204,226,240-247).
  *
  * Algorithm (matminer `OPSiteFingerprint.featurize`, defaults dr=0.1,
  * ddr=0.01, ndr=1, dop=0.001, dist_exp=2, zero_ops=True):
  *  1. collect neighbors out to the smallest integer radius ≥ 7 Å that
  *     yields ≥ 12 of them; work in relative distances d/dmin;
  *  2. for each of the three shell widths dr ∈ {0.09, 0.10, 0.11}, snap
  *     relative distances to shell midpoints, walk the distinct shells
  *     outward, and at each shell of exact size c evaluate the CN_c order
  *     parameters over the included neighbors, scaled by the distance
  *     factor (mean of 1/d_rel)^2; CN slots skipped over by a shell jump
  *     score 0 (`zero_ops`);
  *  3. vote across the three widths with the dop-binned histogram-peak
  *     rule (two agreeing widths win; three-way disagreement picks the
  *     lowest-valued bin).
  *
  * The motif order parameters themselves are the Gaussian-penalty forms
  * of the paper (pymatgen `LocalStructOrderParams`): each candidate
  * frame puts one neighbor at the pole and one on the x-axis, scores the
  * polar angles of the others against the motif's ideal angles and their
  * azimuths against the motif's rotational symmetry, and the site takes
  * the best frame. The inverse Gaussian width (`IgwTa`) is calibrated
  * against the reference's shipped StandardScaler statistics — the same
  * numeric-parity oracle the other discovered conventions use.
  */
object OpFingerprint {

  /** Motif-Gaussian parameter set.
    *
    * Inverse Gaussian widths for the polar-angle penalties, in 1/(theta/pi)
    * units (sigma = pi/IGW), per motif — matminer ships per-motif parameter
    * sets (cn_motif_op_params), and the defaults here are calibrated against
    * the shipped scaler statistics of the labeled components (the same
    * numeric-parity oracle the other discovered conventions use; the
    * octahedral family pins EXACTLY at the paper's 0.0667π width, i.e.
    * IGW = 1/0.0667 — both its stats inside 0.2%).
    *
    * Calibration is FROZEN: production featurization always uses
    * [[Calibrated]]; the calibration probe (tools.OpScan) constructs
    * variant instances and threads them through explicitly — no mutable
    * global state to corrupt a run (and no local-mode-only mutation
    * visible from mapPartitions).
    */
  final case class OpParams(
      IgwBent150: Double = 12.0,
      IgwLin: Double = 9.0,
      IgwTriPlan: Double = 7.0,
      IgwTet: Double = 20.0,
      IgwPentPlan: Double = 7.0,
      // equatorial-plane and south-pole widths (octahedral + see-saw family)
      IgwEp: Double = 14.99250374812594, // = 1/0.0667, Zimmermann 2017
      IgwSpp: Double = 14.99250374812594,
      // azimuthal Gaussian width for the see-saw rectangle (its equatorial
      // pair sits at 90 degrees, which no cos(k*phi)^2 factor can reward
      // while penalizing the square-planar 180-degree pair)
      IgwAa: Double = 11.46,
      // see-saw's own equatorial width (oct's is pinned exactly by its own
      // two scaler stats; see-saw calibrates independently)
      IgwSswEp: Double = 18.0,
      // south-pole weight (octahedral family)
      WSpp: Double = 3.0,
      // calibration switches: see-saw azimuth form (0 = 90°-centered
      // Gaussian, 1 = cos^2(2*phi) like the octahedral ring) and the
      // tet/tri azimuthal cosine exponent
      SswMode: Int = 3,
      TetExpCos: Int = 2,
      TetMode: Int = 1)

  /** The calibrated production parameter set (see OpParams scaladoc). */
  val Calibrated: OpParams = OpParams()

  // south-pole presence threshold (octahedral family)
  val MinSpp = 2.792526803190927 // 160 degrees

  val Dop = 0.001
  val DistExp = 2

  /** Per-site order-parameter values, AFTER the histogram vote. */
  final case class OpValues(
      sgl: Double, bent150: Double, lin: Double, tri: Double, tet: Double,
      ssw: Double, sqp: Double, pent: Double, oct: Double, q6: Double)

  private val NMotifs = 10

  /** All sites of a material: matminer grows an integer radius from 7 Å
    * until a site has ≥ 12 neighbors; the radius is PER SITE, so a dense
    * site keeps its 7 Å set even when a sparse one needs 9. */
  def material(lat: Geometry.Lattice, frac: Array[Array[Double]],
      p: OpParams = Calibrated): IndexedSeq[OpValues] = {
    val n = frac.length
    var opCut = 7.0
    var opNl = Geometry.neighborVectors(lat, frac, opCut)
    var counts = Array.fill(n)(0)
    opNl.foreach(nb => counts(nb.siteIdx) += 1)
    while (counts.exists(_ < 12)) {
      opCut += 1.0
      opNl = Geometry.neighborVectors(lat, frac, opCut)
      counts = Array.fill(n)(0)
      opNl.foreach(nb => counts(nb.siteIdx) += 1)
    }
    val opBySite = opNl.groupBy(_.siteIdx)
    (0 until n).map { i =>
      val all = opBySite(i)
      var r = 7.0
      while (all.count(_.dist <= r) < 12) r += 1.0
      val sel = all.filter(_.dist <= r)
      site(sel.map(_.dist).toArray, sel.map(_.vec).toArray, p)
    }
  }

  /** Compute the fingerprint for one site.
    *
    * @param dists neighbor distances (Å), any order, out to a radius with
    *              ≥ 12 neighbors (the caller handles radius growth)
    * @param vecs  matching offset vectors
    */
  def site(dists: Array[Double], vecs: Array[Array[Double]],
      p: OpParams = Calibrated): OpValues = {
    val n = dists.length
    if (n == 0) return OpValues(0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    var dmin = Double.MaxValue
    var i = 0
    while (i < n) { if (dists(i) < dmin) dmin = dists(i); i += 1 }
    val drel = new Array[Double](n)
    i = 0
    while (i < n) { drel(i) = dists(i) / dmin; i += 1 }
    val units = vecs.map(v => {
      val nm = Geometry.norm(v)
      Array(v(0) / nm, v(1) / nm, v(2) / nm)
    })

    // sgl_bd (CN_1): 1 - d1/d2 over the full neighbor list — identical at
    // every shell width, so the vote only bin-centers it
    val sorted = drel.sorted
    val sgl = if (n == 1) 1.0 else 1.0 - sorted(0) / sorted(1)

    // opvals(w)(motif): one value per shell width per motif
    val opvals = Array.ofDim[Double](3, NMotifs)
    var w = 0
    while (w < 3) {
      val dr = 0.10 + (w - 1) * 0.01
      val snap = drel.map(d => (math.floor(d / dr + 0.5) + 0.5) * dr)
      val levels = snap.distinct.sorted
      opvals(w)(0) = sgl
      var prevCn = 0
      var li = 0
      while (li < levels.length && prevCn < 12) {
        val lev = levels(li)
        val included = (0 until n).filter(snap(_) <= lev + 1e-12)
        val cn = included.size
        if (cn >= 2 && cn <= 12 && cn > prevCn) {
          var invSum = 0.0
          included.foreach(j => invSum += 1.0 / drel(j))
          val dFac = math.pow(invSum / cn, DistExp)
          val vs = included.map(units(_)).toArray
          cn match {
            case 2 =>
              opvals(w)(1) = dFac * geomOp(Bent150, vs, p)
              opvals(w)(2) = dFac * geomOp(Lin, vs, p)
            case 3 => opvals(w)(3) = dFac * geomOp(TriPlan, vs, p)
            case 4 =>
              opvals(w)(4) = dFac * geomOp(Tet, vs, p)
              opvals(w)(5) = dFac * geomOp(SeeSaw, vs, p)
              // "square co-planar" shares the octahedral branch family
              // (south-pole reward + 90°-spaced equatorial ring)
              opvals(w)(6) = dFac * geomOp(Oct, vs, p)
            case 5 => opvals(w)(7) = dFac * geomOp(PentPlan, vs, p)
            case 6 => opvals(w)(8) = dFac * geomOp(Oct, vs, p)
            case 12 => opvals(w)(9) = dFac * Geometry.q6Order(vs.toIndexedSeq, 12)
            case _ => ()
          }
        }
        if (cn > prevCn) prevCn = cn
        li += 1
      }
      w += 1
    }

    OpValues(
      vote(opvals, 0), vote(opvals, 1), vote(opvals, 2), vote(opvals, 3),
      vote(opvals, 4), vote(opvals, 5), vote(opvals, 6), vote(opvals, 7),
      vote(opvals, 8), vote(opvals, 9))
  }

  /** The dop-binned histogram-peak vote across the three shell widths
    * (matminer's exact binning: int() truncation, edge clamps to [0,1],
    * adjacent max-count bins merged, ties to the lowest value). */
  private[materials] def vote(opvals: Array[Array[Double]], m: Int): Double = {
    val v = Array(opvals(0)(m), opvals(1)(m), opvals(2)(m))
    val idop = 1.0 / Dop
    var minval = (v.min * idop - 1.5).toInt.toDouble * Dop
    if (minval < 0.0) minval = 0.0
    if (minval > 1.0) minval = 1.0
    var maxval = (v.max * idop + 1.5).toInt.toDouble * Dop
    if (maxval < 0.0) maxval = 0.0
    if (maxval > 1.0) maxval = 1.0
    if (minval == maxval) { minval -= Dop; maxval += Dop }
    val nbins = ((maxval - minval) * idop).toInt
    val hist = new Array[Int](nbins)
    val width = (maxval - minval) / nbins
    v.foreach { x =>
      if (x >= minval && x <= maxval) {
        val b = math.min(((x - minval) / width).toInt, nbins - 1)
        hist(b) += 1
      }
    }
    val maxHist = hist.max
    val peaks = (0 until nbins).filter(hist(_) == maxHist)
      .map(b => (b, minval + (b + 0.5) * width))
    // merge adjacent equal-count peaks (two op values straddling an edge)
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    var i = 0
    while (i < peaks.length) {
      if (i < peaks.length - 1 && peaks(i + 1)._1 == peaks(i)._1 + 1) {
        merged += ((hist(peaks(i)._1) + hist(peaks(i + 1)._1),
          0.5 * (peaks(i)._2 + peaks(i + 1)._2)))
        i += 1
      } else merged += ((hist(peaks(i)._1), peaks(i)._2))
      i += 1
    }
    merged.maxBy(_._1)._2 match { case x => x }
  }

  // ---- motif order parameters (Gaussian-penalty frame scores) ----------

  sealed trait Motif
  case object Lin extends Motif
  case object Bent150 extends Motif
  case object TriPlan extends Motif
  case object Tet extends Motif
  case object SeeSaw extends Motif
  case object PentPlan extends Motif
  case object Oct extends Motif

  private def clamp(x: Double): Double = math.max(-1.0, math.min(1.0, x))
  private def dot(a: Array[Double], b: Array[Double]): Double =
    a(0) * b(0) + a(1) * b(1) + a(2) * b(2)
  private def gauss(igw: Double, x: Double): Double =
    math.exp(-0.5 * igw * igw * x * x)

  /** Best frame score for a motif over unit neighbor vectors. Each frame
    * (j pole, k x-axis) accumulates penalty-weighted angle terms; the
    * site takes the maximum frame. */
  def geomOp(motif: Motif, units: Array[Array[Double]],
      p: OpParams = Calibrated): Double = {
    import p._
    val n = units.length
    val ipi = 1.0 / math.Pi
    var best = 0.0
    var j = 0
    while (j < n) {
      val z = units(j)
      var k = 0
      while (k < n) {
        if (k != j) {
          val rk = units(k)
          val cosK = clamp(dot(z, rk))
          val thetak = math.acos(cosK)
          // body-fixed x-axis: k's direction orthogonalized against the pole
          val xr = Array(rk(0) - cosK * z(0), rk(1) - cosK * z(1), rk(2) - cosK * z(2))
          val xn = Geometry.norm(xr)
          val flagX = xn < 1e-8
          if (!flagX) { xr(0) /= xn; xr(1) /= xn; xr(2) /= xn }
          var qsp = 0.0
          var nrm = 0.0
          var gk = 0.0 // saved pole-angle Gaussian (tri/tet/pent families)
          motif match {
            case Lin =>
              qsp += gauss(IgwLin, thetak * ipi - 1.0); nrm += 1
            case Bent150 =>
              qsp += gauss(IgwBent150, thetak * ipi - 5.0 / 6.0); nrm += 1
            case TriPlan => gk = gauss(IgwTriPlan, thetak * ipi - 2.0 / 3.0)
            case Tet => gk = gauss(IgwTet, thetak * ipi - 0.6081734479693927)
            case PentPlan =>
              val ta = if (thetak <= 0.4 * math.Pi) 0.4 else 0.8
              gk = gauss(IgwPentPlan, thetak * ipi - ta)
            case Oct => () // frames need an equatorial x-axis: the south
              // pole is rewarded in the m-loop; a k at >= MinSpp leaves
              // the frame empty (a bare antipodal pair must NOT score 1)
            case SeeSaw =>
              // mode 3: like oct, the x-axis neighbor's own angle is not
              // scored — only m-loop terms count
              if (SswMode != 3 && thetak < MinSpp) {
                qsp += gauss(IgwSswEp, thetak * ipi - 0.5); nrm += 1
              }
          }

          var m = 0
          while (m < n) {
            if (m != j && m != k && !flagX) {
              val rm = units(m)
              val cosM = clamp(dot(z, rm))
              val thetam = math.acos(cosM)
              val x2 = Array(rm(0) - cosM * z(0), rm(1) - cosM * z(1), rm(2) - cosM * z(2))
              val x2n = Geometry.norm(x2)
              if (x2n >= 1e-8) {
                val phi = math.acos(clamp(dot(xr, x2) / x2n))
                motif match {
                  case TriPlan =>
                    val c = math.cos(1.0 * phi)
                    qsp += gk * gauss(IgwTriPlan, thetam * ipi - 2.0 / 3.0) * c * c
                    nrm += 1
                  case Tet =>
                    val c = math.pow(math.abs(math.cos(1.5 * phi)), TetExpCos)
                    val pole = if (TetMode == 1) 1.0 else gk
                    qsp += pole * gauss(IgwTet, thetam * ipi - 0.6081734479693927) * c
                    nrm += 1
                  case PentPlan =>
                    val ta = if (thetam <= 0.4 * math.Pi) 0.4 else 0.8
                    val c = math.cos(phi)
                    qsp += gk * gauss(IgwPentPlan, thetam * ipi - ta) * c * c
                    nrm += 1
                  case Oct =>
                    if (thetak < MinSpp) {
                      if (thetam >= MinSpp) {
                        qsp += WSpp * gauss(IgwSpp, thetam * ipi - 1.0); nrm += WSpp
                      } else {
                        val c = math.cos(2.0 * phi)
                        qsp += c * c * gauss(IgwEp, thetam * ipi - 0.5); nrm += 1
                      }
                    }
                  case SeeSaw =>
                    if (thetak < MinSpp) {
                      if (thetam >= MinSpp) {
                        qsp += WSpp * gauss(IgwSpp, thetam * ipi - 1.0)
                        nrm += WSpp
                      } else {
                        // azimuthal term for the rectangular equatorial
                        // pair at 90 degrees
                        val az = SswMode match {
                          case 0 => gauss(IgwAa, phi * ipi - 0.5)
                          case 2 => val c = math.cos(2.0 * phi); c * c * c * c
                          case _ => val c = math.cos(2.0 * phi); c * c
                        }
                        qsp += az * gauss(IgwSswEp, thetam * ipi - 0.5)
                        nrm += 1
                      }
                    }
                  case _ => ()
                }
              }
            }
            m += 1
          }
          if (nrm > 1e-12) {
            val v = qsp / nrm
            if (v > best) best = v
          }
        }
        k += 1
      }
      j += 1
    }
    best
  }
}
