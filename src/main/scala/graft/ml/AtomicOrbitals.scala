package graft.ml

/** C8: composition HOMO/LUMO band edges from neutral-atom orbital energies
  * — the engine's version of matminer's `AtomicOrbitals` featurizer
  * (reference ml_prediction.py:81; labels HOMO_energy / LUMO_energy /
  * gap_AO at ml_prediction.py:114-116, 163-164, 198-199, 235), which
  * delegates to pymatgen's rigid-band `MolecularOrbitals` model over the
  * NIST-LDA atomic-orbital table.
  *
  * Rigid-band fill: pool every atom's valence subshells (each subshell
  * contributes its FULL capacity 2/6/10/14 scaled by the element amount,
  * regardless of the neutral atom's partial filling), sort by orbital
  * energy, and pour in the composition's total electron count. The last
  * subshell the electrons reach is the HOMO; if it is exactly filled the
  * LUMO is the next subshell up, otherwise the subshell is partially
  * filled and HOMO = LUMO (metallic edge, gap_AO = 0).
  *
  * Noble-gas cores are pooled as one lumped orbital per element (capacity
  * = core electron count, energy far below any valence subshell) — they
  * are always completely filled before any valence subshell, so only
  * their capacity matters, exactly as in the per-subshell formulation.
  *
  * Amounts need not be integers: scaling a composition scales electrons
  * and capacities alike, so band edges are ratio-invariant (the analog of
  * pymatgen's get_integer_formula_and_factor normalization).
  *
  * Pure Scala: runs inside a composition-level UDF (compositions have ≤6
  * species — the pool is tens of entries, driver-free and shuffle-free).
  */
object AtomicOrbitals {

  /** Band-edge result: energies in Hartree; `character` values like "O 2p". */
  final case class BandEdges(
      homoEnergy: Double, lumoEnergy: Double, gap: Double,
      homoCharacter: String, lumoCharacter: String)

  private def capacity(l: Char): Int = l match {
    case 's' => 2
    case 'p' => 6
    case 'd' => 10
    case 'f' => 14
    case other => throw new IllegalArgumentException(s"unknown subshell $other")
  }

  /** Fill the composition's orbital pool; None if no known element. */
  def bandEdges(comp: Map[String, Double]): Option[BandEdges] = {
    val present = comp.filter { case (el, amt) =>
      amt > 0 && ElementData.bySymbol.contains(el) }
    if (present.isEmpty) return None
    // (energy, capacity, label); lumped cores first by construction
    val pool = present.toSeq.flatMap { case (el, amt) =>
      val p = ElementData.bySymbol(el)
      val core =
        if (p.coreZ > 0) Seq((-1e4 - p.z, p.coreZ * amt, s"$el core")) else Nil
      core ++ p.orbitals.map { case (name, e) =>
        (e, capacity(name.last) * amt, s"$el $name") }
    }.sortBy(t => (t._1, t._3)) // label tiebreak: deterministic across runs
    var electrons = present.map { case (el, amt) =>
      ElementData.bySymbol(el).z * amt }.sum
    val Eps = 1e-9
    var i = 0
    while (i < pool.length && electrons > Eps) {
      electrons -= pool(i)._2
      i += 1
    }
    val homoIdx = math.max(0, i - 1)
    val (homoE, _, homoLabel) = pool(homoIdx)
    if (electrons < -Eps || i >= pool.length) {
      // partially filled (or pool exhausted): metallic edge, HOMO = LUMO
      Some(BandEdges(homoE, homoE, 0.0, homoLabel, homoLabel))
    } else {
      val (lumoE, _, lumoLabel) = pool(i)
      Some(BandEdges(homoE, lumoE, lumoE - homoE, homoLabel, lumoLabel))
    }
  }
}
