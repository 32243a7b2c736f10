package graft.ml

import graft.SparkSpec

/** Gates on the scaler-parity drift report: the report must cover every
  * scaler component of all four models, map the vast majority of labels
  * to engine features, and the unambiguous physical quantities (atomic
  * mass / electronegativity means over the same 1,266 records) must agree
  * with the shipped scaler means closely — those element tables are
  * standard published values on both sides, so drift there means a bug,
  * not a convention difference. */
class ScalerDriftSpec extends SparkSpec {

  test("scaler drift report: full coverage, high mapping rate, tight parity on unambiguous features") {
    val rep = ScalerDrift.report(spark).collect()
    val byModel = rep.groupBy(_.getString(0))
    // one row per scaler component
    assert(byModel("el_comp").length == 34)
    assert(byModel("ion_comp").length == 42)
    assert(byModel("el_comp_st").length == 29)
    assert(byModel("ion_comp_st").length == 45)
    // every reference label has an engine counterpart
    val mapped = rep.count(_.getString(3) != null)
    assert(mapped == rep.length, s"only $mapped/${rep.length} labels mapped")
    // unambiguous features: mean atomic mass / EN / row agree within 2%
    val tight = Set("f_mass_wmean", "f_en_wmean", "f_en_min", "f_row_wmean")
    rep.filter(r => r.getString(3) != null && tight(r.getString(3))).foreach { r =>
      val drift = r.getDouble(r.fieldIndex("mean_drift_rel"))
      assert(drift < 0.02,
        s"${r.getString(0)}/${r.getString(2)} (${r.getString(3)}): mean drift $drift")
    }
    // every mapped row carries finite engine stats
    rep.filter(_.getString(3) != null).foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("eng_mean")) && !r.isNullAt(r.fieldIndex("eng_std")),
        s"${r.getString(2)}: missing engine stats")
    }
    // overall parity floor: round 4 measured 144/150 components within 5%
    // on BOTH mean and scale (VIRE radii + Miracle table + anion states) —
    // lock that in; a table regression must fail loudly
    val tight5 = rep.count { r =>
      !r.isNullAt(r.fieldIndex("mean_drift_rel")) &&
        r.getDouble(r.fieldIndex("mean_drift_rel")) <= 0.05 &&
        r.getDouble(r.fieldIndex("scale_drift_rel")) <= 0.05
    }
    assert(tight5 >= 144, s"only $tight5/150 scaler components within 5%")
  }
}
