package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.materials.Materials

/** comp_st model verification (SURVEY.md §6): structural features must
  * improve on the compositional model, matching the reference's error
  * ordering comp_st < comp for both dielectric types. */
class CompStSpec extends SparkSpec {

  test("structure featurizer: full corpus, physically-sane outputs") {
    val mats = Materials.readJson(spark)
    val feats = StructureFeaturizer.featurize(spark, mats).cache()
    assert(feats.count() == 1278)
    val row = feats.agg(
      min("s_density"), max("s_density"),
      min("s_packing"), max("s_packing"),
      min("s_min_dist_min"), max("s_min_dist_max")).head()
    // oxide densities: ~2-12 g/cc; bond lengths: 1.3-3.5 Å
    assert(row.getDouble(0) > 1.0 && row.getDouble(1) < 16.0,
      s"density range ${row.getDouble(0)}..${row.getDouble(1)}")
    // atomic-radius spheres overlap in dense oxides, so the "packing
    // fraction" feature can exceed 1 — it's a descriptor, not a volume claim
    assert(row.getDouble(2) > 0.05 && row.getDouble(3) < 2.0,
      s"packing range ${row.getDouble(2)}..${row.getDouble(3)}")
    assert(row.getDouble(4) > 1.0 && row.getDouble(5) < 4.5,
      s"min-dist range ${row.getDouble(4)}..${row.getDouble(5)}")
  }

  test("el_comp_st model beats el_comp (reference ordering comp_st < comp)") {
    import DielectricModel._
    val mComp = train(spark, Electronic, Comp, numTrees = 120)
    val mSt = train(spark, Electronic, CompSt, numTrees = 120)
    val rmseComp = predictTrainingSet(spark, mComp, Electronic, Comp)
      .select(sqrt(avg(pow(col("pred_log10") - col("label"), 2)))).head().getDouble(0)
    val rmseSt = predictTrainingSet(spark, mSt, Electronic, CompSt)
      .select(sqrt(avg(pow(col("pred_log10") - col("label"), 2)))).head().getDouble(0)
    info(s"el: rmse_comp=$rmseComp rmse_comp_st=$rmseSt")
    assert(rmseSt < rmseComp, s"comp_st ($rmseSt) must beat comp ($rmseComp)")
    assert(rmseSt < 0.05, s"rmse_comp_st $rmseSt") // golden el_comp_st: 0.0187
  }

  test("ion_comp_st model beats ion_comp") {
    import DielectricModel._
    val mComp = train(spark, Ionic, Comp, numTrees = 120)
    val mSt = train(spark, Ionic, CompSt, numTrees = 120)
    val rmseComp = predictTrainingSet(spark, mComp, Ionic, Comp)
      .select(sqrt(avg(pow(col("pred_log10") - col("label"), 2)))).head().getDouble(0)
    val rmseSt = predictTrainingSet(spark, mSt, Ionic, CompSt)
      .select(sqrt(avg(pow(col("pred_log10") - col("label"), 2)))).head().getDouble(0)
    info(s"ion: rmse_comp=$rmseComp rmse_comp_st=$rmseSt")
    assert(rmseSt < rmseComp, s"comp_st ($rmseSt) must beat comp ($rmseComp)")
    assert(rmseSt < 0.15, s"rmse_comp_st $rmseSt") // golden ion_comp_st: 0.0740
  }
}
