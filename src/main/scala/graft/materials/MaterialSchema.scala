package graft.materials

import org.apache.spark.sql.types._

/** Canonical schema of the oxide-dielectric materials corpus.
  *
  * Mirrors the verified record shape of the reference database
  * (/root/reference/oxi_diel_db/data/, 1,278 uniform JSON documents;
  * field semantics documented in the reference README.md:17-38 — note the
  * actual dielectric keys are `epsilon_*`, not the README's stale
  * `dielectric_*` names). See /root/repo/SURVEY.md §1.2 and FIXTURES.md §1.
  *
  * The schema is fixed — production reads NEVER infer (inference over
  * millions of multiline JSON files would be a full extra pass at scale);
  * JSON is the landing format only, compacted to parquet at ingest.
  */
object MaterialSchema {

  val lattice: StructType = StructType(Seq(
    StructField("matrix", ArrayType(ArrayType(DoubleType))), // 3x3 row vectors
    StructField("a", DoubleType), StructField("b", DoubleType),
    StructField("c", DoubleType), StructField("alpha", DoubleType),
    StructField("beta", DoubleType), StructField("gamma", DoubleType),
    StructField("volume", DoubleType)))

  val site: StructType = StructType(Seq(
    StructField("species", ArrayType(StructType(Seq(
      StructField("element", StringType),
      StructField("occu", DoubleType))))), // always 1 entry, occu = 1.0
    StructField("abc", ArrayType(DoubleType)),  // [3] fractional
    StructField("xyz", ArrayType(DoubleType)),  // [3] cartesian
    StructField("label", StringType),
    StructField("properties", MapType(StringType, DoubleType)))) // always {}

  val structure: StructType = StructType(Seq(
    StructField("@module", StringType), // const "pymatgen.core.structure"
    StructField("@class", StringType),  // const "Structure"
    StructField("charge", DoubleType),  // always null
    StructField("lattice", lattice),
    StructField("sites", ArrayType(site)))) // length = nsites

  val spacegroup: StructType = StructType(Seq(
    StructField("source", StringType), // const "spglib"
    StructField("symbol", StringType),
    StructField("number", IntegerType),
    StructField("point_group", StringType),
    StructField("crystal_system", StringType), // 7 values
    StructField("hall", StringType)))

  val dielectric: StructType = StructType(Seq(
    StructField("epsilon_ionic", ArrayType(ArrayType(DoubleType))), // 3x3, ~symmetric
    StructField("epsilon_ionic_avg", DoubleType),       // = mean(eig)
    StructField("epsilon_ionic_eig", ArrayType(DoubleType)), // [3] = eigvals
    StructField("epsilon_electronic", ArrayType(ArrayType(DoubleType))),
    StructField("epsilon_electronic_avg", DoubleType),
    StructField("epsilon_electronic_eig", ArrayType(DoubleType))))

  val phonon: StructType = StructType(Seq(
    StructField("lowest_freq", DoubleType), // = min(frequency); THz
    StructField("frequency", ArrayType(DoubleType)))) // length = 3*nsites

  val born: StructType = StructType(Seq(
    StructField("avg_abs_trace", DoubleType), // = mean_sites(|trace|/3)
    StructField("tensors", ArrayType(ArrayType(ArrayType(DoubleType)))))) // nsites x 3 x 3

  val schema: StructType = StructType(Seq(
    StructField("mp_id", StringType),     // "mp-…" | "mvc-…"; primary key
    StructField("formula", StringType),   // cations EN-ordered, O last
    StructField("nelements", IntegerType),
    StructField("nsites", IntegerType),
    StructField("elements", ArrayType(StringType)), // sorted; always contains O
    StructField("structure", structure),
    StructField("spacegroup", spacegroup),
    StructField("dielectric", dielectric),
    StructField("phonon", phonon),
    StructField("born_effective_charge", born),
    StructField("band_gap", DoubleType),  // eV
    StructField("is_direct", BooleanType)))
}
