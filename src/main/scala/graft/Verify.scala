package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd+ args: restrict to the named queries (builder-side
    // iteration on a single oracle row; the driver passes exactly two)
    val Array(sfDir, outDir, only @ _*) = args
    val wanted: String => Boolean =
      if (only.isEmpty) _ => true else only.toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // raw-corpus export first: the mat_* oracle SQL reads this fixed-path
    // parquet to recompute the materials queries independently in DuckDB
    try graft.materials.Materials.exportRaw(spark)
    catch { case e: Throwable =>
      System.err.println(s"[verify] materials raw export failed: ${e.getMessage}")
    }
    // golden-parity export next: ml_golden_gate (Spark AND its DuckDB
    // oracle) reads these fixed-path parquets
    try graft.ml.DielectricModel.exportGoldenParity(spark)
    catch { case e: Throwable =>
      System.err.println(s"[verify] ml golden-parity export failed: ${e.getMessage}")
    }
    // quality-classifier export: ml_quality_score (Spark AND its DuckDB
    // oracle) recomputes sigmoid scores from these fixed-path parquets
    try graft.ml.QualityClassifier.exportScored(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[verify] quality-classifier export failed: ${e.getMessage}")
    }
    // semdedup cell export: dd_semdedup (Spark AND its DuckDB oracle)
    // computes the prune from this fitted (vec_id, cell) assignment
    try graft.operators.SemDedup.exportCells(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[verify] semdedup cell export failed: ${e.getMessage}")
    }
    // BPE round-state export: tx_bpe_merges (Spark AND its DuckDB oracle)
    // recomputes each round's winning pair from these states
    try graft.operators.Bpe.exportStates(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[verify] bpe state export failed: ${e.getMessage}")
    }
    // HLL estimate export: ds_hll_distinct (Spark AND its DuckDB oracle)
    // gates the same exported sketch estimates against exact distincts
    try graft.operators.Sketches.exportEstimates(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[verify] hll estimate export failed: ${e.getMessage}")
    }
    // recurrence exports: ds_doremi / q32_pagerank are export-gates (both
    // engines read these doubles and check their own recurrence replay
    // within a tolerance — CORRECTNESS_r06 proved decimal emission does
    // not absorb cross-engine drift at rounding boundaries)
    try graft.operators.Doremi.exportWeights(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[verify] doremi weight export failed: ${e.getMessage}")
    }
    try graft.operators.Graphs.exportRanks(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[verify] pagerank export failed: ${e.getMessage}")
    }
    // recall-gate exports: the approximate shortlists/pair sets/bloom
    // counts both engines gate against independent exact recomputes
    try graft.operators.RecallGates.exportAll(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[verify] recall-gate export failed: ${e.getMessage}")
    }
    SparkEntry.queries.filter(q => wanted(q._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
