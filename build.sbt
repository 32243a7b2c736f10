ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "oxi_diel_dbspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run output goes straight to stdout, un-prefixed: the bench
// driver parses Bench's single JSON line, and sbt's default logger
// would wrap it in "[info] ".
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // the ContextCleaner's periodic System.gc() (the 30s cadence Bench/
  // Verify/probes set for cachedCheckpoint shuffle-file reclamation)
  // must run as a G1 CONCURRENT cycle: as a stop-the-world full GC on a
  // large heap with cached corpora it randomly taxed identical probe
  // passes by up to 30s (measured: tx_contamination 3.6s steady vs
  // 33-56s GC-hit passes on a 96g heap). Weak-ref processing — the
  // cleaner's actual need — happens in the concurrent cycle's remark.
  // Xms=Xmx + AlwaysPreTouch because the LARGER half of those swings
  // was not GC at all: on a 96g heap, G1's eden wanders through
  // never-touched regions for tens of GB (gc log: 27-39 GB young
  // before first collection), and the mutator pays the OS page-zeroing
  // on first touch — identical warm 10x passes read 1.8-118s with ~98s
  // cumulative excess ~= zeroing 96 GB once (r9 A/B; zero Full GCs and
  // <1s total pause in the same runs). Pre-touching moves that cost to
  // JVM startup, outside every measured pass.
  "-XX:+ExplicitGCInvokesConcurrent",
  "-XX:+AlwaysPreTouch",
) ++ sys.env.get("GRAFT_GC_LOG").map(f => s"-Xlog:gc*:file=$f:time,uptime").toSeq ++
  // probe knob: a checkpoint dir switches PersistSlots.cachedCheckpoint
  // to RELIABLE checkpoints (spark.* sys props load into SparkConf at
  // session build) — lets QueryTime/PlanAudit measure the cluster mode
  sys.env.get("GRAFT_CHECKPOINT_DIR").map(d => s"-Dspark.checkpoint.dir=$d").toSeq
