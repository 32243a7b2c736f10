package graft.operators

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** Multi-writer OCC for [[Snapshots.commitOptimistic]]: contending
  * writers must all land, each in its own version slot, with no lost
  * updates, no torn manifests, and a linear append chain (every
  * manifest = its parent's lines + exactly one batch's files). */
class ConcurrentCommitSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = s"/tmp/graft_occspec_$tag"
    val fs = new Path(d).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(d), true)
    d
  }

  private def manifestLines(d: String, v: Int): Seq[String] = {
    val p = new Path(f"$d/_log/$v%08d.manifest")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList.filter(_.nonEmpty)
    finally in.close()
  }

  test("two contending writers: all commits land, history is linear, no lost rows") {
    val d = freshDir("race")
    val perWriter = 5
    def writer(base: Long): Future[Seq[Int]] = Future {
      (0 until perWriter).map { i =>
        val id = base + i
        Snapshots.commitOptimistic(
          Seq((id, s"w$base-$i")).toDF("id", "s").coalesce(1), d)
      }
    }
    val vs = Await.result(
      Future.sequence(Seq(writer(100L), writer(200L))), 5.minutes).flatten

    // every writer landed in its own slot; slots are the dense range 1..10
    assert(vs.distinct.length == 2 * perWriter)
    assert(Snapshots.versions(spark, d) == (1 to 2 * perWriter))

    // no lost updates: the live view holds every row exactly once
    val rows = Snapshots.read(spark, d).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.length == 2 * perWriter && rows.distinct.length == rows.length)
    assert(rows.map(_._1).toSet ==
      ((100L until 100L + perWriter) ++ (200L until 200L + perWriter)).toSet)

    // linearity: manifest v = manifest v-1 + exactly one batch dir's files
    (2 to 2 * perWriter).foreach { v =>
      val prev = manifestLines(d, v - 1)
      val cur = manifestLines(d, v)
      assert(cur.startsWith(prev), s"v$v does not extend v${v - 1}")
      val added = cur.drop(prev.length).map(_.split('\t').head.split('/')(1)).distinct
      assert(added.length == 1, s"v$v appended ${added.length} batch dirs")
    }

    // vacuum over writer-unique batch dirs stays reference-counted
    Snapshots.vacuum(spark, d, keep = 1, orphanGraceMs = 0L)
    assert(Snapshots.read(spark, d).count() == 2L * perWriter)
  }

  test("optimistic commit records manifest stats; pruned read still works after a race") {
    val d = freshDir("stats")
    val fa = Future(Snapshots.commitOptimistic(
      Seq((1L, 5.0), (2L, 10.0)).toDF("id", "v").coalesce(1), d, statsCol = Some("v")))
    val fb = Future(Snapshots.commitOptimistic(
      Seq((3L, 500.0)).toDF("id", "v").coalesce(1), d, statsCol = Some("v")))
    Await.result(Future.sequence(Seq(fa, fb)), 5.minutes)
    val (pruned, opened, total) = Snapshots.readPruned(spark, d, "v", 0.0, 50.0)
    assert(total == 2 && opened == 1)
    assert(pruned.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }
}
