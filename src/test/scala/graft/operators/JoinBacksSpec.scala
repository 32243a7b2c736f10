package graft.operators

import graft.SparkSpec

/** Branch boundaries of the shared vector join-back sizing (ADVICE r8):
  * the broadcast/shuffle decision must flip exactly at the conf-derived
  * budget (pricing ALL simultaneously-live sides), honor Spark's 8 GB
  * hard relation cap independently of the budget, and degrade to the
  * plain shuffle join-back — never an error — past either limit. */
class JoinBacksSpec extends SparkSpec {

  private def broadcasts(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Boolean = {
    val df = graft.sources.Tables.embeddings(spark, sf).select("vec_id", "embedding")
    f(df).queryExecution.analyzed.toString.contains("ResolvedHint")
  }

  test("budget branch: both sides priced together; flips at the configured budget") {
    val budget = 512L << 20
    spark.conf.set("graft.broadcast.budget", budget.toString)
    try {
      val rowBytes = JoinBacks.vectorRowBytes(64)
      val fits = budget / rowBytes / 2 - 1 // 2 sides under budget
      val over = budget / rowBytes / 2 + 1 // 2 sides just past it
      assert(broadcasts(JoinBacks.vectorJoinBack(spark, fits, 64)),
        s"$fits rows × 2 sides fits $budget but did not broadcast")
      assert(!broadcasts(JoinBacks.vectorJoinBack(spark, over, 64)),
        s"$over rows × 2 sides exceeds $budget but broadcast anyway")
      // a single side under the same total must flip the other way at
      // the doubled row count — the 2× accounting is real
      assert(broadcasts(JoinBacks.vectorJoinBack(spark, over, 64, sides = 1)))
    } finally spark.conf.unset("graft.broadcast.budget")
  }

  test("overflowed (negative) size estimates read as does-not-fit, never broadcast") {
    // the r9 review find: an unknown-count sentinel times any row width
    // wraps negative, and a signed comparison then read it as "fits" —
    // inverting the conservative fallback into an unbounded broadcast
    spark.conf.set("graft.broadcast.budget", Long.MaxValue.toString)
    try {
      assert(!JoinBacks.fits(spark, -64L))
      assert(!JoinBacks.fits(spark, Long.MaxValue * JoinBacks.vectorRowBytes(64)))
    } finally spark.conf.unset("graft.broadcast.budget")
  }

  test("hard cap: one side past ~8 GB never broadcasts, regardless of budget") {
    spark.conf.set("graft.broadcast.budget", Long.MaxValue.toString)
    try {
      val rowBytes = JoinBacks.vectorRowBytes(64)
      val pastCap = (8L << 30) / rowBytes + 1
      assert(!broadcasts(JoinBacks.vectorJoinBack(spark, pastCap, 64, sides = 1)),
        "a relation past Spark's 8 GB broadcast cap must fall back to shuffle")
    } finally spark.conf.unset("graft.broadcast.budget")
  }

  test("wider vectors shrink the broadcastable row count proportionally") {
    // the r8 bug class: a hard-coded 64-dim width under-prices wider
    // embeddings and sails past the cap
    assert(JoinBacks.vectorRowBytes(1024) > 8 * JoinBacks.vectorRowBytes(64) / 2)
    val budget = 512L << 20
    spark.conf.set("graft.broadcast.budget", budget.toString)
    try {
      val n = budget / JoinBacks.vectorRowBytes(64) / 2 - 1
      assert(broadcasts(JoinBacks.vectorJoinBack(spark, n, 64)))
      assert(!broadcasts(JoinBacks.vectorJoinBack(spark, n, 1024)),
        "the same row count at 16× the dim must not fit the same budget")
    } finally spark.conf.unset("graft.broadcast.budget")
  }
}
