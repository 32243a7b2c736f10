package graft.operators

/** Corpus-keyed scratch paths for oracle exports (the frames Verify
  * writes ahead of the query dump so BOTH engines of a gate query read
  * the same bytes). One place for the hash-the-dir idiom — the path must
  * derive from the corpus dir, or a stale export from a different SF
  * (or a concurrent run) gets scored silently. */
private[graft] object ExportPaths {
  def forCorpus(prefix: String, dir: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    s"/tmp/graft_${prefix}_$h.parquet"
  }
}
