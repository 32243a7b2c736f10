package graft.operators

/** One switch for every session-cached index artifact (memoized persisted
  * frames, fitted IVF quantizers, PQ codebooks). Used by Bench's cold
  * re-run: dropping these returns the session to artifact-cold state
  * (codegen stays compiled — that part of cold is once-per-JVM) without
  * forking a fresh JVM. */
object ArtifactCaches {
  def clear(): Unit = {
    PersistSlots.clear()
    Similarity.clearLshCache()
    Similarity.clearIvfCache()
    Similarity.clearPqCache()
    Bpe.clearTrainCache()
    Graphs.clearBloomCache()
  }
}
