package graft

/** Session-keyed persisted-artifact registry: build-once temp dirs
  * holding parquet artifacts, with the two hazards the hand-rolled
  * copies kept re-growing fixed in ONE place:
  *
  *  - failure-safe creation: a THROWING build deletes its half-made
  *    temp dir before rethrowing, so no failed build can orphan a
  *    directory the clear path can never find;
  *  - build/clear exclusion: `clear()` takes the same lock as builds,
  *    so a clear racing an in-flight build waits for it and then
  *    deletes (the adopt contract) instead of deleting a directory a
  *    caller is about to read.
  *
  * Extracted for the substring tier's window index (d70); the older
  * artifact tiers (SimilarityOps saved indexes, Sketches census,
  * EmailOps aux) predate it and keep their proven local registries. */
final class ArtifactRegistry(prefix: String) {
  private val dirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val lock = new Object

  /** The artifact dir for `key`, building it via `build(dir)` on
    * first access. Serialized with [[clear]]; callers racing on the
    * same key share one build. */
  def getOrBuild(key: String)(build: String => Unit): String =
    lock.synchronized {
      Option(dirs.get(key)).getOrElse {
        val dir = java.nio.file.Files.createTempDirectory(prefix).toString
        try build(dir)
        catch { case e: Throwable => Fs.deleteTree(dir); throw e }
        dirs.put(key, dir)
        dir
      }
    }

  /** Delete every artifact dir and drop the pointers. */
  def clear(): Unit = lock.synchronized {
    dirs.values.forEach(d => Fs.deleteTree(d))
    dirs.clear()
  }

  /** Delete only the artifacts whose key contains `sub` — the
    * targeted-clear contract a composite warm needs (its re-time
    * cycles must drop the entry's OWN artifact, never a sibling the
    * other line items already paid for). */
  def clearMatching(sub: String): Unit = lock.synchronized {
    val it = dirs.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.contains(sub)) { Fs.deleteTree(e.getValue); it.remove() }
    }
  }
}
