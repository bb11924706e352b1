package graft.queries

/** JVM-exit cleanup registry for per-invocation scratch dirs (ADVICE
  * r20): unique-per-invocation staging paths fixed the parallel-suite
  * race but accumulated unboundedly across bench samples — several fresh
  * parquet copies of orders/documents per write-back row per run, and
  * streaming checkpoint dirs on tmpfs (/dev/shm — RAM). Registration is
  * O(1) per dir; deletion is best-effort on shutdown, newest-path-first
  * within each tree.
  */
private[graft] object Scratch {
  private val created =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.forEach { p =>
      try {
        val root = java.nio.file.Paths.get(p)
        if (java.nio.file.Files.exists(root)) {
          val walk = java.nio.file.Files.walk(root)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(f => java.nio.file.Files.deleteIfExists(f))
          finally walk.close()
        }
      } catch { case _: Throwable => () } // best-effort cleanup
    }
  }))

  /** Register a path for deletion at JVM exit; returns it unchanged. */
  def register(path: String): String = { created.add(path); path }
}
