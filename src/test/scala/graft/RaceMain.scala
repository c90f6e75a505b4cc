package graft

/** Forked-JVM commit racer for the cross-process OCC proof
  * (VERDICT r15 ask #6): a SECOND operating-system process — its own
  * JVM, its own Hadoop FileSystem/FileContext instances, zero shared
  * state with the test JVM beyond the filesystem — races
  * `LakeLogStore.putIfAbsent` publishes for versions 1..n of the same
  * table log. Args: `<tableDir> <n> <writerId> <outFile> <goFile>`.
  * Waits for `goFile` to appear (the start barrier that lines both
  * racers up), then attempts every version back-to-back and records
  * one `v won|lost` line per attempt. No Spark involved: the log
  * protocol is pure metadata I/O, which is exactly why the race proof
  * can be cheap. */
object RaceMain {
  def main(args: Array[String]): Unit = {
    val Array(dir, nStr, writerId, outFile, goFile) = args
    val n = nStr.toInt
    val store = graft.sources.LakeLogStore.forPath(dir)
    val go = java.nio.file.Paths.get(goFile)
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (!java.nio.file.Files.exists(go)) {
      if (System.nanoTime() > deadline)
        throw new IllegalStateException("RaceMain: start barrier never appeared")
      Thread.`yield`()
    }
    // per-version RENDEZVOUS (r17): each racer drops a marker for v and
    // spins (bounded) for the peer's before attempting — the publish
    // race then starts from a synchronized point every version, so
    // two-sided contention survives host load (without it, a starved
    // JVM attempts every version late and loses all 60, which is a
    // scheduling artifact, not the OCC property under test). A missing
    // peer marker after the bound means the peer died or fell behind —
    // proceed, the invariant holds regardless.
    val barrierDir = go.getParent
    val peer = if (writerId == "child") "parent" else "child"
    val results = new StringBuilder
    (1 to n).foreach { v =>
      java.nio.file.Files.createFile(barrierDir.resolve(s"rdv-$writerId-$v"))
      val peerMark = barrierDir.resolve(s"rdv-$peer-$v")
      val waitUntil = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (!java.nio.file.Files.exists(peerMark) &&
        System.nanoTime() < waitUntil) Thread.`yield`()
      val target = new org.apache.hadoop.fs.Path(s"$dir/_log", f"v$v%05d.json")
      val payload = s"""{"racer":"$writerId","v":$v}"""
      val won =
        try { store.putIfAbsent(target, payload); true }
        catch {
          case e: IllegalStateException if e.getMessage.contains("conflict") => false
        }
      results.append(s"$v ${if (won) "won" else "lost"}\n")
      ()
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile),
      results.toString)
    ()
  }
}
