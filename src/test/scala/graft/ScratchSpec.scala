package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The r21 scratch-dir cleanup registry (ADVICE r20: per-invocation
  * staging paths accumulated unboundedly across bench samples). Tests a
  * PRIVATE registry instance — sweeping the process-wide `Scratch` object
  * mid-test would delete live scratch dirs of concurrently-running
  * suites.
  */
class ScratchSpec extends AnyFunSuite {

  test("sweep deletes registered trees recursively and drops the entry") {
    val reg = new queries.ScratchRegistry
    val root = Files.createTempDirectory("graft_scratch_spec")
    val sub = Files.createDirectories(root.resolve("a/b"))
    Files.writeString(sub.resolve("f.txt"), "x")
    assert(reg.register(root.toString) == root.toString) // returns unchanged
    assert(reg.size == 1)
    reg.sweep()
    assert(!Files.exists(root))
    assert(reg.size == 0)
  }

  test("sweep tolerates never-created and already-deleted paths") {
    val reg = new queries.ScratchRegistry
    reg.register(s"${System.getProperty("java.io.tmpdir")}/graft_never_made_" +
      java.util.UUID.randomUUID.toString)
    reg.sweep() // must not throw; entry dropped
    assert(reg.size == 0)
  }

  test("registry deduplicates repeated registrations of one path") {
    val reg = new queries.ScratchRegistry
    val p = Files.createTempDirectory("graft_scratch_dup").toString
    reg.register(p); reg.register(p)
    assert(reg.size == 1)
    reg.sweep()
    assert(!Files.exists(Paths.get(p)))
  }
}
