package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Gates for the atomic stage-once protocol (ADVICE r12: the
  * check-_SUCCESS-then-overwrite idiom raced; [[Stage.ensure]] replaces
  * it with temp-write + ATOMIC_MOVE under a per-root lock). */
class StageSpec extends AnyFunSuite {

  test("concurrent ensure builds once; every caller then sees a complete artifact") {
    val root = Files.createTempDirectory("graft-stage").toString + "/artifact"
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 8).map { _ =>
      new Thread(() =>
        try {
          Stage.ensure(root) { tmp =>
            builds.incrementAndGet()
            new java.io.File(tmp).mkdirs()
            Files.write(Paths.get(s"$tmp/part-0"), "data".getBytes("UTF-8"))
            Thread.sleep(50) // widen the window a partial build is in flight
            Files.write(Paths.get(s"$tmp/_SUCCESS"), Array.empty[Byte])
          }
          // post-condition for EVERY caller, winner or not: the published
          // root is complete (marker + data together, never one without
          // the other — the partial-read race the old idiom allowed)
          assert(new java.io.File(s"$root/_SUCCESS").exists())
          assert(new java.io.File(s"$root/part-0").exists())
        } catch { case t: Throwable => errors.add(t): Unit })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errors.isEmpty, s"thread failures: ${errors.peek()}")
    assert(builds.get() === 1, "exactly one thread must run the build")
    // and a later ensure is a pure no-op
    Stage.ensure(root)(_ => fail("must not rebuild a published artifact"))
  }

  test("a stale partial root (no marker) is cleared and rebuilt") {
    val root = Files.createTempDirectory("graft-stage").toString + "/artifact"
    new java.io.File(root).mkdirs()
    Files.write(Paths.get(s"$root/part-stale"), "crashed build".getBytes("UTF-8"))
    Stage.ensure(root) { tmp =>
      new java.io.File(tmp).mkdirs()
      Files.write(Paths.get(s"$tmp/part-0"), "fresh".getBytes("UTF-8"))
      Files.write(Paths.get(s"$tmp/_SUCCESS"), Array.empty[Byte])
    }
    assert(new java.io.File(s"$root/_SUCCESS").exists())
    assert(new java.io.File(s"$root/part-0").exists())
    assert(!new java.io.File(s"$root/part-stale").exists(),
      "stale partial content must not survive into the published root")
  }

  test("a build that forgets the marker fails loudly and publishes nothing") {
    val root = Files.createTempDirectory("graft-stage").toString + "/artifact"
    val e = intercept[IllegalStateException] {
      Stage.ensure(root) { tmp =>
        new java.io.File(tmp).mkdirs()
        Files.write(Paths.get(s"$tmp/part-0"), "x".getBytes("UTF-8"))
      }
    }
    assert(e.getMessage.contains("no _SUCCESS"))
    assert(!new java.io.File(root).exists(), "nothing may be published")
  }

  test("custom markers gate multi-generation builds") {
    val root = Files.createTempDirectory("graft-stage").toString + "/artifact"
    Stage.ensure(root, marker = "gen=2/_SUCCESS") { tmp =>
      new java.io.File(s"$tmp/gen=1").mkdirs()
      new java.io.File(s"$tmp/gen=2").mkdirs()
      Files.write(Paths.get(s"$tmp/gen=1/_SUCCESS"), Array.empty[Byte])
      Files.write(Paths.get(s"$tmp/gen=2/_SUCCESS"), Array.empty[Byte])
    }
    assert(new java.io.File(s"$root/gen=2/_SUCCESS").exists())
    Stage.ensure(root, marker = "gen=2/_SUCCESS")(_ => fail("must not rebuild"))
  }
}
