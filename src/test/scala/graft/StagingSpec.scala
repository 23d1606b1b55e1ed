package graft

import graft.core.Staging
import org.scalatest.funsuite.AnyFunSuite

/** Scope semantics of the staging registry (ADVICE r14): release is tied
  * to the creating call path; a global sweep can never touch another
  * path's frames.
  */
class StagingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def frame() = Seq(1L, 2L, 3L).toDF("v")

  test("scoped frames release at block exit; nesting releases inner first") {
    val before = Staging.liveCount
    Staging.scoped {
      val a = Staging.stage(frame())
      assert(a.storageLevel.useMemory, "staged frame must be persisted")
      assert(Staging.liveCount == before + 1)
      Staging.scoped {
        val b = Staging.stage(frame().filter($"v" > 1))
        assert(Staging.liveCount == before + 2)
        assert(b.count() == 2L)
      }
      // inner scope closed: its frame gone, outer frame still cached
      assert(Staging.liveCount == before + 1)
      assert(a.storageLevel.useMemory)
      assert(a.count() == 3L)
    }
    assert(Staging.liveCount == before)
  }

  test("releaseAll sweeps only global frames, never scoped ones") {
    Staging.scoped {
      val scopedF = Staging.stage(frame())
      // simulate another (unscoped) path registering globally: releaseAll
      // from anywhere must drop IT but leave the scoped frame cached.
      // (Other suites' unscoped stages may also sit in the global
      // registry — the sweep takes them all, so assert on the scoped
      // remainder, not on exact counts.)
      var globalF: org.apache.spark.sql.DataFrame = null
      val t = new Thread(() => globalF = Staging.stage(frame().filter($"v" =!= 2)))
      t.start(); t.join()
      assert(globalF.storageLevel.useMemory)
      Staging.releaseAll()
      assert(Staging.liveCount == 1,
        "after the sweep only this thread's scoped frame remains registered")
      assert(!globalF.storageLevel.useMemory,
        "the globally-registered frame must be swept")
      assert(scopedF.storageLevel.useMemory,
        "a scoped frame must survive a global sweep (the r14 corruption hazard)")
      assert(scopedF.count() == 3L)
    }
  }

  test("scoped release survives a throwing body; release() drops one frame precisely") {
    val before = Staging.liveCount
    intercept[RuntimeException] {
      Staging.scoped {
        Staging.stage(frame())
        throw new RuntimeException("boom")
      }
    }
    assert(Staging.liveCount == before, "scope must release on exception")
    Staging.scoped {
      val a = Staging.stage(frame())
      val b = Staging.stage(frame().filter($"v" > 2))
      Staging.release(a)
      assert(!a.storageLevel.useMemory && b.storageLevel.useMemory)
      assert(Staging.liveCount == before + 1)
    }
    assert(Staging.liveCount == before)
  }

  test("scopes are thread-confined: a sibling thread's scope exit cannot release this thread's frames") {
    Staging.scoped {
      val mine = Staging.stage(frame())
      val t = new Thread(() => Staging.scoped {
        Staging.stage(frame().filter($"v" < 3)).count()
      })
      t.start(); t.join()
      assert(mine.storageLevel.useMemory,
        "another thread's scoped release must not unpersist this thread's stage")
      assert(mine.count() == 3L)
    }
  }
}
