package graft.operators

import graft.SparkSpec
import org.apache.spark.storage.StorageLevel

class StageMemoSpec extends SparkSpec {
  import spark.implicits._

  private def input() = Seq((1L, "a"), (2L, "b")).toDF("id", "v")

  test("memoized builds once per (plan, stage, param) and returns the " +
    "persisted stage to every later consumer") {
    var builds = 0
    def build() = { builds += 1; input().selectExpr("id * 2 AS id2") }
    val a = StageMemo.memoized(input(), "spec:once", 1.0)(build())
    val b = StageMemo.memoized(input(), "spec:once", 1.0)(build())
    assert(builds == 1)
    assert(a.storageLevel != StorageLevel.NONE)
    assert(rows(a) == rows(b))
    // a different param is a different entry
    StageMemo.memoized(input(), "spec:once", 2.0)(build())
    assert(builds == 2)
    StageMemo.clear(spark)
  }

  test("recording captures touched entries; invalidate drops exactly " +
    "those, so a repeat re-pays the build and repopulates the memo " +
    "while unrelated entries survive") {
    var builds = 0
    var other = 0
    def build() = { builds += 1; input().selectExpr("id + 1 AS id1") }
    def buildOther() = { other += 1; input().selectExpr("id - 1 AS id0") }
    StageMemo.memoized(input(), "spec:other", 1.0)(buildOther())
    assert(other == 1)
    // attempt 1: builds and records the touch (memo read AND build)
    val (_, touched) = StageMemo.recording {
      StageMemo.memoized(input(), "spec:inv", 1.0)(build()).count()
    }
    assert(builds == 1)
    // repeat attempt: invalidate the touched entries, run with the memo
    // ACTIVE — the build runs again and the entry is repopulated
    StageMemo.invalidate(touched)
    StageMemo.memoized(input(), "spec:inv", 1.0)(build()).count()
    assert(builds == 2)
    // the repopulated entry serves later consumers without rebuilding
    StageMemo.memoized(input(), "spec:inv", 1.0)(build())
    assert(builds == 2)
    // unrelated entries were untouched by the invalidation
    StageMemo.memoized(input(), "spec:other", 1.0)(buildOther())
    assert(other == 1)
    StageMemo.clear(spark)
  }

  test("recording restores the outer mode when the thunk throws, and a " +
    "memo HIT is recorded too (second consumers invalidate correctly)") {
    var builds = 0
    def build() = { builds += 1; input().selectExpr("id AS idx") }
    StageMemo.memoized(input(), "spec:hit", 1.0)(build())
    assert(builds == 1)
    // a pure memo hit inside a recording scope must still be captured
    val (_, touched) = StageMemo.recording {
      StageMemo.memoized(input(), "spec:hit", 1.0)(build())
    }
    assert(builds == 1)
    StageMemo.invalidate(touched)
    StageMemo.memoized(input(), "spec:hit", 1.0)(build())
    assert(builds == 2, "invalidated hit entry must rebuild")
    intercept[RuntimeException] {
      StageMemo.recording[Unit] { throw new RuntimeException("boom") }
    }
    // recording mode is off again: plain memoized calls hit the entry
    StageMemo.memoized(input(), "spec:hit", 1.0)(build())
    assert(builds == 2)
    StageMemo.clear(spark)
  }
}
