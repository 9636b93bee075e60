package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.storage.StorageLevel

/** [[Scratch]] is the session-safety fix for the r16 per-batch block
  * sweeps: release must go through the EXACT RDD handles a scope's own
  * snapshots created, never a session-global `getPersistentRDDs` diff
  * that would free a concurrent caller's blocks (fatal for a victim's
  * localCheckpoint — truncated lineage cannot recompute). */
class ScratchSpec extends SparkSpec {

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("scoped releases its own snapshots and ONLY those") {
    import spark.implicits._
    // a "concurrent caller's" state: one cached Dataset and one
    // localCheckpoint taken OUTSIDE the scope — both must survive the
    // scope's release untouched
    val foreignCache = (1 to 100).toDF("x")
      .persist(StorageLevel.MEMORY_AND_DISK)
    foreignCache.count()
    val foreignCk = (1 to 50).toDF("y").localCheckpoint()
    val before = persistedIds
    assert(before.nonEmpty)

    var scopedIds: Set[Int] = Set.empty
    val result = Scratch.scoped {
      val snap = Scratch.snapshot((1 to 10).toDF("z")
        .withColumn("z2", F.col("z") * 2))
      scopedIds = persistedIds -- before
      assert(scopedIds.nonEmpty, "snapshot should persist blocks")
      snap.agg(F.sum("z2")).collect().head.getLong(0)
    }
    assert(result === 110L)
    // the scope's snapshot blocks are gone...
    assert((persistedIds & scopedIds).isEmpty,
      "scope exit must release its own snapshot RDDs")
    // ...and the foreign state is untouched and still readable
    assert(before.subsetOf(persistedIds),
      "scope exit must not touch RDDs it did not create")
    assert(foreignCache.count() === 100L)
    assert(foreignCk.count() === 50L)
    foreignCache.unpersist(true)
    org.apache.spark.sql.graftbridge.Bridge.checkpointedRdd(foreignCk)
      .foreach(_.unpersist(true))
  }

  test("snapshotManaged releases by exact handle; snapshot content exact") {
    import spark.implicits._
    val src = (1 to 7).map(i => (i.toLong, s"v$i")).toDF("id", "s")
    val before = persistedIds
    val (snap, release) = Scratch.snapshotManaged(src)
    assert(snap.orderBy("id").collect().toSeq ===
      src.orderBy("id").collect().toSeq)
    val mine = persistedIds -- before
    assert(mine.nonEmpty)
    release()
    assert((persistedIds & mine).isEmpty, "release must free the snapshot")
    release() // idempotent
  }

  test("without a scope, snapshot degrades to a plain localCheckpoint") {
    import spark.implicits._
    val before = persistedIds
    val snap = Scratch.snapshot((1 to 5).toDF("a"))
    assert(snap.count() === 5L)
    val mine = persistedIds -- before
    assert(mine.nonEmpty, "scope-less snapshot still materializes")
    // caller-owned lifecycle: explicitly release through the bridge handle
    org.apache.spark.sql.graftbridge.Bridge.checkpointedRdd(snap)
      .foreach(_.unpersist(true))
    assert((persistedIds & mine).isEmpty)
  }

  test("scopes nest: inner registrations release at the inner exit") {
    import spark.implicits._
    Scratch.scoped {
      val outer = Scratch.snapshot((1 to 3).toDF("o"))
      var innerIds: Set[Int] = Set.empty
      val beforeInner = persistedIds
      Scratch.scoped {
        Scratch.snapshot((1 to 4).toDF("i")).count()
        innerIds = persistedIds -- beforeInner
        assert(innerIds.nonEmpty)
      }
      assert((persistedIds & innerIds).isEmpty,
        "inner scope exit releases inner snapshots")
      assert(outer.count() === 3L, "outer snapshot survives the inner exit")
    }
  }

  test("scoped releases on exception too") {
    import spark.implicits._
    val before = persistedIds
    intercept[RuntimeException] {
      Scratch.scoped {
        Scratch.snapshot((1 to 3).toDF("e")).count()
        throw new RuntimeException("boom")
      }
    }
    assert(persistedIds === before)
  }
}
