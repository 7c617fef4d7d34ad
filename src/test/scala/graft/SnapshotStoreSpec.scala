package graft

import org.apache.spark.sql.functions._
import graft.operators.SnapshotStore

/** The publish protocol's guarantees: versions are immutable and
  * re-readable, the pointer swap is the single commit point (a data
  * directory without a swapped pointer is invisible), and publish is
  * crash-safe in the only ordering it performs.
  */
class SnapshotStoreSpec extends SparkSpec {

  private def freshRoot(): String =
    Scratch.dir(spark, s"snapstore_${System.nanoTime()}")

  test("publish/read round-trips and versions stay readable") {
    val s = spark
    import s.implicits._
    val root = freshRoot()
    val v1 = SnapshotStore.publish(Seq((1L, "a"), (2L, "b")).toDF("id", "x"), root)
    val v2 = SnapshotStore.publish(Seq((1L, "a2"), (3L, "c")).toDF("id", "x"), root)
    assert(v1 == 1 && v2 == 2)
    assert(SnapshotStore.currentVersion(spark, root).contains(2))
    assert(SnapshotStore.read(spark, root).orderBy("id")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a2"), (3L, "c")))
    // time travel: v1 unchanged after v2's publish
    assert(SnapshotStore.readVersion(spark, root, 1).orderBy("id")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("a data directory without the pointer swap is invisible (crash-safety)") {
    val s = spark
    import s.implicits._
    val root = freshRoot()
    SnapshotStore.publish(Seq((1L, "a")).toDF("id", "x"), root)
    // simulate a crash AFTER the v2 data write, BEFORE the pointer swap
    Seq((9L, "half")).toDF("id", "x").write.parquet(s"$root/v2")
    assert(SnapshotStore.currentVersion(spark, root).contains(1),
      "an unswapped pointer must leave the previous version live")
    assert(SnapshotStore.read(spark, root).count() == 1L)
    // the next successful publish must not be confused by the orphan:
    // it reads the POINTER for the next version, so it overwrites v2
    val v = SnapshotStore.publish(Seq((2L, "b"), (3L, "c")).toDF("id", "x"), root)
    assert(v == 2)
    assert(SnapshotStore.read(spark, root).count() == 2L)
  }

  test("vacuum removes only versions past the retention window") {
    val s = spark
    import s.implicits._
    val root = freshRoot()
    (1 to 4).foreach(i =>
      SnapshotStore.publish(Seq((i.toLong, s"v$i")).toDF("id", "x"), root))
    val removed = SnapshotStore.vacuum(spark, root, keep = 2)
    assert(removed == Seq(1, 2))
    // retained window fully readable; vacuumed versions gone
    assert(SnapshotStore.readVersion(spark, root, 3).count() == 1L)
    assert(SnapshotStore.read(spark, root).as[(Long, String)].head()
      == ((4L, "v4")))
    intercept[Exception] {
      SnapshotStore.readVersion(spark, root, 1).count()
    }
    // idempotent; never touches the current version even at keep=1
    assert(SnapshotStore.vacuum(spark, root, keep = 2).isEmpty)
    assert(SnapshotStore.vacuum(spark, root, keep = 1) == Seq(3))
    assert(SnapshotStore.read(spark, root).count() == 1L)
  }

  test("reading an unpublished root fails loudly") {
    val root = freshRoot()
    intercept[IllegalStateException] {
      SnapshotStore.read(spark, root)
    }
    assert(SnapshotStore.currentVersion(spark, root).isEmpty)
  }
}
