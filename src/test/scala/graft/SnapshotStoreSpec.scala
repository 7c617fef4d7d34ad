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

  test("rollback restores old content as a NEW forward version") {
    val s = spark
    import s.implicits._
    val root = freshRoot()
    SnapshotStore.publish(Seq((1L, "a"), (2L, "b")).toDF("id", "x"), root)
    SnapshotStore.publish(Seq((9L, "bad")).toDF("id", "x"), root)
    val v3 = SnapshotStore.rollback(spark, root, 1)
    assert(v3 == 3, "restore must commit forward, never move the pointer back")
    assert(SnapshotStore.currentVersion(spark, root).contains(3))
    assert(SnapshotStore.read(spark, root).orderBy("id")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a"), (2L, "b")))
    // the bad version stays readable for forensics/diff
    assert(SnapshotStore.readVersion(spark, root, 2)
      .as[(Long, String)].collect().toSeq == Seq((9L, "bad")))
    // and the store keeps accepting publishes after a restore
    assert(SnapshotStore.publish(Seq((5L, "e")).toDF("id", "x"), root) == 4)
    // out-of-history targets fail loudly
    intercept[IllegalArgumentException] {
      SnapshotStore.rollback(spark, root, 9)
    }
    intercept[IllegalStateException] {
      SnapshotStore.rollback(spark, freshRoot(), 1)
    }
  }

  test("a data directory without the pointer swap is invisible (crash-safety)") {
    val s = spark
    import s.implicits._
    val root = freshRoot()
    SnapshotStore.publish(Seq((1L, "a")).toDF("id", "x"), root)
    // simulate a crash AFTER claim + v2 data write, BEFORE the pointer
    // swap — exactly what a dying publisher leaves behind
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(root, "v2._claim"), false).close()
    Seq((9L, "half")).toDF("id", "x").write.parquet(s"$root/v2")
    assert(SnapshotStore.currentVersion(spark, root).contains(1),
      "an unswapped pointer must leave the previous version live")
    assert(SnapshotStore.read(spark, root).count() == 1L)
    // the stale claim blocks version 2 LOUDLY (never a silent clobber)…
    val e = intercept[IllegalStateException] {
      SnapshotStore.publish(Seq((2L, "b")).toDF("id", "x"), root)
    }
    assert(e.getMessage.contains("collision"))
    // …and documented recovery (delete the dead publisher's marker)
    // makes the slot publishable again, overwriting the orphan data
    fs.delete(new org.apache.hadoop.fs.Path(root, "v2._claim"), false)
    val v = SnapshotStore.publish(Seq((2L, "b"), (3L, "c")).toDF("id", "x"), root)
    assert(v == 2)
    assert(SnapshotStore.read(spark, root).count() == 2L)
  }

  test("concurrent publishers cannot allocate the same version (claim is exclusive)") {
    val s = spark
    import s.implicits._
    val root = freshRoot()
    SnapshotStore.publish(Seq((1L, "a")).toDF("id", "x"), root)
    // both racers read _CURRENT=1 and target v2; the claim serializes
    // them: exactly one wins, the loser fails instead of clobbering
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = Await.result(Future.sequence(Seq("x", "y").map { tag =>
      Future(
        try Right(SnapshotStore.publish(Seq((2L, tag)).toDF("id", "x"), root))
        catch { case e: IllegalStateException => Left(e) })
    }), 2.minutes)
    // The safety property is NO LOST COMMIT: either the claim serialized
    // the racers onto one version (one winner, one loud loser) or they
    // never actually raced (one finished before the other read _CURRENT)
    // and both succeeded on DISTINCT versions. Two Rights on the SAME
    // version — the silent clobber this fix exists for — must be
    // impossible, and every successful publish must be durably readable.
    val wins = results.collect { case Right(v) => v }
    assert(wins.nonEmpty, s"at least one publish must succeed: $results")
    assert(wins.distinct.size == wins.size,
      s"two publishes claimed the same version (lost commit): $results")
    assert(results.count(_.isLeft) == 2 - wins.size)
    wins.foreach { v =>
      assert(SnapshotStore.readVersion(spark, root, v).count() == 1L,
        s"published version $v must be readable")
    }
    assert(SnapshotStore.currentVersion(spark, root).contains(wins.max))
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

  test("retention makes rollback outside the window impossible BY POLICY (u9↔u7)") {
    // VERDICT r13 #3: u9's contract says vacuuming a version ends its
    // rollback eligibility AS POLICY — the failure must name retention,
    // not surface as a missing-path parquet read, while rollback inside
    // the window keeps working.
    val s = spark
    import s.implicits._
    val root = freshRoot()
    (1 to 4).foreach(i =>
      SnapshotStore.publish(Seq((i.toLong, s"v$i")).toDF("id", "x"), root))
    assert(SnapshotStore.vacuum(spark, root, keep = 2) == Seq(1, 2))
    val e = intercept[IllegalStateException] {
      SnapshotStore.rollback(spark, root, 1)
    }
    assert(e.getMessage.contains("retention") && e.getMessage.contains("v1"),
      s"policy error must name retention and the vacuumed version: ${e.getMessage}")
    // inside the window the u7 contract is untouched: restore commits
    // forward and carries v3's content
    val v5 = SnapshotStore.rollback(spark, root, 3)
    assert(v5 == 5)
    assert(SnapshotStore.read(spark, root).as[(Long, String)].head()
      == ((3L, "v3")))
  }

  test("log compaction law (u11↔u10): the compacted store under ONE new " +
      "delta reads identically to the original log stack under that delta") {
    val s = spark
    import s.implicits._
    // (id, text, rev, op, ver) — op B=base row, U=upsert, D=tombstone.
    // The stack covers every interaction the law must survive: an update
    // overwritten across logs (1), a plain single-log update (2), a base
    // delete (3), an insert that dies inside the log stack (10, the
    // delta-on-delta case), an insert that survives (11), untouched (4).
    def rows(t: (Long, String, Long, String, Long)*) =
      t.toDF("id", "text", "rev", "op", "ver")
    val base = rows((1L, "a", 1L, "B", 0L), (2L, "b", 1L, "B", 0L),
      (3L, "c", 1L, "B", 0L), (4L, "d", 1L, "B", 0L))
    val d1 = rows((1L, "a2", 2L, "U", 1L), (2L, "b2", 2L, "U", 1L),
      (3L, null, 0L, "D", 1L), (10L, "x", 1L, "U", 1L),
      (11L, "y", 1L, "U", 1L))
    val d2 = rows((1L, "a3", 3L, "U", 2L), (10L, null, 0L, "D", 2L))
    // merge-on-read: per key the highest-version row wins, tombstones drop
    def mor(stack: org.apache.spark.sql.DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id")).orderBy(col("ver").desc)
      stack.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("op") =!= "D")
        .select("id", "text", "rev", "ver")
        .orderBy("id").as[(Long, String, Long, Long)].collect().toSeq
    }
    // u11's fold: per-key log winner, then u1's anti-join ∪ survivors
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("ver").desc)
    val winners = d1.unionByName(d2)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val compacted = base
      .join(winners.select("id"), Seq("id"), "left_anti")
      .unionByName(winners.filter(col("op") =!= "D").drop("rn"))
    // law 0: the compacted store alone reads as the three-log MoR read
    assert(mor(compacted) == mor(base.unionByName(d1).unionByName(d2)))
    // the compacted base is a REAL published store, not a lineage
    val root = freshRoot()
    SnapshotStore.publish(compacted, root)
    val stored = SnapshotStore.read(spark, root)
    // law: one new delta (update a survivor, delete another, insert a
    // fresh key, resurrect the key the log stack killed) reads the same
    // over the compacted store as over the full log chain
    val d3 = rows((1L, "a4", 4L, "U", 3L), (2L, null, 0L, "D", 3L),
      (12L, "z", 1L, "U", 3L), (10L, "x2", 2L, "U", 3L))
    assert(mor(stored.unionByName(d3)) ==
      mor(base.unionByName(d1).unionByName(d2).unionByName(d3)),
      "post-compaction MoR read diverged from the uncompacted log chain")
  }

  test("reading an unpublished root fails loudly") {
    val root = freshRoot()
    intercept[IllegalStateException] {
      SnapshotStore.read(spark, root)
    }
    assert(SnapshotStore.currentVersion(spark, root).isEmpty)
  }
}
