package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.util.Random

/** MSD-shaped fixture per FIXTURES.md §A1: 40-char hex user ids, TR+16
  * track ids, skewed play counts spanning the histogram bin edges, a
  * vestigial `__index_level_0__` pandas column readers must tolerate and
  * drop, duplicate (user, track) rows, and val/test rows whose user or
  * track never appears in train (exercising handleInvalid=skip).
  *
  * Planted structure (so ALS has signal): user u plays tracks with
  * track_index % 10 == u % 10 at high counts, others at count 1-2.
  */
object MsdFixture {

  private def userId(i: Int): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"user$i".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    (h + h).take(40)
  }

  private def trackId(i: Int): String = {
    val alnum = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    val r = new Random(i * 7919 + 13)
    "TR" + Seq.fill(16)(alnum(r.nextInt(alnum.length))).mkString
  }

  final case class Tables(train: DataFrame, valDf: DataFrame, testDf: DataFrame)

  def build(spark: SparkSession, nUsers: Int = 120, nTracks: Int = 200,
      seed: Long = 42L): Tables = {
    import spark.implicits._
    val r = new Random(seed)
    val binEdges = Seq(1, 2, 3, 5, 6, 10, 11, 49, 50, 99, 100, 999, 1000)

    val train = (for {
      u <- 0 until nUsers
      t <- 0 until nTracks
      if t % 10 == u % 10 || r.nextInt(20) == 0
    } yield {
      val structural = t % 10 == u % 10
      val count =
        if (structural) binEdges(r.nextInt(binEdges.length))
        else 1 + r.nextInt(2)
      (userId(u), count, trackId(t), u.toLong * nTracks + t)
    }) ++ Seq( // duplicate (user, track) rows
      (userId(0), 5, trackId(0), 999990L),
      (userId(0), 7, trackId(0), 999991L))

    // val/test: known users on structural tracks, PLUS unseen user and
    // unseen track rows that handleInvalid=skip must drop
    def holdout(users: Range, unseenTag: Int) = (for {
      u <- users
      t <- 0 until nTracks if t % 10 == u % 10
    } yield (userId(u), 1 + r.nextInt(5), trackId(t), 0L)) ++ Seq(
      (userId(90000 + unseenTag), 3, trackId(0), 1L),
      (userId(users.head), 2, trackId(90000 + unseenTag), 2L))

    val cols = Seq("user_id", "count", "track_id", "__index_level_0__")
    Tables(
      train.toDF(cols: _*),
      holdout(0 until 25, 1).toDF(cols: _*),
      holdout(25 until 60, 2).toDF(cols: _*))
  }
}
