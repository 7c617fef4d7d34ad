package graft

import org.apache.spark.sql.functions._
import graft.operators.ExactSubstr

/** Planted-duplicate laws for the ExactSubstr operator (VERDICT r12 #6):
  * maximal shared spans with exact arbitrary boundaries, including the
  * edge cases the anchor+islands construction must get right —
  * overlapping anchor runs, adjacent-but-mismatched spans, repeats on
  * several diagonals, and sub-threshold suppression. k=4, minLen=6 here
  * so fixtures stay readable; the registered d16 uses k=8, minLen=12.
  */
class ExactSubstrSpec extends SparkSpec {

  private val K = 4
  private val L = 6

  private def spans(docs: (Long, String)*): Seq[(Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    val df = docs.toSeq.toDF("doc_id", "text")
    ExactSubstr.maximalSpans(
        ExactSubstr.anchors(df, lower(col("text")), K), K, L)
      .orderBy("doc_a", "doc_b", "start_a", "start_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
  }

  private def words(n: Int, tag: String): String =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  test("a planted verbatim run is reported once with exact boundaries") {
    // doc2 embeds tokens 3..10 of doc1 (8 tokens) at position 4
    val shared = "c3 c4 c5 c6 c7 c8 c9 c10"
    val got = spans(
      1L -> s"a1 a2 $shared a11 a12",
      2L -> s"b1 b2 b3 $shared b12")
    assert(got === Seq((1L, 2L, 3L, 4L, 8L)),
      s"one maximal span, exact ends; got $got")
  }

  test("overlapping k-gram anchors merge into ONE maximal span") {
    // a 10-token shared run yields 7 overlapping 4-gram anchors on one
    // diagonal — the islands pass must merge them, never emit 7 spans
    val shared = words(10, "s")
    val got = spans(1L -> s"x1 $shared", 2L -> s"$shared y1 y2")
    assert(got === Seq((1L, 2L, 2L, 1L, 10L)))
  }

  test("adjacent runs split by a single mismatch stay TWO spans") {
    // same diagonal, 7 matching tokens, one mismatch, 7 more matching:
    // the mismatch kills every k-gram crossing it, leaving two islands
    val a = "s1 s2 s3 s4 s5 s6 s7 DIFFA t1 t2 t3 t4 t5 t6 t7"
    val b = "s1 s2 s3 s4 s5 s6 s7 DIFFB t1 t2 t3 t4 t5 t6 t7"
    val got = spans(1L -> a, 2L -> b)
    assert(got === Seq((1L, 2L, 1L, 1L, 7L), (1L, 2L, 9L, 9L, 7L)),
      s"mismatch must split the run; got $got")
  }

  test("a repeated region reports every (pair, diagonal) occurrence") {
    // doc2 contains the shared run TWICE -> two diagonals, two rows
    val shared = words(6, "r")
    val got = spans(
      1L -> s"p1 $shared p2",
      2L -> s"$shared q1 q2 q3 $shared")
    assert(got === Seq((1L, 2L, 2L, 1L, 6L), (1L, 2L, 2L, 10L, 6L)),
      s"both occurrences carry the span; got $got")
  }

  test("runs below minLen (but >= k) and below k are suppressed") {
    val got = spans(
      1L -> s"${words(5, "m")} z1 z2 z3", // 5-token shared run: >= k, < L
      2L -> s"${words(5, "m")} w1 w2 w3",
      3L -> "n1 n2 n3 o1 o2 o3 o4 o5", // 3-token run with doc 4: < k
      4L -> "n1 n2 n3 x1 x2 x3 x4 x5")
    assert(got.isEmpty, s"sub-threshold runs must not surface; got $got")
  }

  test("three-way duplicate reports every ordered pair exactly once") {
    val shared = words(7, "w")
    val got = spans(1L -> shared, 2L -> shared, 3L -> shared)
    assert(got === Seq((1L, 2L, 1L, 1L, 7L), (1L, 3L, 1L, 1L, 7L),
      (2L, 3L, 1L, 1L, 7L)))
  }

  test("hashedAnchors mode (the corpus-scale shuffle concession) agrees " +
      "with the exact text-keyed mode on the seeded fixtures") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val vocab = Array("v0", "v1", "v2")
      def tok(doc: Int, i: Int) =
        vocab(math.abs((doc * 31 + i * 17 + seed * 7919) % 3))
      val n = 40
      val docs = (1 to 3).map(d =>
        (d.toLong, (1 to n).map(i => tok(d, i)).mkString(" ")))
      val df = docs.toDF("doc_id", "text")
      val occ = ExactSubstr.anchors(df, lower(col("text")), K)
      val exact = ExactSubstr.maximalSpans(occ, K, L)
        .collect().map(_.toSeq).toSet
      val hashed = ExactSubstr.maximalSpans(occ, K, L, hashedAnchors = true)
        .collect().map(_.toSeq).toSet
      assert(hashed === exact, s"seed=$seed: hashed-anchor output diverged")
    }
  }

  // ----- selfMaximalSpans (d17): within-document repeats ---------------

  private def selfSpans(docs: (Long, String)*): Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    val df = docs.toSeq.toDF("doc_id", "text")
    ExactSubstr.selfMaximalSpans(
        ExactSubstr.anchors(df, lower(col("text")), K), K, L)
      .orderBy("doc_id", "start_a", "start_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  test("a planted within-document repeat is reported with exact boundaries") {
    // tokens 2..9 repeat at position 11 — one (start_a, start_b, len) row
    val rep = words(8, "r")
    val got = selfSpans(1L -> s"a1 $rep a2 $rep a3 a4")
    assert(got === Seq((1L, 2L, 11L, 8L)), s"got $got")
  }

  test("tandem repeat with period < k is ONE overlapping-sides run") {
    // period-2 tandem: "x y" * 8 = 16 tokens. On diagonal off=2 the
    // maximal match is w[1..14] == w[3..16] (sides OVERLAP — a valid
    // repeat); diagonals 4, 6, 8, 10 carry the shorter echoes >= L
    val t = (1 to 8).flatMap(_ => Seq("x", "y")).mkString(" ")
    val got = selfSpans(1L -> t)
    val want = (2 to 10 by 2).collect {
      case off if 16 - off >= L => (1L, 1L, (1 + off).toLong, (16 - off).toLong)
    }
    assert(got === want, s"got $got want $want")
  }

  test("three occurrences of one span report every ordered position pair") {
    val rep = words(6, "q")
    val got = selfSpans(1L -> s"$rep z1 $rep z2 z3 $rep")
    // occurrences at 1, 8, 16 -> pairs (1,8), (1,16), (8,16)
    assert(got === Seq((1L, 1L, 8L, 6L), (1L, 1L, 16L, 6L),
      (1L, 8L, 16L, 6L)), s"got $got")
  }

  test("self-repeats below minLen and the off=0 self-diagonal are suppressed") {
    // a 5-token repeat (>= k, < L) and a doc with no repeat at all:
    // nothing surfaces — in particular no row from anchors matching
    // themselves at off = 0
    val rep = words(5, "u")
    val got = selfSpans(
      1L -> s"$rep c1 c2 c3 $rep",
      2L -> words(20, "fresh"))
    assert(got.isEmpty, s"got $got")
  }

  test("selfMaximalSpans agrees with a brute-force diagonal scan on " +
      "seeded small-vocab fixtures (dense accidental self-overlap)") {
    for (seed <- 1 to 6; vsize <- 2 to 4) {
      val vocab = (0 until vsize).map(v => s"v$v").toArray
      def tok(i: Int) =
        vocab(math.abs((i * 17 + seed * 7919) % vsize))
      val n = 30 + seed * 3
      val w = (1 to n).map(tok).toArray
      val got = selfSpans(1L -> w.mkString(" ")).toSet
      val want = (for {
        off <- 1 to (n - 1)
        run <- {
          val ms = (0 until n - off).filter(i => w(i) == w(i + off))
          ms.foldLeft(List.empty[List[Int]]) {
            case (acc, i) if acc.nonEmpty && acc.head.head == i - 1 =>
              (i :: acc.head) :: acc.tail
            case (acc, i) => List(i) :: acc
          }
        }
        len = run.length if len >= L
      } yield (1L, (run.min + 1).toLong, (run.min + 1 + off).toLong,
        len.toLong)).toSet
      assert(got === want, s"seed=$seed vsize=$vsize: got=$got want=$want")
    }
  }

  test("agrees with a brute-force maximal-common-substring scan across " +
      "seeded fixtures (small vocab forces rich overlap structure)") {
    // deterministic pseudo-random fixtures checked against an O(n*m)
    // diagonal-walk reference; vocab sizes 2..4 create dense accidental
    // repeats (the hardest case for islands bookkeeping)
    for (seed <- 1 to 6; vsize <- 2 to 4) {
      val vocab = (0 until vsize).map(v => s"v$v").toArray
      def tok(doc: Int, i: Int) =
        vocab(math.abs((doc * 31 + i * 17 + seed * 7919) % vsize))
      val n = 30 + seed * 3
      val d1 = (1 to n).map(i => tok(1, i)).toArray
      val d2 = (1 to n).map(i => tok(2, i)).toArray
      val got = spans(1L -> d1.mkString(" "), 2L -> d2.mkString(" ")).toSet
      val want = (for {
        off <- -(n - 1) to (n - 1)
        run <- {
          val ms = (0 until n).filter { i =>
            val j = i - off
            j >= 0 && j < n && d1(i) == d2(j)
          }
          ms.foldLeft(List.empty[List[Int]]) {
            case (acc, i) if acc.nonEmpty && acc.head.head == i - 1 =>
              (i :: acc.head) :: acc.tail
            case (acc, i) => List(i) :: acc
          }
        }
        len = run.length if len >= L
      } yield (1L, 2L, (run.min + 1).toLong, (run.min + 1 - off).toLong,
        len.toLong)).toSet
      assert(got === want, s"seed=$seed vsize=$vsize: got=$got want=$want")
    }
  }
}
