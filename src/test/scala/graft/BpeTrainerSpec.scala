package graft

import org.apache.spark.sql.functions._
import graft.operators.BpeTrainer

/** BPE learning against the hand-computed merge sequence of a planted
  * corpus (the Sennrich-paper-style fixture, sans end-of-word marker),
  * plus the greedy-scan law of the merge-apply fold.
  */
class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  // low x5, lower x2, newest x6, widest x3. Hand-computed pair counts:
  //   step 1: es=9 st=9 tie -> (e,s) n=9
  //   step 2: (es,t) n=9
  //   step 3: lo=7 ow=7 tie -> (l,o) n=7
  //   step 4: (lo,w) n=7
  private val fixture = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("learns the hand-computed merge sequence with exact counts") {
    val got = BpeTrainer.train(fixture.toDF("word", "cnt"), "word", "cnt",
      merges = 4)
    val expect = Seq(
      ("e", "s", "es", 9L), ("es", "t", "est", 9L),
      ("l", "o", "lo", 7L), ("lo", "w", "low", 7L))
    assert(got.map(m => (m.left, m.right, m.merged, m.pairCount)) === expect)
    assert(got.map(_.step) === Seq(1, 2, 3, 4))
  }

  test("stops early when no pair repeats") {
    // every word is a single char: no adjacent pairs at all
    val got = BpeTrainer.train(
      Seq(("a", 5L), ("b", 3L)).toDF("word", "cnt"), "word", "cnt", merges = 3)
    assert(got.isEmpty)
  }

  test("merge apply is greedy left-to-right: aaa -> [aa, a], aaaa -> [aa, aa]") {
    val df = Seq("aaa", "aaaa").toDF("w")
      .select(col("w"), BpeTrainer.applyMerge(split(col("w"), ""), "a", "a").as("m"))
    val got = df.orderBy("w").collect().map(_.getSeq[String](1).toList).toList
    assert(got === List(List("aa", "a"), List("aa", "aa")))
  }

  test("merged symbols participate in later merges") {
    // (a,b)->ab then (ab,c)->abc
    val words = Seq(("abc", 4L), ("ab", 3L)).toDF("word", "cnt")
    val got = BpeTrainer.train(words, "word", "cnt", merges = 2)
    assert(got.map(m => (m.left, m.right, m.pairCount)) ===
      Seq(("a", "b", 7L), ("ab", "c", 4L)))
  }

  test("encode replays learned merges: 'lowest' -> [low, est]") {
    val merges = BpeTrainer.train(fixture.toDF("word", "cnt"), "word", "cnt", 4)
    val got = Seq("lowest", "low", "newest", "xyz").toDF("w")
      .select(col("w"), BpeTrainer.encode(col("w"), merges).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    // "lowest" was never a training word, but its pieces were
    assert(got("lowest") === List("low", "est"))
    assert(got("low") === List("low"))
    assert(got("newest") === List("n", "e", "w", "est"))
    // unseen characters stay single symbols
    assert(got("xyz") === List("x", "y", "z"))
  }

  test("encodeLooped == fused encode on the learned table (incl null/empty)") {
    val merges = BpeTrainer.train(fixture.toDF("word", "cnt"), "word", "cnt", 4)
    val sample = Seq(Some("lowest"), Some("low"), Some("newest"), Some("xyz"),
      Some(""), None).toDF("w")
    val both = sample.select(
      BpeTrainer.encode(col("w"), merges).as("fused"),
      BpeTrainer.encodeLooped(col("w"), merges).as("looped"))
    assert(both.filter(not(col("fused") <=> col("looped"))).count() === 0L)
  }

  test("encode dispatches past MaxFusedMerges and still replays in order") {
    // 40 chained merges over a 41-char alphabet: a+b -> ab, ab+c -> abc, ...
    // correct ordered replay collapses the whole alphabet to ONE symbol.
    val alphabet = (('a' to 'z') ++ ('A' to 'O')).map(_.toString)
    val chained = alphabet.tail.scanLeft(("", alphabet.head)) {
      case ((_, acc), ch) => (ch, acc + ch)
    }.tail.zipWithIndex.map { case ((ch, merged), i) =>
      BpeTrainer.Merge(i + 1, merged.dropRight(ch.length), ch, merged, 1L)
    }
    assert(chained.size > BpeTrainer.MaxFusedMerges)
    val got = Seq(alphabet.mkString).toDF("w")
      .select(BpeTrainer.encode(col("w"), chained).as("toks"))
      .head().getSeq[String](0).toList
    // trailing "" from Catalyst's split(w, "") stays an unmerged symbol
    assert(got.filter(_.nonEmpty) === List(alphabet.mkString))
  }

  test("checkpointed training learns the same merges") {
    val dir = Scratch.dir(spark, "bpe_spec")
    val plain = BpeTrainer.train(fixture.toDF("word", "cnt"), "word", "cnt", 4)
    val ck = BpeTrainer.train(fixture.toDF("word", "cnt"), "word", "cnt", 4,
      checkpointDir = Some(dir))
    assert(plain === ck)
  }

  // ----- batched trainer (the vocabulary-scale path, VERDICT r9 #4) -----

  test("trainBatched(batch=1) degenerates to greedy bit-identically") {
    for (corpus <- Seq(fixture,
        Seq(("abc", 4L), ("ab", 3L)),
        Seq(("banana", 3L), ("bandana", 2L), ("nab", 5L)))) {
      val greedy = BpeTrainer.train(corpus.toDF("word", "cnt"), "word", "cnt", 5)
      val batched = BpeTrainer.trainBatched(corpus.toDF("word", "cnt"),
        "word", "cnt", merges = 5, batch = 1)
      assert(batched.merges === greedy,
        s"batch=1 must equal greedy on $corpus")
      // one round per learned merge, plus at most one empty-probe round
      // when the corpus exhausts before the merge budget
      assert(batched.rounds >= greedy.size &&
        batched.rounds <= greedy.size + 1,
        s"batch=1 rounds=${batched.rounds} vs ${greedy.size} merges")
    }
  }

  test("non-interacting top pairs: batched == greedy in ONE round") {
    // each doubled-pair word keeps its (x,y) count strictly above every
    // pair that shares a symbol with it ((y,x), (y,'') trailers), and the
    // four alphabets are disjoint — so greedy's first four merges are
    // exactly the four admitted candidates, in the same order.
    val corpus = Seq(("abab", 9L), ("cdcd", 8L), ("efef", 7L), ("ghgh", 6L))
    val greedy = BpeTrainer.train(corpus.toDF("word", "cnt"), "word", "cnt", 4)
    val batched = BpeTrainer.trainBatched(corpus.toDF("word", "cnt"),
      "word", "cnt", merges = 4, batch = 4)
    assert(greedy.map(m => (m.left, m.right, m.pairCount)) ===
      Seq(("a", "b", 18L), ("c", "d", 16L), ("e", "f", 14L), ("g", "h", 12L)))
    assert(batched.merges === greedy)
    assert(batched.rounds === 1, "4 disjoint merges amortize to one round")
  }

  test("interacting candidates are deferred to a fresh recount, never " +
      "applied on stale counts") {
    // (p,q) and (q,x) tie at 10 but share q: the batch admits (p,q),
    // SKIPS (q,x), and fills with disjoint (r,s) — while greedy's step 2
    // is the (pq,x) pair its first merge creates. The documented
    // divergence regime, pinned exactly.
    val corpus = Seq(("pqx", 10L), ("rs", 4L))
    val batched = BpeTrainer.trainBatched(corpus.toDF("word", "cnt"),
      "word", "cnt", merges = 2, batch = 2)
    assert(batched.merges.map(m => (m.left, m.right, m.pairCount)) ===
      Seq(("p", "q", 10L), ("r", "s", 4L)))
    assert(batched.rounds === 1)
    val greedy = BpeTrainer.train(corpus.toDF("word", "cnt"), "word", "cnt", 2)
    assert(greedy.map(m => (m.left, m.right, m.pairCount)) ===
      Seq(("p", "q", 10L), ("pq", "x", 10L)))
    // the deferred (q,x) pair is impossible after (p,q) merges — the
    // next ROUND's recount sees it gone, so it is never learned stale
    assert(!batched.merges.exists(m => m.left == "q" && m.right == "x"))
  }

  test("batched checkpointing keeps the table identical and rounds scale " +
      "as ~merges/batch") {
    val corpus = Seq(("abab", 9L), ("cdcd", 8L), ("efef", 7L), ("ghgh", 6L),
      ("ijij", 5L), ("klkl", 4L), ("mnmn", 3L), ("opop", 2L))
    val dir = Scratch.dir(spark, "bpe_batch_spec")
    val plain = BpeTrainer.trainBatched(corpus.toDF("word", "cnt"),
      "word", "cnt", merges = 8, batch = 4)
    val ck = BpeTrainer.trainBatched(corpus.toDF("word", "cnt"),
      "word", "cnt", merges = 8, batch = 4, checkpointDir = Some(dir))
    assert(plain === ck)
    assert(plain.rounds <= 3,
      s"8 merges at batch=4 over disjoint alphabets should take ~2 rounds, " +
        s"got ${plain.rounds}")
  }

  test("train refuses past MaxTrainRounds (one driver round-trip per " +
      "merge — vocabulary scale needs a batched trainer)") {
    val e = intercept[IllegalArgumentException] {
      BpeTrainer.train(fixture.toDF("word", "cnt"), "word", "cnt",
        BpeTrainer.MaxTrainRounds + 1)
    }
    assert(e.getMessage.contains("MaxTrainRounds"))
    // and the bound itself sits where the scaladoc claims: comfortably
    // above bench's K=64 point, far below a 10k+ vocabulary
    assert(BpeTrainer.MaxTrainRounds >= 64 && BpeTrainer.MaxTrainRounds < 10000)
  }
}
