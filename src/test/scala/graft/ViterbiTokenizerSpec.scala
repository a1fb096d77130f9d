package graft

import org.apache.spark.sql.functions._

import graft.operators.ViterbiTokenizer

/** [[ViterbiTokenizer]]: properties the cross-engine hash cannot state —
  * the DP's OPTIMALITY against brute-force enumeration of every legal
  * segmentation, the validity of the chosen pieces, and the
  * superlinear score actually preferring a long piece over its split
  * (the design claim that makes Viterbi non-trivial here). */
class ViterbiTokenizerSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  /** Every legal segmentation's total score (single chars always
    * legal; longer pieces iff in vocab) — exponential, fine at the
    * fixture's ≤ 8-char words. */
  private def allScores(word: String, vocab: Set[String]): Seq[Long] = {
    def go(pos: Int): Seq[Long] =
      if (pos == word.length) Seq(0L)
      else (1 to math.min(ViterbiTokenizer.MaxPiece, word.length - pos)).flatMap { l =>
        val piece = word.substring(pos, pos + l)
        if (l == 1 || vocab(piece))
          go(pos + l).map(_ + ViterbiTokenizer.score(piece))
        else Seq.empty
      }
    go(0)
  }

  test("DP total equals the brute-force maximum; chosen pieces are a valid legal partition") {
    val words = graft.sources.Tables.documents(spark, dir)
      .select(explode(expr("filter(split(text, ' '), w -> length(w) > 0)")).as("word"))
      .distinct()
    val vocab = ViterbiTokenizer.pieceVocab(words)
      .collect().map(_.getString(0)).toSet
    assert(vocab.nonEmpty, "fixture must yield a non-trivial piece lexicon")
    val ws = words.collect().map(_.getString(0))
    assert(ws.length > 20)
    ws.foreach { w =>
      val pieces = ViterbiTokenizer.piecesOf(w, vocab)
      assert(pieces.mkString == w, s"'$w': pieces must concatenate back")
      assert(pieces.forall(p => p.length == 1 || vocab(p)),
        s"'$w': every multi-char piece must be in the lexicon")
      val total = pieces.map(ViterbiTokenizer.score).sum
      val brute = allScores(w, vocab).max
      assert(total == brute,
        s"'$w': DP total $total != brute-force max $brute (pieces=$pieces)")
    }
    // At least one corpus word genuinely uses a multi-char piece —
    // otherwise the lexicon threshold made the whole exercise trivial.
    assert(ws.exists(w => ViterbiTokenizer.piecesOf(w, vocab).exists(_.length > 1)),
      "no corpus word segmented with a multi-char piece")
  }

  test("superlinear score prefers the long piece over its split; tie-break takes the longer last piece") {
    val vocab = Set("ab", "cd", "abcd")
    // score(abcd) = 1600 + h%50 vs score(ab)+score(cd) = 800 + (<100):
    // the quadratic term dominates, one piece must win.
    assert(ViterbiTokenizer.piecesOf("abcd", vocab) == List("abcd"))
    // Without the 4-gram, the two bigrams beat four singles.
    assert(ViterbiTokenizer.piecesOf("abcd", Set("ab", "cd")) == List("ab", "cd"))
  }

  // ----------------------------------------------------------- hard EM

  private def corpusWords = graft.sources.Tables.documents(spark, dir)
    .select(explode(expr("filter(split(text, ' '), w -> length(w) > 0)")).as("word"))

  test("piecesOfScored under initScores == piecesOf under the bare vocab, word for word") {
    val words = corpusWords.distinct()
    val vocab = ViterbiTokenizer.pieceVocab(words).collect().map(_.getString(0)).toSet
    val ws = words.collect().map(_.getString(0))
    val alphabet = ws.flatMap(_.toCharArray.map(_.toString)).toSet
    val s0 = ViterbiTokenizer.initScores(vocab, alphabet)
    ws.foreach { w =>
      assert(ViterbiTokenizer.piecesOfScored(w, s0) == ViterbiTokenizer.piecesOf(w, vocab),
        s"'$w': scored DP under seed map diverged from the vocab DP")
    }
  }

  test("emRefine equals an independent driver-side replay of count + re-score") {
    val words = corpusWords.distinct()
    val wf = corpusWords.groupBy("word").agg(count(lit(1)).as("freq"))
    val vocab = ViterbiTokenizer.pieceVocab(words).collect().map(_.getString(0)).toSet
    val freqs = wf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val alphabet = freqs.keySet.flatMap(_.toCharArray.map(_.toString))
    val s0 = ViterbiTokenizer.initScores(vocab, alphabet)
    val got = ViterbiTokenizer.emRefine(wf, s0)
    // independent replay: hard counts from the same DP, pure Scala
    val cnt = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    freqs.foreach { case (w, f) =>
      ViterbiTokenizer.piecesOfScored(w, s0).foreach(p => cnt(p) += f)
    }
    val total = cnt.values.sum
    val nv = s0.size.toLong
    val want = s0.keysIterator.map { p =>
      val l = p.length.toLong
      p -> (100L * l * l + (1000000L * (cnt(p) + 1L)) / (total + nv))
    }.toMap
    assert(got === want)
    assert(got.keySet === s0.keySet, "the M-step must never change DP legality")
  }

  test("the refined DP stays total/valid and shifts mass toward used pieces") {
    val words = corpusWords.distinct()
    val wf = corpusWords.groupBy("word").agg(count(lit(1)).as("freq"))
    val vocab = ViterbiTokenizer.pieceVocab(words).collect().map(_.getString(0)).toSet
    val ws = words.collect().map(_.getString(0))
    val alphabet = ws.flatMap(_.toCharArray.map(_.toString)).toSet
    val s0 = ViterbiTokenizer.initScores(vocab, alphabet)
    val s1 = ViterbiTokenizer.emRefine(wf, s0)
    ws.foreach { w =>
      val ps = ViterbiTokenizer.piecesOfScored(w, s1)
      assert(ps.mkString == w, s"'$w': refined pieces must concatenate back")
      assert(ps.forall(s1.contains), s"'$w': refined pieces must stay in the map")
    }
    // every piece the seed segmentation used outscores every UNUSED piece
    // of the same length (the usage term is the only difference)
    val used = ws.flatMap(w => ViterbiTokenizer.piecesOfScored(w, s0)).toSet
    val unusedByLen = (s0.keySet -- used).groupBy(_.length)
    used.foreach { p =>
      unusedByLen.get(p.length).foreach { others =>
        val floor = others.map(s1).max
        assert(s1(p) >= floor,
          s"used piece '$p' (${s1(p)}) must not score below the unused floor $floor")
      }
    }
  }
}
