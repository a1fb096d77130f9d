package graft

import org.apache.spark.sql.functions._

import graft.operators.BpeTrainer

/** Pins the BPE trainer's merge semantics (qx60/qx61's kernel): the
  * greedy left-to-right non-overlapping fold, count-then-lexicographic
  * tiebreak, hierarchical merges (a learned symbol feeding a later
  * merge), and the token-count contract of the apply side.
  */
class BpeSpec extends SparkTestBase {

  import spark.implicits._

  private def freq(rows: (String, Long)*) = rows.toDF("word", "cnt")

  private def seqsOf(state: org.apache.spark.sql.DataFrame): Map[String, String] =
    state.select("word", "seq").collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("bpe: overlapping run merges greedily left-to-right, non-overlapping") {
    // `aaa` with merge (a,a): greedy L-to-R gives [aa, a], never [a, aa];
    // `aaaa` gives [aa, aa]. This is the case where a replace-all or a
    // right-fold spelling silently diverges from published BPE.
    val (merges, state) = BpeTrainer.train(freq("aaa" -> 1L, "aaaa" -> 1L), steps = 1)
    assert(merges.head.left == "a" && merges.head.right == "a")
    assert(merges.head.pairCount == 5L) // 2 in aaa + 3 in aaaa (pre-merge adjacencies)
    val s = seqsOf(state)
    assert(s("aaa") == "|aa|a|</w>")
    assert(s("aaaa") == "|aa|aa|</w>")
    state.unpersist()
  }

  test("bpe: the size-gated local replay equals the distributed step loop") {
    // Round 17: train() replays the merge loop on the driver below the
    // measured-vocab gate; merges (counts included) and the final state
    // must equal the per-step distributed loop on a fixture with
    // hierarchy, ties and overlapping runs.
    val wf = freq("aaa" -> 2L, "aaaa" -> 1L, "abab" -> 3L, "cd" -> 3L,
      "banana" -> 2L, "bandana" -> 1L)
    val (lm, ls) = BpeTrainer.train(wf, steps = 4)
    val (dm, ds) = BpeTrainer.trainDistributed(wf, steps = 4)
    assert(lm === dm)
    assert(seqsOf(ls) === seqsOf(ds))
  }

  test("bpe: astral (non-BMP) symbols merge identically local and distributed") {
    // "𝕏" (U+1D54F) is two UTF-16 units but one code point. The merged
    // symbol "𝕏y" must cut correctly out of the '|'-fold accumulator in
    // BOTH spellings (ADVICE r17: Spark length/substr count code points,
    // Java String.length counts UTF-16 units — the distributed cut width
    // is now computed in code points). Repeats force a second-level
    // merge THROUGH the astral symbol.
    val wf = freq("𝕏y𝕏y" -> 5L, "𝕏yz" -> 3L, "a𝕏y" -> 2L)
    val (lm, ls) = BpeTrainer.train(wf, steps = 3)
    val (dm, ds) = BpeTrainer.trainDistributed(wf, steps = 3)
    assert(lm === dm)
    assert(seqsOf(ls) === seqsOf(ds))
    assert(lm.exists(m => (m.left + m.right).contains("𝕏")),
      "fixture must actually merge through the astral symbol")
  }

  test("bpe: learned symbols feed later merges (hierarchy)") {
    // Classic corpus: est merges bottom-up through multi-char symbols.
    val (merges, state) = BpeTrainer.train(
      freq("lowest" -> 5L, "low" -> 2L, "newest" -> 6L), steps = 4)
    // (e,s) appears 11x (lowest+newest) - the top pair; then (es,t) 11x...
    val pairs = merges.map(m => (m.left, m.right))
    assert(pairs.head == ("e", "s"), s"got $pairs")
    assert(pairs.contains(("es", "t")), "expected the learned 'es' symbol to feed a later merge")
    val s = seqsOf(state)
    assert(s("newest").contains("est"), s"newest tokenized as ${s("newest")}")
    state.unpersist()
  }

  test("bpe: count ties break lexicographically on (lhs, rhs)") {
    // Two disjoint words, equal freq, each with exactly one distinct
    // pair type of the same total count: (a,b) vs (c,d) -> (a,b) first.
    val (merges, state) = BpeTrainer.train(freq("ab" -> 3L, "cd" -> 3L), steps = 1)
    assert(merges.head.left == "a" && merges.head.right == "b")
    state.unpersist()
  }

  test("bpe apply: token counts shrink monotonically and conserve at step 0") {
    val wf = freq("spark" -> 4L, "sparse" -> 3L, "park" -> 2L)
    val base = BpeTrainer.initState(wf)
      .select(sum(BpeTrainer.tokenCount * col("cnt"))).as[Long].head()
    // chars + end marker per occurrence
    assert(base == 4L * 6 + 3L * 7 + 2L * 5)
    // No symbol ever neighbors itself in this corpus, so every counted
    // pair occurrence is disjoint and each merge step removes EXACTLY
    // pairCount tokens — the conservation identity of the algorithm.
    val (ms, st) = BpeTrainer.train(wf, steps = 3)
    val tot = st.select(sum(BpeTrainer.tokenCount * col("cnt"))).as[Long].head()
    assert(tot == base - ms.map(_.pairCount).sum,
      s"base $base, merges ${ms.map(_.pairCount)}, got $tot")
    st.unpersist()
  }
}
