package graft

import org.apache.spark.sql.functions._

/** The round-13 audit rows (qx118 recall, qx119 shard-fold, qx120
  * dedup Venn) pinned against independent driver-side recomputations
  * from their constituent gate spellings — the semantics the
  * cross-engine hash alone cannot state (that the summary numbers
  * really are the recall / the fold gap / the membership cells of the
  * rows they audit). */
class AuditRowsSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("qx118: histogram covers every query once and the summary row IS recall@5") {
    val brute = queries.ExtQueries.qx2(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    val lsh = queries.ExtQueries.qx3(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    val out = SparkEntry.queries("qx118_ann_recall_audit")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val hist = out.filter(_._1 >= 0)
    val summary = out.find(_._1 == -1L).get
    assert(hist.map(_._2).sum === brute.size.toLong, "histogram must cover every query once")
    val hits = brute.map { case (q, bs) =>
      val ls = lsh.getOrElse(q, Array.empty).map(_._2).toSet
      bs.count(t => ls(t._2)).toLong
    }.sum
    assert(summary._2 === brute.size.toLong)
    assert(summary._3 === 1000000L * hits / (5L * brute.size),
      "summary recall_micro must equal the driver-side recomputation")
    // per-cell recount
    val cells = brute.map { case (q, bs) =>
      bs.count(t => lsh.getOrElse(q, Array.empty).map(_._2).toSet(t._2)).toLong
    }.groupBy(identity).map { case (h, qs) => h -> qs.size.toLong }
    hist.foreach { case (h, n, _) => assert(cells.getOrElse(h, 0L) === n, s"cell $h") }
  }

  test("qx119: volume folds exactly; every planted dup crosses the parity shards") {
    val rows = SparkEntry.queries("qx119_shard_card_fold")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, fold, global, lo, gl, cross) =>
      assert(fold === global, s"$src: volume must be shard-summable")
      assert(cross === gl - lo, s"$src: cross must be the fold shortfall")
      assert(lo === 0L,
        s"$src: the planted neighbor-copy dups all straddle parity, so shard-local sees none")
    }
    assert(rows.map(_._5).sum > 0L, "the corpus plants cross-shard dups — global must see them")
  }

  test("qx121: the summary row IS graph-ANN recall@top1 recomputed from qx2/qx109") {
    val brute1 = queries.ExtQueries.qx2(spark, dir).where(col("rk") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val beam = queries.ExtQueries.qx109(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    val out = SparkEntry.queries("qx121_graph_recall")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val found = brute1.count { case (q, nn) =>
      beam.getOrElse(q, Array.empty).exists(_._2 == nn) }.toLong
    val summary = out.find(_._1 == -1L).get
    assert(summary._2 === brute1.size.toLong)
    assert(summary._3 === 1000000L * found / brute1.size)
    assert(out.filter(_._1 >= 0).map(_._2).sum === brute1.size.toLong)
    assert(out.find(_._1 == 1L).map(_._2).getOrElse(0L) === found)
  }

  test("qx122: the summary row IS IVFADC recall@5 recomputed from qx2/qx44") {
    val brute = queries.ExtQueries.qx2(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    val adc = queries.ExtQueries.qx44(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    val out = SparkEntry.queries("qx122_ivfadc_recall")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val hist = out.filter(_._1 >= 0)
    val summary = out.find(_._1 == -1L).get
    assert(hist.map(_._2).sum === brute.size.toLong, "histogram must cover every query once")
    val hits = brute.map { case (q, bs) =>
      val as = adc.getOrElse(q, Array.empty).map(_._2).toSet
      bs.count(t => as(t._2)).toLong
    }.sum
    assert(summary._2 === brute.size.toLong)
    assert(summary._3 === 1000000L * hits / (5L * brute.size),
      "summary recall_micro must equal the driver-side recomputation")
  }

  test("qx123: every family's summary row IS its recall@5 recomputed from the gate spellings") {
    val brute = queries.ExtQueries.qx2(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    val fams = Map(
      "ivf" -> queries.ExtQueries.qx13(spark, dir),
      "imi" -> queries.ExtQueries.qx15(spark, dir),
      "kmeans" -> queries.ExtQueries.qx16(spark, dir))
    val out = SparkEntry.queries("qx123_ivf_family_recall")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSet === fams.keySet, "one ledger block per family")
    fams.foreach { case (fam, df) =>
      val served = df.collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      val rows = out.filter(_._1 == fam)
      val summary = rows.find(_._2 == -1L).get
      assert(rows.filter(_._2 >= 0).map(_._3).sum === brute.size.toLong,
        s"$fam: histogram must cover every query once")
      val hits = brute.map { case (q, bs) =>
        val ss = served.getOrElse(q, Array.empty).map(_._2).toSet
        bs.count(t => ss(t._2)).toLong
      }.sum
      assert(summary._3 === brute.size.toLong, s"$fam: summary n_queries")
      assert(summary._4 === 1000000L * hits / (5L * brute.size),
        s"$fam: summary recall_micro must equal the driver-side recomputation")
    }
  }

  test("qx120: cells recount the three families' pair sets exactly") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val m = pairs(queries.ExtQueries.qx4(spark, dir))
    val s = pairs(queries.ExtQueries.qx14(spark, dir).select("doc_a", "doc_b"))
    val e = pairs(queries.ExtQueries.qx12(spark, dir).select("vec_a", "vec_b"))
    val expected = (m ++ s ++ e).toSeq
      .groupBy(p => (if (m(p)) 1L else 0L, if (s(p)) 1L else 0L, if (e(p)) 1L else 0L))
      .map { case (k, ps) => k -> ps.size.toLong }
    val out = SparkEntry.queries("qx120_dedup_venn")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(out === expected, "Venn cells must recount the constituent pair sets")
    // the corpus fact the row documents: lexical channels corroborate
    // each other on planted copies; the text-independent embeddings
    // never join them (structural triple-cell emptiness)
    assert(out.keySet.forall { case (mm, ss, ee) => !(ee == 1L && (mm == 1L || ss == 1L)) },
      "synthetic embeddings are text-independent — no mixed semantic/lexical cell here")
  }
}
