package graft

/** [[ReleaseGate]] — the qx117 manifest held against the pinned
  * release criteria. Pins the decision function on the real corpus
  * (releasable; the doc-hash leak contrast > 0 rides along
  * informationally) and on doctored manifests exercising each
  * criterion's failure edge. */
class ReleaseGateSpec extends SparkTestBase {

  test("the gate corpus is releasable; the doc-hash contrast shows the closed leak") {
    val rows = ReleaseGate.manifestRows(
      queries.ExtQueries.qx117(spark, "/root/testdata/sf0.001"))
    val (ok, d) = ReleaseGate.evaluate(rows)
    assert(ok, s"gate corpus must be releasable, got $d")
    assert(d("cluster_leaks") === 0L)
    assert(d("dochash_leaks") > 0L,
      "the naive scheme leaks on this corpus — the contrast qx115 documents")
    assert(d("worst_gap_milli") > 0L, "the calibration gap is reported, not hidden")
    assert(d("n_sources") > 0L && d("min_final_tokens") > 0L)
  }

  test("evaluateCorpus: a doctored corpus flips the standing verdict to false end-to-end") {
    import org.apache.spark.sql.functions._
    val docs = sources.Tables.documents(spark, "/root/testdata/sf0.001")
    // healthy committed corpus through the staging path (the DoorSoak
    // cadence readout's exact spelling): releasable
    val (okHealthy, dHealthy) = ReleaseGate.evaluateCorpus(spark, docs,
      tmpDir("relgate_healthy"))
    assert(okHealthy, s"the gate corpus staged through evaluateCorpus must pass, got $dHealthy")
    // doctored: every text collapsed to one token — the whole corpus
    // fails the Gopher gate, the curated yield is empty, and the
    // CORPUS (not a doctored manifest row) flips the verdict
    val (okDoc, dDoc) = ReleaseGate.evaluateCorpus(spark,
      docs.withColumn("text", lit("x")), tmpDir("relgate_doctored"))
    assert(!okDoc, s"a zero-yield corpus must fail the standing gate, got $dDoc")
    assert(dDoc("final_langs") === 0L, "the failure is the empty curated yield")
  }

  test("the serving ledger reports each ANN family's audit summary") {
    import org.apache.spark.sql.functions.col
    val led = ReleaseGate.servingLedger(spark, "/root/testdata/sf0.001")
    assert(led.keySet === Set("lsh_recall5_micro", "graph_recall1_micro",
      "ivfadc_recall5_micro"))
    led.values.foreach(v => assert(v >= 0L && v <= 1000000L))
    val direct = queries.ExtQueries.qx118(spark, "/root/testdata/sf0.001")
      .where(col("hits") === -1L).head.getAs[Long]("recall_micro")
    assert(led("lsh_recall5_micro") === direct,
      "the ledger must be the audit row's own summary, nothing recomputed differently")
  }

  test("each criterion's failure edge flips the verdict") {
    val base = ReleaseGate.manifestRows(
      queries.ExtQueries.qx117(spark, "/root/testdata/sf0.001"))
    def flipped(f: Array[(String, String, Long)] => Array[(String, String, Long)]) =
      ReleaseGate.evaluate(f(base))._1
    // a leaked cluster in the cluster-keyed scheme
    assert(!flipped(_.map {
      case ("splits", k, _) if k == "cluster/split:-1/clusters" => ("splits", k, 3L)
      case r => r
    }), "cluster leaks must fail the gate")
    // a language whose final budget collapsed to zero
    assert(!flipped(_.map {
      case ("final", k, _) if k.endsWith("/tokens") => ("final", k, 0L)
      case r => r
    }), "a zero-yield language must fail the gate")
    // a card missing its majority-language row
    assert(!flipped(_.filterNot { case (s, k, _) =>
      s == "card" && k.contains("/major:")
    }), "an incomplete card must fail the gate")
    // the calibration gap is informational — worsening it alone must NOT flip
    assert(flipped(_.map {
      case ("calibration", k, _) if k.endsWith("/gap_milli") => ("calibration", k, 999L)
      case r => r
    }), "calibration is reported, never a silent threshold")
  }
}
