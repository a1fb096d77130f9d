package graft

import org.apache.spark.sql.functions._

/** qx115 — leakage-safe splits by near-dup cluster. Pins the contract
  * the hash cannot state: under the cluster scheme every near-dup PAIR
  * is co-split (zero leakage by construction), the naive doc-hash
  * scheme genuinely leaks on this corpus, and the 80/10/10 shape
  * roughly holds. */
class ClusterSplitSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("cluster scheme co-splits every near-dup pair; doc-hash scheme leaks") {
    val out = SparkEntry.queries("qx115_cluster_split")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val leak = out.filter(_._2 == -1L).map(t => t._1 -> t._4).toMap
    assert(leak("cluster") === 0L, "cluster-keyed splits must never split a cluster")
    assert(leak("dochash") > 0L, "the naive scheme must exhibit the leak on this corpus")
    // the strong form, checked directly on the pairs: both ends of every
    // mined near-dup pair land in the same cluster-keyed split
    val P = 2147483647L
    def bucket(c: org.apache.spark.sql.Column) = {
      val s = pmod(pmod(c * 1000003L + 12345L, lit(P)), lit(10L))
      when(s < 8L, lit(0L)).when(s === 8L, lit(1L)).otherwise(lit(2L))
    }
    val labels = SparkEntry.queries("qx20_dup_clusters")(spark, dir)
      .select(col("doc_id"), bucket(col("rep")).as("sp"))
    val pairs = queries.ExtQueries.qx4(spark, dir)
    val crossSplit = pairs
      .join(labels.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sp", "sa"), "doc_a")
      .join(labels.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sp", "sb"), "doc_b")
      .where(col("sa") =!= col("sb")).count()
    assert(crossSplit === 0L, "no mined pair may straddle a cluster-keyed split")
    // 80/10/10 shape (loose: hashing small cluster counts wobbles)
    val cl = out.filter(t => t._1 == "cluster" && t._2 >= 0L)
    val n = cl.map(_._3).sum.toDouble
    val train = cl.find(_._2 == 0L).get._3 / n
    assert(train > 0.7 && train < 0.9, s"train share $train out of band")
  }
}
