package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CoreQueries => Q, ExtOracle, ExtQueries => X, Oracle}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each entry in [[queries]] is a deterministic batch twin of one operator
  * family from SURVEY.md §2; [[oracleSql]] carries its DuckDB formulation.
  */
object SparkEntry {
  /** Flagship query (reference Q/AverageSensorReadings.java:61-79) on
    * sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Q.q04(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_stateless_pipeline" -> (Q.q01 _),
    "q02_rolling_max"        -> (Q.q02 _),
    "q03_rolling_sum"        -> (Q.q03 _),
    "q04_window_avg"         -> (Q.q04 _),
    "q05_broadcast_alert"    -> (Q.q05 _),
    "q05b_asof_shuffled"     -> (Q.q05b _),
    "q06_sliding_window"     -> (Q.q06 _),
    "q07_session_window"     -> (Q.q07 _),
    "q08_delta_alert"        -> (Q.q08 _),
    "q09_interval_join"      -> (Q.q09 _),
    "q10_window_join"        -> (Q.q10 _),
    "q11_union"              -> (Q.q11 _),
    "q12_late_data"          -> (Q.q12 _),
    "q13_count_window"       -> (Q.q13 _),
    "q14_udaf_avg"           -> (Q.q14 _),
    "q15_txn_sink"           -> (Q.q15 _),
    "q16_lineitem_pricing"   -> (Q.q16 _),
    "q17_segment_revenue"    -> (Q.q17 _),
    "q18_rolling_minmax"     -> (Q.q18 _),
    "q19_median"             -> (Q.q19 _),
    "qx1_exact_dedup"        -> (X.qx1 _),
    "qx2_cosine_topk"        -> (X.qx2 _),
    "qx3_ann_lsh"            -> (X.qx3 _),
    "qx4_minhash_lsh"        -> (X.qx4 _),
    "qx5_simhash"            -> (X.qx5 _),
    "qx6_ngram_jaccard"      -> (X.qx6 _),
    "qx7_text_stats"         -> (X.qx7 _),
    "qx8_langid"             -> (X.qx8 _),
    "qx9_token_count"        -> (X.qx9 _),
    "qx10_fingerprint"       -> (X.qx10 _),
    "qx11_multimodal"        -> (X.qx11 _),
    "qx12_embed_neardup"     -> (X.qx12 _),
    "qx13_ann_ivf"           -> (X.qx13 _),
    "qx14_simhash_neardup"   -> (X.qx14 _),
    "qx15_ann_imi"           -> (X.qx15 _),
    "qx16_ann_kmeans"        -> (X.qx16 _),
    "qx17_substring_dup"     -> (X.qx17 _),
    "qx18_distinct_sketch"   -> (X.qx18 _),
    "qx19_heavy_hitters"     -> (X.qx19 _),
    "qx20_dup_clusters"      -> (X.qx20 _),
    "qx21_stratified_sample" -> (X.qx21 _),
    "qx22_curation_pipeline" -> (X.qx22 _),
    "qx23_length_quantiles"  -> (X.qx23 _),
    "qx24_chunking"          -> (X.qx24 _),
    "qx25_seq_packing"       -> (X.qx25 _),
    "qx26_rare_terms"        -> (X.qx26 _),
    "qx27_proportional_sample" -> (X.qx27 _),
    "qx28_pca_project"       -> (X.qx28 _),
    "qx29_decontaminate"     -> (X.qx29 _),
    "qx30_split"             -> (X.qx30 _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_stateless_pipeline" -> Oracle.q01,
    "q02_rolling_max"        -> Oracle.q02,
    "q03_rolling_sum"        -> Oracle.q03,
    "q04_window_avg"         -> Oracle.q04,
    "q05_broadcast_alert"    -> Oracle.q05,
    "q05b_asof_shuffled"     -> Oracle.q05, // same semantics, shuffled plan
    "q06_sliding_window"     -> Oracle.q06,
    "q07_session_window"     -> Oracle.q07,
    "q08_delta_alert"        -> Oracle.q08,
    "q09_interval_join"      -> Oracle.q09,
    "q10_window_join"        -> Oracle.q10,
    "q11_union"              -> Oracle.q11,
    "q12_late_data"          -> Oracle.q12,
    "q13_count_window"       -> Oracle.q13,
    "q14_udaf_avg"           -> Oracle.q14,
    "q15_txn_sink"           -> Oracle.q15,
    "q16_lineitem_pricing"   -> Oracle.q16,
    "q17_segment_revenue"    -> Oracle.q17,
    "q18_rolling_minmax"     -> Oracle.q18,
    "q19_median"             -> Oracle.q19,
    "qx1_exact_dedup"        -> ExtOracle.qx1,
    "qx2_cosine_topk"        -> ExtOracle.qx2,
    "qx3_ann_lsh"            -> ExtOracle.qx3,
    "qx4_minhash_lsh"        -> ExtOracle.qx4,
    "qx5_simhash"            -> ExtOracle.qx5,
    "qx6_ngram_jaccard"      -> ExtOracle.qx6,
    "qx7_text_stats"         -> ExtOracle.qx7,
    "qx8_langid"             -> ExtOracle.qx8,
    "qx9_token_count"        -> ExtOracle.qx9,
    "qx10_fingerprint"       -> ExtOracle.qx10,
    "qx11_multimodal"        -> ExtOracle.qx11,
    "qx12_embed_neardup"     -> ExtOracle.qx12,
    "qx13_ann_ivf"           -> ExtOracle.qx13,
    "qx14_simhash_neardup"   -> ExtOracle.qx14,
    "qx15_ann_imi"           -> ExtOracle.qx15,
    "qx16_ann_kmeans"        -> ExtOracle.qx16,
    "qx17_substring_dup"     -> ExtOracle.qx17,
    "qx18_distinct_sketch"   -> ExtOracle.qx18,
    "qx19_heavy_hitters"     -> ExtOracle.qx19,
    "qx20_dup_clusters"      -> ExtOracle.qx20,
    "qx21_stratified_sample" -> ExtOracle.qx21,
    "qx22_curation_pipeline" -> ExtOracle.qx22,
    "qx23_length_quantiles"  -> ExtOracle.qx23,
    "qx24_chunking"          -> ExtOracle.qx24,
    "qx25_seq_packing"       -> ExtOracle.qx25,
    "qx26_rare_terms"        -> ExtOracle.qx26,
    "qx27_proportional_sample" -> ExtOracle.qx27,
    "qx29_decontaminate"     -> ExtOracle.qx29,
    "qx30_split"             -> ExtOracle.qx30,
  )
}
