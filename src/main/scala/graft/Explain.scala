package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of selected queries
  * (default: a representative set) so scan pushdown, broadcast choices and
  * whole-stage-codegen spans can be reviewed.
  *
  * Usage: sbt "runMain graft.Explain [sfDir] [query ...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("s1_scan_filter_project", "j1_broadcast_join_agg",
        "w1_rolling_sma", "q1_lineitem_agg", "q3_shipping_priority",
        "e1_cosine_topk", "x3_minhash_lsh_pairs", "a2_window_stats",
        "aj1_asof_join", "rj1_interval_join", "d3_ngram_jaccard_pairs",
        "e2_cosine_neardup_pairs", "x8_ivf_topk", "w10_grouped_topk",
        "ct1_contamination", "d7_winnow_pairs", "c4_group_sample",
        "q18_large_orders", "q12_priority_counts", "f1_funnel_conversion",
        "c5_temperature_mix", "z1_zorder_key", "e3_knn_join",
        "t11_relative_quality_gate", "f2_cohort_retention",
        "st1_table_stats", "dq1_quality_checks",
        "p15_json_extract", "h1_length_histogram",
        "d8v_simhash_band_complete", "e3v_knn_scores_match",
        "e3r_knn_recall", "x6_media_features", "x13_media_resize",
        "d9_cluster_keep_best", "t10_unigram_lm_score", "x4r_ann_recall",
        "r3_grouping_sets", "w12_range_frame")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
