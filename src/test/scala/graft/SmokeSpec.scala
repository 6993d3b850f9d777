package graft

/** Every driver-contract query runs and returns rows at sf0.001 — the
  * same smoke the driver applies to `SparkEntry.entry`. */
class SmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has an oracle or a documented rows-only check") {
    val rowsOnly = Set("q02_metadata", "q05b_bpe", "q10_index_roundtrip",
      "q18_multimodal", "q61b_opq_search", "q75_mmr", "q94_pca",
      "q117_nsw_search", "q118_nsw_append", "q121_bpe_train",
      "q124_nsw_filtered", "q125_compress_signal", "q140b_hll_distinct",
      "q144_audio_stats", "q145_nsw_recall", "q146_nsw_rank_metrics",
      "q149_tar_shards", "q151_index_sync", "q152_serving_audit",
      "q158_safetensors", "q163_lrs_report", "q167_packed_export",
      "q168_exactsubstr_remove", "q172_seeding_quality",
      "q175_image_phash", "q180_text_index_sync", "q181_image_dedup",
      "q187_optimize_commit", "q189_gdpr_erase", "q193_image_hash_sync",
      "q197_quality_classifier", "q198_markov_attribution",
      "q199_branch_merge", "q200_dp_release", "q205_partial_compaction",
      "q206_calibration", "q207_core_census", "q212_sketch_quantiles",
      "q217_conformal_gate", "q219_cdc_dedup", "q226_knn_seam_recall",
      "q229_kcenter_coreset")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
    val stale = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"oracle SQL without a query: $stale")
  }

  test("exportJson writes exactly the n-row head sample") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_json_export"
    operators.Scan.exportJson(Tables.documents(spark, sf0001), 10, path)
    val back = spark.read.json(path)
    assert(back.count() === 10)
    val ids = back.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val expected = Tables.documents(spark, sf0001)
      .orderBy("doc_id").limit(10).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids === expected)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name returns rows at sf0.001") {
      assert(fn(spark, sf0001).count() > 0, s"$name returned no rows")
    }
  }
}
