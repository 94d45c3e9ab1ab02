package graft

import graft.operators.{ImageOps, MediaOps => M, RelationalOps => R, StreamingOps => S, TextOps => T, VectorOps => V, XmlOps => X}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator inventory
  * each query exercises. Every SQL-expressible query has a DuckDB oracle
  * with IDENTICAL column names and (where floating point is involved)
  * order-independent integer/rounded arithmetic so value hashes match.
  * The two crawl_* queries run the actual crawl engine (binary image
  * payloads — not SQL-expressible) and get the driver's rows-only check;
  * their real correctness gate is the oracle-equivalence ScalaTest suite.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    R.q1Agg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational core (SURVEY §2.1-2.7)
    "q1_agg" -> (R.q1Agg _),
    "q_count_pushdown" -> (R.qCountPushdown _),
    "q_anti_join" -> (R.qAntiJoin _),
    "q_semi_join" -> (R.qSemiJoin _),
    "q_broadcast_join" -> (R.qBroadcastJoin _),
    "q_window_quota" -> (R.qWindowQuota _),
    "q_union_dedup" -> (R.qUnionDedup _),
    "q_topk" -> (R.qTopk _),
    "q_rollup" -> (R.qRollup _),
    "q_event_window" -> (R.qEventWindow _),
    "q_explode_tokens" -> (R.qExplodeTokens _),
    "q_date_range" -> (R.qDateRange _),
    "q_recent" -> (R.qRecent _),
    "q_json_extract" -> (R.qJsonExtract _),
    "q_json_struct" -> (R.qJsonStruct _),
    "q_xml_struct" -> (X.qXmlStruct _),
    // text pipeline (training-data ops)
    "dedup_exact" -> (T.dedupExact _),
    "dedup_ngram" -> (T.dedupNgram _),
    "dedup_minhash_lsh" -> (T.dedupMinhashLsh _),
    "dedup_simhash" -> (T.dedupSimhash _),
    "text_tokens" -> (T.textTokens _),
    "text_quality" -> (T.textQuality _),
    "text_langid" -> (T.textLangid _),
    "text_fingerprint" -> (T.textFingerprint _),
    "sample_stratified" -> (T.sampleStratified _),
    "decontaminate" -> (T.decontaminate _),
    "decontaminate_bloom" -> (T.decontaminateBloom _),
    "curate_corpus" -> (T.curateCorpus _),
    "text_repetition" -> (T.textRepetition _),
    "neardup_clusters" -> (T.neardupClusters _),
    "corpus_mixture" -> (T.corpusMixture _),
    "dedup_spans" -> (T.dedupSpans _),
    "text_familiarity" -> (T.textFamiliarity _),
    "text_pii" -> (T.textPii _),
    "export_shards" -> (T.exportShards _),
    "embed_neardup_clusters" -> (V.embedNearDupClusters _),
    // embeddings (similarity search)
    "embed_knn" -> (V.embedKnn _),
    "embed_neardup" -> (V.embedNearDup _),
    "embed_neardup_brute" -> (V.embedNearDupBrute _),
    "embed_ann_lsh" -> (V.embedAnnLsh _),
    "embed_ann_ivf" -> ((s, d) => V.embedAnnIvf(s, d)),
    // the SAME operator pinned to a small centroid cap so the TWO-LEVEL
    // coarse-quantizer branch (active at K = cap, i.e. N >= 4·cap² — far
    // beyond any test corpus at the default 4096) runs under the driver's
    // DuckDB gate every round, twin included. kCap = 10, NOT 8: at the
    // verify corpus's n = 500 the cap-8 stride (step 62) resonates with
    // the multiplicative hash down to ONE cell / ONE super — a vacuous
    // gate (every pair a candidate ⇒ brute-force top-k that any broken
    // two-level assignment still reproduces). Cap 10 (step 50) yields
    // 15 cells / 5 supers, so the super→cell domain filter actually
    // prunes and the gate bites (VectorOpsSpec picks 10 for the same
    // reason).
    "embed_ann_ivf_2l" -> ((s, d) => V.embedAnnIvf(s, d, kCap = 10)),
    // multimodal: phash near-dup with a synthetic-phash oracle twin
    "img_phash_neardup" -> (ImageOps.imgPhashNearDup _),
    "img_phash_clusters" -> (ImageOps.imgPhashClusters _),
    // multimodal: real RIFF/WAVE parse + frame-container sampling,
    // arithmetic oracle twins (MediaOps scaladoc explains the gate)
    "audio_features" -> (M.audioFeatures _),
    "video_frames" -> (M.videoFrames _),
    // structured streaming (event-time window + stateful sessionization)
    "stream_event_window" -> (S.streamEventWindow _),
    "stream_sessionize" -> (S.streamSessionize _),
    "stream_enrich" -> (S.streamEnrich _),
    "stream_dedup" -> (S.streamDedup _),
    // crawl engine end-to-end (binary payloads; rows-only driver check)
    "crawl_smoke" -> (ImageOps.crawlSmoke _),
    "crawl_phash_dedup" -> (ImageOps.crawlPhashDedup _),
    // image-curation capstone over a crawl (decode gate → size/aspect →
    // phash-cluster canonical keep → per-host cap); binary-backed, so
    // rows-only driver check + the independent full-funnel ScalaTest
    "crawl_curate_images" -> (ImageOps.curateImages _)
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> R.q1AggSql,
    "q_count_pushdown" -> R.qCountPushdownSql,
    "q_anti_join" -> R.qAntiJoinSql,
    "q_semi_join" -> R.qSemiJoinSql,
    "q_broadcast_join" -> R.qBroadcastJoinSql,
    "q_window_quota" -> R.qWindowQuotaSql,
    "q_union_dedup" -> R.qUnionDedupSql,
    "q_topk" -> R.qTopkSql,
    "q_rollup" -> R.qRollupSql,
    "q_event_window" -> R.qEventWindowSql,
    "q_explode_tokens" -> R.qExplodeTokensSql,
    "q_date_range" -> R.qDateRangeSql,
    "q_recent" -> R.qRecentSql,
    "q_json_extract" -> R.qJsonExtractSql,
    "q_json_struct" -> R.qJsonStructSql,
    "q_xml_struct" -> X.qXmlStructSql,
    "dedup_exact" -> T.dedupExactSql,
    "dedup_ngram" -> T.dedupNgramSql,
    "dedup_minhash_lsh" -> T.dedupMinhashLshSql,
    "dedup_simhash" -> T.dedupSimhashSql,
    "text_tokens" -> T.textTokensSql,
    "text_quality" -> T.textQualitySql,
    "text_langid" -> T.textLangidSql,
    "text_fingerprint" -> T.textFingerprintSql,
    "sample_stratified" -> T.sampleStratifiedSql,
    "decontaminate" -> T.decontaminateSql,
    // bloom prescreen + exact verify ⇒ IDENTICAL result: shares the oracle
    "decontaminate_bloom" -> T.decontaminateSql,
    "curate_corpus" -> T.curateCorpusSql,
    "text_repetition" -> T.textRepetitionSql,
    "neardup_clusters" -> T.neardupClustersSql,
    "corpus_mixture" -> T.corpusMixtureSql,
    "dedup_spans" -> T.dedupSpansSql,
    "text_familiarity" -> T.textFamiliaritySql,
    "text_pii" -> T.textPiiSql,
    "export_shards" -> T.exportShardsSql,
    "embed_neardup_clusters" -> V.embedNearDupClustersSql,
    "embed_knn" -> V.embedKnnSql,
    "embed_neardup" -> V.embedNearDupSql,
    "embed_neardup_brute" -> V.embedNearDupBruteSql,
    "embed_ann_lsh" -> V.embedAnnLshSql,
    "embed_ann_ivf" -> V.embedAnnIvfSql,
    "embed_ann_ivf_2l" -> V.embedAnnIvfSqlFor(10),
    "img_phash_neardup" -> ImageOps.imgPhashNearDupSql,
    "img_phash_clusters" -> ImageOps.imgPhashClustersSql,
    "audio_features" -> M.audioFeaturesSql,
    "video_frames" -> M.videoFramesSql,
    "stream_event_window" -> S.streamEventWindowSql,
    "stream_sessionize" -> S.streamSessionizeSql,
    "stream_enrich" -> S.streamEnrichSql,
    "stream_dedup" -> S.streamDedupSql
  )
}
