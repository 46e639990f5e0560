package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.run.Queries

/** Driver contract — the engine's complete query surface
  * (SURVEY.md §2 operator inventory + training-data ops), each entry
  * paired with an independent ANSI-SQL oracle the harness runs in
  * DuckDB over the same parquet tables. Column names and types are
  * aligned pair-wise (the compare sorts columns by name and hashes
  * values); measures use exact-integer cents / rounded-5dp similarity
  * so results are bit-identical across engines (see
  * graft.run.Queries scaladoc for the determinism rules).
  */
object SparkEntry {

  /** Flagship: the full KG-construction pipeline (extract → map →
    * mentions → link → canonicalize → dedup) on sf=0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.kgPipeline(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational core
    "q1_agg" -> (Queries.q1Agg _),
    "q_join_agg" -> (Queries.qJoinAgg _),
    "q_window_topk" -> (Queries.qWindowTopk _),
    "q_anti_join" -> (Queries.qAntiJoin _),
    "q_semi_join" -> (Queries.qSemiJoin _),
    "q_distinct_agg" -> (Queries.qDistinctAgg _),
    "q_rollup" -> (Queries.qRollup _),
    "q_cube" -> (Queries.qCube _),
    "q_setops" -> (Queries.qSetOps _),
    "q_events_window" -> (Queries.qEventsWindow _),
    "q_events_sessions" -> (Queries.qEventsSessions _),
    "q_stateful_sessions" -> (Queries.qStatefulSessions _),
    "q_events_dedup" -> (Queries.qEventsDedup _),
    "q_stream_enrich" -> (Queries.qStreamEnrich _),
    "q_stream_join" -> (Queries.qStreamJoin _),
    "text_shards_manifest" -> (Queries.textShardsManifest _),
    "text_decontaminate" -> (Queries.textDecontaminate _),
    "q_salted_agg" -> (Queries.qSaltedAgg _),
    "q_host_salted_agg" -> (Queries.qHostSaltedAgg _),
    "q5_multi_join" -> (Queries.q5MultiJoin _),
    "q_asof_join" -> (Queries.qAsofJoin _),
    "q_range_join" -> (Queries.qRangeJoin _),
    "q_range_join_ts" -> (Queries.qRangeJoinTs _),
    "q_doclen_quantiles" -> (Queries.qDoclenQuantiles _),
    "q_quantile_sketch" -> (Queries.qQuantileSketch _),
    "q_distinct_sketch" -> (Queries.qDistinctSketch _),
    // KG construction (SURVEY.md §2.1)
    "kg_triples" -> (Queries.kgTriples _),
    "kg_csvw_full" -> (Queries.kgCsvwFull _),
    "kg_csvw_dates" -> (Queries.kgCsvwDates _),
    "kg_nq_lines" -> (Queries.kgNqLines _),
    "kg_turtle_blocks" -> (Queries.kgTurtleBlocks _),
    "kg_mentions" -> (Queries.kgMentions _),
    "kg_canonical" -> (Queries.kgCanonical _),
    "kg_link_scores" -> (Queries.kgLinkScores _),
    "kg_pipeline" -> (Queries.kgPipeline _),
    "kg_pagerank" -> (Queries.kgPagerank _),
    "kg_property_table" -> (Queries.kgPropertyTable _),
    "kg_delta" -> (Queries.kgDelta _),
    "kg_bgp_hop" -> (Queries.kgBgpHop _),
    "kg_bgp_optional" -> (Queries.kgBgpOptional _),
    "kg_bgp_path" -> (Queries.kgBgpPath _),
    "kg_void_stats" -> (Queries.kgVoidStats _),
    "kg_taxonomy_closure" -> (Queries.kgTaxonomyClosure _),
    "kg_type_inference" -> (Queries.kgTypeInference _),
    // training-data ops
    "text_tokens" -> (Queries.textTokens _),
    "text_quality" -> (Queries.textQuality _),
    "text_langid" -> (Queries.textLangId _),
    "text_fingerprint" -> (Queries.textFingerprint _),
    "text_rolling_hash" -> (Queries.textRollingHash _),
    "text_pack_shards" -> (Queries.textPackShards _),
    "text_sample_stratified" -> (Queries.textSampleStratified _),
    "text_host_cap" -> (Queries.textHostCap _),
    "text_repetition" -> (Queries.textRepetition _),
    "text_pii_redact" -> (Queries.textPiiRedact _),
    "text_vocab_topk" -> (Queries.textVocabTopk _),
    "text_url_canon" -> (Queries.textUrlCanon _),
    "dedup_exact" -> (Queries.dedupExact _),
    "curation_pipeline" -> (Queries.curationPipeline _),
    "dedup_ngram_jaccard" -> (Queries.dedupNgramJaccard _),
    "dedup_ngram_containment" -> (Queries.dedupNgramContainment _),
    "dedup_minhash_lsh" -> (Queries.dedupMinhashLsh _),
    "dedup_minhash_recall" -> (Queries.dedupMinhashRecall _),
    "dedup_incremental" -> (Queries.dedupIncremental _),
    "dedup_passages" -> (Queries.dedupPassages _),
    "dedup_simhash" -> (Queries.dedupSimhash _),
    "dedup_embedding" -> (Queries.dedupEmbedding _),
    "dedup_embedding_lsh" -> (Queries.dedupEmbeddingLsh _),
    "dedup_embedding_recall" -> (Queries.dedupEmbeddingRecall _),
    "dedup_clusters" -> (Queries.dedupClusters _),
    "sim_ann_topk" -> (Queries.simAnnTopk _),
    "kg_link_ann" -> (Queries.kgLinkAnn _),
    "kg_link_ann_recall" -> (Queries.kgLinkAnnRecall _),
    "sim_ann_lsh" -> (Queries.simAnnLsh _),
    "sim_ann_lsh_recall" -> (Queries.simAnnLshRecall _),
    "sim_ann_ivf" -> (Queries.simAnnIvf _),
    "sim_ann_ivf_lloyd" -> (Queries.simAnnIvfLloyd _),
    "sim_ann_ivf_recall" -> (Queries.simAnnIvfRecall _),
    "mm_decode" -> (Queries.mmDecode _),
    "mm_thumbnail" -> (Queries.mmThumbnail _),
    "mm_frame_sample" -> (Queries.mmFrameSample _),
    "mm_resample" -> (Queries.mmResample _),
    "mm_thumbnail_ppm" -> (Queries.mmThumbnailPpm _)
  )

  // ---------- portable-hash SQL fragments ----------
  //
  // The approximate operators (MinHash+LSH, SimHash, sign-hash ANN,
  // IVF) draw every hash/plane from graft.ops.Portable — 31-bit
  // arithmetic and fixed-order double folds that DuckDB evaluates
  // identically. These fragments re-derive the engine's exact
  // signatures, buckets and candidate sets in SQL, which upgrades the
  // round-1 "no_oracle" entries to hash-exact rows and powers the
  // recall queries (VERDICT round 1, item 2). Shared CONSTANTS
  // (seeds, the mixer) are parameters of the algorithm under test; the
  // COMPUTATION (signatures, joins, verification) is independent SQL.

  private val P = graft.ops.Portable

  /** The nation-descriptor triple mapping as a SQL SELECT over a
    * given source relation of (n_name, n_nationkey, n_regionkey) —
    * shared by the property-table / delta / BGP oracles so the
    * snapshot-diff oracle can state the SAME mapping over two inputs.
    */
  private def nationTriplesSql(rel: String): String =
    s"""SELECT 'http://graft.local/tpch/nation/' || n_name AS s,
       |  'http://schema.org/name' AS p, 'literal' AS o_kind, n_name AS o_lex,
       |  CAST(NULL AS VARCHAR) AS o_datatype, 'en' AS o_lang,
       |  'http://graft.local/graph/tpch' AS g FROM $rel
       |UNION ALL
       |SELECT 'http://graft.local/tpch/nation/' || n_name,
       |  'http://graft.local/def/key', 'literal', CAST(n_nationkey AS VARCHAR),
       |  'http://www.w3.org/2001/XMLSchema#integer', CAST(NULL AS VARCHAR),
       |  'http://graft.local/graph/tpch' FROM $rel
       |UNION ALL
       |SELECT 'http://graft.local/tpch/nation/' || n_name,
       |  'http://schema.org/containedInPlace', 'iri',
       |  'http://graft.local/tpch/region/' || CAST(n_regionkey AS VARCHAR),
       |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       |  'http://graft.local/graph/tpch' FROM $rel
       |UNION ALL
       |SELECT 'http://graft.local/tpch/nation/' || n_name,
       |  'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'iri',
       |  'http://schema.org/Country', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       |  'http://graft.local/graph/tpch' FROM $rel""".stripMargin

  /** Integer fixed-point PageRank, 5 rounds unrolled (the engine's
    * exact long arithmetic — scale 10^12, damping 17/20, truncating
    * division on non-negative values == floor == DuckDB `//`) over the
    * deterministic customer chain + homepage-hub graph.
    * Ends in `p5(id, pr)`.
    */
  private val kgPagerankCtes: String = {
    val scaleL = 1000000000000L
    val base = scaleL * 3L / 20L
    val iters = (1 to 5).map { i =>
      s"""c$i AS (SELECT e.dst AS id, SUM(p.pr // e.deg) AS m
         |  FROM edeg e JOIN p${i - 1} p ON p.id = e.src GROUP BY e.dst),
         |p$i AS (SELECT n.id, CAST($base + (17 * COALESCE(c.m, 0)) // 20 AS BIGINT) AS pr
         |  FROM nodes n LEFT JOIN c$i c USING (id))""".stripMargin
    }.mkString(",\n")
    s"""cust AS (SELECT CAST(c_custkey AS BIGINT) AS k, c_nationkey FROM customer),
       |chain AS (SELECT k AS src,
       |    lead(k) OVER (PARTITION BY c_nationkey ORDER BY k) AS dst FROM cust),
       |hubv AS (SELECT MIN(k) AS hub FROM cust),
       |edges AS (SELECT src, dst FROM chain WHERE dst IS NOT NULL
       |  UNION ALL SELECT k, hub FROM cust, hubv WHERE k <> hub),
       |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
       |edeg AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)),
       |nodes AS (SELECT DISTINCT id FROM
       |  (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
       |p0 AS (SELECT id, CAST($scaleL AS BIGINT) AS pr FROM nodes),
       |$iters""".stripMargin
  }

  /** 3-token shingle sets per document (mirrors Dedup.shingleSet). */
  private val shingleCtes: String =
    """tok AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents),
      |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
      |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      |  FROM tok WHERE len(t) >= 3)""".stripMargin

  /** Exact n-gram Jaccard pairs via posting-list join with the df cap
    * mirrored (df BETWEEN 2 AND maxDf — Dedup.ngramJaccardPairs).
    * Ends in relation `exact_pairs(id_a, id_b, jaccard)`.
    */
  private val ngramFromSh: String =
    s"""post AS (SELECT doc_id, len(s) AS sz, unnest(s) AS shingle FROM sh),
       |keep AS (SELECT shingle FROM post GROUP BY shingle
       |  HAVING count(*) BETWEEN 2 AND ${graft.ops.Dedup.defaultMaxDf}),
       |pl AS (SELECT doc_id, sz, shingle FROM post JOIN keep USING (shingle)),
       |ipair AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sa, b.sz AS sb,
       |    count(*) AS inter
       |  FROM pl a JOIN pl b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4),
       |exact_pairs AS (SELECT id_a, id_b,
       |    round(CAST(inter AS DOUBLE) / (sa + sb - inter), 5) AS jaccard
       |  FROM ipair
       |  WHERE round(CAST(inter AS DOUBLE) / (sa + sb - inter), 5) >= 0.12)""".stripMargin

  private val ngramPairCtes: String = shingleCtes + ",\n" + ngramFromSh

  /** MinHash signatures (64 universal hashes over polyhash31 shingle
    * hashes), 16×4 banding, bucket self-join, exact-Jaccard verify.
    * Ends in relation `mh_pairs(id_a, id_b, jaccard)` (pre-tau).
    */
  private val minhashFromSh: String = {
    val seedPairs = (0 until 64).map(j => s"[${P.seedA(j)}, ${P.seedB(j)}]")
      .mkString("[", ", ", "]")
    s"""hs AS (SELECT doc_id, s, list_transform(s, sg -> ${P.polyhash31Sql("sg")}) AS hv FROM sh),
         |msig AS (SELECT doc_id, s, list_transform($seedPairs,
         |    ab -> list_min(list_transform(hv, h -> (ab[1]*h + ab[2]) % 2147483647))) AS sg
         |  FROM hs),
         |bb AS (SELECT doc_id, bnd.band,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT), sg[bnd.band*4 + 1 : bnd.band*4 + 4]),
         |      (a, v) -> (a*1000003 + v) % 2147483648) AS bucket
         |  FROM msig CROSS JOIN (SELECT unnest(range(0, 16)) AS band) bnd),
         |mcand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
         |    AND a.doc_id < b.doc_id),
         |mh_pairs AS (SELECT id_a, id_b,
         |    round(CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) /
         |      (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))), 5) AS jaccard
         |  FROM mcand JOIN sh x ON x.doc_id = id_a JOIN sh y ON y.doc_id = id_b)""".stripMargin
  }

  private val minhashCtes: String = shingleCtes + ",\n" + minhashFromSh

  /** 60-bit SimHash (4 chunks × 15 bits, per-chunk universal hashes
    * over distinct-token polyhash31), chunk-key blocking, Hamming
    * verify. Ends in `sh_pairs(id_a, id_b, hamming)` (pre-threshold).
    */
  private val simhashCtes: String = {
    val pa = P.sqlLongList(graft.ops.Dedup.simhashA.toSeq)
    val pb = P.sqlLongList(graft.ops.Dedup.simhashB.toSeq)
    s"""stok AS (SELECT doc_id, list_distinct(regexp_extract_all(text, '\\S+')) AS ts FROM documents),
       |sth AS (SELECT doc_id, unnest(list_transform(ts, tk -> ${P.polyhash31Sql("tk")})) AS h
       |  FROM stok WHERE len(ts) > 0),
       |svt AS (SELECT doc_id, sbit.b AS b,
       |    SUM(CASE WHEN ((((($pa)[(sbit.b // 15) + 1] * h + ($pb)[(sbit.b // 15) + 1])
       |      % 2147483647) >> (sbit.b % 15)) & 1) = 1 THEN 1 ELSE -1 END) AS v
       |  FROM sth CROSS JOIN (SELECT unnest(range(0, 60)) AS b) sbit
       |  GROUP BY doc_id, sbit.b),
       |ssig AS (SELECT doc_id,
       |    SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END) AS sig
       |  FROM svt GROUP BY doc_id),
       |sck AS (SELECT doc_id, sig, ch.c AS c, (sig >> (ch.c * 15)) & 32767 AS key
       |  FROM ssig CROSS JOIN (SELECT unnest(range(0, 4)) AS c) ch),
       |sh_pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
       |  FROM sck a JOIN sck b ON a.c = b.c AND a.key = b.key AND a.doc_id < b.doc_id)""".stripMargin
  }

  /** Sign-hash buckets over the embeddings (portable hyperplanes,
    * sequential-fold dots). Ends in `bk(vec_id, t, bucket)`; `e` holds
    * the double-cast vectors.
    */
  private def annBucketCtes(tables: Int, bits: Int, dim: Int): String = {
    val plane = P.planeComponentSql("t", "b", "d")
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |tb AS (SELECT tt.t AS t, bb2.b AS b
       |  FROM (SELECT unnest(range(0, $tables)) AS t) tt
       |  CROSS JOIN (SELECT unnest(range(0, $bits)) AS b) bb2),
       |dp AS (SELECT vec_id, t, b,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(0, $dim),
       |      d -> v[d+1] * ($plane))), (a, x) -> a + x) AS dotp
       |  FROM e CROSS JOIN tb),
       |bk AS (SELECT vec_id, t,
       |    SUM(CASE WHEN dotp >= 0 THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END) AS bucket
       |  FROM dp GROUP BY vec_id, t)""".stripMargin
  }

  /** Sign-hash bucket table for an arbitrary (id, v) relation —
    * the two-relation generalization of [[annBucketCtes]] used by the
    * ANN linker oracle. Emits `<out>(<idCol>, t, bucket)`; expects a
    * `tb(t, b)` plane grid already in scope.
    */
  private def signBucketsOf(rel: String, idCol: String, out: String,
      dim: Int): String = {
    val plane = P.planeComponentSql("t", "b", "d")
    s"""${out}_dp AS (SELECT $idCol, t, b,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(0, $dim),
       |      d -> v[d+1] * ($plane))), (a, x) -> a + x) AS dotp
       |  FROM $rel CROSS JOIN tb),
       |$out AS (SELECT $idCol, t,
       |    SUM(CASE WHEN dotp >= 0 THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END) AS bucket
       |  FROM ${out}_dp GROUP BY $idCol, t)""".stripMargin
  }

  /** ANN entity-link candidates (Linker.annLinkCandidates): gazetteer =
    * every 16th embedding, contexts = the rest; 8×3 sign-LSH blocking,
    * exact round5-cosine re-rank, minSim 0.2, top-3 per context. Ends
    * in `ann_link(ctx_id, rk, entity_id, sim)`.
    */
  private val kgLinkAnnCtes: String =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |ctx AS (SELECT vec_id AS ctx_id, v FROM e WHERE vec_id % 16 <> 0),
       |ent AS (SELECT vec_id AS entity_id, v FROM e WHERE vec_id % 16 = 0),
       |tb AS (SELECT tt.t AS t, bb2.b AS b
       |  FROM (SELECT unnest(range(0, 8)) AS t) tt
       |  CROSS JOIN (SELECT unnest(range(0, 3)) AS b) bb2),
       |${signBucketsOf("ctx", "ctx_id", "cbk", 64)},
       |${signBucketsOf("ent", "entity_id", "ebk", 64)},
       |kcand AS (SELECT DISTINCT ctx_id, entity_id
       |  FROM cbk JOIN ebk ON cbk.t = ebk.t AND cbk.bucket = ebk.bucket),
       |ksc AS (SELECT ctx_id, entity_id,
       |    round(${P.cosineSql("q.v", "c.v", 64)}, 5) AS sim
       |  FROM kcand JOIN ctx q USING (ctx_id) JOIN ent c USING (entity_id)),
       |krk AS (SELECT *, row_number() OVER (PARTITION BY ctx_id
       |    ORDER BY sim DESC, entity_id) AS rk FROM ksc WHERE sim >= 0.2),
       |ann_link AS (SELECT ctx_id, CAST(rk AS BIGINT) AS rk, entity_id, sim
       |  FROM krk WHERE rk <= 3)""".stripMargin

  /** Brute twin: every (context, entity) scored, same threshold/rank.
    * Ends in `ann_brute(ctx_id, entity_id)`.
    */
  private val kgLinkAnnBruteCtes: String =
    s"""bsc AS (SELECT ctx_id, entity_id,
       |    round(${P.cosineSql("q.v", "c.v", 64)}, 5) AS sim
       |  FROM ctx q CROSS JOIN ent c),
       |brk AS (SELECT *, row_number() OVER (PARTITION BY ctx_id
       |    ORDER BY sim DESC, entity_id) AS rk FROM bsc WHERE sim >= 0.2),
       |ann_brute AS (SELECT ctx_id, entity_id FROM brk WHERE rk <= 3)""".stripMargin

  /** LSH ANN top-k (8 tables × 3 bits, exact re-rank). Ends in
    * `lsh_topk(query_id, rk, neighbor_id, sim)`.
    */
  private val annLshCtes: String = annBucketCtes(8, 3, 64) + ",\n" +
    s"""lcand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM bk q JOIN bk c ON q.t = c.t AND q.bucket = c.bucket
       |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
       |lsc AS (SELECT query_id, neighbor_id, round(${P.cosineSql("q.v", "c.v", 64)}, 5) AS sim
       |  FROM lcand JOIN e q ON q.vec_id = query_id JOIN e c ON c.vec_id = neighbor_id),
       |lrk AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY sim DESC, neighbor_id) AS rk FROM lsc),
       |lsh_topk AS (SELECT query_id, CAST(rk AS BIGINT) AS rk, neighbor_id, sim
       |  FROM lrk WHERE rk <= 5)""".stripMargin

  /** The embeddings relation + the 16 lowest-vec_id seed centroids
    * (cid = rank order), named `name`.
    */
  private def ivfSeedCte(name: String): String =
    s"""$name AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
       |  FROM e ORDER BY vec_id LIMIT 16)""".stripMargin

  /** IVF search over whatever `cent(cid, cv)` is in scope: argmax
    * assignment by (round5 cosine DESC, cid ASC), nprobe=4 probing,
    * exact re-rank. Ends in `ivf_topk`.
    */
  private val ivfSearchTail: String =
    s"""iasg AS (SELECT vec_id, v, cid,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY round(${P.cosineSql("v", "cv", 64)}, 5) DESC, cid) AS r
       |  FROM e CROSS JOIN cent),
       |idx AS (SELECT vec_id AS neighbor_id, v AS nv, cid AS list_id FROM iasg WHERE r = 1),
       |iprb AS (SELECT vec_id AS query_id, v AS qv, cid AS list_id,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY round(${P.cosineSql("v", "cv", 64)}, 5) DESC, cid) AS r
       |  FROM e CROSS JOIN cent WHERE vec_id < 10),
       |isc AS (SELECT query_id, neighbor_id, round(${P.cosineSql("qv", "nv", 64)}, 5) AS sim
       |  FROM (SELECT query_id, qv, list_id FROM iprb WHERE r <= 4) pp
       |  JOIN idx USING (list_id) WHERE neighbor_id <> query_id),
       |irk AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY sim DESC, neighbor_id) AS rk FROM isc),
       |ivf_topk AS (SELECT query_id, CAST(rk AS BIGINT) AS rk, neighbor_id, sim
       |  FROM irk WHERE rk <= 5)""".stripMargin

  /** IVF top-k with seed centroids (iters=0). */
  private val annIvfCtes: String =
    "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),\n" +
      ivfSeedCte("cent") + ",\n" + ivfSearchTail

  /** IVF top-k after ONE Lloyd refinement step (iters=1) — the
    * production configuration, re-derived relationally (VERDICT round
    * 3, next #4): assign everything to the seed centroids, per-(list,
    * dim) means from ORDER-INDEPENDENT scaled-long sums — the exact
    * portable arithmetic the engine uses (sum of CAST(round(v·10⁶) AS
    * BIGINT), then (sum/count)/10⁶ in double) — an emptied list keeps
    * its seed centroid, then search with the refined centroids.
    */
  private val annIvfLloydCtes: String =
    "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),\n" +
      ivfSeedCte("cent0") + ",\n" +
      s"""lasg AS (SELECT vec_id, v, cid,
         |    row_number() OVER (PARTITION BY vec_id
         |      ORDER BY round(${P.cosineSql("v", "cv", 64)}, 5) DESC, cid) AS r
         |  FROM e CROSS JOIN cent0),
         |lmem AS (SELECT vec_id, v, cid FROM lasg WHERE r = 1),
         |lsums AS (SELECT cid, p.pos AS pos,
         |    SUM(CAST(round(v[p.pos + 1] * 1000000) AS BIGINT)) AS sc,
         |    COUNT(*) AS cnt
         |  FROM lmem CROSS JOIN (SELECT unnest(range(0, 64)) AS pos) p
         |  GROUP BY cid, p.pos),
         |cent AS (SELECT c0.cid AS cid, COALESCE(s.cv1, c0.cv) AS cv
         |  FROM cent0 c0 LEFT JOIN (SELECT cid,
         |      list((CAST(sc AS DOUBLE) / cnt) / 1000000.0 ORDER BY pos) AS cv1
         |    FROM lsums GROUP BY cid) s USING (cid)),
         |""".stripMargin + ivfSearchTail

  /** Brute-force exact top-k pair set (the sim_ann_topk oracle's
    * relation form) — recall denominators. Ends in
    * `bf_topk(query_id, neighbor_id)`. Requires `e` in scope.
    */
  private val annBruteCtes: String =
    """bsc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    round(list_cosine_similarity(q.v, c.v), 5) AS sim
      |  FROM e q JOIN e c ON c.vec_id <> q.vec_id WHERE q.vec_id < 10),
      |brk AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY sim DESC, neighbor_id) AS rk FROM bsc),
      |bf_topk AS (SELECT query_id, neighbor_id FROM brk WHERE rk <= 5)""".stripMargin

  /** One-row recall scoreboard over two relations with key columns
    * (k1, k2): n_exact, n_approx, n_found, recall_pct.
    */
  private def recallSelect(exactRel: String, approxRel: String,
      k1: String, k2: String): String =
    s"""SELECT
       |  (SELECT count(*) FROM $exactRel) AS n_exact,
       |  (SELECT count(*) FROM $approxRel) AS n_approx,
       |  (SELECT count(*) FROM $exactRel x JOIN $approxRel y
       |     ON x.$k1 = y.$k1 AND x.$k2 = y.$k2) AS n_found,
       |  CAST(CASE WHEN (SELECT count(*) FROM $exactRel) = 0 THEN 100
       |       ELSE (100 * (SELECT count(*) FROM $exactRel x JOIN $approxRel y
       |         ON x.$k1 = y.$k1 AND x.$k2 = y.$k2))
       |         // (SELECT count(*) FROM $exactRel) END AS BIGINT) AS recall_pct""".stripMargin

  /** DuckDB oracles — every harness query has one (round 1's four
    * rows-only approximate entries are now reproduced signature-for-
    * signature via the portable fragments above).
    */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(FLOOR(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_c,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_join_agg" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(FLOOR(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_c,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,

    "q_window_topk" ->
      """SELECT n_name, CAST(rk AS BIGINT) AS rk, o_orderkey,
        |  CAST(FLOOR(o_totalprice*100) AS BIGINT) AS price_c
        |FROM (
        |  SELECT n_name, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY n_name
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey)
        |WHERE rk <= 3""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 490000.0)""".stripMargin,

    "q_distinct_agg" ->
      """SELECT c_mktsegment,
        |  CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
        |  CAST(COUNT(*) AS BIGINT) AS n_cust
        |FROM customer GROUP BY c_mktsegment""".stripMargin,

    "q_rollup" ->
      """SELECT c_mktsegment, c_nationkey, CAST(COUNT(*) AS BIGINT) AS n
        |FROM customer GROUP BY ROLLUP(c_mktsegment, c_nationkey)""".stripMargin,

    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(FLOOR(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_price_c
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,

    "q_setops" ->
      """SELECT p_partkey FROM part WHERE p_size > 40
        |INTERSECT
        |SELECT p_partkey FROM part WHERE p_retailprice > 980.0
        |EXCEPT
        |SELECT p_partkey FROM part WHERE p_retailprice < 905.0""".stripMargin,

    "q_events_window" ->
      """SELECT date_trunc('hour', ts) AS ws, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(FLOOR(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_events_sessions" ->
      """WITH x AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |y AS (SELECT user_id,
        |  CASE WHEN lag(us) OVER w IS NULL
        |         OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS ind
        |  FROM x WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
        |SELECT user_id, CAST(SUM(ind) AS BIGINT) AS n_sessions,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM y GROUP BY user_id""".stripMargin,

    // the oracle is the plain inequality join DuckDB executes with its
    // own range strategy — the engine's bin-bucketed equi join must
    // reproduce it exactly (inclusive bounds)
    "q_range_join" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
        |    event_type FROM events),
        |w AS (SELECT DISTINCT user_id, us AS w_start,
        |    us + 3600000000 AS w_end
        |  FROM e WHERE event_type = 'purchase')
        |SELECT e.user_id, e.event_id,
        |  CAST(COUNT(w.w_start) AS BIGINT) AS n_windows
        |FROM e LEFT JOIN w
        |  ON e.user_id = w.user_id AND e.us >= w.w_start AND e.us <= w.w_end
        |GROUP BY e.user_id, e.event_id""".stripMargin,

    // same join driven by the raw TIMESTAMP columns (the engine bins
    // them on epoch µs internally); DuckDB again executes the plain
    // timestamp inequality join
    "q_range_join_ts" ->
      """WITH w AS (SELECT DISTINCT user_id, ts AS w_start,
        |    ts + INTERVAL 1 HOUR AS w_end
        |  FROM events WHERE event_type = 'purchase')
        |SELECT e.user_id, e.event_id,
        |  CAST(COUNT(w.w_start) AS BIGINT) AS n_windows
        |FROM events e LEFT JOIN w
        |  ON e.user_id = w.user_id AND e.ts >= w.w_start AND e.ts <= w.w_end
        |GROUP BY e.user_id, e.event_id""".stripMargin,

    // the oracle is DuckDB's NATIVE ASOF JOIN — a dedicated operator
    // implementation entirely unlike the engine's union-and-carry
    // window, so agreement is strong evidence for the semantics
    "q_asof_join" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
        |    event_type, value FROM events),
        |p AS (SELECT user_id, us,
        |    CAST(SUM(CAST(FLOOR(value*100) AS BIGINT)) AS BIGINT) AS purchase_c
        |  FROM e WHERE event_type = 'purchase' GROUP BY user_id, us)
        |SELECT e.user_id, e.event_id,
        |  COALESCE(p.purchase_c, -1) AS last_purchase_c
        |FROM e ASOF LEFT JOIN p
        |  ON e.user_id = p.user_id AND e.us >= p.us""".stripMargin,

    // replayed duplicates (every 10th event delivered twice) must
    // collapse back to the original event set
    "q_events_dedup" ->
      """SELECT event_id, user_id, event_type,
        |  CAST(FLOOR(value*100) AS BIGINT) AS value_c
        |FROM events""".stripMargin,

    // the stream-stream attribution join's batch twin: a plain
    // inequality join over the raw event columns
    "q_stream_join" ->
      """WITH v AS (SELECT event_id AS view_id, user_id, ts AS v_ts
        |    FROM events WHERE event_type = 'view'),
        |p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts
        |    FROM events WHERE event_type = 'purchase')
        |SELECT purchase_id, view_id, user_id
        |FROM v JOIN p USING (user_id)
        |WHERE v_ts >= p_ts - INTERVAL 1 HOUR AND v_ts <= p_ts""".stripMargin,

    // the tier dim rows are interpolated from the ONE Scala definition
    // (EventStream.tierRows), so engine and oracle share it by
    // construction
    "q_stream_enrich" -> {
      val dimValues = graft.streaming.EventStream.tierRows
        .map { case (id, name, bp) => s"($id, '$name', $bp)" }.mkString(", ")
      s"""WITH dim(tier_id, tier_name, mult_bp) AS (VALUES $dimValues),
         |ev AS (SELECT (user_id % 3 + 3) % 3 AS tier_id,
         |    CAST(FLOOR(value*100) AS BIGINT) AS value_c
         |  FROM events WHERE event_type IS NOT NULL)
         |SELECT tier_name, CAST(COUNT(*) AS BIGINT) AS n_events,
         |  CAST(SUM(value_c * mult_bp) AS BIGINT) AS sum_c
         |FROM ev JOIN dim USING (tier_id) GROUP BY tier_name""".stripMargin
    },

    "q_salted_agg" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(FLOOR(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
        |FROM events GROUP BY event_type""".stripMargin,

    // integer quantile indexes land both engines on identical rows;
    // one branch per quantile spec so p50 AND p90 are both always
    // present, even when a tiny language collapses the two indexes
    "q_doclen_quantiles" ->
      """WITH t AS (SELECT lang, doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |r AS (SELECT lang, n_tokens,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_tokens, doc_id) AS rk,
        |    COUNT(*) OVER (PARTITION BY lang) AS cnt FROM t)
        |SELECT lang, 'p50' AS q, n_tokens FROM r WHERE rk - 1 = (cnt - 1) // 2
        |UNION ALL
        |SELECT lang, 'p90' AS q, n_tokens FROM r WHERE rk - 1 = ((cnt - 1) * 9) // 10""".stripMargin,

    // sketch-twin gates (VERDICT round 2, item 2): the oracle predicts
    // the exact group counts AND within_bound ≡ 1 — the sketch's own
    // error contract (rank-interval / 3σ envelope), never sketch
    // internals. A sketch whose error leaves the contract breaks the
    // hash; the exact twins (q_doclen_quantiles / q_distinct_agg)
    // remain the validation references.
    "q_quantile_sketch" ->
      """WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang)
        |SELECT lang, 'p50' AS q, n, CAST(1 AS BIGINT) AS within_bound FROM c
        |UNION ALL
        |SELECT lang, 'p90' AS q, n, CAST(1 AS BIGINT) AS within_bound FROM c""".stripMargin,

    "q_distinct_sketch" ->
      """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
        |  CAST(1 AS BIGINT) AS within_bound
        |FROM events GROUP BY event_type""".stripMargin,

    // the oracle is the UNsalted groupBy — the two-phase salted plan
    // must be value-identical to the direct aggregation
    "q_host_salted_agg" ->
      """WITH d AS (SELECT 'https://ex.test/doc/' || CAST(doc_id AS VARCHAR) AS url,
        |    text FROM documents)
        |SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host,
        |  CAST(COUNT(*) AS BIGINT) AS n_pages,
        |  CAST(SUM(length(text)) AS BIGINT) AS text_chars
        |FROM d GROUP BY 1""".stripMargin,

    "kg_triples" ->
      """SELECT 'http://graft.local/tpch/nation/' || n_name AS s,
        |  'http://schema.org/name' AS p, 'literal' AS o_kind, n_name AS o_lex,
        |  CAST(NULL AS VARCHAR) AS o_datatype, 'en' AS o_lang,
        |  'http://graft.local/graph/tpch' AS g FROM nation
        |UNION ALL
        |SELECT 'http://graft.local/tpch/nation/' || n_name,
        |  'http://graft.local/def/key', 'literal', CAST(n_nationkey AS VARCHAR),
        |  'http://www.w3.org/2001/XMLSchema#integer', CAST(NULL AS VARCHAR),
        |  'http://graft.local/graph/tpch' FROM nation
        |UNION ALL
        |SELECT 'http://graft.local/tpch/nation/' || n_name,
        |  'http://schema.org/containedInPlace', 'iri',
        |  'http://graft.local/tpch/region/' || CAST(n_regionkey AS VARCHAR),
        |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
        |  'http://graft.local/graph/tpch' FROM nation
        |UNION ALL
        |SELECT 'http://graft.local/tpch/nation/' || n_name,
        |  'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'iri',
        |  'http://schema.org/Country', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
        |  'http://graft.local/graph/tpch' FROM nation""".stripMargin,

    // C3 typed literal + C8 separator fan-out + C4 csvw:value template,
    // re-derived relationally: string_split for the multi-valued cell,
    // string concatenation for the templated literal
    "kg_csvw_full" ->
      """WITH pt AS (SELECT p_partkey AS partkey, p_name AS name,
        |    p_type AS type, p_size AS size FROM part)
        |SELECT 'http://graft.local/tpch/part/' || CAST(partkey AS VARCHAR) AS s,
        |  'http://graft.local/def/size' AS p, 'literal' AS o_kind,
        |  CAST(size AS VARCHAR) AS o_lex,
        |  'http://www.w3.org/2001/XMLSchema#integer' AS o_datatype,
        |  CAST(NULL AS VARCHAR) AS o_lang,
        |  'http://graft.local/graph/part' AS g FROM pt
        |UNION ALL
        |SELECT 'http://graft.local/tpch/part/' || CAST(partkey AS VARCHAR),
        |  'http://graft.local/def/nameWord', 'literal', w.word,
        |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
        |  'http://graft.local/graph/part'
        |FROM pt, LATERAL (SELECT unnest(string_split(name, ' ')) AS word) w
        |WHERE w.word <> ''
        |UNION ALL
        |SELECT 'http://graft.local/tpch/part/' || CAST(partkey AS VARCHAR),
        |  'http://www.w3.org/2000/01/rdf-schema#label', 'literal',
        |  'part ' || CAST(partkey AS VARCHAR) || ' is a ' || type,
        |  CAST(NULL AS VARCHAR), 'en', 'http://graft.local/graph/part'
        |FROM pt""".stripMargin,

    // datatype object form {"base","format"}: the engine parses cells
    // arriving in declared non-ISO formats and emits XSD CANONICAL
    // lexical forms, which strftime re-derives straight from the
    // original timestamp column (round-trip is lossless by design)
    "kg_csvw_dates" ->
      """SELECT 'http://graft.local/tpch/order/' || CAST(o_orderkey AS VARCHAR) AS s,
        |  'http://graft.local/def/orderDate' AS p, 'literal' AS o_kind,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_lex,
        |  'http://www.w3.org/2001/XMLSchema#date' AS o_datatype,
        |  CAST(NULL AS VARCHAR) AS o_lang,
        |  'http://graft.local/graph/order' AS g FROM orders
        |UNION ALL
        |SELECT 'http://graft.local/tpch/order/' || CAST(o_orderkey AS VARCHAR),
        |  'http://graft.local/def/orderInstant', 'literal',
        |  strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S'),
        |  'http://www.w3.org/2001/XMLSchema#dateTime', CAST(NULL AS VARCHAR),
        |  'http://graft.local/graph/order' FROM orders
        |UNION ALL
        |SELECT 'http://graft.local/tpch/order/' || CAST(o_orderkey AS VARCHAR),
        |  'http://graft.local/def/orderYear', 'literal',
        |  strftime(o_orderdate, '%Y'),
        |  'http://www.w3.org/2001/XMLSchema#gYear', CAST(NULL AS VARCHAR),
        |  'http://graft.local/graph/order' FROM orders""".stripMargin,

    "kg_nq_lines" ->
      """WITH t AS (
        |  SELECT 'http://graft.local/tpch/nation/' || n_name AS s,
        |    'http://schema.org/name' AS p, 'literal' AS o_kind, n_name AS o_lex,
        |    CAST(NULL AS VARCHAR) AS o_datatype, 'en' AS o_lang FROM nation
        |  UNION ALL
        |  SELECT 'http://graft.local/tpch/nation/' || n_name,
        |    'http://graft.local/def/key', 'literal', CAST(n_nationkey AS VARCHAR),
        |    'http://www.w3.org/2001/XMLSchema#integer', CAST(NULL AS VARCHAR) FROM nation
        |  UNION ALL
        |  SELECT 'http://graft.local/tpch/nation/' || n_name,
        |    'http://schema.org/containedInPlace', 'iri',
        |    'http://graft.local/tpch/region/' || CAST(n_regionkey AS VARCHAR),
        |    CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) FROM nation
        |  UNION ALL
        |  SELECT 'http://graft.local/tpch/nation/' || n_name,
        |    'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'iri',
        |    'http://schema.org/Country', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) FROM nation)
        |SELECT '<' || s || '> <' || p || '> ' ||
        |  CASE WHEN o_kind = 'iri' THEN '<' || o_lex || '>'
        |       ELSE '"' || o_lex || '"' ||
        |         CASE WHEN o_lang IS NOT NULL THEN '@' || o_lang
        |              WHEN o_datatype IS NOT NULL THEN '^^<' || o_datatype || '>'
        |              ELSE '' END
        |  END || ' <http://graft.local/graph/tpch> .' AS line
        |FROM t""".stripMargin,

    "kg_turtle_blocks" ->
      """WITH t AS (
        |  SELECT 'http://graft.local/tpch/nation/' || n_name AS s,
        |    'http://schema.org/name' AS p,
        |    '"' || n_name || '"@en' AS obj, n_name AS olex FROM nation
        |  UNION ALL
        |  SELECT 'http://graft.local/tpch/nation/' || n_name,
        |    'http://graft.local/def/key',
        |    '"' || CAST(n_nationkey AS VARCHAR) ||
        |    '"^^<http://www.w3.org/2001/XMLSchema#integer>',
        |    CAST(n_nationkey AS VARCHAR) FROM nation
        |  UNION ALL
        |  SELECT 'http://graft.local/tpch/nation/' || n_name,
        |    'http://schema.org/containedInPlace',
        |    '<http://graft.local/tpch/region/' || CAST(n_regionkey AS VARCHAR) || '>',
        |    'http://graft.local/tpch/region/' || CAST(n_regionkey AS VARCHAR) FROM nation
        |  UNION ALL
        |  SELECT 'http://graft.local/tpch/nation/' || n_name,
        |    'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
        |    '<http://schema.org/Country>', 'http://schema.org/Country' FROM nation)
        |SELECT '<' || s || '>' || chr(10) || '    ' ||
        |  string_agg('<' || p || '> ' || obj,
        |    ' ;' || chr(10) || '    ' ORDER BY p, olex) || ' .' AS block
        |FROM t GROUP BY s""".stripMargin,

    "kg_mentions" ->
      """WITH m AS (
        |  SELECT 'ent:spark' AS entity_id, doc_id,
        |    len(regexp_extract_all(text, '\bspark\b')) AS n FROM documents
        |  UNION ALL SELECT 'ent:customer', doc_id,
        |    len(regexp_extract_all(text, '\bcustomer\b')) FROM documents
        |  UNION ALL SELECT 'ent:vector', doc_id,
        |    len(regexp_extract_all(text, '\bvector\b')) FROM documents
        |  UNION ALL SELECT 'ent:stream', doc_id,
        |    len(regexp_extract_all(text, '\bstream\b')) FROM documents)
        |SELECT entity_id,
        |  CAST(COUNT(CASE WHEN n > 0 THEN 1 END) AS BIGINT) AS n_docs,
        |  CAST(SUM(n) AS BIGINT) AS n_mentions
        |FROM m GROUP BY entity_id HAVING SUM(n) > 0""".stripMargin,

    "kg_canonical" ->
      """WITH c AS (SELECT c_custkey,
        |    COUNT(*) OVER (PARTITION BY c_nationkey) AS cnt,
        |    MIN(c_custkey) OVER (PARTITION BY c_nationkey) AS mn
        |  FROM customer)
        |SELECT 'u:' || lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS node,
        |       'u:' || lpad(CAST(mn AS VARCHAR), 10, '0') AS canonical
        |FROM c WHERE cnt >= 2""".stripMargin,

    // the link scorer's whole feature vector is exact integers, so the
    // oracle re-derives it from regexes: n via regexp_extract_all,
    // first_begin as the length of the lazy prefix before the first
    // word-bounded hit, corroboration as surface = first-token anchor
    "kg_link_scores" ->
      """WITH d AS (
        |  SELECT 'https://ex.test/doc/' || CAST(doc_id AS VARCHAR) AS url, text,
        |    regexp_extract(text, '^(\S+)', 1) AS w1 FROM documents),
        |g AS (
        |  SELECT * FROM (VALUES ('spark','ent:spark'), ('customer','ent:customer'),
        |    ('vector','ent:vector'), ('stream','ent:stream')) AS t(surface, entity_id)),
        |m AS (
        |  SELECT d.url, d.w1, g.surface, g.entity_id,
        |    len(regexp_extract_all(d.text, '\b' || g.surface || '\b')) AS n,
        |    length(regexp_extract(d.text,
        |      '(?s)^((?:.)*?)\b' || g.surface || '\b', 1)) AS fb
        |  FROM d, g)
        |SELECT url, entity_id, CAST(n AS BIGINT) AS n_mentions,
        |  CAST(fb AS BIGINT) AS first_begin,
        |  CAST(CASE WHEN surface = w1 THEN 1 ELSE 0 END AS BIGINT) AS corroborated,
        |  CAST(CASE WHEN surface = w1 THEN 9000 ELSE 5000 END
        |    + 250 * least(n - 1, 2)
        |    + CASE WHEN fb < 64 THEN 300 ELSE 0 END
        |    + CASE WHEN length(surface) >= 6 THEN 200 ELSE 0 END AS BIGINT) AS score_bp
        |FROM m WHERE n > 0""".stripMargin,

    "kg_pipeline" ->
      """WITH d AS (
        |  SELECT 'https://ex.test/doc/' || CAST(doc_id AS VARCHAR) AS url,
        |    text, lang, regexp_extract(text, '^(\S+)', 1) AS w1
        |  FROM documents),
        |c AS (
        |  SELECT *, CASE WHEN w1 IN ('spark','customer','vector','stream')
        |    THEN 'ent:' || w1 ELSE url END AS subj FROM d),
        |t AS (
        |  SELECT subj AS s, 'http://purl.org/dc/terms/language' AS p,
        |    'literal' AS o_kind, lang AS o_lex,
        |    'http://www.w3.org/2001/XMLSchema#string' AS o_datatype,
        |    CAST(NULL AS VARCHAR) AS o_lang FROM c
        |  UNION ALL
        |  SELECT subj, 'http://graft.local/def/firstToken', 'literal', w1,
        |    CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) FROM c
        |    WHERE w1 IS NOT NULL AND w1 <> ''
        |  UNION ALL
        |  SELECT subj, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'iri',
        |    'http://schema.org/WebPage', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) FROM c
        |  UNION ALL
        |  SELECT subj, 'http://schema.org/mentions', 'iri', 'ent:spark',
        |    CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) FROM c
        |    WHERE regexp_matches(text, '\bspark\b')
        |  UNION ALL
        |  SELECT subj, 'http://schema.org/mentions', 'iri', 'ent:customer',
        |    CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) FROM c
        |    WHERE regexp_matches(text, '\bcustomer\b')
        |  UNION ALL
        |  SELECT subj, 'http://schema.org/mentions', 'iri', 'ent:vector',
        |    CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) FROM c
        |    WHERE regexp_matches(text, '\bvector\b')
        |  UNION ALL
        |  SELECT subj, 'http://schema.org/mentions', 'iri', 'ent:stream',
        |    CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) FROM c
        |    WHERE regexp_matches(text, '\bstream\b'))
        |SELECT DISTINCT s, p, o_kind, o_lex, o_datatype, o_lang,
        |  'http://graft.local/graph/web' AS g
        |FROM t""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(regexp_extract_all(text, '\S+'))) AS BIGINT) AS n_distinct_tokens,
        |  CAST(len(regexp_extract_all(text, ' ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+')) AS BIGINT) AS n_bpe_tokens,
        |  CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha_chars
        |FROM documents""".stripMargin,

    "text_quality" ->
      """WITH q AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(regexp_extract_all(text, '\b(the|a|of|and|to|in)\b')) AS BIGINT) AS n_stopwords,
        |  CAST(len(regexp_extract_all(text, '[\.,;:!\?]')) AS BIGINT) AS n_punct
        |FROM documents)
        |SELECT *,
        |  (n_tokens >= 10 AND n_tokens <= 100000
        |   AND (n_chars - n_tokens + 1) >= n_tokens * 2
        |   AND (n_chars - n_tokens + 1) <= n_tokens * 12
        |   AND n_stopwords >= 1) AS keep
        |FROM q""".stripMargin,

    "text_langid" ->
      """WITH s AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\b(the|a|of|and|to|in)\b')) AS BIGINT) AS score_en,
        |  CAST(len(regexp_extract_all(text, '\b(der|die|das|und|ist|nicht)\b')) AS BIGINT) AS score_de,
        |  CAST(len(regexp_extract_all(text, '\b(le|la|les|et|est|une)\b')) AS BIGINT) AS score_fr,
        |  CAST(len(regexp_extract_all(text, '\b(el|los|las|es|una|que)\b')) AS BIGINT) AS score_es,
        |  CAST(len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS BIGINT) AS score_zh
        |FROM documents)
        |SELECT *, CASE
        |  WHEN score_en = greatest(score_en, score_de, score_fr, score_es, score_zh) AND score_en > 0 THEN 'en'
        |  WHEN score_de = greatest(score_en, score_de, score_fr, score_es, score_zh) AND score_de > 0 THEN 'de'
        |  WHEN score_fr = greatest(score_en, score_de, score_fr, score_es, score_zh) AND score_fr > 0 THEN 'fr'
        |  WHEN score_es = greatest(score_en, score_de, score_fr, score_es, score_zh) AND score_es > 0 THEN 'es'
        |  WHEN score_zh = greatest(score_en, score_de, score_fr, score_es, score_zh) AND score_zh > 0 THEN 'zh'
        |  ELSE 'und' END AS pred_lang
        |FROM s""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]+', '', 'g')) AS fp
        |FROM documents""".stripMargin,

    // the rolling fold re-derived token by token: portable 31-bit
    // polynomial token hash, 20-bit truncation, base-1009 Horner mod 2^31-1
    "text_rolling_hash" ->
      s"""SELECT doc_id,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(regexp_extract_all(coalesce(text, ''), '\\S+'),
         |      t -> ${P.polyhash31Sql("t")} % 1048576)),
         |    (a, x) -> (a*1009 + x) % 2147483647) AS rh
         |FROM documents""".stripMargin,

    // the two-phase distributed prefix sum must equal the plain global
    // window cumsum (same mix31 order, same start-offset shard rule)
    "text_pack_shards" ->
      s"""WITH t AS (SELECT doc_id,
         |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
         |    ${P.mix31Sql("doc_id")} AS ord
         |  FROM documents),
         |c AS (SELECT doc_id, n_tokens,
         |    SUM(n_tokens) OVER (ORDER BY ord, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM t)
         |SELECT doc_id, n_tokens,
         |  CAST((cum - n_tokens) // 5000 AS BIGINT) AS shard
         |FROM c""".stripMargin,

    // decontamination re-derived in SQL: benchmark shingle hashes
    // (distinct), corpus shingle hashes per doc (distinct STRINGS then
    // hashed — a collision legitimately counts once per string, same
    // as the engine), LEFT JOIN keeps shingle-less docs as clean rows
    "text_decontaminate" ->
      s"""WITH $shingleCtes,
         |bench AS (SELECT DISTINCT ${P.polyhash31Sql("sg")} AS h
         |  FROM (SELECT unnest(s) AS sg FROM sh WHERE doc_id % 50 = 0)),
         |post AS (SELECT doc_id, ${P.polyhash31Sql("sg")} AS h
         |  FROM (SELECT doc_id, unnest(s) AS sg FROM sh WHERE doc_id % 50 <> 0)),
         |hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nc
         |  FROM post JOIN bench USING (h) GROUP BY doc_id)
         |SELECT d.doc_id, CAST(coalesce(nc, 0) AS BIGINT) AS n_contaminated,
         |  coalesce(nc, 0) > 0 AS contaminated
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) d
         |LEFT JOIN hits USING (doc_id)""".stripMargin,

    // per-shard manifest bookkeeping re-derived from the same naive
    // global-window cumsum the pack oracle uses
    "text_shards_manifest" ->
      s"""WITH t AS (SELECT doc_id,
         |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
         |    ${P.mix31Sql("doc_id")} AS ord
         |  FROM documents),
         |c AS (SELECT doc_id, n_tokens,
         |    SUM(n_tokens) OVER (ORDER BY ord, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM t),
         |s AS (SELECT doc_id, n_tokens,
         |    CAST((cum - n_tokens) // 5000 AS BIGINT) AS shard FROM c)
         |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
         |  CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
         |FROM s GROUP BY shard""".stripMargin,

    // content-keyed stratified sample: the oracle recomputes the SAME
    // mix31(doc_id) < floor(fraction·2^31) membership test, so the
    // sampled row set matches hash-exactly (not statistically)
    "text_sample_stratified" -> {
      val cases = Queries.sampleFractions.toSeq.sortBy(_._1)
        .map { case (s, f) => s"WHEN '$s' THEN ${graft.ops.Sampling.threshold(f)}" }
        .mkString(" ")
      s"""SELECT CAST(doc_id AS BIGINT) AS doc_id, lang FROM documents
         |WHERE ${P.mix31Sql("doc_id")} < CASE lang $cases
         |  ELSE ${graft.ops.Sampling.threshold(Queries.sampleDefault)} END""".stripMargin
    },

    // per-host cap: the oracle is the PLAIN one-window spelling of the
    // same deterministic (mix31(id), id) rank the two-phase engine
    // path must reproduce exactly
    "text_host_cap" ->
      s"""WITH r AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY ${P.mix31Sql("doc_id")}, doc_id) AS BIGINT) AS rk
         |  FROM documents)
         |SELECT doc_id, source, rk FROM r WHERE rk <= 5""".stripMargin,

    // intra-document repetition: token / word-2-gram top counts via
    // unnest + group-by (the engine counts per-doc in a JVM hash map);
    // the integer-arithmetic gate is re-spelled verbatim
    "text_repetition" ->
      """WITH tok AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents),
        |b AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
        |    CAST(len(t) - len(list_distinct(t)) AS BIGINT) AS dup_token_n,
        |    CAST(greatest(len(t) - 1, 0) AS BIGINT) AS n_2grams
        |  FROM tok),
        |tu AS (SELECT doc_id, unnest(t) AS tk FROM tok),
        |ttop AS (SELECT doc_id, MAX(c) AS top FROM (
        |    SELECT doc_id, tk, COUNT(*) AS c FROM tu GROUP BY doc_id, tk) GROUP BY doc_id),
        |gu AS (SELECT doc_id,
        |    unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS gm
        |  FROM tok),
        |gtop AS (SELECT doc_id, MAX(c) AS topg FROM (
        |    SELECT doc_id, gm, COUNT(*) AS c FROM gu GROUP BY doc_id, gm) GROUP BY doc_id)
        |SELECT b.doc_id, n_tokens, dup_token_n,
        |  CAST(coalesce(ttop.top, 0) AS BIGINT) AS top_token_n, n_2grams,
        |  CAST(coalesce(gtop.topg, 0) AS BIGINT) AS top_2gram_n,
        |  (n_tokens > 0 AND 10*dup_token_n <= 3*n_tokens
        |   AND 5*coalesce(gtop.topg, 0) <= n_2grams) AS rep_keep
        |FROM b LEFT JOIN ttop ON b.doc_id = ttop.doc_id
        |LEFT JOIN gtop ON b.doc_id = gtop.doc_id""".stripMargin,

    // PII scrub: the same deterministic PII synthesis from doc_id, the
    // same three regexes applied in the same order ('g' = replace-all,
    // matching Spark's regexp_replace semantics), counts re-derived on
    // the raw synth text, and the full redacted string md5-checked
    "text_pii_redact" ->
      s"""WITH synth AS (SELECT doc_id,
         |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
         |      || repeat(' cc' || CAST(doc_id AS VARCHAR) || '@ex.org',
         |           CAST(((doc_id % 3) + 3) % 3 AS INT))
         |      || ' from 10.0.' || CAST(((doc_id % 256) + 256) % 256 AS VARCHAR)
         |      || '.7 call +1 555-'
         |      || lpad(CAST(((doc_id % 10000) + 10000) % 10000 AS VARCHAR), 4, '0') AS text
         |  FROM documents),
         |red AS (SELECT doc_id, text,
         |    regexp_replace(regexp_replace(regexp_replace(text,
         |      '${graft.ops.TextOps.emailRe}', '<EMAIL>', 'g'),
         |      '${graft.ops.TextOps.ipv4Re}', '<IP>', 'g'),
         |      '${graft.ops.TextOps.phoneRe}', '<PHONE>', 'g') AS r
         |  FROM synth)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '${graft.ops.TextOps.emailRe}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '${graft.ops.TextOps.ipv4Re}')) AS BIGINT) AS n_ips,
         |  CAST(len(regexp_extract_all(text, '${graft.ops.TextOps.phoneRe}')) AS BIGINT) AS n_phones,
         |  md5(r) AS red_fp, CAST(length(r) AS BIGINT) AS red_len
         |FROM red""".stripMargin,

    // (count desc, token) is a total order — the top-20 cut is unique
    "text_vocab_topk" ->
      """SELECT token, CAST(COUNT(*) AS BIGINT) AS n
        |FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS token FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,

    // the oracle is the EXPECTED canonical string per messy shape,
    // stated directly — an independent derivation, not a re-run of
    // the normalization algorithm
    "text_url_canon" ->
      """SELECT doc_id,
        |  CASE doc_id % 4
        |    WHEN 0 THEN 'http://www.ex' || CAST(doc_id % 7 AS VARCHAR)
        |      || '.test/a/' || CAST(doc_id AS VARCHAR) || '?a=1&z=9'
        |    WHEN 1 THEN 'https://ex' || CAST(doc_id % 7 AS VARCHAR) || '.test/b?a=1&b=2'
        |    WHEN 2 THEN 'http://ex' || CAST(doc_id % 7 AS VARCHAR) || '.test/'
        |    ELSE 'https://sub.ex' || CAST(doc_id % 7 AS VARCHAR)
        |      || '.test:8443/c/' || CAST(doc_id AS VARCHAR)
        |  END AS url_canon,
        |  CASE doc_id % 4
        |    WHEN 0 THEN 'test.ex' || CAST(doc_id % 7 AS VARCHAR) || '.www'
        |    WHEN 1 THEN 'test.ex' || CAST(doc_id % 7 AS VARCHAR)
        |    WHEN 2 THEN 'test.ex' || CAST(doc_id % 7 AS VARCHAR)
        |    ELSE 'test.ex' || CAST(doc_id % 7 AS VARCHAR) || '.sub'
        |  END AS surt
        |FROM documents""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS fp, CAST(MIN(doc_id) AS BIGINT) AS keep_id,
        |  CAST(COUNT(*) AS BIGINT) AS group_size
        |FROM documents GROUP BY md5(text)""".stripMargin,

    // the composed curation pass: same gate/vote/fingerprint formulas
    // as text_quality / text_langid / text_fingerprint, then the
    // min-survivor-per-fingerprint dedup window
    "curation_pipeline" ->
      """WITH s AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(regexp_extract_all(text, '\b(the|a|of|and|to|in)\b')) AS BIGINT) AS s_en,
        |  CAST(len(regexp_extract_all(text, '\b(der|die|das|und|ist|nicht)\b')) AS BIGINT) AS s_de,
        |  CAST(len(regexp_extract_all(text, '\b(le|la|les|et|est|une)\b')) AS BIGINT) AS s_fr,
        |  CAST(len(regexp_extract_all(text, '\b(el|los|las|es|una|que)\b')) AS BIGINT) AS s_es,
        |  CAST(len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS BIGINT) AS s_zh,
        |  md5(regexp_replace(lower(text), '[^a-z0-9]+', '', 'g')) AS fp
        |FROM documents),
        |g AS (SELECT *,
        |  CASE WHEN n_tokens >= 10 AND n_tokens <= 100000
        |    AND (n_chars - n_tokens + 1) >= n_tokens * 2
        |    AND (n_chars - n_tokens + 1) <= n_tokens * 12
        |    AND s_en >= 1 THEN 1 ELSE 0 END AS q_keep,
        |  CASE WHEN s_en = greatest(s_en, s_de, s_fr, s_es, s_zh) AND s_en > 0
        |    THEN 1 ELSE 0 END AS lang_keep
        |FROM s),
        |m AS (SELECT *,
        |  MIN(CASE WHEN q_keep = 1 AND lang_keep = 1 THEN doc_id END)
        |    OVER (PARTITION BY fp) AS canon
        |FROM g)
        |SELECT doc_id, n_tokens,
        |  CAST(q_keep AS BIGINT) AS q_keep, CAST(lang_keep AS BIGINT) AS lang_keep,
        |  CAST(CASE WHEN q_keep = 1 AND lang_keep = 1 AND doc_id = canon
        |    THEN 1 ELSE 0 END AS BIGINT) AS selected
        |FROM m""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""WITH $ngramPairCtes
         |SELECT id_a, id_b, jaccard FROM exact_pairs""".stripMargin,

    // same ipair sufficient statistics, containment measure
    "dedup_ngram_containment" ->
      s"""WITH $ngramPairCtes
         |SELECT id_a, id_b,
         |  round(CAST(inter AS DOUBLE) / least(sa, sb), 5) AS containment
         |FROM ipair
         |WHERE round(CAST(inter AS DOUBLE) / least(sa, sb), 5) >= 0.2""".stripMargin,

    "dedup_minhash_lsh" ->
      s"""WITH $minhashCtes
         |SELECT id_a, id_b, jaccard FROM mh_pairs WHERE jaccard >= 0.12""".stripMargin,

    "dedup_minhash_recall" ->
      s"""WITH $shingleCtes,
         |$ngramFromSh,
         |$minhashFromSh,
         |erel AS (SELECT DISTINCT id_a, id_b FROM exact_pairs),
         |arel AS (SELECT DISTINCT id_a, id_b FROM mh_pairs WHERE jaccard >= 0.12)
         |${recallSelect("erel", "arel", "id_a", "id_b")}""".stripMargin,

    // incremental snapshot dedup: signatures are row-local, so the
    // oracle re-derives them over the WHOLE corpus and applies the
    // store/batch membership split (doc_id pmod 5) purely in SQL —
    // batch-vs-store candidates from the banded bucket join plus
    // within-batch pairs owned by the later doc_id, then exact-Jaccard
    // verified against the same shingle sets
    "dedup_incremental" ->
      s"""WITH $shingleCtes,
         |$minhashFromSh,
         |stb AS (SELECT * FROM bb WHERE ((doc_id % 5) + 5) % 5 < 4),
         |inb AS (SELECT * FROM bb WHERE ((doc_id % 5) + 5) % 5 = 4),
         |icand AS (
         |  SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_match
         |  FROM inb a JOIN stb b ON a.band = b.band AND a.bucket = b.bucket
         |  UNION
         |  SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_match
         |  FROM inb a JOIN inb b ON a.band = b.band AND a.bucket = b.bucket
         |    AND a.doc_id > b.doc_id),
         |iv AS (SELECT id_new, id_match,
         |    round(CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) /
         |      (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))), 5) AS jaccard
         |  FROM icand JOIN sh x ON x.doc_id = id_new JOIN sh y ON y.doc_id = id_match)
         |SELECT id_new, id_match, jaccard FROM iv WHERE jaccard >= 0.12""".stripMargin,

    // passage dedup: same fixed-width token chunks + md5 fingerprints;
    // "first global occurrence wins" re-spelled as one window (the
    // engine uses the skew-safe min-struct aggregate + join)
    "dedup_passages" ->
      """WITH tok AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents),
        |pz AS (SELECT doc_id, CAST(i.v AS BIGINT) AS p_idx,
        |    md5(array_to_string(t[i.v*6 + 1 : least((i.v+1)*6, len(t))], ' ')) AS h
        |  FROM tok, LATERAL (SELECT unnest(range(0, (len(t) + 5) // 6)) AS v) i)
        |SELECT doc_id, p_idx, h,
        |  (row_number() OVER (PARTITION BY h ORDER BY doc_id, p_idx) = 1) AS keep
        |FROM pz""".stripMargin,

    "kg_pagerank" ->
      s"""WITH $kgPagerankCtes
         |SELECT id, pr FROM p5""".stripMargin,

    "kg_property_table" ->
      s"""WITH t AS (${nationTriplesSql("nation")})
         |SELECT s,
         |  MIN(CASE WHEN p = 'http://schema.org/name' THEN o_lex END) AS name,
         |  MIN(CASE WHEN p = 'http://graft.local/def/key' THEN o_lex END) AS key_lex,
         |  MIN(CASE WHEN p = 'http://schema.org/containedInPlace' THEN o_lex END) AS place,
         |  MIN(CASE WHEN p = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' THEN o_lex END) AS type_iri
         |FROM t GROUP BY s""".stripMargin,

    "kg_delta" ->
      s"""WITH n2 AS (SELECT CASE WHEN n_nationkey % 2 = 1
         |      THEN n_name || '_v2' ELSE n_name END AS n_name,
         |    n_nationkey, n_regionkey FROM nation),
         |a AS (${nationTriplesSql("nation")}),
         |b AS (${nationTriplesSql("n2")}),
         |rem AS (SELECT * FROM a EXCEPT SELECT * FROM b),
         |adds AS (SELECT * FROM b EXCEPT SELECT * FROM a)
         |SELECT '-' AS op, * FROM rem
         |UNION ALL
         |SELECT '+' AS op, * FROM adds""".stripMargin,

    "kg_bgp_hop" ->
      s"""WITH t AS (${nationTriplesSql("nation")}
         |UNION ALL
         |SELECT 'http://graft.local/tpch/region/' || CAST(r_regionkey AS VARCHAR),
         |  'http://schema.org/name', 'literal', r_name,
         |  CAST(NULL AS VARCHAR), 'en', 'http://graft.local/graph/tpch' FROM region)
         |SELECT t1.s AS n, t2.o_lex AS r, t3.o_lex AS rname, t4.o_lex AS nname
         |FROM t t1
         |JOIN t t2 ON t2.s = t1.s AND t2.p = 'http://schema.org/containedInPlace'
         |JOIN t t3 ON t3.s = t2.o_lex AND t3.p = 'http://schema.org/name'
         |JOIN t t4 ON t4.s = t1.s AND t4.p = 'http://schema.org/name'
         |WHERE t1.p = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
         |  AND t1.o_kind = 'iri' AND t1.o_lex = 'http://schema.org/Country'""".stripMargin,

    "kg_bgp_optional" ->
      s"""WITH t AS (${nationTriplesSql("nation")}
         |UNION ALL
         |SELECT 'http://graft.local/tpch/region/' || CAST(r_regionkey AS VARCHAR),
         |  'http://schema.org/name', 'literal', r_name,
         |  CAST(NULL AS VARCHAR), 'en', 'http://graft.local/graph/tpch' FROM region)
         |SELECT t1.s AS x, t1.o_lex AS name, t2.o_lex AS parent
         |FROM t t1
         |LEFT JOIN t t2 ON t2.s = t1.s
         |  AND t2.p = 'http://schema.org/containedInPlace'
         |WHERE t1.p = 'http://schema.org/name'""".stripMargin,

    "kg_void_stats" ->
      s"""WITH t AS (${nationTriplesSql("nation")}
         |UNION ALL
         |SELECT 'http://graft.local/tpch/region/' || CAST(r_regionkey AS VARCHAR),
         |  'http://schema.org/name', 'literal', r_name,
         |  CAST(NULL AS VARCHAR), 'en', 'http://graft.local/graph/tpch' FROM region)
         |SELECT p, CAST(COUNT(*) AS BIGINT) AS n_triples,
         |  CAST(COUNT(DISTINCT s) AS BIGINT) AS n_subjects,
         |  CAST(COUNT(DISTINCT o_lex) AS BIGINT) AS n_objects,
         |  CAST(SUM(CASE WHEN o_kind = 'literal' THEN 1 ELSE 0 END) AS BIGINT) AS n_literals,
         |  CAST(SUM(CASE WHEN o_kind = 'iri' THEN 1 ELSE 0 END) AS BIGINT) AS n_iris
         |FROM t GROUP BY p""".stripMargin,

    "kg_bgp_path" ->
      """WITH RECURSIVE e AS (
        |  SELECT 'http://graft.local/tax/n' || CAST(p_partkey AS VARCHAR) AS child,
        |    'http://graft.local/tax/n' || CAST((p_partkey - 1) // 8 AS VARCHAR) AS parent
        |  FROM part WHERE p_partkey > 0),
        |anc AS (
        |  SELECT child, parent AS ancestor FROM e
        |  UNION
        |  SELECT a.child, e.parent FROM anc a JOIN e ON a.ancestor = e.child),
        |lab AS (
        |  SELECT 'http://graft.local/tax/n' || CAST(p_partkey AS VARCHAR) AS s,
        |    'node ' || CAST(p_partkey AS VARCHAR) AS name
        |  FROM part WHERE p_partkey > 0)
        |SELECT a.child AS x, l.name
        |FROM anc a JOIN lab l ON l.s = a.child
        |WHERE a.ancestor = 'http://graft.local/tax/n0'""".stripMargin,

    // rdfs9 over a FIXED-DEPTH class DAG: the oracle unrolls the two
    // TBox levels directly instead of recursing
    "kg_type_inference" ->
      """WITH p AS (SELECT 'n' || CAST(p_partkey AS VARCHAR) AS inst, p_type,
        |    length(p_type) % 2 AS g FROM part)
        |SELECT inst, 'cat/' || p_type AS cls, CAST(0 AS BIGINT) AS dist FROM p
        |UNION ALL
        |SELECT inst, 'grp/' || CAST(g AS VARCHAR), CAST(1 AS BIGINT) FROM p
        |UNION ALL
        |SELECT inst, 'root', CAST(2 AS BIGINT) FROM p""".stripMargin,

    "kg_taxonomy_closure" ->
      """WITH RECURSIVE e AS (
        |  SELECT 'n' || CAST(p_partkey AS VARCHAR) AS child,
        |    'n' || CAST((p_partkey - 1) // 8 AS VARCHAR) AS parent
        |  FROM part WHERE p_partkey > 0
        |  UNION ALL
        |  SELECT 'n' || CAST(p_partkey AS VARCHAR), 'cat/' || p_type
        |  FROM part WHERE p_partkey > 0
        |  UNION ALL
        |  SELECT DISTINCT 'cat/' || p_type, 'n0' FROM part WHERE p_partkey > 0),
        |anc AS (
        |  SELECT child, parent AS ancestor, 1 AS dist FROM e
        |  UNION
        |  SELECT a.child, e.parent, a.dist + 1 FROM anc a JOIN e ON a.ancestor = e.child)
        |SELECT child, ancestor, CAST(MIN(dist) AS BIGINT) AS dist
        |FROM anc GROUP BY child, ancestor""".stripMargin,

    "dedup_simhash" ->
      s"""WITH $simhashCtes
         |SELECT id_a, id_b, hamming FROM sh_pairs WHERE hamming <= 3""".stripMargin,

    "dedup_embedding_lsh" ->
      s"""WITH ${annBucketCtes(8, 3, 64)},
         |ecand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM bk a JOIN bk b ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |esc AS (SELECT id_a, id_b, round(${P.cosineSql("x.v", "y.v", 64)}, 5) AS sim
         |  FROM ecand JOIN e x ON x.vec_id = id_a JOIN e y ON y.vec_id = id_b)
         |SELECT id_a, id_b, sim FROM esc WHERE sim >= 0.35""".stripMargin,

    "dedup_embedding_recall" ->
      s"""WITH ${annBucketCtes(8, 3, 64)},
         |ecand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM bk a JOIN bk b ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |esc AS (SELECT id_a, id_b, round(${P.cosineSql("x.v", "y.v", 64)}, 5) AS sim
         |  FROM ecand JOIN e x ON x.vec_id = id_a JOIN e y ON y.vec_id = id_b),
         |arel AS (SELECT id_a, id_b FROM esc WHERE sim >= 0.35),
         |erel AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id
         |  WHERE round(list_cosine_similarity(a.v, b.v), 5) >= 0.35)
         |${recallSelect("erel", "arel", "id_a", "id_b")}""".stripMargin,

    "kg_link_ann" ->
      s"""WITH $kgLinkAnnCtes
         |SELECT ctx_id, rk, entity_id, sim FROM ann_link""".stripMargin,

    "kg_link_ann_recall" ->
      s"""WITH $kgLinkAnnCtes,
         |$kgLinkAnnBruteCtes,
         |arel AS (SELECT ctx_id, entity_id FROM ann_link)
         |${recallSelect("ann_brute", "arel", "ctx_id", "entity_id")}""".stripMargin,

    "sim_ann_lsh" ->
      s"""WITH $annLshCtes
         |SELECT query_id, rk, neighbor_id, sim FROM lsh_topk""".stripMargin,

    "sim_ann_lsh_recall" ->
      s"""WITH $annLshCtes,
         |$annBruteCtes,
         |arel AS (SELECT query_id, neighbor_id FROM lsh_topk)
         |${recallSelect("bf_topk", "arel", "query_id", "neighbor_id")}""".stripMargin,

    "sim_ann_ivf" ->
      s"""WITH $annIvfCtes
         |SELECT query_id, rk, neighbor_id, sim FROM ivf_topk""".stripMargin,

    "sim_ann_ivf_recall" ->
      s"""WITH $annIvfCtes,
         |$annBruteCtes,
         |arel AS (SELECT query_id, neighbor_id FROM ivf_topk)
         |${recallSelect("bf_topk", "arel", "query_id", "neighbor_id")}""".stripMargin,

    "sim_ann_ivf_lloyd" ->
      s"""WITH $annIvfLloydCtes
         |SELECT query_id, rk, neighbor_id, sim FROM ivf_topk""".stripMargin,

    "q5_multi_join" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,

    "q_stateful_sessions" ->
      """WITH x AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |y AS (SELECT user_id,
        |  CASE WHEN lag(us) OVER w IS NULL
        |         OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS ind
        |  FROM x WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
        |SELECT user_id, CAST(SUM(ind) AS BIGINT) AS n_sessions,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM y GROUP BY user_id""".stripMargin,

    "dedup_clusters" ->
      """WITH RECURSIVE tok AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents),
        |sh AS (SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(t) - 1),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
        |  FROM tok WHERE len(t) >= 3),
        |p AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
        |    len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS sa, len(b.s) AS sb
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
        |e AS (SELECT ia, ib FROM p
        |  WHERE round(CAST(inter AS DOUBLE) / (sa + sb - inter), 5) >= 0.12),
        |sym AS (SELECT ia AS a, ib AS b FROM e UNION SELECT ib, ia FROM e),
        |reach(a, b) AS (SELECT a, b FROM sym
        |  UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
        |mn AS (SELECT a, MIN(b) AS mb FROM reach GROUP BY a)
        |SELECT d.doc_id,
        |  CAST(COALESCE(LEAST(m.mb, d.doc_id), d.doc_id) AS BIGINT) AS canon_id
        |FROM documents d LEFT JOIN mn m ON m.a = d.doc_id""".stripMargin,

    "dedup_embedding" ->
      """WITH e AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.v, b.v), 5) AS sim
        |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.v, b.v), 5) >= 0.35""".stripMargin,

    "sim_ann_topk" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(list_cosine_similarity(q.v, c.v), 5) AS sim
        |  FROM e q JOIN e c ON c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 10),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, neighbor_id) AS rk FROM s)
        |SELECT query_id, CAST(rk AS BIGINT) AS rk, neighbor_id, sim
        |FROM r WHERE rk <= 5""".stripMargin,

    // The oracle predicts every metadata field from the doc_id
    // arithmetic that parameterizes the synthetic containers
    // (Multimodal.syntheticMedia scaladoc); the engine must recover
    // the same values by PARSING the real JPEG/WAV bytes.
    "mm_decode" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'jpeg' ELSE 'wav' END AS kind,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 55 + doc_id % 17
        |       ELSE 44 + (10 + doc_id % 90) * (1 + (doc_id // 2) % 2) * 2
        |       END AS BIGINT) AS n_bytes,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 16 + (doc_id * 7) % 1000 END AS BIGINT) AS width,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 16 + (doc_id * 13) % 800 END AS BIGINT) AS height,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 3
        |       ELSE 1 + (doc_id // 2) % 2 END AS BIGINT) AS channels,
        |  CAST(CASE WHEN doc_id % 2 = 1 THEN 8000 + (doc_id % 5) * 4000 END AS BIGINT) AS sample_rate,
        |  CAST(CASE WHEN doc_id % 2 = 1 THEN 10 + doc_id % 90 END AS BIGINT) AS n_frames,
        |  TRUE AS ok
        |FROM documents""".stripMargin,

    // fit-box arithmetic + the 55-byte pixel-less re-encode; odd ids are
    // the WAV payloads, which the thumbnail pass must reject cleanly
    "mm_thumbnail" ->
      """WITH e AS (SELECT doc_id, 16 + (doc_id*7) % 1000 AS w, 16 + (doc_id*13) % 800 AS h
        |  FROM documents WHERE doc_id % 2 = 0),
        |t AS (SELECT doc_id, w, h,
        |  CASE WHEN w <= 256 AND h <= 256 THEN w ELSE greatest(1, (w*256) // greatest(w,h)) END AS tw,
        |  CASE WHEN w <= 256 AND h <= 256 THEN h ELSE greatest(1, (h*256) // greatest(w,h)) END AS th
        |  FROM e)
        |SELECT doc_id, 'jpeg' AS kind, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(tw AS BIGINT) AS target_w, CAST(th AS BIGINT) AS target_h,
        |  CAST(55 AS BIGINT) AS out_n_bytes, TRUE AS ok
        |FROM t
        |UNION ALL
        |SELECT doc_id, 'other', NULL, NULL, NULL, NULL, NULL, FALSE
        |FROM documents WHERE doc_id % 2 = 1""".stripMargin,

    // every-4th-frame PCM sum re-derived from the pcmSample formula via
    // generate_series; even ids are the JPEG payloads (rejected rows)
    "mm_frame_sample" ->
      """WITH o AS (SELECT doc_id, 10 + doc_id % 90 AS frames, 1 + (doc_id // 2) % 2 AS ch
        |  FROM documents WHERE doc_id % 2 = 1),
        |s AS (SELECT o.doc_id, o.frames, o.ch, f.f, c.c
        |  FROM o,
        |    LATERAL (SELECT unnest(generate_series(0, CAST(o.frames - 1 AS BIGINT), 4)) AS f) f,
        |    LATERAL (SELECT unnest(generate_series(0, CAST(o.ch - 1 AS BIGINT))) AS c) c)
        |SELECT doc_id, 'wav' AS kind, CAST(MAX(frames) AS BIGINT) AS n_frames,
        |  CAST(COUNT(DISTINCT f) AS BIGINT) AS n_sampled,
        |  CAST(SUM((doc_id + 7*f + 3*c) % 251) AS BIGINT) AS sum_sampled, TRUE AS ok
        |FROM s GROUP BY doc_id
        |UNION ALL
        |SELECT doc_id, 'other', NULL, NULL, NULL, FALSE
        |FROM documents WHERE doc_id % 2 = 0""".stripMargin,

    // the 2x2 box-filter output, re-derived pixel-by-pixel from the
    // ppmPixel formula: each output pixel is the floor-mean of its
    // 4-pixel block, summed over the whole output raster — the engine
    // must reproduce this by PARSING real P6 bytes, filtering, and
    // re-reading its own re-encoded container
    "mm_resample" ->
      """WITH d AS (SELECT doc_id, 4 + (doc_id*3) % 29 AS w, 4 + (doc_id*5) % 23 AS h
        |  FROM documents),
        |g AS (SELECT doc_id, w, h, w // 2 AS ow, h // 2 AS oh FROM d),
        |s AS (SELECT doc_id, w, h, ow, oh, ox.v AS ox, oy.v AS oy, c.v AS c
        |  FROM g,
        |    LATERAL (SELECT unnest(range(0, ow)) AS v) ox,
        |    LATERAL (SELECT unnest(range(0, oh)) AS v) oy,
        |    LATERAL (SELECT unnest(range(0, 3)) AS v) c),
        |o AS (SELECT doc_id, w, h, ow, oh,
        |   (((doc_id + 5*(2*ox)   + 7*(2*oy)   + 11*c) % 251)
        |  + ((doc_id + 5*(2*ox+1) + 7*(2*oy)   + 11*c) % 251)
        |  + ((doc_id + 5*(2*ox)   + 7*(2*oy+1) + 11*c) % 251)
        |  + ((doc_id + 5*(2*ox+1) + 7*(2*oy+1) + 11*c) % 251)) // 4 AS px
        |  FROM s)
        |SELECT doc_id, 'ppm' AS kind, CAST(w AS BIGINT) AS width,
        |  CAST(h AS BIGINT) AS height, CAST(ow AS BIGINT) AS out_w,
        |  CAST(oh AS BIGINT) AS out_h, CAST(SUM(px) AS BIGINT) AS out_sum, TRUE AS ok
        |FROM o GROUP BY doc_id, w, h, ow, oh""".stripMargin,

    // pixel-real thumbnails at arbitrary fit-box ratios: per output
    // pixel, the floor-mean of its floor-division block re-derived from
    // the ppmPixel formula; the engine must reproduce the total by
    // parsing real P6 bytes, box-filtering at the fit-box ratio, and
    // re-reading its own re-encoded container
    "mm_thumbnail_ppm" ->
      """WITH d AS (SELECT doc_id, 9 + (doc_id*3) % 40 AS w, 9 + (doc_id*5) % 40 AS h
        |  FROM documents),
        |t AS (SELECT doc_id, w, h,
        |  CASE WHEN w <= 16 AND h <= 16 THEN w ELSE greatest(1, (w*16) // greatest(w,h)) END AS tw,
        |  CASE WHEN w <= 16 AND h <= 16 THEN h ELSE greatest(1, (h*16) // greatest(w,h)) END AS th
        |  FROM d),
        |s AS (SELECT doc_id, w, h, tw, th, ox.v AS ox, oy.v AS oy, c.v AS c,
        |    (ox.v*w) // tw AS x0, ((ox.v+1)*w) // tw AS x1,
        |    (oy.v*h) // th AS y0, ((oy.v+1)*h) // th AS y1
        |  FROM t,
        |    LATERAL (SELECT unnest(range(0, tw)) AS v) ox,
        |    LATERAL (SELECT unnest(range(0, th)) AS v) oy,
        |    LATERAL (SELECT unnest(range(0, 3)) AS v) c),
        |o AS (SELECT doc_id, w, h, tw, th,
        |    SUM((doc_id + 5*x.v + 7*y.v + 11*c) % 251) // ((x1-x0)*(y1-y0)) AS px
        |  FROM s,
        |    LATERAL (SELECT unnest(range(x0, x1)) AS v) x,
        |    LATERAL (SELECT unnest(range(y0, y1)) AS v) y
        |  GROUP BY doc_id, w, h, tw, th, ox, oy, c, x0, x1, y0, y1)
        |SELECT doc_id, 'ppm' AS kind, CAST(w AS BIGINT) AS width,
        |  CAST(h AS BIGINT) AS height, CAST(tw AS BIGINT) AS target_w,
        |  CAST(th AS BIGINT) AS target_h, CAST(SUM(px) AS BIGINT) AS out_sum,
        |  TRUE AS ok
        |FROM o GROUP BY doc_id, w, h, tw, th""".stripMargin
  )
}
