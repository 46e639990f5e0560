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
    "q_salted_agg" -> (Queries.qSaltedAgg _),
    // KG construction (SURVEY.md §2.1)
    "kg_triples" -> (Queries.kgTriples _),
    "kg_nq_lines" -> (Queries.kgNqLines _),
    "kg_turtle_blocks" -> (Queries.kgTurtleBlocks _),
    "kg_mentions" -> (Queries.kgMentions _),
    "kg_canonical" -> (Queries.kgCanonical _),
    "kg_pipeline" -> (Queries.kgPipeline _),
    // training-data ops
    "text_tokens" -> (Queries.textTokens _),
    "text_quality" -> (Queries.textQuality _),
    "text_langid" -> (Queries.textLangId _),
    "text_fingerprint" -> (Queries.textFingerprint _),
    "dedup_exact" -> (Queries.dedupExact _),
    "dedup_ngram_jaccard" -> (Queries.dedupNgramJaccard _),
    "dedup_minhash_lsh" -> (Queries.dedupMinhashLsh _),
    "dedup_simhash" -> (Queries.dedupSimhash _),
    "dedup_embedding" -> (Queries.dedupEmbedding _),
    "dedup_clusters" -> (Queries.dedupClusters _),
    "sim_ann_topk" -> (Queries.simAnnTopk _),
    "sim_ann_lsh" -> (Queries.simAnnLsh _),
    "sim_ann_ivf" -> (Queries.simAnnIvf _),
    "mm_decode" -> (Queries.mmDecode _)
  )

  /** DuckDB oracles. Omitted on purpose (rows-only check): LSH-pruned
    * operators whose candidate sets are sound-but-approximate
    * (dedup_minhash_lsh, dedup_simhash, sim_ann_lsh — their EXACT
    * counterparts dedup_ngram_jaccard / sim_ann_topk are fully
    * oracle-checked).
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

    "q_salted_agg" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(FLOOR(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
        |FROM events GROUP BY event_type""".stripMargin,

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

    "dedup_exact" ->
      """SELECT md5(text) AS fp, CAST(MIN(doc_id) AS BIGINT) AS keep_id,
        |  CAST(COUNT(*) AS BIGINT) AS group_size
        |FROM documents GROUP BY md5(text)""".stripMargin,

    "dedup_ngram_jaccard" ->
      """WITH tok AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents),
        |sh AS (SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(t) - 1),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
        |  FROM tok WHERE len(t) >= 3),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS sa, len(b.s) AS sb
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b,
        |  round(CAST(inter AS DOUBLE) / (sa + sb - inter), 5) AS jaccard
        |FROM p WHERE round(CAST(inter AS DOUBLE) / (sa + sb - inter), 5) >= 0.12""".stripMargin,

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

    "mm_decode" ->
      """WITH b AS (SELECT doc_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n FROM documents)
        |SELECT doc_id, n AS n_bytes,
        |  16 + n % 64 AS width, 16 + (n // 64) % 64 AS height,
        |  1 + n % 8 AS n_frames, n > 0 AS ok
        |FROM b""".stripMargin
  )
}
