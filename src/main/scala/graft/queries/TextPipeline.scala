package graft.queries

import graft.{Num, QueryDef, Tables}
import graft.functions.TextFunctions._
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Training-data text pipeline over `documents`: dedup (exact, MinHash+LSH,
  * SimHash, exact Jaccard), token statistics, quality scoring,
  * fingerprinting and language ID. Oracle-checked wherever the semantics
  * are expressible in ANSI SQL; signature-based ops (xxhash-seeded) are
  * rows-only entries.
  */
object TextPipeline {
  import Num._

  private val stops = Seq("the", "a", "of", "and", "to")

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "dedup_exact_stats",
      (s, dir) =>
        Tables(s, dir, "documents")
          .agg(count(lit(1)).as("n_docs"),
               countDistinct(md5(col("text"))).as("n_unique_texts"),
               countDistinct(col("text")).as("n_unique_raw")),
      Some("""
        SELECT COUNT(*) AS n_docs,
          COUNT(DISTINCT MD5(text)) AS n_unique_texts,
          COUNT(DISTINCT text) AS n_unique_raw
        FROM documents""")),

    QueryDef(
      "dedup_keep_first",
      (s, dir) =>
        Dedup.exactKeepFirst(Tables(s, dir, "documents"), "text", "doc_id")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("sum_kept_ids"))
          .orderBy(col("lang")),
      Some("""
        WITH kept AS (
          SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY MD5(text))
        SELECT lang, COUNT(*) AS n_kept,
          CAST(SUM(d.doc_id) AS BIGINT) AS sum_kept_ids
        FROM documents d JOIN kept USING (doc_id)
        GROUP BY lang
        ORDER BY lang""")),

    QueryDef(
      "text_token_stats",
      (s, dir) =>
        Tables(s, dir, "documents")
          .withColumn("n_tokens", tokenCount(col("text")))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
               (sum(col("n_tokens")).cast("double") / count(lit(1))).as("avg_tokens"),
               max(col("n_tokens")).as("max_tokens"),
               min(col("n_tokens")).as("min_tokens"))
          .orderBy(col("lang")),
      Some("""
        WITH t AS (SELECT lang, LEN(STRING_SPLIT(text, ' ')) AS n_tokens FROM documents)
        SELECT lang, COUNT(*) AS n_docs,
          CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens,
          CAST(MAX(n_tokens) AS INTEGER) AS max_tokens,
          CAST(MIN(n_tokens) AS INTEGER) AS min_tokens
        FROM t
        GROUP BY lang
        ORDER BY lang""")),

    // BPE-ish pre-tokenization counts vs whitespace counts (the training-
    // data token-budget estimate).
    QueryDef(
      "text_bpe_token_stats",
      (s, dir) =>
        Tables(s, dir, "documents")
          .withColumn("n_ws", tokenCount(col("text")))
          .withColumn("n_bpe", bpeishTokenCount(col("text")))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
               sum(col("n_ws")).as("ws_tokens"),
               sum(col("n_bpe")).as("bpe_tokens"),
               (sum(col("n_bpe")).cast("double") / sum(col("n_ws"))).as("bpe_per_ws"))
          .orderBy(col("lang")),
      Some("""
        WITH t AS (
          SELECT lang, LEN(STRING_SPLIT(text, ' ')) AS n_ws,
            LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n_bpe
          FROM documents)
        SELECT lang, COUNT(*) AS n_docs,
          CAST(SUM(n_ws) AS BIGINT) AS ws_tokens,
          CAST(SUM(n_bpe) AS BIGINT) AS bpe_tokens,
          CAST(SUM(n_bpe) AS DOUBLE) / SUM(n_ws) AS bpe_per_ws
        FROM t
        GROUP BY lang
        ORDER BY lang""")),

    QueryDef(
      "text_quality_scores",
      (s, dir) =>
        Tables(s, dir, "documents")
          .withColumn("stop_ratio", stopwordRatio(col("text"), stops))
          .withColumn("chars_per_token",
            col("n_chars").cast("double") / tokenCount(col("text")).cast("double"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
               davg6(col("stop_ratio")).as("avg_stop_ratio"),
               davg6(col("chars_per_token")).as("avg_chars_per_token"))
          .orderBy(col("source")),
      Some("""
        WITH t AS (
          SELECT source, n_chars,
            CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
              x -> x IN ('the','a','of','and','to'))) AS DOUBLE)
              / LEN(STRING_SPLIT(text, ' ')) AS stop_ratio,
            CAST(n_chars AS DOUBLE) / LEN(STRING_SPLIT(text, ' ')) AS chars_per_token
          FROM documents)
        SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(CAST(stop_ratio AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_stop_ratio,
          CAST(SUM(CAST(chars_per_token AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_chars_per_token
        FROM t
        GROUP BY source
        ORDER BY source""")),

    QueryDef(
      "text_fingerprints",
      (s, dir) =>
        Tables(s, dir, "documents")
          .select(col("doc_id"), fingerprint(col("text")).as("fp"))
          .orderBy(col("doc_id")),
      Some("""
        SELECT doc_id, SUBSTRING(MD5(LOWER(TRIM(text))), 1, 16) AS fp
        FROM documents
        ORDER BY doc_id""")),

    QueryDef(
      "text_search_like",
      (s, dir) =>
        Tables(s, dir, "documents")
          .groupBy(col("lang"))
          .agg(count(when(col("text").like("%spark%"), 1)).as("n_spark"),
               count(when(col("text").rlike("join.*filter|filter.*join"), 1)).as("n_join_filter"),
               count(lit(1)).as("n_docs"))
          .orderBy(col("lang")),
      Some("""
        SELECT lang,
          COUNT(CASE WHEN text LIKE '%spark%' THEN 1 END) AS n_spark,
          COUNT(CASE WHEN REGEXP_MATCHES(text, 'join.*filter|filter.*join') THEN 1 END) AS n_join_filter,
          COUNT(*) AS n_docs
        FROM documents
        GROUP BY lang
        ORDER BY lang""")),

    // Exact token-set Jaccard pairs — the oracle-checkable dedup baseline.
    // Blocked to a deterministic sample (doc_id ≡ 0 mod 5): exact all-pairs
    // Jaccard is the MinHash oracle, not the scale path, so the query keeps
    // the pair space bounded at any scale factor (standard dedup blocking).
    QueryDef(
      "jaccard_token_pairs",
      (s, dir) =>
        Dedup.jaccardPairs(
            Tables(s, dir, "documents").filter(col("doc_id") % 5 === 0),
            "text", "doc_id", 0.62)
          .orderBy(col("id_a"), col("id_b")),
      Some("""
        WITH toks AS (
          SELECT doc_id AS id, UNNEST(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS tok
          FROM documents WHERE doc_id % 5 = 0),
        sizes AS (SELECT id, COUNT(*) AS n_tok FROM toks GROUP BY id),
        inter AS (
          SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
          FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id
          GROUP BY a.id, b.id)
        SELECT id_a, id_b,
          ROUND(CAST(n_inter AS DOUBLE) / (sa.n_tok + sb.n_tok - n_inter), 6) AS jaccard
        FROM inter
          JOIN sizes sa ON sa.id = id_a
          JOIN sizes sb ON sb.id = id_b
        WHERE CAST(n_inter AS DOUBLE) / (sa.n_tok + sb.n_tok - n_inter) >= 0.62
        ORDER BY id_a, id_b""")),

    // Near-dup clustering: connected components over the exact-jaccard
    // pair graph (the transitive-closure step between pair generation
    // and row dropping). Oracle = DuckDB recursive CTE label
    // propagation over the same pairs.
    QueryDef(
      "dedup_connected_components",
      (s, dir) => {
        val pairs = Dedup.jaccardPairs(
          Tables(s, dir, "documents").filter(col("doc_id") % 5 === 0),
          "text", "doc_id", 0.62)
        Dedup.connectedComponents(pairs)
          .select(col("id").as("doc_id"), col("label").as("canonical"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH RECURSIVE toks AS (
          SELECT doc_id AS id, UNNEST(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS tok
          FROM documents WHERE doc_id % 5 = 0),
        sizes AS (SELECT id, COUNT(*) AS n_tok FROM toks GROUP BY id),
        inter AS (
          SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
          FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id
          GROUP BY a.id, b.id),
        pairs AS (
          SELECT id_a, id_b
          FROM inter
            JOIN sizes sa ON sa.id = id_a
            JOIN sizes sb ON sb.id = id_b
          WHERE CAST(n_inter AS DOUBLE) / (sa.n_tok + sb.n_tok - n_inter) >= 0.62),
        edges AS (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
        nodes AS (SELECT DISTINCT a AS id FROM edges),
        cc AS (
          SELECT id AS node, id AS label FROM nodes
          UNION
          SELECT e.b AS node, cc.label FROM cc JOIN edges e ON cc.node = e.a)
        SELECT node AS doc_id, MIN(label) AS canonical
        FROM cc GROUP BY node ORDER BY doc_id""")),

    // MinHash+LSH near-dup candidates (seeded-xxhash signatures — not
    // SQL-expressible; golden-vector pinned counts below).
    QueryDef(
      "minhash_lsh_candidates",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        Dedup.minhashCandidates(docs, "text", "doc_id")
          .agg(count(lit(1)).as("n_candidate_pairs"),
               countDistinct(col("id_a")).as("n_docs_with_candidates"))
      },
      // GOLDEN VECTOR oracle: the seeded-xxhash signature has no SQL
      // counterpart, so the pair/doc counts are pinned from the seed-42
      // sf0.01 run. Candidate QUALITY is independently gated by
      // DedupSpec's recall assertion vs exact token Jaccard (the
      // SQL-checkable jaccard_token_pairs query covers the exact side);
      // this pin freezes the integration output so any signature or
      // banding regression hash-fails. sf0.01 ONLY.
      Some("""
        SELECT CAST(n_candidate_pairs AS BIGINT) AS n_candidate_pairs,
               CAST(n_docs_with_candidates AS BIGINT) AS n_docs_with_candidates
        FROM (VALUES (25, 24)) AS t(n_candidate_pairs, n_docs_with_candidates)""")),

    // SimHash band-collision candidates (golden-vector pinned counts).
    QueryDef(
      "simhash_candidates",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        Dedup.simhashCandidates(docs, "text", "doc_id")
          .agg(count(lit(1)).as("n_candidate_pairs"),
               countDistinct(col("id_a")).as("n_docs_with_candidates"))
      },
      // GOLDEN VECTOR oracle: pinned from the seed-42 sf0.01 run (the
      // 64-bit shingle-hash SimHash has no SQL counterpart); Hamming
      // proximity of emitted candidates is gated by DedupSpec. Freezes
      // the integration output against regression. sf0.01 ONLY.
      Some("""
        SELECT CAST(n_candidate_pairs AS BIGINT) AS n_candidate_pairs,
               CAST(n_docs_with_candidates AS BIGINT) AS n_docs_with_candidates
        FROM (VALUES (2343, 391)) AS t(n_candidate_pairs, n_docs_with_candidates)""")),

    // Heuristic language ID vs the labeled lang column. The stopword
    // argmax is plain SQL, so the oracle replays it: per-language
    // stopword-occurrence counts, highest score wins, ties to the
    // alphabetically-last language (Spark's greatest() over
    // (score, lang) structs), zero hits → 'und'.
    QueryDef(
      "langid_confusion",
      (s, dir) => {
        val profiles = Map(
          "en" -> Seq("the", "and", "of", "to", "a"),
          "de" -> Seq("der", "die", "das", "und", "ist"),
          "fr" -> Seq("le", "la", "et", "les", "des"),
          "es" -> Seq("el", "la", "de", "y", "que"),
          "zh" -> Seq("的", "是", "了", "在", "我"))
        Tables(s, dir, "documents")
          .withColumn("predicted", langId(col("text"), profiles))
          .groupBy(col("lang"), col("predicted"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("lang"), col("predicted"))
      },
      Some("""
        WITH s AS (SELECT lang,
            len(list_filter(str_split(text, ' '),
              t -> t IN ('the', 'and', 'of', 'to', 'a'))) AS s_en,
            len(list_filter(str_split(text, ' '),
              t -> t IN ('der', 'die', 'das', 'und', 'ist'))) AS s_de,
            len(list_filter(str_split(text, ' '),
              t -> t IN ('le', 'la', 'et', 'les', 'des'))) AS s_fr,
            len(list_filter(str_split(text, ' '),
              t -> t IN ('el', 'la', 'de', 'y', 'que'))) AS s_es,
            len(list_filter(str_split(text, ' '),
              t -> t IN ('的', '是', '了', '在', '我'))) AS s_zh
          FROM documents),
        p AS (SELECT lang,
            CASE WHEN GREATEST(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
                 WHEN s_zh = GREATEST(s_de, s_en, s_es, s_fr, s_zh) THEN 'zh'
                 WHEN s_fr = GREATEST(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
                 WHEN s_es = GREATEST(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
                 WHEN s_en = GREATEST(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
                 ELSE 'de' END AS predicted
          FROM s)
        SELECT lang, predicted, COUNT(*) AS n
        FROM p
        GROUP BY lang, predicted
        ORDER BY lang, predicted"""))
  )
}
