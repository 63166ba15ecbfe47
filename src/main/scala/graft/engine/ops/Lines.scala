package graft.engine.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.io.Tables

/** C4 / RefinedWeb-style LINE-LEVEL curation (SURVEY.md §2.2-I, r11
  * verdict item 1): line segmentation, per-line quality filters with
  * per-rule accounting, corpus-wide exact line deduplication, and
  * document reflow from the surviving lines.
  *
  * The driver fixture's `documents.text` is single-line (space-separated
  * tokens, no newlines/punctuation), which structurally blocks line
  * operators — any green would be fake. So the family runs on a DERIVED
  * multi-line fixture [[mlLines]]: a deterministic, SQL-replayable
  * re-segmentation of each document into punctuated lines with injected
  * cross-document boilerplate (the exact dup/filter targets C4's line
  * rules exist for). The derivation is pure column arithmetic on
  * (doc_id, text), so the DuckDB oracle replays it verbatim as a CTE and
  * every query in the family is hash-oracled end-to-end.
  *
  * Derivation (per document; all arithmetic exact in BIGINT):
  *  - tokens = split(text) dropping empties; W = 4 + doc_id % 5 words
  *    per line; line j (1-based) takes tokens [(j-1)W+1 .. jW] — the
  *    final line keeps the short remainder (a natural `too_few_words`
  *    target);
  *  - boilerplate override: (doc_id + 3j) % 13 = 0 → "all rights
  *    reserved."; = 1 → "click here to subscribe to our newsletter"
  *    (deliberately unterminated — a double violation). Identical
  *    strings across thousands of docs = the cross-doc exact-dup shape;
  *  - terminal punctuation: (doc_id + j) % 5 → 0..2 '.', 3 '!', 4 none
  *    (the `no_terminal_punct` target).
  *
  * Scale (100 TB): segmentation is a narrow generator (split + sequence +
  * explode — no shuffle); the only wide ops in the family are
  * groupBy(line) for corpus-wide dedup and groupBy(doc_id) for reflow,
  * both plain hash aggregates on explicit keys. At cluster scale the
  * dedup key would be a 128-bit line digest rather than the line string
  * (same plan shape, ~10× less shuffle payload — C4 dedups span hashes
  * for the same reason); the fixture keys on the string so the oracle
  * compares exact survivors. Reflow's collect_list is per-document
  * (bounded by doc length), never per-corpus.
  */
object Lines {
  private type Q = (SparkSession, String) => DataFrame

  private def words(c: Column): Column =
    filter(split(c, " "), t => length(t) > 0)

  /** The derived multi-line fixture: one row per (doc_id, line_no, line). */
  def mlLines(documents: DataFrame, idCol: String, textCol: String): DataFrame = {
    val seg = documents
      .select(col(idCol).cast("long").as("doc_id"), words(col(textCol)).as("tk"))
      .withColumn("w", (lit(4) + pmod(col("doc_id"), lit(5L))).cast("int"))
      .filter(size(col("tk")) > 0)
      .withColumn("line_no",
        explode(sequence(lit(1),
          ceil(size(col("tk")).cast("double") / col("w")).cast("int"))))
    val j = col("line_no").cast("long")
    val b = pmod(col("doc_id") + lit(3L) * j, lit(13L))
    val p = pmod(col("doc_id") + j, lit(5L))
    val base = concat_ws(" ",
      slice(col("tk"), (col("line_no") - 1) * col("w") + 1, col("w")))
    val punct = when(p <= 2, lit(".")).when(p === 3, lit("!")).otherwise(lit(""))
    seg.select(col("doc_id"), j.as("line_no"),
      when(b === 0, lit("all rights reserved."))
        .when(b === 1, lit("click here to subscribe to our newsletter"))
        .otherwise(concat(base, punct)).as("line"))
  }

  // The three C4-style line rules (RefinedWeb §Line-wise filtering):
  // each is an independent Column predicate so q_line_filters can
  // account per-rule while q_doc_reflow drops on their disjunction.
  private def ruleNoPunct(line: Column): Column =
    !(line.endsWith(".") || line.endsWith("!") || line.endsWith("?"))
  private def ruleShort(line: Column): Column =
    size(words(line)) < 3
  private def ruleBoiler(line: Column): Column =
    line.contains("subscribe") || line.contains("rights reserved")

  /** The rule conjunction every keep-decision uses — the ONE
    * implementation shared by [[docReflow]] and the streaming
    * reflow-at-ingest face, so the batch and stream can never filter
    * by different rules. */
  def passesAllRules(line: Column): Column =
    !ruleNoPunct(line) && !ruleShort(line) && !ruleBoiler(line)

  /** Corpus-wide exact line dedup accounting: per document, how many of
    * its lines survive when each distinct line keeps only its FIRST
    * occurrence (ordered by doc_id, line_no — the deterministic survivor
    * rule every dedup operator in this repo uses). groupBy(line) +
    * min(struct) is the scale shape: one hash aggregate on the line key,
    * no window over the full corpus. */
  def lineDedup(lines: DataFrame): DataFrame = {
    val kept = lines
      .groupBy("line")
      .agg(min(struct(col("doc_id"), col("line_no"))).as("s"))
      .select(col("s.doc_id").as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_kept"))
    lines.groupBy("doc_id").agg(count(lit(1)).as("n_lines"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy("doc_id")
  }

  /** Per-rule drop accounting (the q_gopher_rules discipline at line
    * granularity): for each rule, how many lines it flags and how many
    * documents it touches, plus the `any_rule` disjunction row. One
    * global aggregate over the flagged projection — the count-distincts
    * are per-rule doc sets, expanded map-side. */
  def lineFilters(lines: DataFrame): DataFrame = {
    val l = col("line")
    val f = lines.select(col("doc_id"),
      ruleNoPunct(l).as("r1"), ruleShort(l).as("r2"), ruleBoiler(l).as("r3"))
      .withColumn("r0", col("r1") || col("r2") || col("r3"))
    f.agg(
        sum(when(col("r0"), 1L).otherwise(0L)).as("d0"),
        countDistinct(when(col("r0"), col("doc_id"))).as("n0"),
        sum(when(col("r1"), 1L).otherwise(0L)).as("d1"),
        countDistinct(when(col("r1"), col("doc_id"))).as("n1"),
        sum(when(col("r2"), 1L).otherwise(0L)).as("d2"),
        countDistinct(when(col("r2"), col("doc_id"))).as("n2"),
        sum(when(col("r3"), 1L).otherwise(0L)).as("d3"),
        countDistinct(when(col("r3"), col("doc_id"))).as("n3"))
      .select(expr(
        """stack(4,
          |  'any_rule',         d0, n0,
          |  'boilerplate',      d3, n3,
          |  'no_terminal_punct', d1, n1,
          |  'too_few_words',    d2, n2) as (rule, n_dropped, n_docs)""".stripMargin))
      .orderBy("rule")
  }

  /** Reflow: apply all three line filters, then corpus-wide exact line
    * dedup over the survivors, then reassemble each document from its
    * surviving lines in original order ('\n'-joined). Documents with no
    * surviving line drop out — the C4 output contract. The per-doc
    * collect_list is bounded by document length; ordering is pinned by
    * array_sort over (line_no, line) structs, not by shuffle luck. */
  def docReflow(lines: DataFrame): DataFrame = {
    val kept = lines.filter(passesAllRules(col("line")))
    val surv = kept
      .groupBy("line")
      .agg(min(struct(col("doc_id"), col("line_no"))).as("s"))
      .select(col("s.doc_id").as("doc_id"), col("s.line_no").as("line_no"),
        col("line"))
    surv.groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("line_no"), col("line")))),
            x => x.getField("line")), "\n").as("text"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .orderBy("doc_id")
  }

  /** FREQUENCY-based boilerplate detection (the CCNet/RefinedWeb move
    * the static blocklist can't make: boilerplate is whatever repeats
    * across unrelated documents, discovered from the corpus itself):
    * every line occurring in ≥ `minDocs` DISTINCT documents, with its
    * document reach and total occurrence count — the versioned
    * blocklist artifact a curation pipeline persists and serves to
    * [[lineFilters]]-style drops downstream. One hash aggregate on the
    * line key; at 100 TB the output is boilerplate-vocabulary-sized
    * (Zipf head), candidate for broadcast at apply time. */
  def lineFreqBoilerplate(lines: DataFrame, minDocs: Int): DataFrame =
    lines.groupBy("line")
      .agg(countDistinct("doc_id").as("n_docs"), count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= minDocs)
      .orderBy("line")

  /** The C4 DOCUMENT-level gate over line statistics: a page whose
    * lines are mostly unterminated or mostly fragments is dropped
    * whole, regardless of any single line's quality. Per doc:
    * line count, terminated-line count, the floored basis-point
    * termination ratio, short-line count, and the keep verdict
    * (≥ 60% terminated AND ≥ 2 lines) — every intermediate exact in
    * BIGINT so the verdict hash-oracles. One narrow flag projection +
    * one doc-keyed hash aggregate. */
  def docLineQuality(lines: DataFrame): DataFrame = {
    val l = col("line")
    lines.select(col("doc_id"),
        (!ruleNoPunct(l)).cast("long").as("term"),
        ruleShort(l).cast("long").as("short"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"), sum("term").as("n_terminated"),
        sum("short").as("n_short"))
      .withColumn("term_bp",
        floor(lit(10000L) * col("n_terminated") / col("n_lines")).cast("long"))
      .withColumn("keep", col("term_bp") >= 6000 && col("n_lines") >= 2)
      .orderBy("doc_id")
  }

  /** The RefinedWeb-order HEAD stage for the composed corpus build
    * ([[TextPipeline.curationPipeline]]): line-level curation BEFORE
    * any document-level gate — segment ([[mlLines]]), line filters +
    * corpus-wide exact line dedup + reassembly ([[docReflow]], reused
    * verbatim per the one-implementation rule), then re-attach the
    * document dims the manifest groups by. Real C4/RefinedWeb runs in
    * exactly this order (line filters/dedup → Gopher rules → LM floor →
    * decontaminate → near-dup → split); feeding THIS frame to
    * `curationPipeline` gives that order without the operator changing.
    * Docs whose every line drops never reach the doc gates (the C4
    * contract). One dims join on the doc_id partitioning reflow
    * already produced. */
  def lineCuratedCorpus(documents: DataFrame, idCol: String, textCol: String,
                        dims: Seq[String]): DataFrame =
    docReflow(mlLines(documents, idCol, textCol))
      .select(col("doc_id"), col("text"))
      .join(documents.select(col(idCol).cast("long").as("doc_id") +: dims.map(col): _*),
        Seq("doc_id"))

  /** Incremental line dedup — the batch twin of the streaming line
    * registry (`s_stream_line_dedup`) and the line-granular sibling of
    * `q_dedup_incremental`: the job a daily crawl actually runs. Delta
    * lines survive iff FIRST within the delta (min (doc_id, line_no))
    * AND absent from the STANDING registry; per delta doc, the
    * accounting (n_lines, n_kept). Cost ∝ delta lines + one anti-join
    * against the registry (line-keyed, registry side distinct-line-
    * sized) — the standing corpus never re-segments. */
  def lineDedupIncremental(standing: DataFrame, delta: DataFrame): DataFrame = {
    val firstInDelta = delta.groupBy("line")
      .agg(min(struct(col("doc_id"), col("line_no"))).as("s"))
      .select(col("s.doc_id").as("doc_id"), col("line"))
    val kept = firstInDelta
      .join(standing.select(col("line")).distinct(), Seq("line"), "left_anti")
      .groupBy("doc_id").agg(count(lit(1)).as("n_kept"))
    delta.groupBy("doc_id").agg(count(lit(1)).as("n_lines"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy("doc_id")
  }

  private def ml(s: SparkSession, d: String): DataFrame =
    mlLines(Tables.documents(s, d), "doc_id", "text")

  val queries: Map[String, Q] = Map(
    "q_line_dedup" -> ((s, d) => lineDedup(ml(s, d))),
    "q_line_filters" -> ((s, d) => lineFilters(ml(s, d))),
    "q_doc_reflow" -> ((s, d) => docReflow(ml(s, d))),
    "q_line_freq_boilerplate" -> ((s, d) => lineFreqBoilerplate(ml(s, d), minDocs = 3)),
    "q_doc_line_quality" -> ((s, d) => docLineQuality(ml(s, d))),
    // the standing/delta boundary is the same keyBucket 90/10 hash
    // carve as q_cc_incremental — a fixed 10% delta at every scale
    "q_line_dedup_incremental" -> ((s, d) => {
      val lines = ml(s, d)
      val old = TextPipeline.keyBucket(col("doc_id")) < 90
      lineDedupIncremental(lines.filter(old), lines.filter(!old))
    }))

  /** Shared CTE prefix replaying [[mlLines]] in DuckDB: same token
    * filter, same W/boilerplate/punctuation arithmetic (doc_id ≥ 0 so
    * `%` ≡ pmod), list slice `tk[a:b]` is 1-based inclusive clamped —
    * exactly Spark's slice(tk, a, w). */
  private val mlCteTail: String =
    """
      |ml AS (
      |  SELECT doc_id, j AS line_no,
      |    CASE WHEN (doc_id + 3*j) % 13 = 0 THEN 'all rights reserved.'
      |         WHEN (doc_id + 3*j) % 13 = 1 THEN 'click here to subscribe to our newsletter'
      |         ELSE array_to_string(tk[((j-1)*w + 1):(j*w)], ' ') ||
      |              CASE WHEN (doc_id + j) % 5 <= 2 THEN '.'
      |                   WHEN (doc_id + j) % 5 = 3 THEN '!' ELSE '' END
      |    END AS line
      |  FROM (SELECT doc_id, tk, w,
      |               unnest(range(1, CAST(ceil(len(tk) / w) AS BIGINT) + 1)) AS j
      |        FROM mld WHERE len(tk) > 0))""".stripMargin

  private def mlCteBodyWhere(pred: String): String =
    s"""mld AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), t -> len(t) > 0) AS tk,
      |         4 + (doc_id % 5) AS w
      |  FROM documents${if (pred.isEmpty) "" else s" WHERE $pred"}),""".stripMargin +
    mlCteTail
  private val mlCteBody: String = mlCteBodyWhere("")

  private val mlCte: String = "WITH " + mlCteBody

  private val sqlRules: String =
    """(line LIKE '%.' OR line LIKE '%!' OR line LIKE '%?') AS ok_punct,
      |len(list_filter(string_split(line, ' '), t -> len(t) > 0)) >= 3 AS ok_words,
      |NOT (line LIKE '%subscribe%' OR line LIKE '%rights reserved%') AS ok_boiler""".stripMargin

  /** CTE BODY (no WITH prefix) replaying [[lineCuratedCorpus]]: the
    * mlLines derivation, the three line rules, corpus-wide first-
    * occurrence line dedup, and reassembly — ending in
    * `refl_docs(doc_id, text, lang)`. Composed oracles (the
    * q_curation_pipeline chain) prepend this and read their corpus
    * FROM refl_docs instead of documents. The reflow arithmetic is
    * byte-identical to the q_doc_reflow oracle (same rules, same
    * survivor rule, same chr(10) ORDER BY line_no reassembly).
    * `pred` slices the DOCUMENTS feeding the whole derivation (r15:
    * the curation pipeline line-curates only the corpus slice, so
    * held-out eval docs can't win first-occurrence survivorship in
    * the corpus line-dedup registry). */
  def reflowDocsCtesBody(pred: String = ""): String =
    s"""${mlCteBodyWhere(pred)},
      |rfl AS (SELECT doc_id, line_no, line, $sqlRules FROM ml),
      |rkept AS (SELECT doc_id, line_no, line FROM rfl
      |          WHERE ok_punct AND ok_words AND ok_boiler),
      |rsurv AS (
      |  SELECT doc_id, line_no, line FROM (
      |    SELECT doc_id, line_no, line,
      |           row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn
      |    FROM rkept) WHERE rn = 1),
      |refl0 AS (
      |  SELECT doc_id, string_agg(line, chr(10) ORDER BY line_no) AS text
      |  FROM rsurv GROUP BY doc_id),
      |refl_docs AS (
      |  SELECT r.doc_id, r.text, d.lang
      |  FROM refl0 r JOIN documents d USING (doc_id))""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_line_dedup" -> s"""$mlCte,
      |surv AS (
      |  SELECT doc_id FROM (
      |    SELECT doc_id, row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn
      |    FROM ml) WHERE rn = 1),
      |k AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept FROM surv GROUP BY doc_id)
      |SELECT t.doc_id, CAST(t.n_lines AS BIGINT) AS n_lines,
      |       coalesce(k.n_kept, 0) AS n_kept
      |FROM (SELECT doc_id, count(*) AS n_lines FROM ml GROUP BY doc_id) t
      |LEFT JOIN k USING (doc_id)
      |ORDER BY doc_id""".stripMargin,

    "q_line_filters" -> s"""$mlCte,
      |fl AS (SELECT doc_id, $sqlRules FROM ml)
      |SELECT * FROM (
      |  SELECT 'any_rule' AS rule,
      |    CAST(count(*) FILTER (WHERE NOT (ok_punct AND ok_words AND ok_boiler)) AS BIGINT) AS n_dropped,
      |    CAST(count(DISTINCT doc_id) FILTER (WHERE NOT (ok_punct AND ok_words AND ok_boiler)) AS BIGINT) AS n_docs
      |  FROM fl
      |  UNION ALL
      |  SELECT 'boilerplate',
      |    CAST(count(*) FILTER (WHERE NOT ok_boiler) AS BIGINT),
      |    CAST(count(DISTINCT doc_id) FILTER (WHERE NOT ok_boiler) AS BIGINT) FROM fl
      |  UNION ALL
      |  SELECT 'no_terminal_punct',
      |    CAST(count(*) FILTER (WHERE NOT ok_punct) AS BIGINT),
      |    CAST(count(DISTINCT doc_id) FILTER (WHERE NOT ok_punct) AS BIGINT) FROM fl
      |  UNION ALL
      |  SELECT 'too_few_words',
      |    CAST(count(*) FILTER (WHERE NOT ok_words) AS BIGINT),
      |    CAST(count(DISTINCT doc_id) FILTER (WHERE NOT ok_words) AS BIGINT) FROM fl)
      |ORDER BY rule""".stripMargin,

    "q_line_freq_boilerplate" -> s"""$mlCte
      |SELECT line, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |       CAST(count(*) AS BIGINT) AS n_occ
      |FROM ml GROUP BY line
      |HAVING count(DISTINCT doc_id) >= 3
      |ORDER BY line""".stripMargin,

    "q_doc_line_quality" -> s"""$mlCte
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(count(*) FILTER (WHERE line LIKE '%.' OR line LIKE '%!' OR line LIKE '%?') AS BIGINT) AS n_terminated,
      |  CAST(count(*) FILTER (WHERE len(list_filter(string_split(line, ' '), t -> len(t) > 0)) < 3) AS BIGINT) AS n_short,
      |  CAST(floor(10000 * count(*) FILTER (WHERE line LIKE '%.' OR line LIKE '%!' OR line LIKE '%?') / count(*)) AS BIGINT) AS term_bp,
      |  (floor(10000 * count(*) FILTER (WHERE line LIKE '%.' OR line LIKE '%!' OR line LIKE '%?') / count(*)) >= 6000
      |   AND count(*) >= 2) AS keep
      |FROM ml GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_line_dedup_incremental" -> s"""$mlCte,
      |delta AS (SELECT * FROM ml WHERE ${TextPipeline.keyBucketSql("doc_id")} >= 90),
      |standing AS (SELECT DISTINCT line FROM ml WHERE ${TextPipeline.keyBucketSql("doc_id")} < 90),
      |firstd AS (
      |  SELECT doc_id, line FROM (
      |    SELECT doc_id, line,
      |           row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn
      |    FROM delta) WHERE rn = 1),
      |kept AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept
      |  FROM firstd ANTI JOIN standing USING (line)
      |  GROUP BY doc_id)
      |SELECT t.doc_id, CAST(t.n_lines AS BIGINT) AS n_lines,
      |       coalesce(k.n_kept, 0) AS n_kept
      |FROM (SELECT doc_id, count(*) AS n_lines FROM delta GROUP BY doc_id) t
      |LEFT JOIN kept k USING (doc_id)
      |ORDER BY doc_id""".stripMargin,

    "q_doc_reflow" -> s"""$mlCte,
      |fl AS (SELECT doc_id, line_no, line, $sqlRules FROM ml),
      |kept AS (SELECT doc_id, line_no, line FROM fl
      |         WHERE ok_punct AND ok_words AND ok_boiler),
      |surv AS (
      |  SELECT doc_id, line_no, line FROM (
      |    SELECT doc_id, line_no, line,
      |           row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn
      |    FROM kept) WHERE rn = 1)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines_kept,
      |       string_agg(line, chr(10) ORDER BY line_no) AS text,
      |       CAST(len(string_agg(line, chr(10) ORDER BY line_no)) AS BIGINT) AS n_chars
      |FROM surv GROUP BY doc_id ORDER BY doc_id""".stripMargin)
}
