package graft.engine.ops

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** Pins the C4-style line-curation family (SURVEY §2.2-I, r11 verdict
  * item 1): the derived multi-line fixture must actually contain the
  * structures the rules target (cross-doc duplicate lines, unterminated
  * lines, short lines, boilerplate), every rule must fire non-trivially,
  * and reflow output must be clean under the rules it claims to apply —
  * the "filters demonstrably fire" requirement, so a no-op green is
  * impossible. */
class LinesSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = graft.engine.io.Tables.documents(spark, sfDir)
  private lazy val ml = Lines.mlLines(docs, "doc_id", "text").cache()

  test("mlLines: segmentation is exact — ceil(n/W) lines per doc, tokens preserved in order on non-boiler lines") {
    val expected = docs
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), t => length(t) > 0)).as("n"))
      .withColumn("w", lit(4) + pmod(col("doc_id"), lit(5L)))
      .select(col("doc_id"), ceil(col("n").cast("double") / col("w")).cast("long").as("n_lines"))
    val got = ml.groupBy("doc_id").agg(count(lit(1)).as("n_lines"))
    assert(expected.join(got, Seq("doc_id"))
      .filter(expected("n_lines") =!= got("n_lines")).count() === 0)

    // non-boiler lines re-concatenated must reproduce the original
    // token stream (minus the injected overrides): check one doc fully
    val d0 = docs.filter(col("doc_id") === 1L).select("text").head().getString(0)
    val toks = d0.split(" ").filter(_.nonEmpty)
    val w = (4 + 1 % 5).toInt
    val lines = ml.filter(col("doc_id") === 1L).orderBy("line_no")
      .select("line_no", "line").as[(Long, String)].collect()
    lines.foreach { case (j, line) =>
      val b = (1 + 3 * j) % 13
      if (b != 0 && b != 1) {
        val base = toks.slice(((j - 1) * w).toInt, (j * w).toInt).mkString(" ")
        assert(line.stripSuffix(".").stripSuffix("!") === base,
          s"line $j of doc 1 mismatch: $line vs $base")
      }
    }
  }

  test("fixture has the dup/filter targets: cross-doc duplicate lines, unterminated, short, boilerplate all present") {
    val boiler = ml.filter(col("line") === "all rights reserved.").count()
    val boiler2 = ml.filter(col("line") === "click here to subscribe to our newsletter").count()
    assert(boiler > 10 && boiler2 > 10, s"boilerplate must appear across many docs ($boiler/$boiler2)")
    val unterminated = ml.filter(!(col("line").endsWith(".") || col("line").endsWith("!") || col("line").endsWith("?"))).count()
    assert(unterminated > 10)
    val short = ml.filter(size(filter(split(col("line"), " "), t => length(t) > 0)) < 3).count()
    assert(short > 0)
    // cross-doc exact dup lines beyond boilerplate (duplicated fixture texts)
    val dupLines = ml.groupBy("line")
      .agg(countDistinct("doc_id").as("nd")).filter(col("nd") > 1).count()
    assert(dupLines > 2, s"need cross-doc duplicate lines, got $dupLines")
  }

  test("q_line_dedup: accounting sums to the corpus distinct-line count; duplicates genuinely removed") {
    val dd = SparkEntry.queries("q_line_dedup")(spark, sfDir).cache()
    val totLines = dd.agg(sum("n_lines")).head().getLong(0)
    val totKept = dd.agg(sum("n_kept")).head().getLong(0)
    val distinctLines = ml.select("line").distinct().count()
    assert(totKept === distinctLines, "survivors must equal distinct lines")
    assert(totKept < totLines, "dedup must remove a non-trivial number of lines")
    assert(totLines === ml.count())
  }

  test("q_line_filters: every rule fires; any_rule bounded by the rule sum and at least the max rule") {
    val byRule = SparkEntry.queries("q_line_filters")(spark, sfDir)
      .select("rule", "n_dropped").as[(String, Long)].collect().toMap
    Seq("any_rule", "boilerplate", "no_terminal_punct", "too_few_words").foreach { r =>
      assert(byRule(r) > 0, s"rule $r never fired — fixture is not exercising it")
    }
    val partSum = byRule("boilerplate") + byRule("no_terminal_punct") + byRule("too_few_words")
    assert(byRule("any_rule") <= partSum)
    assert(byRule("any_rule") >= Seq("boilerplate", "no_terminal_punct", "too_few_words").map(byRule).max)
    // the unterminated-boilerplate line violates two rules at once →
    // strict inclusion-exclusion overlap, pinning per-rule independence
    assert(byRule("any_rule") < partSum)
  }

  test("q_line_freq_boilerplate: discovers the injected boilerplate from frequency alone and ranks it at the head") {
    val got = SparkEntry.queries("q_line_freq_boilerplate")(spark, sfDir)
      .as[(String, Long, Long)].collect()
    val byLine = got.map(r => r._1 -> r._2).toMap
    // the two injected strings must be discovered — by REACH, with no
    // blocklist knowledge — and dominate every organic duplicate line
    assert(byLine.contains("all rights reserved."))
    assert(byLine.contains("click here to subscribe to our newsletter"))
    val injected = Set("all rights reserved.", "click here to subscribe to our newsletter")
    val organicMax = got.filterNot(r => injected(r._1)).map(_._2).maxOption.getOrElse(0L)
    assert(injected.forall(byLine(_) > organicMax * 10),
      "injected boilerplate must dominate organic duplicate lines by an order of magnitude")
    // threshold genuinely filters: some organic lines qualify, most don't
    assert(got.length > 2, "organic cross-doc duplicates must also qualify at the threshold")
    val all2 = ml.groupBy("line").agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") >= 2).count()
    assert(got.length < all2, "the minDocs threshold must drop the 2-doc tail")
    // n_occ >= n_docs always (a line can repeat within a doc)
    assert(got.forall(r => r._3 >= r._2))
  }

  test("q_doc_line_quality: the doc-level gate fires both ways and its ratio is exact") {
    val rows = SparkEntry.queries("q_doc_line_quality")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    assert(rows.length === docs.count())
    val (kept, dropped) = rows.partition(_._6)
    assert(kept.nonEmpty && dropped.nonEmpty,
      "the 60%-terminated gate must fire in both directions on the fixture")
    rows.foreach { case (id, nLines, nTerm, nShort, termBp, keep) =>
      assert(termBp === 10000L * nTerm / nLines, s"doc $id ratio must be exact floor bp")
      assert(keep === (termBp >= 6000L && nLines >= 2L), s"doc $id verdict must follow the rule")
      assert(nTerm <= nLines && nShort <= nLines)
    }
    // reconcile one doc's counts against the derived lines directly
    val id0 = rows.head._1
    val manual = ml.filter(col("doc_id") === id0)
      .select(col("line")).as[String].collect()
    assert(rows.head._2 === manual.length)
    assert(rows.head._3 === manual.count(l => l.endsWith(".") || l.endsWith("!") || l.endsWith("?")))
  }

  test("q_line_dedup_incremental: delta-only accounting — standing lines strip, fresh lines survive, boilerplate never re-enters") {
    val got = SparkEntry.queries("q_line_dedup_incremental")(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    val old = ml.filter(graft.engine.ops.TextPipeline.keyBucket(col("doc_id")) < 90)
    val delta = ml.filter(graft.engine.ops.TextPipeline.keyBucket(col("doc_id")) >= 90)
    // one row per delta doc, none for standing docs
    val deltaDocs = delta.select("doc_id").distinct().as[Long].collect().toSet
    assert(got.map(_._1).toSet === deltaDocs)
    // the injected boilerplate exists on BOTH sides of the carve, so
    // every delta occurrence must strip (the operator's whole point)
    val standingLines = old.select("line").distinct().as[String].collect().toSet
    assert(standingLines.contains("all rights reserved."))
    val stripped = got.map(r => r._2 - r._3).sum
    assert(stripped > 0, "standing lines must strip from the delta")
    assert(got.map(_._3).sum > 0, "fresh delta lines must survive")
    // reconcile against a direct recomputation
    val manual = delta.as[(Long, Long, String)].collect()
      .groupBy(_._3).map { case (_, occ) => occ.minBy(o => (o._1, o._2)) }
      .filterNot(o => standingLines.contains(o._3))
      .groupBy(_._1).map { case (id, xs) => id -> xs.size.toLong }
    got.foreach { case (id, _, nKept) =>
      assert(nKept === manual.getOrElse(id, 0L), s"doc $id survivor count")
    }
  }

  test("q_doc_reflow: output is clean (every line passes all rules, no duplicate line corpus-wide) and loses only dropped docs") {
    val rf = SparkEntry.queries("q_doc_reflow")(spark, sfDir).cache()
    val outLines = rf.select(col("doc_id"), explode(split(col("text"), "\n")).as("line"))
    assert(outLines.filter(
      !(col("line").endsWith(".") || col("line").endsWith("!") || col("line").endsWith("?")) ||
      size(filter(split(col("line"), " "), t => length(t) > 0)) < 3 ||
      col("line").contains("subscribe") || col("line").contains("rights reserved")).count() === 0,
      "reflowed text must contain only rule-passing lines")
    assert(outLines.groupBy("line").count().filter(col("count") > 1).count() === 0,
      "reflowed corpus must be exactly line-deduped")
    assert(rf.count() <= docs.count())
    assert(rf.count() > 0)
    // n_chars is the reflowed length, not the original
    assert(rf.filter(length(col("text")) =!= col("n_chars")).count() === 0)
    // line counts match the reassembled text
    assert(rf.filter(size(split(col("text"), "\n")) =!= col("n_lines_kept")).count() === 0)
  }
}
