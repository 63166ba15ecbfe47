package graft
import graft.engine.GraftSession

/** Scale-slope audit (r7): times a curated set of the heaviest /
  * quadratic-risk operators at TWO scale factors (default sf0.01 and
  * sf0.1 — a 10× data ladder) and records the empirical slope
  * `t(large) / t(small)` per query, writing `SCALECHECK.json`.
  *
  * Purpose: the 100 TB scale claims are otherwise argued from plan
  * shapes (PlanShapeSpec pins partial aggs, broadcast sides, absence of
  * cartesians / single-partition exchanges). This artifact makes them
  * MEASURED: a blocked/bucketed operator should scale ~linearly in the
  * data (slope ≲ 10 on a 10× ladder — usually far below, because
  * fixed per-job scheduling and plan overhead dominates the small
  * point), while an accidentally quadratic stage shows up as a slope
  * well past the data growth. Anything past `FlagSlope` lands in the
  * `flagged` list and owes a writeup or a fix.
  *
  * Methodology (see the bench-noise notes in Bench.scala): run1 of a
  * query in a fresh JVM pays codegen/JIT warmup, so each (query, sf)
  * point is timed `Runs` times and scored as the MIN of runs 2.. —
  * steady state, resistant to co-tenant stalls. The small SF runs
  * first so its page cache is warm before the large point (both read
  * the same tables the driver bench reads). Evaluation is the same
  * noop sink Bench uses — full operator execution, no driver collect.
  *
  * Not part of the driver contract — a committed audit artifact.
  * Usage: `runMain graft.ScaleCheck [q_names...]` (default: the
  * curated set below); env `SPARK_GRAFT_SF_SMALL` / `SPARK_GRAFT_SF_LARGE`
  * override the ladder.
  */
object ScaleCheck {
  /** Heaviest bench entries + every quadratic-risk family member:
    * near-dup (band join blowup risk), dedup graph (iterative CC),
    * ANN/PQ (train loops + rerank joins), retrieval (posting joins),
    * fuzzy (block self-join), packing (window shapes), plus the
    * widest pure-relational shapes as linear controls. */
  val Curated: Seq[String] = Seq(
    // near-dup / dedup graph
    "q_dedup_minhash", "q_dedup_minhash_salted", "q_dedup_minhash_k32",
    "q_dedup_incremental", "q_ngram_jaccard", "q_ngram_jaccard_banded",
    "q_dedup_simhash", "q_dedup_embedding", "q_semantic_dedup",
    "q_dedup_clusters", "q_dedup_survivors", "q_dedup_substring",
    // ANN / retrieval
    "q_ann_ivfpq_rerank", "q_ann_ivf_trained", "q_sim_pairs_topk",
    "q_bm25_topk", "q_hybrid_rerank",
    // text / training loops
    "q_bpe_learn", "q_bpe_apply", "q_curation_pipeline", "q_fuzzy_match",
    "q_pack_global", "q_quality_classifier",
    // r7 additions: DSIR (feature explode + two-phase prefix scan),
    // cluster-balanced pruning (trained assignment + cell-quota rank)
    "q_dsir_weights", "q_dsir_sample", "q_cluster_prune",
    // r8 additions: index maintenance (delta merge vs standing index),
    // winnowing pair join (fp-keyed self-join under the freq cap),
    // CCNet terciles (histogram windows + broadcast-back), canonical
    // selection (the full cluster loop + argmax joins)
    "q_index_merge", "q_winnow_pairs", "q_ppl_buckets", "q_dedup_canonical",
    // r8 second wave: bloom membership prune (probe + confirm join),
    // char folds (per-row HOF over distinct chars), batch planner
    // (sharded windows), funnel chain (shrinking keyed joins), recall
    // audit (two retrieval stacks composed)
    "q_bloom_dedup", "q_char_diversity", "q_length_batches",
    "q_funnel", "q_ann_recall",
    // r8 third wave: containment (block self-join, length-agnostic
    // keys), the all-pairs dedup audit (declared quadratic tier, now
    // size-bound pruned), bitext mining (target × broadcast src slice),
    // pagerank (iterative keyed joins), band audit (signature pass,
    // nothing quadratic), PMI (vocab-keyed joins)
    "q_containment", "q_dedup_eval", "q_bitext_mine",
    "q_graph_pagerank", "q_lsh_band_stats", "q_pmi_collocations",
    "q_query_expansion", "q_rank_fusion", "q_ncm_eval", "q_anomaly_windows",
    "q_semantic_clusters", "q_dedup_eval_sweep",
    // r9 additions: the r8 suspect-flagged three-level LM join (pin its
    // steady slope), the gram-keyed novelty two-pass, the χ² divergence
    // vocab join, the Rényi diversity aggregate, the double-window
    // nearest as-of, the top-n log-log regression
    "q_lm_score_backoff", "q_ngram_novelty", "q_domain_divergence",
    "q_token_diversity", "q_asof_join_nearest", "q_zipf_fit",
    // r10: the sample-tier pair truth (declared-quadratic at 1/16 the
    // constant — carried for the record next to its full-fat twin)
    "q_sim_pairs_topk_sampled",
    // r10 second wave: the prefix-filtered exact join (the new exact
    // tier — its whole claim is candidate volume ~ true pairs), the
    // declared blocked-join fuzzy fallback, the entity-cluster CC loop,
    // the KN score join chain, the trained SemDeDup (bounded cells —
    // should ride the ladder flatter than its literal-codebook twin)
    "q_jaccard_prefix", "q_fuzzy_match2", "q_fuzzy_clusters",
    "q_lm_score_kn", "q_semantic_dedup_trained", "q_minhash_estimate",
    // r10 third wave: the twin-collapse triangle count, the distributed
    // prefix sum (linear control for the sweep line), the double-pass
    // phrase-boosted retrieval, the multi-probe ANN
    "q_graph_triangles", "q_interval_coverage", "q_bm25_proximity",
    "q_ann_multiprobe", "q_market_basket", "q_jaccard_prefix_incremental",
    // linear controls (wide scans, shuffles, windows)
    "q_agg_group", "q_window_rank", "q_topk_per_group", "q_join_bucketed",
    "q_profile", "q_zorder", "q_outlier_mad", "q_vocab_build")

  val Runs = 3
  /** 10× data; slopes beyond this on the ladder mean the operator did
    * MORE than proportionally more work — quadratic-risk territory. */
  val FlagSlope = 12.0

  /** Ground-truth audit tiers that are O(n²) BY DECLARATION (SURVEY
    * §2.2-I: run-on-sample discipline). Their fitted exponent ≈ 2 is the
    * declared design, not a finding — excluded from the superlinear
    * flag list, carried verbatim in the artifact for the record.
    * The `_sampled` twins belong here too: a FIXED-FRACTION carve keeps
    * the quadratic shape (at 1/16 the constant) — at production scale
    * the carve pct is chosen to bound the sample absolutely. */
  val DeclaredQuadratic: Set[String] =
    Set("q_sim_pairs_topk", "q_dedup_eval", "q_dedup_eval_sweep",
      "q_sim_pairs_topk_sampled")

  /** Exponent past this on the log-log fit = superlinear growth worth a
    * writeup (1.0 = linear; blocked/bucketed operators should sit below
    * ~1.2 once fixed overhead is amortized). */
  val FlagExponent = 1.5

  /** Last-rung slope flag (r9 verdict #4): the sf0.1→sf0.3 rung is 3×
    * data with fixed overhead already amortized, so a steady-state
    * operator should grow ≤ ~3×; past 2.5 WITH the first rung already
    * sublinear-looking is the soft-quadratic signature the old flat
    * `flag_slope: 12` could never see (r9's q_fuzzy_match measured a
    * 4.99× rung while passing every old flag). Exceptions must be
    * DECLARED, not tolerated: [[DeclaredQuadratic]] (audit tiers) plus
    * [[DeclaredXlExempt]] (fixture-shaped trends with a documented
    * production path). */
  val FlagSlopeXl = 2.5

  /** Per-entry declared exemptions from [[FlagSlopeXl]] beyond the
    * audit tiers — each with the reason the measured trend is the
    * fixture's, not the operator's:
    *  - `q_semantic_dedup`: the fixture binds the FIXED 8-cell literal
    *    codebook, so cell population grows with the corpus and the
    *    within-cell verify grows with its square. The production path
    *    (the trained-codebook overload, `q_semantic_dedup_trained` —
    *    measured rung 2.03× vs the literal twin's 3.19×) grows k with
    *    the corpus so cell population stays bounded — the operator is
    *    linear in (n · cell_size); only the 8-cell fixture pin is
    *    quadratic.
    *  - `q_fuzzy_match2`: the DECLARED general-maxDist fallback tier —
    *    a blocked self-join whose in-block verify is quadratic by
    *    contract (deletion neighborhoods explode combinatorially past
    *    d=1). The scale path IS `q_fuzzy_match`'s deletion-neighborhood
    *    strategy (measured rung 1.0–2.2×); at d≥2 a caller at scale
    *    composes a tighter key into blockCols, exactly as the operator
    *    scaladoc instructs.
    *  - `q_missing_links`: rung 2.70× for 3× data with fitted exponent
    *    0.79 — LINEAR growth whose last rung simply tracks the data
    *    ratio (the replica fixture triples the family count and the
    *    quotient wedge stage is linear in families once per-family
    *    density is fixed), not a quadratic signature; the flag fired
    *    because 2.5 < the rung's own data ratio 3, and the
    *    investigation is this note. */
  val DeclaredXlExempt: Set[String] =
    Set("q_semantic_dedup", "q_fuzzy_match2", "q_missing_links")

  def main(args: Array[String]): Unit = {
    val small = sys.env.getOrElse("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.01")
    val large = sys.env.getOrElse("SPARK_GRAFT_SF_LARGE", "/root/testdata/sf0.1")
    // third rung (r8 verdict #7): the 3× replica built by MakeScale —
    // two points cannot distinguish linear-with-overhead from
    // soft-quadratic; the fitted exponent needs curvature. Optional:
    // absent dir degrades to the 2-point ladder.
    val xl = sys.env.getOrElse("SPARK_GRAFT_SF_XL", "target/testdata/sf0.3")
    val haveXl = java.nio.file.Files.isDirectory(java.nio.file.Paths.get(xl))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val names = if (args.nonEmpty) args.toSeq else Curated
    val spark = GraftSession.local(cpus)

    def steady(name: String, sfDir: String): Double = {
      val fn = SparkEntry.queries(name)
      val ts = (1 to Runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val s = ts.drop(1).min
      System.err.println(f"SCALE $name $sfDir runs=${ts.map(t => f"$t%.2f").mkString(",")} steady=$s%.2f")
      s
    }

    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    /** Least-squares slope of log t over log relative-data-size. */
    def fitExponent(points: Seq[(Double, Double)]): Double = {
      val xs = points.map(p => math.log(p._1)); val ys = points.map(p => math.log(p._2))
      val xb = xs.sum / xs.size; val yb = ys.sum / ys.size
      val num = xs.zip(ys).map { case (x, y) => (x - xb) * (y - yb) }.sum
      val den = xs.map(x => (x - xb) * (x - xb)).sum
      num / den
    }

    // relative data sizes: sf0.01 = 1, sf0.1 = 10, sf0.3 = 30
    val rows = names.map { n =>
      val ts = steady(n, small)
      val tl = steady(n, large)
      val txl = if (haveXl) Some(steady(n, xl)) else None
      val pts = Seq((1.0, ts), (10.0, tl)) ++ txl.map(t => (30.0, t))
      (n, ts, tl, txl, tl / ts, fitExponent(pts))
    }
    // Named-query reruns MERGE into the existing artifact instead of
    // truncating it to the named set: a single entry caught inside a
    // co-tenant load window (r9: q_agg_group's sf0.3 point read 32 s in
    // a 183-run JVM vs 1.3 s steady in a fresh one) gets re-measured
    // without paying the full hour-scale ladder again.
    val priorBody: Map[String, String] =
      if (args.isEmpty) Map.empty
      else try {
        val p = java.nio.file.Paths.get("SCALECHECK.json")
        if (!java.nio.file.Files.exists(p)) Map.empty
        else {
          import org.json4s._
          org.json4s.jackson.JsonMethods.parse(new String(
            java.nio.file.Files.readAllBytes(p),
            java.nio.charset.StandardCharsets.UTF_8)) \ "queries" match {
            case JObject(fields) => fields.map { case (k, v) =>
              k -> org.json4s.jackson.JsonMethods.compact(v)
            }.toMap
            case _ => Map.empty
          }
        }
      } catch { case _: Throwable => Map.empty }
    val freshBody = rows.map { case (n, ts, tl, txl, sl, ex) =>
      val xlPart = txl.map(t => s""","t_xl":${fmt(t)},"slope_xl":${fmt(t / tl)}""").getOrElse("")
      n -> s"""{"t_small":${fmt(ts)},"t_large":${fmt(tl)}$xlPart,"slope":${fmt(sl)},"exponent":${fmt(ex)}}"""
    }.toMap
    val merged = priorBody ++ freshBody
    val body = merged.toSeq.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + v }
      .mkString(",")
    // flags recompute over the MERGED map (a rerun that clears a flag
    // must clear it in the artifact, and stale flags must not vanish
    // just because their query wasn't in the rerun set)
    def field(json: String, name: String): Option[Double] = {
      import org.json4s._
      org.json4s.jackson.JsonMethods.parse(json) \ name match {
        case JDouble(v) => Some(v)
        case JInt(v) => Some(v.toDouble)
        case JDecimal(v) => Some(v.toDouble)
        case _ => None
      }
    }
    val flagged = merged.toSeq.sortBy(_._1).collect {
      case (k, v) if field(v, "slope").exists(_ > FlagSlope) => k
    }
    val superlinear = merged.toSeq.sortBy(_._1).collect {
      case (k, v) if field(v, "exponent").exists(_ > FlagExponent) &&
        !DeclaredQuadratic(k) => k
    }
    val flaggedXl = merged.toSeq.sortBy(_._1).collect {
      case (k, v) if field(v, "slope_xl").exists(_ > FlagSlopeXl) &&
        !DeclaredQuadratic(k) && !DeclaredXlExempt(k) => k
    }
    val ladder = (Seq(small, large) ++ (if (haveXl) Seq(xl) else Nil))
      .map("\"" + _ + "\"").mkString(",")
    val json =
      s"""{"ladder":[$ladder],"data_sizes":[1,10${if (haveXl) ",30" else ""}],"runs":$Runs,""" +
      s""""score":"min of runs 2..$Runs (steady state)","flag_slope":$FlagSlope,""" +
      s""""flag_exponent":$FlagExponent,"flag_slope_xl":$FlagSlopeXl,""" +
      s""""declared_quadratic":[${DeclaredQuadratic.toSeq.sorted.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""declared_xl_exempt":[${DeclaredXlExempt.toSeq.sorted.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""flagged":[${flagged.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""superlinear":[${superlinear.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""flagged_xl":[${flaggedXl.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""queries":{$body}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("SCALECHECK.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    println(json)
  }
}
