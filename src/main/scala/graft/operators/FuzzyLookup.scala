package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{FloatType, IntegerType}
import graft.functions.TextKernels

/** Fuzzy full-text lookup join — the Spark-native replacement for the
  * reference's Lucene-backed `luceneLookup`
  * (/root/reference/mllib/src/main/scala/index/implicits.scala:15-392).
  *
  * Semantics preserved (see FIXTURES.md §1): for every left row, the single
  * best-scoring right row by approximate text match of `query` against
  * `text`; LEFT OUTER (no match ⇒ right columns null-padded); output =
  * left columns ++ right columns ++ `_score_: float, _tags_: array<string>,
  * _startIndex_: int, _endIndex_: int` (char span of the matched region of
  * the query).
  *
  * Architecture — a pure DataFrame program, no per-executor sidecar index:
  *
  *  1. tokenize both sides (accent-fold + lowercase, offsets kept);
  *  2. candidate generation = inverted-index equi-join on token; fuzzy
  *     candidates (maxLevDistance > 0) via SymSpell deletion-variant join,
  *     verified with bounded Levenshtein;
  *  3. TF-IDF-style scoring with Lucene-like doc-length normalization
  *     (`/sqrt(docLen)`) — this is what makes "IL" prefer the 2-token
  *     "Illinois, IL" over the 4-token "Des Plaines, US, IL";
  *  4. strategy "ngram": matches must cluster within a query-token window
  *     (gap <= nNgrams) and the best cluster wins — proximity scoring that
  *     finds the best matching *subspan* of a long query (reference
  *     NgramStrategy, index/NgramStrategy.scala:21-292);
  *  5. top-K per left row via window row_number (deterministic tie-break on
  *     right row id), then join back to the full rows.
  *
  * Scale properties (the reason this is NOT a Lucene port): every stage is a
  * shuffle-native relational op — tokenize/explode, hash joins on token,
  * partial+final aggregation, one window per left row id. No driver-side
  * state, no node-local index files, no collect. Candidate explosion on
  * frequent tokens is bounded by `maxDfRatio` (tokens present in more than
  * that fraction of right docs are treated as stopwords — the analogue of
  * the reference's stop-word list + minTokenLikehood drop), so worst-case
  * candidate volume is O(|left tokens| * maxDfRatio * |right|) and the plan
  * survives a 100x scale-up by adding partitions, not memory.
  */
object FuzzyLookup {

  /** Projected-candidate bound for the in-plan explosion guard (round 18 —
    * the r16 sf1 soak measured the maxDfRatio=1.0 / small-vocab shape
    * scaling as left×right by construction; round 17 added the observe
    * metric, this makes the failure a named raise instead of a hang a
    * caller must notice in a metrics stream). Same order as the ANN
    * exact-lane bound ([[Similarity.BruteForcePairBound]]): 2^27 candidate
    * rows is far above every gated query and healthy gazetteer lookup, and
    * far below where the candidate equi-join becomes an effective hang. */
  val CandidatePairBound: Long = 1L << 27

  /** Sizing companion for the candidate guard (the [[Similarity.autoBits]]
    * / `autoK` convention): the largest `maxDfRatio` that keeps the
    * projected exact-candidate volume under `pairBound` even in the
    * adversarial case where EVERY left token hits a maximal-df right
    * token — Σ_t leftDf·rightDf <= leftTokens · (ratio · rightRows), so
    * ratio = pairBound / (leftTokens · rightRows). Clamped to
    * [1/rightRows, 1]: below 1/rightRows every token is pruned (df >= 1
    * by construction) and the lookup matches nothing.
    *
    * @param rightRows  right-side (catalog) row count
    * @param leftTokens total post-stopword token count over the DISTINCT
    *                   left queries (the memoized unit the pipeline pays
    *                   for) */
  def autoDfRatio(rightRows: Long, leftTokens: Long,
                  pairBound: Long = CandidatePairBound): Double = {
    require(rightRows > 0 && leftTokens > 0,
      s"autoDfRatio needs positive counts, got rightRows=$rightRows " +
        s"leftTokens=$leftTokens")
    math.min(1.0, math.max(1.0 / rightRows,
      pairBound.toDouble / (leftTokens.toDouble * rightRows.toDouble)))
  }

  /** LIFETIME count of `releaseIndex = false` calls in this JVM (see
    * [[Options.releaseIndex]]): each such call persists one right-side
    * token index that only session cache-clearing frees. Past
    * [[UnreleasedIndexWarnThreshold]] every further call logs a named
    * warning — the long-lived-session leak fence (round 18). The counter
    * cannot observe `spark.catalog.clearCache()` (r18 ADVICE: it used to
    * present itself as a LIVE-index count, going permanently stale after
    * the very cache clear its warning recommends), so it is phrased as a
    * call count and [[resetUnreleasedIndexCount]] lets a caller that just
    * cleared the session cache re-arm the fence honestly. */
  private val unreleasedIndexes = new java.util.concurrent.atomic.AtomicLong(0)
  def unreleasedIndexCount: Long = unreleasedIndexes.get()
  /** Re-arm the leak fence after an external cache clear
    * (`spark.catalog.clearCache()` or session teardown). */
  def resetUnreleasedIndexCount(): Unit = unreleasedIndexes.set(0)
  val UnreleasedIndexWarnThreshold: Long = 8L
  @transient private lazy val logger =
    org.slf4j.LoggerFactory.getLogger("graft.operators.FuzzyLookup")

  /** @param maxLevDistance 0 = exact-token candidates only; 1-2 enables the
    *                       deletion-variant fuzzy path
    * @param minScore       matches scoring below are dropped (row null-padded)
    * @param boostAcronyms  2-3 char all-caps tokens matching on both sides
    *                       get `acronymBoost`
    * @param popularityCol  optional right column multiplied into the score
    * @param strategy       "standard" (whole query), "ngram" (best subspan)
    *                       or "predict" (peak-term-weight span — reference
    *                       PredictStrategy, index/PredictStrategy.scala)
    * @param nNgrams        ngram strategy: max token gap within a match cluster
    * @param maxDfRatio     right tokens with docFreq/N above this are ignored
    *                       as candidates (scale guard; 1.0 = off)
    * @param termWeights    per-token likelihoods; weight multiplies the term
    *                       score; tokens under `minTokenLikehood` dropped
    * @param topK           best K right rows per left row (reference: 1)
    * @param filterCols     structured equality filter (reference
    *                       index/IndexStrategy.scala:96-107): (leftCol,
    *                       rightCol) pairs that must be EQUAL for a match —
    *                       folded into the candidate equi-join as extra hash
    *                       keys, so mismatching candidates are never
    *                       generated (not post-filtered)
    * @param tieBreakCol    optional RIGHT column that breaks score ties in
    *                       the top-K window (ascending) instead of the
    *                       internal right row id — makes the chosen match
    *                       independent of partition layout and therefore
    *                       replayable by an external oracle
    * @param releaseIndex   cache contract (round-16): by default (false)
    *                       `lookup` persists the right-side token index and
    *                       NEVER unpersists it — the returned lazy plan
    *                       still references it, so the storage lives until
    *                       the session clears its cache (fine for one-shot
    *                       jobs and the bench, which clears between
    *                       queries; a long-lived caller invoking lookup
    *                       repeatedly accumulates one index per call until
    *                       executor storage evicts). With true, the
    *                       bounded top-K match table (one row per distinct
    *                       query × topK — never data-sized) is EAGERLY
    *                       materialized and the token index unpersisted
    *                       before returning: same output, scoring runs at
    *                       call time, and no SQL-CACHE entry survives the
    *                       call. The pinned id frames (queries, the right
    *                       table) and the materialized top-K remain as
    *                       materializer blocks ([[Materialize.round]] —
    *                       executor-local on the local lane, checkpoint
    *                       files on the reliable lane) for the RETURNED
    *                       plan's lifetime — those are reference-tracked,
    *                       so dropping the returned DataFrame releases
    *                       them via the context cleaner, unlike the
    *                       SQL-cache entry this flag exists to scope
    * @param candidateBound projected-candidate guard (round 18): before
    *                       the candidate equi-join, one vocabulary-sized
    *                       probe computes Σ_token leftDf·rightDf over the
    *                       EXACT join keys (token ++ filterCols) and
    *                       raises by name past this bound, pointing at
    *                       `maxDfRatio` / [[FuzzyLookup.autoDfRatio]].
    *                       The fuzzy lane (maxLevDistance > 0) runs a
    *                       second probe of its own on the deletion-
    *                       variant join keys — variant collisions can
    *                       explode even when exact token sets are
    *                       disjoint. <= 0 disables both — the explicit
    *                       quadratic opt-in, never default
    */
  case class Options(
      maxLevDistance: Int = 0,
      minScore: Double = 0.0,
      boostAcronyms: Boolean = false,
      acronymBoost: Double = 4.0,
      fuzzyFactor: Double = 0.25,
      popularityCol: Option[String] = None,
      stopWords: Set[String] = Set.empty,
      strategy: String = "standard",
      nNgrams: Int = 3,
      maxDfRatio: Double = 1.0,
      termWeights: Map[String, Double] = Map.empty,
      minTokenLikehood: Double = 0.4,
      topK: Int = 1,
      filterCols: Seq[(String, String)] = Nil,
      tieBreakCol: Option[String] = None,
      releaseIndex: Boolean = false,
      candidateBound: Long = CandidatePairBound)

  /** Per-call suffix for the candidate-volume observe metric — observed
    * metric names must be unique within a single query plan. */
  private val lookupSeq = new java.util.concurrent.atomic.AtomicLong(0)

  private val tokUdf = udf((s: String) => TextKernels.tokenizeWithOffsets(s))
  private val levUdf = udf((a: String, b: String, bound: Int) =>
    TextKernels.boundedLevenshtein(a, b, bound))
  /** Token length above which the fuzzy lane refuses by name: deletion
    * variants number ~len^maxDeletes per token, so one 10 kB unbroken
    * "token" (a base64 blob or minified fragment in a query) allocates
    * ~5e7 strings inside the UDF — an executor hang, not a slow row.
    * 512 chars is far above any real word or gazetteer entry and caps
    * the per-token variant count at ~1.3e5. */
  val FuzzyTokenLengthBound: Int = 512

  private def variantsUdf(maxDel: Int) =
    udf((s: String) => {
      require(s.length <= FuzzyTokenLengthBound,
        s"FuzzyLookup fuzzy lane: a ${s.length}-char token exceeds the " +
          s"$FuzzyTokenLengthBound-char bound — deletion variants grow " +
          "as length^maxLevDistance (an executor hang on blob-like " +
          "tokens); clean or stopword mega-tokens, or use " +
          "maxLevDistance = 0 for exact-token candidates")
      TextKernels.deletionVariants(s, maxDel)
    })

  def lookup(left: DataFrame, queryCol: String, right: DataFrame,
             textCol: String, opts: Options = Options()): DataFrame = {
    val fIdx = opts.filterCols.indices
    val lf = opts.filterCols.zipWithIndex.map { case ((l, _), i) => col(l).as(s"_qf${i}_") }
    val rf = opts.filterCols.zipWithIndex.map { case ((_, r), i) => col(r).as(s"_rf${i}_") }
    // Query memoization (the distinct-word discipline used by the
    // tokenizers): a match is a pure function of (query text, filter
    // keys), so the scoring pipeline runs over the DISTINCT query set and
    // the final stitch joins results back BY VALUE. Two wins at scale:
    // (1) cost follows distinct query strings, not left rows — a left
    // with millions of rows over a small query vocabulary (lookupMulti's
    // second column, entity gazetteers) pays for the vocabulary only;
    // (2) the join-back is value-based, so there is no row-id to misalign
    // when the left is itself a shuffle output (a real bug observed at
    // sf0.1: monotonically_increasing_id re-evaluated in a different row
    // order between the pipeline and the stitch, landing one query's
    // match on another's row). The distinct query frame IS id-keyed
    // internally — Materialize.round pins those ids to one evaluation.
    val queries = left
      .select(Seq(col(queryCol).as("_qtext_")) ++ lf: _*)
      .distinct()
      .withColumn("_qlid_", monotonically_increasing_id())
      .transform(Materialize.round)
    // The right side is consumed by the token pipeline, the tie-break
    // select, and the stitch: pin its ids the same way (the catalog side
    // is the dictionary of the join — bounded by contract).
    val rightKeyed = right.withColumn("_rid_", monotonically_increasing_id())
      .transform(Materialize.round)
    // The scoring pipeline works on fully re-aliased projections (fresh
    // attribute ids), so re-joining queries/rightKeyed at the end is not an
    // ambiguous self-join.
    // widen REVERTED (r20, the r19 verdict's item 1): the r19 repartition
    // here made fz01 2.5x slower at 32 cores and ANTI-scale (slower at 32
    // cores than 8) — the widened frame feeds several downstream branches,
    // so the exchange was re-paid per consumer while the tokenizer work it
    // spread is too small to amortize it at any measured configuration.
    val texts = rightKeyed.select(
      Seq(col("_rid_").as("_trid_"), col(textCol).as("_ttext_")) ++ rf: _*)

    // ---- right side: inverted index as a DataFrame ------------------------
    val rightToks = texts
      .select(Seq(col("_trid_"), explode(tokUdf(col("_ttext_"))).as("t")) ++
        fIdx.map(i => col(s"_rf${i}_")): _*)
      .select(Seq(col("_trid_"), col("t.tok").as("rtok"), col("t.acro").as("racro")) ++
        fIdx.map(i => col(s"_rf${i}_")): _*)
      .where(!col("rtok").isin(opts.stopWords.toSeq: _*))
      // three consumers (doclen, df stats, the candidate join) would each
      // re-run the tokenizer explode; persist is the single-node stand-in
      // for the checkpoint/staging write a cluster deployment uses here
      .persist()
    val docLen = rightToks.groupBy("_trid_").agg(count(lit(1)).as("_doclen_"))
    val totals = texts.agg(count(lit(1)).as("_n_docs_"))
    // token -> document frequency -> idf; frequent tokens pruned here, which
    // bounds the candidate join fan-out at scale.
    val tokenStats = rightToks.select("_trid_", "rtok").distinct()
      .groupBy("rtok").agg(count(lit(1)).as("_df_"))
      .crossJoin(broadcast(totals))
      .where(col("_df_") / col("_n_docs_") <= opts.maxDfRatio)
      .withColumn("_idf_", log(lit(1.0) + col("_n_docs_") / col("_df_")))
      .select("rtok", "_idf_")
    val rightIndexed = rightToks.join(tokenStats, "rtok")

    // ---- left side: query tokens with char offsets ------------------------
    // widen REVERTED here too (r20): same verdict-measured regression as
    // the right side — the exchange cost exceeded the spread UDF work.
    val leftToksBase = queries
      .select(Seq(col("_qlid_"), explode(tokUdf(col("_qtext_"))).as("t")) ++
        fIdx.map(i => col(s"_qf${i}_")): _*)
      .select(Seq(col("_qlid_"), col("t.tok").as("qtok"), col("t.pos").as("qpos"),
        col("t.start").as("qstart"), col("t.end").as("qend"),
        col("t.acro").as("qacro")) ++ fIdx.map(i => col(s"_qf${i}_")): _*)
      .where(!col("qtok").isin(opts.stopWords.toSeq: _*))
    // term-weight handling + predict strategy: keep only the +-2 window
    // around the peak-likelihood token (>= 0.75 * peak), the reference's
    // entity-mention span detection
    val leftToks =
      if (opts.termWeights.isEmpty) leftToksBase.withColumn("_tw_", lit(1.0))
      else {
        val wm = opts.termWeights
        val wU = udf((t: String) => wm.getOrElse(t, 0.0))
        val weighted = leftToksBase.withColumn("_tw_", wU(col("qtok")))
          .where(col("_tw_") >= opts.minTokenLikehood)
        if (opts.strategy == "predict") {
          val wl = Window.partitionBy("_qlid_")
          weighted
            .withColumn("_peak_", max(col("_tw_")).over(wl))
            .withColumn("_peakpos_",
              min(when(col("_tw_") === col("_peak_"), col("qpos"))).over(wl))
            .where(col("_tw_") >= col("_peak_") * 0.75 &&
              abs(col("qpos") - col("_peakpos_")) <= 2)
            .drop("_peak_", "_peakpos_")
        } else weighted
      }

    // ---- candidate-volume guard (round 18) --------------------------------
    // The r16 sf1 soak's fz02 finding: with maxDfRatio = 1.0 on a
    // low-vocabulary corpus the candidate join IS left×right by
    // construction — a hang, not a slow query. The r17 observe metric
    // surfaces it only to callers watching the metrics stream; this probe
    // raises BY NAME first (the Guards.degenerateBucketProbe recipe,
    // keyed on token document frequency). Projected volume is computed on
    // the exact join keys (token ++ filter columns), so a selective
    // structured filter is credited, not over-counted; both df tables are
    // vocabulary-sized aggregates over the pinned/persisted token frames,
    // so the probe costs one cheap job. DECIMAL accumulation: a product
    // of two row-count-scale dfs would wrap a LONG sum silently
    // (guard-contract rule 5).
    if (opts.candidateBound > 0) {
      val projected = Guards.projectedJoinVolume(
        leftToks.select(Seq(col("qtok").as("_gtok_")) ++
          fIdx.map(i => col(s"_qf${i}_")): _*),
        rightIndexed.select(Seq(col("rtok").as("_gtok_")) ++
          fIdx.map(i => col(s"_rf${i}_").as(s"_qf${i}_")): _*),
        Seq("_gtok_") ++ fIdx.map(i => s"_qf${i}_"))
      if (projected.compareTo(
          java.math.BigInteger.valueOf(opts.candidateBound)) > 0) {
        // sizing hint from measured inputs, computed on the raise path
        // only: the right count reads cached-side metadata, the left
        // token volume one aggregate over the pinned distinct queries
        val nRight = texts.count()
        val nLeftToks = leftToks.count()
        val hint = autoDfRatio(math.max(nRight, 1L),
          math.max(nLeftToks, 1L), opts.candidateBound)
        throw new IllegalArgumentException(
          s"FuzzyLookup.lookup: projected candidate volume $projected " +
            s"(sum over join keys of leftTokenDf x rightTokenDf) exceeds " +
            s"candidateBound=${opts.candidateBound} — the candidate " +
            s"equi-join would emit that many rows (an effective hang; " +
            s"the sf1 soak measured this shape at left x right). Lower " +
            s"maxDfRatio (currently ${opts.maxDfRatio}; " +
            f"autoDfRatio suggests <= $hint%.6f for these inputs) so " +
            s"high-document-frequency tokens stop generating candidates, " +
            s"or accept the cost explicitly with candidateBound <= 0")
      }
    }

    // ---- candidates: exact inverted-index join ----------------------------
    val acroBoost =
      if (opts.boostAcronyms)
        when(col("qacro") && col("racro"), lit(opts.acronymBoost)).otherwise(lit(1.0))
      else lit(1.0)
    // structured filter: extra equality keys in the SAME hash join — the
    // planner hashes on (token ++ filters), so mismatching candidates never
    // materialize (reference IndexStrategy.scala:96-107)
    val filterCond = fIdx.foldLeft(col("qtok") === col("rtok")) {
      (c, i) => c && col(s"_qf${i}_") === col(s"_rf${i}_")
    }
    val exactCand = leftToks
      .join(rightIndexed, filterCond)
      .select(col("_qlid_"), col("_trid_"), col("qpos"), col("qstart"),
        col("qend"), col("qtok"),
        (col("_idf_") * acroBoost * col("_tw_")).as("_w_"))

    // ---- candidates: SymSpell deletion-variant fuzzy join -----------------
    // set inside the fuzzy branch; unpersisted with rightToks on the
    // releaseIndex=true lane (see the persist note in the branch)
    var fuzzyVariantFrames: Seq[DataFrame] = Nil
    val cand =
      if (opts.maxLevDistance <= 0) exactCand
      else {
        val vu = variantsUdf(opts.maxLevDistance)
        // persisted while probing (r18 ADVICE): the volume probe below
        // fully evaluates the deletion-variant explode — the lane's most
        // expensive UDF — and the candidate join would otherwise
        // recompute it from scratch (the Dedup.minHashLshNewVsCorpus
        // banded-frame treatment). Lifecycle: unpersisted as soon as the
        // bounded top-K is materialized on releaseIndex=true; on the
        // lazy default the variant frames share the token index's
        // session-cache lifetime (the releaseIndex contract + leak
        // fence). Probe disabled ⇒ single consumer ⇒ no persist.
        val probing = opts.candidateBound > 0
        val lv0 = leftToks.withColumn("_var_", explode(vu(col("qtok"))))
        val rv0 = rightIndexed.withColumn("_var_", explode(vu(col("rtok"))))
        val lv = if (probing) lv0.persist() else lv0
        val rv = if (probing) rv0.persist() else rv0
        if (probing) fuzzyVariantFrames = Seq(lv, rv)
        // the fuzzy lane gets its OWN volume probe (round-18 self-review
        // catch): the exact-key projection above is blind to explosions
        // that arrive only through shared deletion VARIANTS (disjoint
        // token sets whose variants all collide — e.g. serial-number
        // vocabularies differing in one char), so the guard must project
        // on the keys this join actually hashes on. Same knobs, same
        // opt-out; cost is one variant-keyed aggregate pair over the
        // vocabulary-sized token tables.
        if (opts.candidateBound > 0) {
          val projectedF = Guards.projectedJoinVolume(
            lv.select(Seq(col("_var_")) ++
              fIdx.map(i => col(s"_qf${i}_")): _*),
            rv.select(Seq(col("_var_")) ++
              fIdx.map(i => col(s"_rf${i}_").as(s"_qf${i}_")): _*),
            Seq("_var_") ++ fIdx.map(i => s"_qf${i}_"))
          if (projectedF.compareTo(
              java.math.BigInteger.valueOf(opts.candidateBound)) > 0) {
            // release the freshly materialized variant caches BEFORE
            // raising (round-19 review catch): the probe above fully
            // evaluated both, and a caller that catches this raise and
            // retries with the remedy the message recommends would
            // otherwise leave two data-scale caches per failed attempt
            // that only a session cache clear can free
            lv.unpersist(); rv.unpersist()
            throw new IllegalArgumentException(
              s"requirement failed: FuzzyLookup.lookup: projected FUZZY " +
                s"candidate volume $projectedF (sum over deletion-variant " +
                s"keys of left x right occurrence counts) exceeds " +
                s"candidateBound=${opts.candidateBound} — the variant " +
                "join would emit that many rows before Levenshtein " +
                "verification (an effective hang); lower maxDfRatio, " +
                "lower maxLevDistance, or accept the cost explicitly " +
                "with candidateBound <= 0")
          }
        }
        val fuzzyFilter = fIdx.foldLeft(col("qtok") =!= col("rtok")) {
          (c, i) => c && col(s"_qf${i}_") === col(s"_rf${i}_")
        }
        val fuzzyCand = lv.join(rv, "_var_")
          .where(fuzzyFilter)
          .select(col("_qlid_"), col("_trid_"), col("qpos"), col("qstart"),
            col("qend"), col("qtok"), col("rtok"), col("_idf_"), col("_tw_"))
          .distinct()
          .withColumn("_lev_", levUdf(col("qtok"), col("rtok"), lit(opts.maxLevDistance)))
          .where(col("_lev_") <= opts.maxLevDistance)
          .select(col("_qlid_"), col("_trid_"), col("qpos"), col("qstart"), col("qend"),
            col("qtok"),
            (col("_idf_") * (lit(1.0) - col("_lev_") /
              greatest(length(col("qtok")), length(col("rtok")))) *
              lit(opts.fuzzyFactor) * col("_tw_")).as("_w_"))
        exactCand.unionByName(fuzzyCand)
      }

    // CANDIDATE-VOLUME OBSERVABILITY (round 17): candidate rows scale as
    // Σ_token (left-df × right-df) — on a low-vocabulary corpus with
    // maxDfRatio = 1.0 that is left×right by construction (the sf1 soak
    // measured fz02-shaped workloads doing exactly this). The named
    // observe metric surfaces the explosion in the listener/metrics
    // stream BEFORE it shows up as wall-time: a production caller seeing
    // `candidate_rows` >> left-rows should lower `maxDfRatio` (prunes
    // high-document-frequency tokens from the index, which is what
    // bounds the join fan-out). Name is per-call-unique because Spark
    // requires observed-metric names to be unique within one query plan
    // (lookupMulti composes several lookups into one).
    val candObserved = cand.observe(
      s"fuzzy_lookup_candidates_${lookupSeq.incrementAndGet()}",
      count(lit(1)).as("candidate_rows"))

    // best evidence per (left, right, query-token); the token itself rides
    // along to become the matched span's `_tags_` (the reference returns
    // `hit.ngram.terms` there, index/IndexStrategy.scala:170)
    val matched = candObserved.groupBy("_qlid_", "_trid_", "qpos")
      .agg(max(col("_w_")).as("_w_"), first(col("qstart")).as("qstart"),
        first(col("qend")).as("qend"), first(col("qtok")).as("qtok"))

    // ---- pair scoring: whole query, or best proximity cluster -------------
    // Strategy "ngram" vs the reference (index/NgramStrategy.scala:113-195):
    // the reference seeds at the best single n-gram and greedily expands
    // left/right one step at a time while the score strictly improves — a
    // LOCAL search that cannot leave its seed's contiguous run. This
    // implementation instead scores every gap-bounded cluster of matched
    // positions and takes the best, i.e. the GLOBAL optimum over candidate
    // spans. They disagree exactly when a far-away single token outscores
    // every seed-adjacent n-gram but a multi-token cluster elsewhere sums
    // higher: the reference stops at its seed, this picks the higher-scoring
    // cluster (FuzzyLookupSpec "ngram strategy beats the greedy seed" pins
    // the case). Deliberate: same intent, strictly better objective, and
    // one relational pass instead of an iterative per-row loop.
    val tagsExpr = expr("transform(array_sort(_tagstructs_), x -> x.qtok)")
    // ORDERED summation, not sum(): float addition is non-associative and a
    // hash-agg's stream order is partition-dependent, so two pairs with the
    // same multiset of weights could score last-ulp apart and defeat the
    // tie-break (and any external replay). Folding the weights in ascending
    // qpos order makes every pair's score bit-deterministic — mathematical
    // ties are exact FP ties, on any engine that folds in the same order.
    val rawExpr = expr(
      "aggregate(array_sort(_wstructs_), 0D, (a, x) -> a + x._w_)")
    val pairScores = opts.strategy match {
      case "ngram" =>
        // cluster matched query positions: a gap > nNgrams starts a new
        // cluster; the best cluster is the matched subspan.
        val wOrder = Window.partitionBy("_qlid_", "_trid_").orderBy("qpos")
        val clustered = matched
          .withColumn("_gap_",
            when(col("qpos") - lag(col("qpos"), 1).over(wOrder) > opts.nNgrams, 1)
              .otherwise(0))
          .withColumn("_cluster_", sum(col("_gap_")).over(
            wOrder.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        clustered.groupBy("_qlid_", "_trid_", "_cluster_")
          .agg(collect_list(struct(col("qpos"), col("_w_"))).as("_wstructs_"),
            min(col("qstart")).as("_s_"), max(col("qend")).as("_e_"),
            collect_list(struct(col("qpos"), col("qtok"))).as("_tagstructs_"))
          .withColumn("_raw_", rawExpr)
          .withColumn("_tags0_", tagsExpr)
          .groupBy("_qlid_", "_trid_")
          .agg(max(struct(col("_raw_"), col("_s_"), col("_e_"), col("_tags0_"))).as("best"))
          .select(col("_qlid_"), col("_trid_"), col("best._raw_").as("_raw_"),
            col("best._s_").as("_s_"), col("best._e_").as("_e_"),
            col("best._tags0_").as("_tags0_"))
      case _ =>
        matched.groupBy("_qlid_", "_trid_")
          .agg(collect_list(struct(col("qpos"), col("_w_"))).as("_wstructs_"),
            min(col("qstart")).as("_s_"), max(col("qend")).as("_e_"),
            collect_list(struct(col("qpos"), col("qtok"))).as("_tagstructs_"))
          .withColumn("_raw_", rawExpr)
          .withColumn("_tags0_", tagsExpr)
          .drop("_wstructs_", "_tagstructs_")
    }

    // length normalization + optional popularity boost
    val withLen = pairScores.join(docLen, "_trid_")
    val popBoosted = opts.popularityCol match {
      case Some(p) =>
        val popDf = rightKeyed.select(col("_rid_").as("_ptrid_"), col(p).as("_pop_"))
        withLen.join(popDf, col("_trid_") === col("_ptrid_"))
          .withColumn("_score_", col("_raw_") / sqrt(col("_doclen_")) * col("_pop_"))
      case None => withLen
        .withColumn("_score_", col("_raw_") / sqrt(col("_doclen_")))
    }

    val scored0 = popBoosted.where(col("_score_") >= opts.minScore)

    // ---- top-K per left row, deterministic --------------------------------
    // default tie-break: internal right row id (stable within a plan);
    // tieBreakCol: a caller-named right column (stable across ANY layout —
    // the oracle-replayable mode)
    val scored = opts.tieBreakCol match {
      case Some(tb) => scored0.join(
        rightKeyed.select(col("_rid_").as("_tbrid_"), col(tb).as("_tb_")),
        col("_trid_") === col("_tbrid_"))
      case None => scored0
    }
    val wTop = Window.partitionBy("_qlid_").orderBy(
      (Seq(col("_score_").desc) ++ opts.tieBreakCol.map(_ => col("_tb_")).toSeq :+
        col("_trid_")): _*)
    val best0 = scored
      .withColumn("_rank_", row_number().over(wTop))
      .where(col("_rank_") <= opts.topK)
      .select(col("_qlid_"), col("_trid_"), col("_score_"),
        col("_s_").as("_si_"), col("_e_").as("_ei_"), col("_tags0_"))
    // releaseIndex contract (see Options): materialize the bounded top-K
    // table eagerly, then drop the token-index cache — the stitch below
    // only needs `best` and the two pinned id frames, so nothing in the
    // returned plan references rightToks anymore
    val best =
      if (!opts.releaseIndex) {
        // leak fence (round 18): each releaseIndex=false call leaves one
        // persisted token index behind for the session cache to free;
        // fine for one-shot jobs, a quiet storage leak in long-lived
        // sessions. Past the threshold every further call warns by name —
        // the default stays lazy (flipping it would move scoring to call
        // time for every one-shot caller), the leak just stops being
        // silent.
        val n = unreleasedIndexes.incrementAndGet()
        if (n > UnreleasedIndexWarnThreshold)
          logger.warn(s"FuzzyLookup.lookup: $n releaseIndex=false calls " +
            "in this JVM, each leaving one token index (and, on the " +
            "probed fuzzy lane, its two deletion-variant frames) cached " +
            "until the session cache is cleared — long-lived sessions " +
            "should pass " +
            "releaseIndex=true (eager bounded top-K materialization, " +
            "index dropped before return), or clear the session cache " +
            "between calls and re-arm this fence with " +
            "FuzzyLookup.resetUnreleasedIndexCount()")
        best0
      } else {
        val b = best0.transform(Materialize.round)
        rightToks.unpersist()
        fuzzyVariantFrames.foreach(_.unpersist())
        b
      }

    // ---- stitch the full rows back (left outer ⇒ null padding) ------------
    // Value-based: each left row meets ITS distinct-query row on
    // null-safe (text, filter keys) equality, then that query's topK
    // matches. Qualified-by-alias references: the scoring subtree shares
    // lineage with queries/rightKeyed, so df("col") resolution would trip
    // Spark's ambiguous-self-join check; alias scoping resolves cleanly.
    val stitchCond = fIdx.foldLeft(
      col(s"GL.`$queryCol`") <=> col("GQ._qtext_")) { (c, i) =>
      c && col(s"GL.`${opts.filterCols(i)._1}`") <=> col(s"GQ._qf${i}_")
    }
    left.as("GL")
      .join(queries.as("GQ"), stitchCond, "left")
      .join(best.as("GB"), col("GQ._qlid_") === col("GB._qlid_"), "left")
      .join(rightKeyed.as("GR"), col("GB._trid_") === col("GR._rid_"), "left")
      .select(left.columns.map(c => col(s"GL.`$c`")) ++
        right.columns.map(c => col(s"GR.`$c`")) ++ Seq(
        col("_score_").cast(FloatType).as("_score_"),
        col("_tags0_").as("_tags_"),
        col("_si_").cast(IntegerType).as("_startIndex_"),
        col("_ei_").cast(IntegerType).as("_endIndex_")): _*)
  }

  /** Array-query variant (reference luceneLookup on an array column,
    * index/implicits.scala): every element of `arrayQueryCol` is resolved
    * independently against the right side; results come back in element
    * order as `{col}_res` = array of {right cols, _score_, _startIndex_,
    * _endIndex_} structs (null-padded for unmatched elements). */
  def lookupArray(left: DataFrame, arrayQueryCol: String, right: DataFrame,
                  textCol: String, opts: Options = Options()): DataFrame = {
    // fail fast on reserved scratch names: a left column named `_laid_`
    // would be silently replaced by the withColumn below (and `_plaid_` /
    // `${col}_res` would collide in the join-back select) — corrupt
    // output beats an error only when it is loud
    val reserved =
      Seq("_laid_", "_plaid_", "_qi_", "_q_", "_packed_", s"${arrayQueryCol}_res")
    val clash = left.columns.intersect(reserved)
    require(clash.isEmpty,
      s"lookupArray reserves internal scratch column names " +
        s"${reserved.mkString("[", ", ", "]")}; rename left column(s) " +
        clash.mkString(", "))
    // _laid_ is consumed by both the exploded lookup and the final join
    // back — pin it to one evaluation (the same misalignment hazard the
    // value-based stitch removes inside lookup; here the array column
    // itself is the join identity, so an id key is the honest option)
    val keyed = left.withColumn("_laid_", monotonically_increasing_id())
      .transform(Materialize.round)
    val exploded = keyed.select(col("_laid_"),
      posexplode(col(arrayQueryCol)).as(Seq("_qi_", "_q_")))
    val matched = lookup(exploded, "_q_", right, textCol, opts)
    val resCols = right.columns ++ Seq("_score_", "_tags_", "_startIndex_", "_endIndex_")
    val packed = matched
      .groupBy("_laid_")
      .agg(array_sort(collect_list(struct(col("_qi_").as("_qi_"),
        struct(resCols.map(col): _*).as("res")))).as("_packed_"))
      .select(col("_laid_").as("_plaid_"),
        expr("transform(_packed_, x -> x.res)").as(s"${arrayQueryCol}_res"))
    keyed.join(packed, col("_laid_") === col("_plaid_"), "left")
      .select(left.columns.map(col) :+ col(s"${arrayQueryCol}_res"): _*)
  }

  /** Multi-query variant (reference `luceneLookups`): each query column is
    * resolved against the same right side; results appear as struct columns
    * `{q}_res` = {right cols, _score_, _tags_, _startIndex_, _endIndex_}.
    *
    * ONE pass for all k query columns — the reference resolves all queries
    * against the index in a single call (index/implicits.scala:58-123), and
    * this does the relational equivalent: pack the k columns into an array,
    * run [[lookupArray]]'s posexplode → single [[lookup]] → regroup, then
    * unpack element i back into `{queryCols(i)}_res`. The k-sequential
    * alternative costs k tokenize/candidate-join/window passes and
    * recomputes the right side's document-frequency statistics k times;
    * this shape pays ONE candidate equi-join and one IDF computation, and
    * the distinct-query memoization inside [[lookup]] dedups strings shared
    * ACROSS columns too. Top-1 per column by contract (the reference's
    * semantics); ask [[lookup]] directly for multi-candidate results.
    *
    * API NOTE (contract change, round 13): earlier rounds accepted
    * `opts.topK > 1` and multiplied left rows k-fold per extra candidate —
    * an accident of the fold implementation, not the reference's top-1
    * semantics. Since the array re-plan this is rejected with a `require`;
    * callers wanting multiple candidates per query use [[lookup]]. */
  def lookupMulti(left: DataFrame, queryCols: Seq[String], right: DataFrame,
                  textCol: String, opts: Options = Options()): DataFrame = {
    require(queryCols.nonEmpty, "at least one query column")
    require(opts.topK == 1,
      s"lookupMulti resolves the single best match per query column " +
        s"(topK must be 1, got ${opts.topK})")
    // a pre-existing `${q}_res` twin would be silently REPLACED by the
    // unpack fold's withColumn and then duplicated in the final select
    val resClash = queryCols.map(q => s"${q}_res").filter(left.columns.contains)
    require(resClash.isEmpty,
      s"lookupMulti writes a `{queryCol}_res` result column per query; " +
        s"left frame already has: ${resClash.mkString(", ")}")
    // Fresh scratch name: suffix until it collides with nothing on the
    // left frame (neither the packed array column nor its `_res` twin).
    val arr = Iterator.from(0).map(i => if (i == 0) "_mq_" else s"_mq${i}_")
      .find(c => !left.columns.contains(c) && !left.columns.contains(s"${c}_res"))
      .get
    val packed = left.withColumn(arr, array(queryCols.map(col): _*))
    val looked = lookupArray(packed, arr, right, textCol, opts)
    queryCols.zipWithIndex.foldLeft(looked) { case (acc, (q, i)) =>
      acc.withColumn(s"${q}_res", element_at(col(s"${arr}_res"), i + 1))
    }.select(left.columns.map(col) ++ queryCols.map(q => col(s"${q}_res")): _*)
  }
}
