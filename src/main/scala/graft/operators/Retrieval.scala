package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Materialize.MaterializeOps

/** Sparse-lexical retrieval (BM25) over a document corpus — the classic
  * complement to the dense ANN tier in [[Similarity]]. The reference
  * reaches for an embedded Lucene for this shape (SURVEY §2.9); here it
  * is the same inverted-index-as-DataFrame design the fuzzy-lookup
  * re-expression proved out: term stats are plain aggregates, the query
  * side is a broadcast join against the posting table, and top-k is a
  * per-query window.
  *
  * Fixed-point discipline: each (query, doc, term) BM25 weight is
  * quantized to 1e-6 (`round(w * 1e6)` as BIGINT) BEFORE the per-doc sum,
  * so the distributed sum is integer — summation-order-free — and the
  * top-k ordering `(score desc, doc_id)` replays exactly in the oracle.
  * (Double addition is non-associative; summing raw doubles across
  * partitions would make the score depend on partitioning.)
  */
object Retrieval {

  /** Tokenize to lowercase whitespace terms. */
  private def terms(df: DataFrame, idCol: String, textCol: String) =
    df.select(col(idCol),
        explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .where(col("term") =!= "")

  /** BM25 top-k: for each `(query_id, term)` row in `queries`, score every
    * document containing the term and keep the `k` best per query.
    *
    * `score_scaled` is the 1e-6 fixed-point BM25 score (BIGINT); idf is
    * the standard `ln(1 + (N - df + 0.5) / (df + 0.5))`.
    *
    * Scale shape: tf/dl/df are one partial+final aggregate each over the
    * token stream; N and avgdl are a 1-row aggregate broadcast by
    * crossJoin; `queries` is broadcast (query sets are small by
    * definition), so the only big shuffles are the token-key aggregates
    * and the final (query, doc) combine — no posting list ever sits on
    * the driver, unlike the Lucene-sidecar design. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, "k must be positive")
    val toks = terms(docs, idCol, textCol)
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // N counts ALL docs (not just tokenized ones) — mirrors count(*) on
    // the source table; avgdl from exact integer sums
    val stats = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(dl.agg(sum(col("dl")).as("_sum_dl_")))
      .select(col("n_docs"),
        (col("_sum_dl_").cast("double") / col("n_docs").cast("double"))
          .as("avgdl"))
    val scored = broadcast(queries)
      .join(dfreq, "term").join(tf, "term").join(dl, idCol)
      .crossJoin(broadcast(stats))
      // one fixed double expression, mirrored token for token in the
      // oracle (left-assoc `0.75 * dl / avgdl` = (0.75*dl)/avgdl there too)
      // `1.0 + $k1` stays a runtime double add (not a Scala-side constant
      // fold) so the oracle's `1.0 + CAST(1.2 AS DOUBLE)` is the same op
      .select(col("query_id"), col(idCol),
        expr(s"""cast(round(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                 * ((tf * (1.0 + $k1)) / (tf + $k1 * (${1 - b} + $b * dl / avgdl)))
                 * 1000000) as bigint)""").as("w"))
    val byDoc = scored.groupBy(col("query_id"), col(idCol))
      .agg(sum(col("w")).as("score_scaled"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_scaled").desc, col(idCol))
    byDoc.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Maximal Marginal Relevance diversification (Carbonell & Goldstein
    * '98) over a ranked candidate list — the reranker that stops a
    * retrieval page (or a RAG context window) from filling with k copies
    * of the same document: greedily pick the candidate maximizing
    * `λ·rel − (1−λ)·max_sim_to_already_selected`.
    *
    * Relevance is the candidate's integer fixed-point score normalized by
    * the query's max (one correctly-rounded division); similarity is
    * n-gram Jaccard between candidate documents (exact integer i/u
    * through one division); λ arrives as the rational `lambdaNum /
    * lambdaDen` so both engines evaluate literally `(7.0·nrel)/10.0 −
    * (3.0·msim)/10.0` — never a `1 − 0.7` whose binary value differs
    * from the SQL literal `0.3`. Every float is a fixed program over
    * exact integers → the selection order replays exactly; ties break on
    * the doc id.
    *
    * Plan: per-query work only — candidates per query are top-k'-bounded
    * upstream, so the pairwise-similarity join is Σ(k')² per query, and
    * each greedy round is one join + one window over the (tiny) remaining
    * set, `localCheckpoint`ed so round t's plan doesn't re-derive rounds
    * 1..t−1. Output: (query_id, `docCol`, rank, `relFpCol`). */
  def mmrRerank(candidates: DataFrame, docCol: String, relFpCol: String,
                docs: DataFrame, docIdCol: String, textCol: String,
                k: Int, lambdaNum: Int = 7, lambdaDen: Int = 10,
                n: Int = 3): DataFrame = {
    require(k >= 1 && lambdaDen > 0 && lambdaNum >= 0 &&
      lambdaNum <= lambdaDen && n >= 1, "bad MMR parameters")
    val lam = s"$lambdaNum.0"
    val oneMinus = s"${lambdaDen - lambdaNum}.0"
    val den = s"$lambdaDen.0"
    val cands = candidates.select(col("query_id"), col(docCol),
      col(relFpCol).cast("long").as("_rel_")).materializeRound()
    val wq = Window.partitionBy("query_id")
    val nrel = cands
      .withColumn("_relmax_", max(col("_rel_")).over(wq))
      .withColumn("_nrel_", expr(
        "cast(_rel_ as double) / cast(_relmax_ as double)"))
      .select(col("query_id"), col(docCol), col("_rel_"), col("_nrel_"))
      .materializeRound()
    // n-gram sets of candidate docs only (semi-join shrinks the scan)
    val candDocs = cands.select(col(docCol)).distinct()
    val grams = docs
      .join(candDocs.withColumnRenamed(docCol, docIdCol), docIdCol)
      .select(col(docIdCol), split(col(textCol), "\\s+").as("_ws_"))
      .select(col(docIdCol), expr("filter(_ws_, x -> x != '')").as("_ws_"))
      .where(size(col("_ws_")) >= n)
      .select(col(docIdCol), explode(expr(
        s"""transform(sequence(1, size(_ws_) - ${n - 1}),
           |  i -> concat_ws(' ', slice(_ws_, i, $n)))""".stripMargin))
        .as("_g_"))
      .distinct().materializeRound()
    val sizes = grams.groupBy(docIdCol).agg(count(lit(1)).as("_ng_"))
    val inter = grams.as("ga").join(grams.as("gb"),
        col("ga._g_") === col("gb._g_") &&
          col(s"ga.$docIdCol") < col(s"gb.$docIdCol"))
      .groupBy(col(s"ga.$docIdCol").as("_da_"),
        col(s"gb.$docIdCol").as("_db_"))
      .agg(count(lit(1)).as("_i_"))
    val pairSim = inter
      .join(sizes.select(col(docIdCol).as("_da_"), col("_ng_").as("_na_")),
        "_da_")
      .join(sizes.select(col(docIdCol).as("_db_"), col("_ng_").as("_nb_")),
        "_db_")
      .select(col("_da_"), col("_db_"), expr(
        "cast(_i_ as double) / cast(_na_ + _nb_ - _i_ as double)")
        .as("_sim_"))
      .materializeRound()
    val wPick = wq.orderBy(col("_mmr_").desc, col(docCol))
    var selected = nrel
      .withColumn("_mmr_", col("_nrel_"))
      .withColumn("_rk_", row_number().over(wPick))
      .where(col("_rk_") === 1)
      .select(col("query_id"), col(docCol), col("_rel_"),
        lit(1).as("rank"))
      .materializeRound()
    // `remaining` is NOT pinned (optimization r19): it is a one-join plan
    // over two frames that are both already materialized (nrel and the
    // per-round selected), so plan depth stays constant without a second
    // barrier per round — dropping it halves the round's actions, and the
    // anti-join is recomputed at most twice per round from cached inputs.
    def remainingOf(sel: DataFrame) =
      nrel.join(sel.select("query_id", docCol),
        Seq("query_id", docCol), "left_anti")
    for (t <- 2 to k) {
      val remaining = remainingOf(selected)
      val selDocs = selected.select(col("query_id"),
        col(docCol).as("_sel_"))
      val sims = remaining.join(selDocs, "query_id")
        .join(pairSim,
          (least(col(docCol), col("_sel_")) === col("_da_")) &&
            (greatest(col(docCol), col("_sel_")) === col("_db_")),
          "left")
        .groupBy(col("query_id"), col(docCol))
        .agg(max(coalesce(col("_sim_"), lit(0.0))).as("_msim_"))
      val picked = remaining.join(sims, Seq("query_id", docCol.toString))
        .withColumn("_mmr_", expr(
          s"($lam * _nrel_) / $den - ($oneMinus * _msim_) / $den"))
        .withColumn("_rk_", row_number().over(wPick))
        .where(col("_rk_") === 1)
        .select(col("query_id"), col(docCol), col("_rel_"),
          lit(t).as("rank"))
      selected = selected.unionByName(picked).materializeRound()
    }
    selected.select(col("query_id"), col(docCol), col("rank"),
      col("_rel_").as(relFpCol))
  }

  /** Exact phrase search over a POSITIONAL inverted index — the "quoted
    * query" Lucene serves from term position lists, as one relational
    * program. `phrases` is (phrase_id, phrase); output is one row per
    * (phrase_id, doc) with `n_matches` = number of occurrences of the
    * phrase as a CONTIGUOUS token run (overlapping occurrences counted,
    * matches at any position, multi-word or single-word phrases alike).
    *
    * The plan is anchor alignment, constant join-depth in phrase length:
    * positional postings (doc, pos, term) join the broadcast exploded
    * phrase terms (phrase_id, ppos, term) on the term, each hit votes for
    * anchor = pos − ppos, and an anchor where the distinct-position vote
    * count equals the phrase length is a full match. One broadcast join +
    * two aggregates TOTAL for any number of phrases of any length — the
    * naive plan is a LIKE scan of every document per phrase, and the
    * chained-self-join plan (one join per adjacent term pair) grows with
    * phrase length and re-shuffles the posting table each step.
    *
    * Scale shape: the posting stream shrinks at the broadcast semi-match
    * (only tokens that appear in some phrase survive); the vote shuffle
    * keys on (phrase_id, doc, anchor) — ids and ints, never text; doc
    * text itself is read once. Everything is integer arithmetic, so a SQL
    * engine replays the result exactly. */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrases: DataFrame): DataFrame = {
    val postings = docs.select(col(idCol),
        posexplode(split(lower(col(textCol)), "\\s+")).as(Seq("pos", "term")))
      .where(col("term") =!= "")
    val pterms = phrases.select(col("phrase_id"),
        posexplode(split(lower(col("phrase")), "\\s+")).as(Seq("ppos", "term")))
      .where(col("term") =!= "")
    val plen = pterms.groupBy("phrase_id").agg(count(lit(1)).as("plen"))
    val votes = postings.join(broadcast(pterms), "term")
      .select(col("phrase_id"), col(idCol),
        (col("pos") - col("ppos")).as("anchor"), col("ppos"))
    votes.groupBy(col("phrase_id"), col(idCol), col("anchor"))
      .agg(count(lit(1)).as("hits"))
      .join(broadcast(plen), "phrase_id")
      .where(col("hits") === col("plen") && col("anchor") >= 0)
      .groupBy(col("phrase_id"), col(idCol))
      .agg(count(lit(1)).as("n_matches"))
  }

  /** Conjunctive (boolean AND) retrieval: documents containing EVERY
    * term of a query — the filter mode next to [[bm25TopK]]'s ranked
    * mode (the two compose: AND-filter first, rank survivors). The
    * relational form of posting-list intersection: distinct (doc, term)
    * pairs joined to the query terms, grouped per (query, doc), kept
    * when the distinct-hit count equals the query's term count. Each
    * query's cost is its rarest-term posting list post-join — the
    * intersection never materializes more than the matched pairs, and
    * everything shuffles on the term key then the (query, doc) key.
    * Output: (query_id, doc_id) matches. */
  def booleanAnd(docs: DataFrame, idCol: String, textCol: String,
                 queries: DataFrame): DataFrame = {
    val toks = docs.select(col(idCol),
        explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .where(col("term") =!= "")
      .distinct()
    // query terms go through the SAME tokenizer as the doc side (round
    // 17): the doc stream is whitespace-split, so a query term the doc
    // tokenizer can never produce (NULL, '', or anything CONTAINING
    // whitespace, e.g. "new york") counted into _nq_ made the whole
    // query silently unsatisfiable. Splitting decomposes a multi-word
    // term into AND-ed tokens — the faithful semantics under this
    // tokenizer — and drops the unmatchable ones.
    val qsz = queries.select(col("query_id"),
        explode(split(lower(col("term")), "\\s+")).as("term"))
      .where(col("term") =!= "")
      .distinct()
    val counts = qsz.groupBy("query_id").agg(count(lit(1)).as("_nq_"))
    toks.join(qsz, "term")
      .groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).as("_hits_"))
      .join(counts, "query_id")
      .where(col("_hits_") === col("_nq_"))
      .select(col("query_id"), col(idCol))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR 2009): merge
    * per-query rankings from SEVERAL retrievers (lexical BM25, an
    * embedding ANN, a freshness sort …) into one list by summing
    * `1/(K + rank)` per document over the runs that retrieved it — the
    * standard hybrid-retrieval combiner, robust to incomparable score
    * scales because only RANKS cross run boundaries.
    *
    * Integer fixed point: each run contributes `scale div (K + rank)`
    * micro-units (rank from 1 within its (run, query), ordered by that
    * run's score descending, doc ascending on ties), so fused scores are
    * exact longs and replay on any engine — no float sum-order drift.
    *
    * Plan: one (run, query)-keyed window for ranks, one (query, doc)
    * aggregate, one query-keyed window for the final top-`k` — all
    * key-partitioned; per-query cost is bounded by the runs' candidate
    * counts, never corpus-sized. Output: (query, doc, n_runs,
    * fused_micro, fused_rank), `fused_rank <= k`, ties broken by doc. */
  def reciprocalRankFusion(runs: DataFrame, runCol: String, queryCol: String,
                           docCol: String, scoreCol: String, k: Int,
                           rrfK: Long = 60L,
                           scale: Long = 1000000L): DataFrame = {
    require(k > 0 && rrfK >= 0 && scale > 0, "need k > 0, rrfK >= 0, scale > 0")
    val wRun = Window.partitionBy(col(runCol), col(queryCol))
      .orderBy(col(scoreCol).desc, col(docCol))
    val wQ = Window.partitionBy(col(queryCol))
      .orderBy(col("fused_micro").desc, col(docCol))
    runs
      // a doc listed TWICE in one run (malformed input) must contribute
      // that run's reciprocal once, at its best score — and the collapse
      // must happen BEFORE rank assignment, or the duplicate row still
      // shifts every worse-ranked doc's rank in that run (collapsing the
      // ranks afterwards fixed only the duplicated doc itself).
      // Well-formed runs (one row per (run, query, doc)) are
      // byte-identical through this aggregate.
      .groupBy(col(runCol), col(queryCol), col(docCol))
      .agg(max(col(scoreCol)).as(scoreCol))
      .withColumn("_rk_", row_number().over(wRun))
      .groupBy(col(queryCol), col(docCol))
      .agg(count(lit(1)).as("n_runs"),
        sum(expr(s"CAST($scale AS BIGINT) div " +
          s"(CAST($rrfK AS BIGINT) + _rk_)")).as("fused_micro"))
      .withColumn("fused_rank", row_number().over(wQ))
      .where(col("fused_rank") <= k)
  }
}
