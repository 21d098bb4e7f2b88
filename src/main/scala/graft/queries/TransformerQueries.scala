package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType}
import graft.Tables
import graft.operators.{Transformers => T, Tuning}

/** Driver-visible queries for the ML-style transformer tier (SURVEY §2.8)
  * and tuning ops — oracle SQL wherever DuckDB can mirror the computation,
  * rows-only for vector-typed / hash-seeded outputs. */
object TransformerQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ArrayHasher over document tokens. poly=true hashes buckets with the
    // SQL-expressible polyHash64, so DuckDB replays the exact bucket
    // assignment and the nnz projection is hash-gated (the murmur default
    // keeps reference parity; bucketing quality is equivalent).
    "tr01_hashed_tf" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("tokens"))
        .select(col("doc_id"), T.arrayHasher(2048, poly = true)(col("tokens")).as("tf"))
        .select(col("doc_id"),
          udf((v: org.apache.spark.ml.linalg.Vector) => v.numNonzeros)
            .apply(col("tf")).as("nnz"))
        .orderBy("doc_id")
    }),

    // Word2VecApplier with a deterministic 1-dim lexicon (token -> [len]):
    // doc vector = [sum of known-token lengths] — exactly mirrorable in SQL
    "tr02_word2vec_apply" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("tokens"))
      val lexicon = docs.select(explode(col("tokens")).as("token")).distinct()
        .select(col("token"), array(length(col("token")).cast("double")).as("vector"))
      // the driver's gate can't sort/hash array columns and hashes decimals
      // scale-sensitively — surface the 1-dim vector as a scalar DOUBLE and
      // the ratio as DOUBLE (full-vector assertions live in TransformersSpec)
      T.applyWordVectors(docs, "tokens", lexicon)
        .select(col("doc_id"),
          element_at(col("doc_vector"), 1).cast("double").as("first_dim"),
          col("hit_ratio").cast("double").as("hit_ratio"))
        .orderBy("doc_id")
    }),

    // RankSplit: customers bucketed by total spend quartile (oracle-able;
    // decimal metric keeps the aggregation order-independent)
    "tr03_rank_split" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .withColumn("price_dec", col("o_totalprice").cast(DecimalType(18, 2)))
      Tuning.rankSplit(o, Seq("o_custkey"), "price_dec", "sum", 4)
        .groupBy(col("o_custkey"), col("fold").cast(IntegerType).as("fold"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_custkey")
    }),

    // Fold assignment via the engine-portable md5 split: the exact per-row
    // fold (not just counts) is replayable by any engine, so the train/eval
    // split of a 100 TB corpus can be audited outside Spark. Hash-gated.
    "tr04_fold_counts" -> ((s, d) => {
      Tuning.assignFoldsStable(Tables.orders(s, d), 5,
        keyCols = Seq("o_orderkey"), seed = 42L)
        .groupBy(col("fold").cast(IntegerType).as("fold"))
        .agg(count(lit(1)).as("n"))
        .orderBy("fold")
    }),

    // SentenceBuilder over re-punctuated document text (rows-only)
    "tr05_sentences" -> ((s, d) => {
      val punct = Tables.documents(s, d).select(col("doc_id"),
        // word salad has no punctuation: insert a period every 12 words so
        // the splitter has real work
        regexp_replace(col("text"), "((\\S+\\s+){11}\\S+)\\s+", "$1. ").as("text"))
      T.buildSentences(punct, "text", minPhraseSize = 2, maxPhraseSize = 30)
        .select("doc_id", "phraseId", "phrase")
        .orderBy("doc_id", "phraseId")
    }),

    // Threshold optimizer over events (purchase detection from value);
    // emits the metrics row (driver sweep over a 500-bin histogram)
    "tr06_threshold_optimizer" -> ((s, d) => {
      val ev = Tables.events(s, d).select(
        (col("value") / lit(100.0)).as("score"),
        when(col("event_type") === "purchase", 1.0).otherwise(0.0).as("label"))
      val m = Tuning.optimizeThreshold(ev, "score", "label", "f1", bins = 200)
      val spark = s
      import spark.implicits._
      Seq((m.threshold, m.tp, m.fp, m.tn, m.fn, m.precision, m.recall, m.f1, m.auc))
        .toDF("threshold", "tp", "fp", "tn", "fn", "precision", "recall", "f1", "auc")
    }),

    // GroupBy policy transformer routed end-to-end (oracle-able: mirrors q20)
    "tr07_groupby_policies" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_quantity"),
        col("l_tax").cast(DecimalType(18, 2)).as("tax_dec"),
        col("l_returnflag"), col("l_linenumber"))
      T.groupByPolicies(li, Seq("l_orderkey"), Seq(
        "l_quantity" -> T.PMax,
        "tax_dec" -> T.PSum,
        "l_returnflag" -> T.PFirst(Seq("l_linenumber"))))
        .withColumn("tax_dec", col("tax_dec").cast("double"))
        .orderBy("l_orderkey")
    }),

    // Lemmatiser: plural-ish forms folded via a derived lexicon (oracle-able)
    "tr08_lemmatize" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("tokens"))
      // derived lexicon: tokens ending in 's' lemmatize to their stem
      val lexicon = docs.select(explode(col("tokens")).as("w")).distinct()
        .where(col("w").endsWith("s") && length(col("w")) > 3)
        .select(col("w").as("simplified"),
          expr("substring(w, 1, length(w) - 1)").as("lemma"))
      T.lemmatize(docs, "tokens", lexicon)
        .select(col("doc_id"), array_join(col("lemmas"), " ").as("lemmatized"))
        .orderBy("doc_id")
    }),

    // Embedding text-format round trip (the reference's `word v1 v2 ...`
    // vectors-source format, Word2VecApplier.scala:94-98): a deterministic
    // 2-dim lexicon (token -> [len, 2*len]) is written as text lines, read
    // back through the distributed EmbeddingText scan, and applied — so the
    // whole write→parse→join path is hash-gated.
    "tr09_text_embeddings" -> ((s, d) => {
      val dir = graft.sources.Scratch.dir(s, "embtxt", d)
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("tokens"))
      val lexicon = docs.select(explode(col("tokens")).as("token")).distinct()
        .select(col("token"), array(
          length(col("token")).cast("double"),
          (length(col("token")) * 2).cast("double")).as("vector"))
      graft.sources.EmbeddingText.write(lexicon, "token", "vector", dir)
      T.applyWordVectors(docs, "tokens", graft.sources.EmbeddingText.read(s, dir))
        .select(col("doc_id"),
          element_at(col("doc_vector"), 1).cast("double").as("dim1"),
          element_at(col("doc_vector"), 2).cast("double").as("dim2"),
          col("hit_ratio").cast("double").as("hit_ratio"))
        .orderBy("doc_id")
    }),

    // CSV scan with a non-default separator (the reference reads its track
    // config via option("sep",";"), twitter/Execute.scala:30): part
    // round-trips through a ';'-separated CSV — `tagged` embeds the
    // separator itself so the writer's quoting and the reader's unquoting
    // are both exercised. The oracle reads the original parquet, so the
    // hash gate proves the round trip lossless.
    "tr10_csv_scan" -> ((s, d) => {
      val dir = graft.sources.Scratch.dir(s, "csv", d)
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_name"), col("p_type"),
          concat_ws(";", col("p_brand"), col("p_type")).as("tagged"))
        .write.mode("overwrite").option("sep", ";").option("header", "true")
        .csv(dir)
      s.read.option("sep", ";").option("header", "true")
        .schema("p_partkey INT, p_name STRING, p_type STRING, tagged STRING")
        .csv(dir)
        .orderBy("p_partkey")
    }),

    // ---- TweetCleaner (oracle-gated via constructed tweets) ----------------
    // documents text is pure [a-z0-9 ], so a tweet synthesized around it has
    // exactly one URL, one mention, and one emoticon — the expected output
    // is writable in closed form, gating the whole regex/replace chain
    "tw01_tweet_clean" -> ((s, d) => {
      val cleanUdf = udf((t: String) => graft.functions.TextKernels.cleanTweet(t))
      Tables.documents(s, d)
        .select(col("doc_id"), concat(
          lit("see https://x.io/p"), col("doc_id"),
          lit(" cc @user"), pmod(col("doc_id"), lit(10)),
          when(pmod(col("doc_id"), lit(2)) === 0, lit(" :) "))
            .otherwise(lit(" :( ")),
          substring(col("text"), 1, 20)).as("tweet"))
        .select(col("doc_id"), cleanUdf(col("tweet")).as("cleaned"))
        .orderBy("doc_id")
    }),

    // ---- URL scrub preserving offsets (oracle-gated) -----------------------
    // replacement must be EXACTLY as long as the URL so every other char
    // keeps its offset; the oracle rebuilds the expected string with
    // repeat(' ', len(url)) and the gate also hashes the total length
    "ur01_url_scrub" -> ((s, d) => {
      val scrubUdf = udf((t: String) =>
        graft.functions.TextKernels.scrubUrlsPreserveOffsets(t))
      Tables.documents(s, d)
        .select(col("doc_id"), concat(
          lit("a https://ex.com/p"), col("doc_id"), lit(" z "),
          substring(col("text"), 1, 10)).as("raw"))
        .select(col("doc_id"), scrubUdf(col("raw")).as("scrubbed"),
          length(col("raw")).as("raw_len"))
        .orderBy("doc_id")
    }),

    // ---- AddId sequential (oracle-gated) -----------------------------------
    "id01_add_id" -> ((s, d) => {
      T.addIdSequential(
        Tables.customer(s, d).select("c_custkey", "c_name"), "c_custkey")
        .select(col("c_custkey"), col("id"))
        .orderBy("c_custkey")
    }),

    // ---- Checkpoint with illegal parquet column chars (oracle-gated) -------
    // aliases carry every escaped char class (space, parens, =, comma);
    // the checkpoint write+read must round-trip names AND values untouched
    "cp01_checkpoint_roundtrip" -> ((s, d) => {
      val agg = Tables.orders(s, d)
        .groupBy(col("o_orderstatus").as("status"))
        .agg(count("*").as("n orders"),
          sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double").as("total(price)=sum,full"))
      val dir = graft.sources.Scratch.dir(s, "checkpoint", s"cp01_$d")
      graft.sources.Checkpoint.checkpoint(agg, dir)
        .orderBy("status")
    }),

    // ---- simplifyText accent fold (oracle-gated via constructed input) -----
    // the constructed prefix exercises NFD mark-stripping (è û é), the
    // three explicit ligature expansions (Æ ß œ), and lowercasing; the
    // expected output is closed-form
    "sv01_simplify_text" -> ((s, d) => {
      val simplifyUdf = udf((t: String) => graft.functions.TextKernels.simplify(t))
      Tables.documents(s, d)
        .select(col("doc_id"), concat(lit("Crème Brûlée ÆON Straße œuf "),
          substring(col("text"), 1, 10)).as("raw"))
        .select(col("doc_id"), simplifyUdf(col("raw")).as("simplified"))
        .orderBy("doc_id")
    }),

    // ---- RawPrediction2Score atan squash (oracle-gated) --------------------
    "rs01_raw_to_score" -> ((s, d) => {
      Tuning.rawToScore(
        Tables.supplier(s, d).select(col("s_suppkey"),
          (col("s_acctbal").cast("double") / 1000.0).as("raw")), "raw")
        .select(col("s_suppkey"), round(col("score"), 6).as("score_r"))
        .orderBy("s_suppkey")
    }),

    // ---- Tag2Vector (oracle-gated: dict order + active indices) ------------
    // dictionary = tags by (freq desc, tag asc) capped at topClasses; the
    // sparse indicator vector is surfaced as its sorted active-index CSV
    // (the driver gate can't hash ml vectors)
    "tv01_tag2vector" -> ((s, d) => {
      val parts = Tables.part(s, d)
        .select(col("p_partkey"), split(col("p_type"), " ").as("tags"))
      val model = T.fitTag2Vector(parts, "tags", minFreq = 1, topClasses = 10)
      val idxUdf = udf((v: org.apache.spark.ml.linalg.Vector) =>
        v.toSparse.indices.mkString(","))
      model.transform(parts, "tags", "vec")
        .select(col("p_partkey"), idxUdf(col("vec")).as("active_idx"))
        .orderBy("p_partkey")
    }),

    // ---- Model/Step pipeline DSL end-to-end (oracle-gated) -----------------
    // a 3-step pipeline: formula filter -> named-input join with Step
    // shaping (select) -> aggregation; gates the step fold, named DFs, and
    // post-op column shaping against one SQL statement
    "md01_model_pipeline" -> ((s, d) => {
      import graft.pipeline.{Model, Step}
      val m = Model("demo", "md01")
        .step("filter", df => df.where(col("l_quantity") > 45))
        .step(Step("join_orders",
          (df, named) => df.join(named("orders"),
            col("l_orderkey") === col("o_orderkey")),
          select = Seq("l_orderkey", "l_quantity", "o_orderstatus")))
        .step("agg", df => df.groupBy("o_orderstatus")
          .agg(count("*").as("n_items"),
            sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
              .cast("double").as("qty")))
      m.run(Tables.lineitem(s, d),
          Map("orders" -> Tables.orders(s, d))).df
        .orderBy("o_orderstatus")
    }),

    // ---- Model run-log JSON sink (reference mllib/Model.scala:142-164):
    // one appended row per run, partitioned by (modelGroup, project,
    // model). Three runs across two groups land in the hive layout; the
    // gate reads the log BACK through the partition dirs and projects the
    // deterministic columns (identity, step roster, data-derived metric
    // counts) — the oracle recomputes those counts from the tables, so a
    // dropped row, a mis-bucketed partition, or a mangled metric all
    // hash-mismatch. Durations stay in the artifact but out of the gate.
    "md02_run_log" -> ((s, d) => {
      import graft.pipeline.Model
      val slug = d.replaceAll("[^A-Za-z0-9]", "_")
      val logPath = s"/tmp/graft_runlog/$slug"
      // the sink is append-mode by contract (one row per run), so the
      // gate clears its own dir for a deterministic replay
      val hPath = new org.apache.hadoop.fs.Path(logPath)
      hPath.getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(hPath, true)
      def runOne(grp: String, proj: String, mdl: String, minQty: Int): Unit = {
        val m = Model(proj, mdl, group = grp)
          .step("filter", df => df.where(col("l_quantity") > minQty))
          .step("agg", df => df.groupBy("l_returnflag")
            .agg(count(lit(1)).as("n")))
        val res = m.run(Tables.lineitem(s, d))
        val kept = res.df.agg(sum(col("n"))).head().getLong(0)
        m.writeRunLog(logPath, res, metrics = Map(
          "rows_out" -> res.df.count().toDouble,
          "rows_kept" -> kept.toDouble))
      }
      runOne("expA", "proj1", "m1", 45)
      runOne("expA", "proj1", "m2", 48)
      runOne("expB", "proj2", "m3", 30)
      s.read.json(logPath)
        // on-disk partition column is the reference's camelCase
        // modelGroup; the gate aliases to snake_case for the oracle
        .select(col("modelGroup").as("model_group"), col("project"), col("model"),
          col("n_steps").cast("long").as("n_steps"), col("step_names"),
          col("rows_out").cast("double").as("rows_out"),
          col("rows_kept").cast("double").as("rows_kept"))
        .orderBy("model_group", "project", "model")
    })
  )

  val oracleSql: Map[String, String] = Map(
    // constructed tweet: url -> _link_, mention -> _mention_, emoticon by
    // parity; everything else passes through the split/join untouched
    // EXCEPT trailing spaces — Java's split(" ") drops trailing empty
    // tokens, so the rejoin rtrims (replayed here)
    "tw01_tweet_clean" ->
      """SELECT doc_id,
        | rtrim('see _link_ cc _mention_ ' ||
        |   CASE WHEN doc_id % 2 = 0 THEN '_positive_' ELSE '_negative_' END ||
        |   ' ' || substr(text, 1, 20), ' ') AS cleaned
        |FROM documents ORDER BY doc_id""".stripMargin,

    "ur01_url_scrub" ->
      """SELECT doc_id,
        | 'a ' || repeat(' ', 16 + length(CAST(doc_id AS VARCHAR))) ||
        |   ' z ' || substr(text, 1, 10) AS scrubbed,
        | CAST(21 + length(CAST(doc_id AS VARCHAR)) +
        |   length(substr(text, 1, 10)) AS INTEGER) AS raw_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "id01_add_id" ->
      """SELECT c_custkey,
        | CAST(row_number() OVER (ORDER BY c_custkey) - 1 AS BIGINT) AS id
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "cp01_checkpoint_roundtrip" ->
      """SELECT o_orderstatus AS status,
        | count(*) AS "n orders",
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |   AS "total(price)=sum,full"
        |FROM orders GROUP BY o_orderstatus ORDER BY status""".stripMargin,

    "sv01_simplify_text" ->
      """SELECT doc_id,
        | 'creme brulee aeon strasse oeuf ' || substr(text, 1, 10) AS simplified
        |FROM documents ORDER BY doc_id""".stripMargin,

    "rs01_raw_to_score" ->
      """SELECT s_suppkey,
        | round(atan(CAST(s_acctbal AS DOUBLE) / 1000.0) / pi() + 0.5, 6)
        |   AS score_r
        |FROM supplier ORDER BY s_suppkey""".stripMargin,

    // dict replay: row_number over (freq desc, tag asc) then LIMIT
    // topClasses (window evaluates before LIMIT, same ordering); active
    // indices = sorted distinct dict hits per part
    "tv01_tag2vector" ->
      """WITH tg AS (
        |  SELECT p_partkey, unnest(string_split(p_type, ' ')) AS tag FROM part),
        |freq AS (
        |  SELECT lower(trim(tag)) AS tag, count(*) AS n FROM tg GROUP BY 1),
        |dict AS (
        |  SELECT tag, CAST(row_number() OVER (ORDER BY n DESC, tag) - 1 AS INTEGER) AS idx
        |  FROM freq ORDER BY n DESC, tag LIMIT 10),
        |px AS (
        |  SELECT t.p_partkey, d.idx FROM tg t
        |  JOIN dict d ON lower(trim(t.tag)) = d.tag),
        |agg AS (
        |  SELECT p_partkey,
        |    array_to_string(list_sort(list_distinct(list(idx))), ',') AS active_idx
        |  FROM px GROUP BY p_partkey)
        |SELECT p.p_partkey, coalesce(a.active_idx, '') AS active_idx
        |FROM part p LEFT JOIN agg a USING (p_partkey)
        |ORDER BY p.p_partkey""".stripMargin,

    "md01_model_pipeline" ->
      """SELECT o_orderstatus, count(*) AS n_items,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_quantity > 45
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // replays the three logged runs from the tables themselves: the row
    // counts the Spark side logged as metrics must equal a fresh count at
    // each run's threshold; identity/roster columns are the run literals
    "md02_run_log" ->
      """WITH m AS (
        |  SELECT 'expA' AS model_group, 'proj1' AS project, 'm1' AS model,
        |         45 AS thr
        |  UNION ALL SELECT 'expA', 'proj1', 'm2', 48
        |  UNION ALL SELECT 'expB', 'proj2', 'm3', 30)
        |SELECT model_group, project, model,
        |  CAST(2 AS BIGINT) AS n_steps,
        |  'filter,agg' AS step_names,
        |  (SELECT CAST(count(DISTINCT l_returnflag) AS DOUBLE)
        |     FROM lineitem WHERE l_quantity > thr) AS rows_out,
        |  (SELECT CAST(count(*) AS DOUBLE)
        |     FROM lineitem WHERE l_quantity > thr) AS rows_kept
        |FROM m ORDER BY model_group, project, model""".stripMargin,

    // nnz = distinct polyHash64Mixed(token) mod 2048 buckets. UHUGEINT poly
    // fold + splitmix64 finalizer (three list_transform stages); the
    // unsigned % matches the JVM's Long.remainderUnsigned.
    "tr01_hashed_tf" ->
      """WITH t1 AS (
        |  SELECT doc_id, list_transform(string_split(text, ' '), t ->
        |    list_reduce(list_prepend(CAST(7 AS UHUGEINT),
        |      [CAST(unicode(c) AS UHUGEINT) FOR c IN string_split(t, '')]),
        |      (a, x) -> (31 * a + x) % CAST(18446744073709551616 AS UHUGEINT))) AS hs
        |  FROM documents),
        |t2 AS (
        |  SELECT doc_id, list_transform(list_transform(list_transform(hs,
        |      h -> (xor(h, h >> 30) * CAST(13787848793156543929 AS UHUGEINT))
        |           % CAST(18446744073709551616 AS UHUGEINT)),
        |      h -> (xor(h, h >> 27) * CAST(10723151780598845931 AS UHUGEINT))
        |           % CAST(18446744073709551616 AS UHUGEINT)),
        |      h -> xor(h, h >> 31)) AS hs
        |  FROM t1)
        |SELECT doc_id,
        | CAST(len(list_distinct(list_transform(hs,
        |   h -> CAST(h % 2048 AS BIGINT)))) AS INTEGER) AS nnz
        |FROM t2 ORDER BY doc_id""".stripMargin,

    "tr04_fold_counts" ->
      """SELECT fold, count(*) AS n FROM (
        |  SELECT CAST(CAST(('0x' || substr(
        |           md5(CAST(o_orderkey AS VARCHAR) || '|' || '42'), 1, 15))
        |         AS BIGINT) % 5 AS INTEGER) AS fold
        |  FROM orders) t
        |GROUP BY fold ORDER BY fold""".stripMargin,

    "tr02_word2vec_apply" ->
      """SELECT doc_id,
        | CAST(list_sum(list_transform(string_split(text, ' '), w -> length(w))) AS DOUBLE) AS first_dim,
        | CAST(1.0 AS DOUBLE) AS hit_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,

    "tr03_rank_split" ->
      """WITH spend AS (
        |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS m,
        |         count(*) AS n_orders
        |  FROM orders GROUP BY o_custkey)
        |SELECT o_custkey,
        |       CAST(ntile(4) OVER (ORDER BY m, o_custkey) - 1 AS INTEGER) AS fold,
        |       n_orders
        |FROM spend ORDER BY o_custkey""".stripMargin,

    // sentence splitting mirrored: the injected ". " every 12 words keeps
    // every phrase under maxPhraseSize=30, so the soft-separator branch is
    // provably dead on this data and the oracle mirrors hard splits + the
    // min-2-token filter only. phraseId = position after filtering.
    "tr05_sentences" ->
      """WITH hard AS (
        |  SELECT doc_id,
        |    list_filter(list_transform(
        |      string_split_regex(
        |        regexp_replace(text, '((\S+\s+){11}\S+)\s+', '\1. ', 'g'),
        |        '[.!?\n]'),
        |      s -> trim(s)), s -> s <> '') AS hp
        |  FROM documents),
        |phr AS (
        |  SELECT doc_id,
        |    list_filter(hp, p -> len(string_split_regex(p, '\s+')) >= 2) AS ps
        |  FROM hard)
        |SELECT doc_id,
        |       CAST(unnest(range(0, len(ps))) AS INTEGER) AS phraseId,
        |       unnest(ps) AS phrase
        |FROM phr ORDER BY doc_id, phraseId""".stripMargin,

    // full mirror of the binned threshold sweep: 200-bin histogram,
    // candidate metrics per threshold, f1-argmax (ties -> lowest bin),
    // trapezoid AUC summed in the same bin-descending fold order as the
    // Scala implementation (list_reduce) so every double is bit-identical
    "tr06_threshold_optimizer" ->
      """WITH ev AS (
        |  SELECT least(greatest(value / 100.0, 0.0), 1.0) AS s,
        |         CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
        |  FROM events),
        |hist AS (
        |  SELECT CAST(least(floor(s * 200), 199) AS BIGINT) AS bin,
        |         CAST(sum(y) AS BIGINT) AS pos, count(*) AS n
        |  FROM ev GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(pos) AS BIGINT) AS totalpos,
        |         CAST(sum(n) - sum(pos) AS BIGINT) AS totalneg
        |  FROM hist),
        |cand AS (
        |  SELECT b.b AS bin,
        |         CAST(COALESCE(sum(h.pos) FILTER (WHERE h.bin >= b.b), 0) AS BIGINT) AS tp,
        |         CAST(COALESCE(sum(h.n - h.pos) FILTER (WHERE h.bin >= b.b), 0) AS BIGINT) AS fp
        |  FROM range(0, 201) b(b) LEFT JOIN hist h ON true
        |  GROUP BY b.b),
        |m AS (
        |  SELECT c.bin, c.tp, c.fp, t.totalneg - c.fp AS tn, t.totalpos - c.tp AS fn,
        |         CASE WHEN c.tp + c.fp = 0 THEN 0.0
        |              ELSE CAST(c.tp AS DOUBLE) / (c.tp + c.fp) END AS p,
        |         CASE WHEN t.totalpos = 0 THEN 0.0
        |              ELSE CAST(c.tp AS DOUBLE) / t.totalpos END AS r,
        |         CASE WHEN t.totalneg = 0 THEN 0.0
        |              ELSE CAST(c.fp AS DOUBLE) / t.totalneg END AS fpr
        |  FROM cand c CROSS JOIN tot t),
        |m2 AS (
        |  SELECT *, CASE WHEN p + r = 0 THEN 0.0 ELSE 2 * p * r / (p + r) END AS f1
        |  FROM m),
        |aucv AS (
        |  SELECT list_reduce(
        |           list_prepend(CAST(0 AS DOUBLE), list(term ORDER BY bin DESC)),
        |           (a, x) -> a + x) AS auc
        |  FROM (
        |    SELECT bin,
        |           (fpr - lag(fpr) OVER w) * (lag(r) OVER w + r) / 2 AS term
        |    FROM m2 WINDOW w AS (ORDER BY bin DESC)) t
        |  WHERE term IS NOT NULL),
        |best AS (SELECT * FROM m2 ORDER BY f1 DESC, bin ASC LIMIT 1)
        |SELECT CAST(best.bin AS DOUBLE) / 200 AS threshold,
        |       best.tp AS tp, best.fp AS fp,
        |       CAST(best.tn AS BIGINT) AS tn, CAST(best.fn AS BIGINT) AS fn,
        |       best.p AS "precision", best.r AS recall, best.f1 AS f1,
        |       aucv.auc AS auc
        |FROM best CROSS JOIN aucv""".stripMargin,

    "tr07_groupby_policies" ->
      """SELECT l_orderkey,
        | max(l_quantity) AS l_quantity,
        | CAST(sum(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS tax_dec,
        | substr(min(concat(lpad(CAST(l_linenumber AS VARCHAR), 10, '0'), l_returnflag)), 11, 100) AS l_returnflag
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "tr08_lemmatize" ->
      """SELECT doc_id,
        | array_to_string(list_transform(string_split(text, ' '),
        |   w -> CASE WHEN w LIKE '%s' AND length(w) > 3
        |             THEN substring(w, 1, length(w) - 1) ELSE w END), ' ') AS lemmatized
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the text-format lexicon maps every token to [len, 2*len], all tokens
    // hit, and integer-valued doubles sum exactly in any order
    "tr09_text_embeddings" ->
      """SELECT doc_id,
        | CAST(list_sum(list_transform(string_split(text, ' '),
        |   w -> length(w))) AS DOUBLE) AS dim1,
        | CAST(list_sum(list_transform(string_split(text, ' '),
        |   w -> 2 * length(w))) AS DOUBLE) AS dim2,
        | CAST(1.0 AS DOUBLE) AS hit_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,

    // oracle reads the original parquet — equality proves the ';'-separated
    // CSV round trip (incl. the quoted separator-bearing column) lossless
    "tr10_csv_scan" ->
      """SELECT p_partkey, p_name, p_type, p_brand || ';' || p_type AS tagged
        |FROM part ORDER BY p_partkey""".stripMargin
  )
}
