package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.Tables
import graft.operators.{Analytics, Retrieval}

/** Behavioral-analytics + retrieval tier (late r7): funnel, retention
  * cohorts, interval merge, exact group quantiles, histogram, BM25 top-k,
  * and exact-sum correlation/regression — each hash-gated against a
  * DuckDB replay of the same integer/decimal/fixed-IEEE program.
  */
object AnalyticsQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- funnel: signup → view → purchase, per-step completer counts ----
    "fu01_funnel_steps" -> ((s, d) => {
      val ft = Analytics.funnelTimes(Tables.events(s, d),
        "user_id", "ts", "event_type", Seq("signup", "view", "purchase"))
      ft.agg(count(col("t1")).as("c1"), count(col("t2")).as("c2"),
          count(col("t3")).as("c3"))
        .selectExpr("""stack(3, 1, 'signup', c1, 2, 'view', c2,
                       3, 'purchase', c3) as (step_idx, step_name, n_users)""")
        .orderBy("step_idx")
    }),

    // ---- retention: weekly cohorts over the event log -------------------
    "rt01_retention_cohorts" -> ((s, d) =>
      Analytics.retentionCohorts(Tables.events(s, d), "user_id", "ts",
          periodSeconds = 604800L)
        .orderBy("cohort_period", "period_offset")),

    // ---- interval merge: coalesced purchase-anchored windows ------------
    // (variable lengths so overlap/touch/gap cases all occur)
    "im01_merge_intervals" -> ((s, d) => {
      val iv = Tables.events(s, d).where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts").as("s_ts"),
          expr("timestampadd(SECOND, cast(60 + pmod(event_id, 7200) as int), ts)")
            .as("e_ts"))
      Analytics.mergeIntervals(iv, "user_id", "s_ts", "e_ts", "event_id")
        .orderBy("user_id", "merged_seq")
    }),

    // ---- exact per-group percentiles (integer rank selection) -----------
    "qt01_group_quantiles" -> ((s, d) =>
      Analytics.groupQuantiles(Tables.lineitem(s, d),
          "l_returnflag", "l_quantity", Seq(25, 50, 75, 90))
        .select(col("l_returnflag"), col("pct"),
          col("l_quantity").cast("double").as("value"))
        .orderBy("l_returnflag", "pct")),

    // ---- fixed-bin histogram over order totals --------------------------
    "hg01_value_histogram" -> ((s, d) =>
      Analytics.histogram(Tables.orders(s, d), "o_totalprice",
          lo = 0.0, hi = 600000.0, nBins = 20)
        .orderBy("bin")),

    // ---- BM25 lexical top-k (1e-6 fixed-point scores) -------------------
    "bm01_bm25_topk" -> ((s, d) => {
      import s.implicits._
      val qs = Seq(
        (1L, "spark"), (1L, "join"), (1L, "window"),
        (2L, "hash"), (2L, "table"), (2L, "scan"),
        (3L, "customer"), (3L, "order"), (3L, "value"))
        .toDF("query_id", "term")
      Retrieval.bm25TopK(Tables.documents(s, d), "doc_id", "text", qs, k = 5)
        .select(col("query_id"), col("doc_id"),
          col("rank").cast(IntegerType).as("rank"), col("score_scaled"))
        .orderBy("query_id", "rank")
    }),

    // ---- exact-sum Pearson corr + least-squares line --------------------
    // small-magnitude columns (quantity, discount) keep every decimal sum
    // under 2^53 so the final double casts are exact — see Analytics doc
    "lr01_linear_fit" -> ((s, d) =>
      Analytics.linearFit(Tables.lineitem(s, d),
          "l_returnflag", "l_quantity", "l_discount")
        .orderBy("l_returnflag"))
  )

  val oracleSql: Map[String, String] = Map(
    "fu01_funnel_steps" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (
        |  SELECT s1.user_id, min(CASE WHEN e.ts > s1.t1 THEN e.ts END) AS t2
        |  FROM s1 LEFT JOIN events e
        |    ON e.user_id = s1.user_id AND e.event_type = 'view'
        |  GROUP BY s1.user_id),
        |s3 AS (
        |  SELECT s2.user_id, min(CASE WHEN e.ts > s2.t2 THEN e.ts END) AS t3
        |  FROM s2 LEFT JOIN events e
        |    ON e.user_id = s2.user_id AND e.event_type = 'purchase'
        |  GROUP BY s2.user_id)
        |SELECT * FROM (
        |  SELECT 1 AS step_idx, 'signup' AS step_name, count(t1) AS n_users
        |  FROM s1
        |  UNION ALL SELECT 2, 'view', count(t2) FROM s2
        |  UNION ALL SELECT 3, 'purchase', count(t3) FROM s3) t
        |ORDER BY step_idx""".stripMargin,

    "rt01_retention_cohorts" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS p
        |  FROM events),
        |coh AS (
        |  SELECT user_id, min(p) AS cohort_period FROM act GROUP BY user_id)
        |SELECT cohort_period, p - cohort_period AS period_offset,
        |  count(*) AS n_users
        |FROM act JOIN coh USING (user_id)
        |GROUP BY cohort_period, period_offset
        |ORDER BY cohort_period, period_offset""".stripMargin,

    "im01_merge_intervals" ->
      """WITH iv AS (
        |  SELECT user_id, event_id, ts AS s_ts,
        |    ts + to_seconds(CAST(60 + event_id % 7200 AS BIGINT)) AS e_ts
        |  FROM events WHERE event_type = 'purchase'),
        |x AS (
        |  SELECT user_id, event_id, s_ts, e_ts,
        |    max(e_ts) OVER (PARTITION BY user_id ORDER BY s_ts, e_ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM iv),
        |g AS (
        |  SELECT user_id, s_ts, e_ts,
        |    sum(CASE WHEN pm IS NULL OR s_ts > pm THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY s_ts, e_ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM x),
        |m AS (
        |  SELECT user_id, grp, min(s_ts) AS m_start, max(e_ts) AS m_end,
        |    count(*) AS n_intervals
        |  FROM g GROUP BY user_id, grp)
        |SELECT user_id,
        |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY m_start)
        |       AS INTEGER) AS merged_seq,
        |  m_start, m_end, n_intervals
        |FROM m ORDER BY user_id, merged_seq""".stripMargin,

    "qt01_group_quantiles" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_quantity,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_quantity) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT l_returnflag, CAST(p AS INTEGER) AS pct,
        |  CAST(l_quantity AS DOUBLE) AS value
        |FROM r JOIN (VALUES (25), (50), (75), (90)) t(p)
        |  ON rn = 1 + (p * (n - 1)) // 100
        |ORDER BY l_returnflag, pct""".stripMargin,

    "hg01_value_histogram" ->
      """WITH b AS (
        |  SELECT least(19, greatest(0, CAST(floor(
        |    (o_totalprice - 0.0) / 600000.0 * 20) AS BIGINT))) AS bin
        |  FROM orders)
        |SELECT bin, 0.0 + bin * (600000.0 / 20) AS bin_lo,
        |  0.0 + (bin + 1) * (600000.0 / 20) AS bin_hi, count(*) AS n
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,

    // fixed-point BM25 replay: identical parenthesization everywhere a
    // double op occurs; per-term weights rounded to 1e-6 BEFORE the sum so
    // the aggregate is an order-free integer sum on both engines
    "bm01_bm25_topk" ->
      """WITH toks AS (
        |  SELECT doc_id, t AS term FROM (
        |    SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS t
        |    FROM documents) u
        |  WHERE t <> ''),
        |tf AS (SELECT doc_id, term, count(*) AS tf
        |       FROM toks GROUP BY doc_id, term),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |stats AS (
        |  SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
        |    CAST((SELECT sum(dl) FROM dl) AS DOUBLE)
        |      / CAST((SELECT count(*) FROM documents) AS DOUBLE) AS avgdl),
        |q(query_id, term) AS (VALUES
        |  (1, 'spark'), (1, 'join'), (1, 'window'),
        |  (2, 'hash'), (2, 'table'), (2, 'scan'),
        |  (3, 'customer'), (3, 'order'), (3, 'value')),
        |scored AS (
        |  SELECT q.query_id, tf.doc_id,
        |    CAST(round(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
        |         * ((tf * (1.0 + CAST(1.2 AS DOUBLE)))
        |            / (tf + CAST(1.2 AS DOUBLE)
        |               * (0.25 + 0.75 * dl / avgdl)))
        |         * 1000000) AS BIGINT) AS w
        |  FROM q JOIN dfreq USING (term) JOIN tf USING (term)
        |    JOIN dl USING (doc_id)
        |  CROSS JOIN stats),
        |agg AS (
        |  SELECT query_id, doc_id, CAST(sum(w) AS BIGINT) AS score_scaled
        |  FROM scored GROUP BY query_id, doc_id)
        |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, rank,
        |  score_scaled
        |FROM (
        |  SELECT query_id, doc_id, score_scaled,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY score_scaled DESC, doc_id) AS INTEGER) AS rank
        |  FROM agg) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // exact decimal moment sums, then one fixed double program per output
    // (div/sqrt are correctly-rounded IEEE ops → bit-identical replay)
    "lr01_linear_fit" ->
      """WITH sums AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
        |    sum(CAST(l_discount AS DECIMAL(18,2))) AS sy,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))
        |        * CAST(l_discount AS DECIMAL(18,2))) AS sxy,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))
        |        * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
        |    sum(CAST(l_discount AS DECIMAL(18,2))
        |        * CAST(l_discount AS DECIMAL(18,2))) AS syy
        |  FROM lineitem GROUP BY l_returnflag),
        |d AS (
        |  SELECT l_returnflag, n, sx, sy,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS dx,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS dy
        |  FROM sums)
        |SELECT l_returnflag, n,
        |  num / sqrt(dx * dy) AS corr_r,
        |  num / dx AS slope,
        |  (CAST(sy AS DOUBLE) - (num / dx) * CAST(sx AS DOUBLE))
        |    / CAST(n AS DOUBLE) AS intercept
        |FROM d ORDER BY l_returnflag""".stripMargin
  )
}
