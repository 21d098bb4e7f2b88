package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.FuzzyLookup
import graft.operators.FuzzyLookup.Options

/** Driver-visible queries for the fuzzy lookup join. fz01 is hash-gated on
  * MATCH IDENTITY (needle -> chosen p_partkey): with maxLevDistance=0 the
  * scoring is pure token-join + idf/sqrt(doclen), which DuckDB replays
  * exactly — only the float score itself is excluded from the compare.
  * fz02 (subspan strategy) stays rows-only; semantic parity is asserted by
  * FuzzyLookupSpec against the reference's own fixtures. */
object FuzzyQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Standard strategy: noisy part descriptions (brand + type) resolved
    // against the part catalog. tieBreakCol makes score ties resolve on
    // p_partkey (not the partition-dependent internal row id), which is
    // what lets the DuckDB oracle replay the chosen row.
    "fz01_fuzzy_part_lookup" -> ((s, d) => {
      val part = Tables.part(s, d)
      val catalog = part.select(
        col("p_partkey"),
        concat_ws(" ", col("p_brand"), col("p_type"), col("p_name")).as("part_text"))
      val needles = part.select(
        concat_ws(" ", col("p_brand"), col("p_type")).as("needle")).distinct()
      FuzzyLookup.lookup(needles, "needle", catalog, "part_text",
        Options(maxDfRatio = 0.5, tieBreakCol = Some("p_partkey")))
        .where(col("part_text").isNotNull)
        .select("needle", "p_partkey")
        .orderBy("needle", "p_partkey")
    }),

    // Structured-equality-filtered lookup (reference luceneLookup's
    // filter columns): the query text (a bare part TYPE) is ambiguous
    // across brands on purpose — the same type string scores against
    // every brand's parts — and the (q_brand = p_brand) filter key
    // restricts candidates BEFORE scoring, which is the semantics the
    // filter exists for. idf/doclen stay global (filter narrows the
    // token join, not the statistics), exactly what the oracle replays.
    "fz03_fuzzy_filtered_lookup" -> ((s, d) => {
      val part = Tables.part(s, d)
      val catalog = part.select(col("p_partkey"), col("p_brand"),
        concat_ws(" ", col("p_type"), col("p_name")).as("part_text"))
      val needles = part.select(col("p_brand").as("q_brand"),
        col("p_type").as("needle")).distinct()
      FuzzyLookup.lookup(needles, "needle", catalog, "part_text",
        Options(maxDfRatio = 0.5, tieBreakCol = Some("p_partkey"),
          filterCols = Seq("q_brand" -> "p_brand")))
        .where(col("part_text").isNotNull)
        .select(col("q_brand"), col("needle"), col("p_partkey"))
        .orderBy("q_brand", "needle", "p_partkey")
    }),

    // Multi-query lookup (reference luceneLookups' `{q}_res` columns):
    // TWO query columns on one left row resolve independently against
    // the same catalog in a single pass; the gate projects each struct
    // result's match identity to scalars (the gated-output rule — the
    // struct API stays for library callers). Needles with every token
    // df-pruned keep their row with a NULL match (the left-join
    // contract), which the oracle reproduces.
    "fz04_fuzzy_multi_lookup" -> ((s, d) => {
      val part = Tables.part(s, d)
      val catalog = part.select(
        col("p_partkey"),
        concat_ws(" ", col("p_brand"), col("p_type"), col("p_name")).as("part_text"))
      val pairs = part.select(
        concat_ws(" ", col("p_brand"), col("p_type")).as("n1"),
        array_join(slice(split(col("p_name"), " "), 1, 2), " ").as("n2"))
        .distinct()
      FuzzyLookup.lookupMulti(pairs, Seq("n1", "n2"), catalog, "part_text",
        Options(maxDfRatio = 0.5, tieBreakCol = Some("p_partkey")))
        .select(col("n1"), col("n2"),
          col("n1_res.p_partkey").as("r1_partkey"),
          col("n2_res.p_partkey").as("r2_partkey"))
        .orderBy("n1", "n2")
    }),

    // Array-query lookup (reference luceneLookup over an array column):
    // every element resolves independently and results come back as an
    // array ALIGNED WITH ELEMENT ORDER — the contract this gate pins by
    // projecting the per-element match keys through concat_ws (positions
    // preserved; an unmatched element renders '-' so alignment is
    // visible in the hash, per the gated-output scalar rule).
    "fz05_fuzzy_array_lookup" -> ((s, d) => {
      val part = Tables.part(s, d)
      val catalog = part.select(
        col("p_partkey"),
        concat_ws(" ", col("p_brand"), col("p_type"), col("p_name")).as("part_text"))
      val pairs = part.select(
        concat_ws(" ", col("p_brand"), col("p_type")).as("n1"),
        array_join(slice(split(col("p_name"), " "), 1, 2), " ").as("n2"))
        .distinct()
        .withColumn("qs", array(col("n1"), col("n2")))
      FuzzyLookup.lookupArray(pairs, "qs", catalog, "part_text",
        Options(maxDfRatio = 0.5, tieBreakCol = Some("p_partkey")))
        .select(col("n1"), col("n2"),
          concat_ws(",", expr(
            "transform(qs_res, x -> coalesce(cast(x.p_partkey as string), '-'))"))
            .as("match_keys"))
        .orderBy("n1", "n2")
    }),

    // Predict strategy (reference PredictStrategy): term weights play
    // the role of per-token model likelihoods — tokens under
    // minTokenLikehood drop, then only the ±2-position window around
    // the peak-weight token (≥ 0.75·peak) scores. The weights fixture
    // is a LITERAL map over the 16-word type vocabulary (syllable-2
    // words peak at 1.0, syllable-3 at 0.8 ride along, syllable-1 at
    // 0.3 fall under the 0.4 threshold), so the whole
    // threshold→peak-window→weighted-evidence chain replays in SQL.
    "fz06_fuzzy_predict_lookup" -> ((s, d) => {
      val part = Tables.part(s, d)
      val catalog = part.select(
        col("p_partkey"),
        concat_ws(" ", col("p_brand"), col("p_type"), col("p_name")).as("part_text"))
      val needles = part.select(col("p_type").as("needle")).distinct()
      val weights = Map(
        "standard" -> 0.3, "small" -> 0.3, "medium" -> 0.3,
        "large" -> 0.3, "economy" -> 0.3, "promo" -> 0.3,
        "anodized" -> 1.0, "burnished" -> 1.0, "plated" -> 1.0,
        "polished" -> 1.0, "brushed" -> 1.0,
        "tin" -> 0.8, "nickel" -> 0.8, "brass" -> 0.8,
        "steel" -> 0.8, "copper" -> 0.8)
      FuzzyLookup.lookup(needles, "needle", catalog, "part_text",
        Options(strategy = "predict", termWeights = weights,
          tieBreakCol = Some("p_partkey")))
        .where(col("part_text").isNotNull)
        .select("needle", "p_partkey")
        .orderBy("needle", "p_partkey")
    }),

    // Ngram strategy: locate short "titles" as subspans inside full document
    // texts (the reference's NgramStrategy use case). Match identity is
    // hash-gated: gap-clustering is lag/cumsum over query positions, which
    // DuckDB replays; only the float score and char spans are excluded.
    "fz02_fuzzy_subspan_titles" -> ((s, d) => {
      val docs = Tables.documents(s, d).where(col("doc_id") % 10 === 0)
      val titles = docs.where(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("title_id"),
          array_join(slice(split(col("text"), " "), 1, 4), " ").as("title"))
      FuzzyLookup.lookup(docs.select("doc_id", "text"), "text", titles, "title",
        Options(strategy = "ngram", nNgrams = 3, minScore = 0.5,
          tieBreakCol = Some("title_id")))
        .where(col("title").isNotNull)
        .select("doc_id", "title_id")
        .orderBy("doc_id")
    })
  )

  // Full replay of the exact-token scoring path: tokenize = lowercase +
  // [a-z0-9]+ runs (the texts are ASCII, so accent folding is identity),
  // idf = ln(1 + N/df) with the maxDfRatio=0.5 prune, doclen counted BEFORE
  // the prune (as the Spark side does), evidence summed once per query
  // position, score = raw/sqrt(doclen), ties broken on min p_partkey.
  // Candidates whose every token is pruned produce no row on either side.
  /** Shared fz04/fz05 replay program: the fz01 scoring recipe run once
    * per DISTINCT query string across BOTH query columns (a match is a
    * pure function of its text — the memoized-lookup contract), ending
    * at a `best` (query → top-1 partkey) map the two final selects
    * join back to the pair rows. */
  private val MultiLookupCte =
    """WITH cat AS (
      |  SELECT p_partkey,
      |         concat_ws(' ', p_brand, p_type, p_name) AS part_text
      |  FROM part),
      |pairs AS (
      |  SELECT DISTINCT concat_ws(' ', p_brand, p_type) AS n1,
      |         array_to_string(string_split(p_name, ' ')[1:2], ' ') AS n2
      |  FROM part),
      |rtok AS (
      |  SELECT p_partkey,
      |         unnest(regexp_extract_all(lower(part_text), '[a-z0-9]+')) AS tok
      |  FROM cat),
      |doclen AS (SELECT p_partkey, count(*) AS dl FROM rtok GROUP BY 1),
      |n AS (SELECT count(*) AS nd FROM cat),
      |idf AS (
      |  SELECT tok, ln(1 + CAST(nd AS DOUBLE) / df) AS idf
      |  FROM (SELECT tok, count(DISTINCT p_partkey) AS df
      |        FROM rtok GROUP BY 1), n
      |  WHERE CAST(df AS DOUBLE) / nd <= 0.5),
      |rdist AS (SELECT DISTINCT p_partkey, tok FROM rtok),
      |qs AS (
      |  SELECT DISTINCT q FROM (
      |    SELECT n1 AS q FROM pairs UNION SELECT n2 AS q FROM pairs)),
      |qt AS (
      |  SELECT q, generate_subscripts(toks, 1) AS qpos, unnest(toks) AS tok
      |  FROM (SELECT q, regexp_extract_all(lower(q), '[a-z0-9]+') AS toks
      |        FROM qs)),
      |ev AS (
      |  SELECT DISTINCT t.q, r.p_partkey, t.qpos, x.idf
      |  FROM qt t
      |  JOIN idf x ON x.tok = t.tok
      |  JOIN rdist r ON r.tok = t.tok),
      |scored AS (
      |  SELECT e.q, e.p_partkey,
      |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |           list(e.idf ORDER BY e.qpos)), (a, x) -> a + x)
      |           / sqrt(d.dl) AS score
      |  FROM ev e JOIN doclen d ON d.p_partkey = e.p_partkey
      |  GROUP BY e.q, e.p_partkey, d.dl),
      |best AS (
      |  SELECT q, p_partkey FROM (
      |    SELECT q, p_partkey,
      |           row_number() OVER (PARTITION BY q
      |                              ORDER BY score DESC, p_partkey) AS rn
      |    FROM scored) t
      |  WHERE rn = 1)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "fz01_fuzzy_part_lookup" ->
      """WITH cat AS (
        |  SELECT p_partkey,
        |         concat_ws(' ', p_brand, p_type, p_name) AS part_text
        |  FROM part),
        |needles AS (
        |  SELECT DISTINCT concat_ws(' ', p_brand, p_type) AS needle FROM part),
        |rtok AS (
        |  SELECT p_partkey,
        |         unnest(regexp_extract_all(lower(part_text), '[a-z0-9]+')) AS tok
        |  FROM cat),
        |doclen AS (SELECT p_partkey, count(*) AS dl FROM rtok GROUP BY 1),
        |n AS (SELECT count(*) AS nd FROM cat),
        |idf AS (
        |  SELECT tok, ln(1 + CAST(nd AS DOUBLE) / df) AS idf
        |  FROM (SELECT tok, count(DISTINCT p_partkey) AS df
        |        FROM rtok GROUP BY 1), n
        |  WHERE CAST(df AS DOUBLE) / nd <= 0.5),
        |qt AS (
        |  SELECT needle, generate_subscripts(toks, 1) AS qpos,
        |         unnest(toks) AS tok
        |  FROM (SELECT needle,
        |          regexp_extract_all(lower(needle), '[a-z0-9]+') AS toks
        |        FROM needles)),
        |ev AS (
        |  SELECT DISTINCT q.needle, r.p_partkey, q.qpos, x.idf
        |  FROM qt q
        |  JOIN idf x ON x.tok = q.tok
        |  JOIN (SELECT DISTINCT p_partkey, tok FROM rtok) r ON r.tok = q.tok),
        |scored AS (
        |  SELECT e.needle, e.p_partkey,
        |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list(e.idf ORDER BY e.qpos)), (a, x) -> a + x)
        |           / sqrt(d.dl) AS score
        |  FROM ev e JOIN doclen d ON d.p_partkey = e.p_partkey
        |  GROUP BY e.needle, e.p_partkey, d.dl)
        |SELECT needle, p_partkey FROM (
        |  SELECT needle, p_partkey,
        |         row_number() OVER (PARTITION BY needle
        |                            ORDER BY score DESC, p_partkey) AS rn
        |  FROM scored) t
        |WHERE rn = 1 ORDER BY needle, p_partkey""".stripMargin,

    // fz04 replay: fz01's scoring program run once per DISTINCT query
    // string of each column (a lookup depends only on its own text),
    // then both top-1 maps LEFT-joined back to the pair rows — rows
    // whose needle lost every token to the df prune stay with NULLs.
    // fz05 replays the SAME program with the two matches rendered as the
    // ordered element-key string (unmatched -> '-').
    "fz04_fuzzy_multi_lookup" -> (MultiLookupCte +
      """
        |SELECT p.n1, p.n2, b1.p_partkey AS r1_partkey,
        |       b2.p_partkey AS r2_partkey
        |FROM pairs p
        |LEFT JOIN best b1 ON b1.q = p.n1
        |LEFT JOIN best b2 ON b2.q = p.n2
        |ORDER BY p.n1, p.n2""".stripMargin),

    "fz05_fuzzy_array_lookup" -> (MultiLookupCte +
      """
        |SELECT p.n1, p.n2,
        |       concat_ws(',', coalesce(CAST(b1.p_partkey AS VARCHAR), '-'),
        |                 coalesce(CAST(b2.p_partkey AS VARCHAR), '-'))
        |         AS match_keys
        |FROM pairs p
        |LEFT JOIN best b1 ON b1.q = p.n1
        |LEFT JOIN best b2 ON b2.q = p.n2
        |ORDER BY p.n1, p.n2""".stripMargin),

    // fz06 replay: the predict chain in SQL — literal weights VALUES,
    // the 0.4 likelihood threshold, peak = max weight per needle with
    // peakpos = its FIRST position, the (≥ 0.75·peak, |Δpos| ≤ 2)
    // window, then weighted evidence (idf·tw) folded in position order;
    // no df prune (query tokens are the 16-word type vocabulary)
    "fz06_fuzzy_predict_lookup" ->
      """WITH cat AS (
        |  SELECT p_partkey,
        |         concat_ws(' ', p_brand, p_type, p_name) AS part_text
        |  FROM part),
        |needles AS (SELECT DISTINCT p_type AS needle FROM part),
        |w(tok, tw) AS (VALUES
        |  ('standard', 0.3), ('small', 0.3), ('medium', 0.3),
        |  ('large', 0.3), ('economy', 0.3), ('promo', 0.3),
        |  ('anodized', 1.0), ('burnished', 1.0), ('plated', 1.0),
        |  ('polished', 1.0), ('brushed', 1.0),
        |  ('tin', 0.8), ('nickel', 0.8), ('brass', 0.8),
        |  ('steel', 0.8), ('copper', 0.8)),
        |rtok AS (
        |  SELECT p_partkey,
        |         unnest(regexp_extract_all(lower(part_text), '[a-z0-9]+')) AS tok
        |  FROM cat),
        |doclen AS (SELECT p_partkey, count(*) AS dl FROM rtok GROUP BY 1),
        |n AS (SELECT count(*) AS nd FROM cat),
        |idf AS (
        |  SELECT tok, ln(1 + CAST(nd AS DOUBLE) / df) AS idf
        |  FROM (SELECT tok, count(DISTINCT p_partkey) AS df
        |        FROM rtok GROUP BY 1), n),
        |rdist AS (SELECT DISTINCT p_partkey, tok FROM rtok),
        |qt AS (
        |  SELECT needle, generate_subscripts(toks, 1) AS qpos,
        |         unnest(toks) AS tok
        |  FROM (SELECT needle,
        |          regexp_extract_all(lower(needle), '[a-z0-9]+') AS toks
        |        FROM needles)),
        |qw AS (
        |  SELECT q.needle, q.qpos, q.tok, w.tw
        |  FROM qt q JOIN w ON w.tok = q.tok
        |  WHERE w.tw >= 0.4),
        |pk AS (SELECT needle, max(tw) AS peak FROM qw GROUP BY 1),
        |pp AS (
        |  SELECT q.needle, min(q.qpos) AS peakpos
        |  FROM qw q JOIN pk ON pk.needle = q.needle AND q.tw = pk.peak
        |  GROUP BY 1),
        |kept AS (
        |  SELECT q.needle, q.qpos, q.tok, q.tw
        |  FROM qw q
        |  JOIN pk ON pk.needle = q.needle
        |  JOIN pp ON pp.needle = q.needle
        |  WHERE q.tw >= pk.peak * 0.75
        |    AND abs(q.qpos - pp.peakpos) <= 2),
        |ev AS (
        |  SELECT DISTINCT k.needle, r.p_partkey, k.qpos, x.idf * k.tw AS wgt
        |  FROM kept k
        |  JOIN idf x ON x.tok = k.tok
        |  JOIN rdist r ON r.tok = k.tok),
        |scored AS (
        |  SELECT e.needle, e.p_partkey,
        |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list(e.wgt ORDER BY e.qpos)), (a, x) -> a + x)
        |           / sqrt(d.dl) AS score
        |  FROM ev e JOIN doclen d ON d.p_partkey = e.p_partkey
        |  GROUP BY e.needle, e.p_partkey, d.dl)
        |SELECT needle, p_partkey FROM (
        |  SELECT needle, p_partkey,
        |         row_number() OVER (PARTITION BY needle
        |                            ORDER BY score DESC, p_partkey) AS rn
        |  FROM scored) t
        |WHERE rn = 1 ORDER BY needle, p_partkey""".stripMargin,

    // fz03 replay: fz01's scoring program with the p_brand equality key
    // added to the EVIDENCE join only — idf and doclen remain global
    // statistics (the filter narrows candidates, not the corpus), and
    // top-1 resolves per (q_brand, needle)
    "fz03_fuzzy_filtered_lookup" ->
      """WITH cat AS (
        |  SELECT p_partkey, p_brand,
        |         concat_ws(' ', p_type, p_name) AS part_text
        |  FROM part),
        |needles AS (
        |  SELECT DISTINCT p_brand AS q_brand, p_type AS needle FROM part),
        |rtok AS (
        |  SELECT p_partkey, p_brand,
        |         unnest(regexp_extract_all(lower(part_text), '[a-z0-9]+')) AS tok
        |  FROM cat),
        |doclen AS (SELECT p_partkey, count(*) AS dl FROM rtok GROUP BY 1),
        |n AS (SELECT count(*) AS nd FROM cat),
        |idf AS (
        |  SELECT tok, ln(1 + CAST(nd AS DOUBLE) / df) AS idf
        |  FROM (SELECT tok, count(DISTINCT p_partkey) AS df
        |        FROM rtok GROUP BY 1), n
        |  WHERE CAST(df AS DOUBLE) / nd <= 0.5),
        |qt AS (
        |  SELECT q_brand, needle, generate_subscripts(toks, 1) AS qpos,
        |         unnest(toks) AS tok
        |  FROM (SELECT q_brand, needle,
        |          regexp_extract_all(lower(needle), '[a-z0-9]+') AS toks
        |        FROM needles)),
        |ev AS (
        |  SELECT DISTINCT q.q_brand, q.needle, r.p_partkey, q.qpos, x.idf
        |  FROM qt q
        |  JOIN idf x ON x.tok = q.tok
        |  JOIN (SELECT DISTINCT p_partkey, p_brand, tok FROM rtok) r
        |    ON r.tok = q.tok AND r.p_brand = q.q_brand),
        |scored AS (
        |  SELECT e.q_brand, e.needle, e.p_partkey,
        |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list(e.idf ORDER BY e.qpos)), (a, x) -> a + x)
        |           / sqrt(d.dl) AS score
        |  FROM ev e JOIN doclen d ON d.p_partkey = e.p_partkey
        |  GROUP BY e.q_brand, e.needle, e.p_partkey, d.dl)
        |SELECT q_brand, needle, p_partkey FROM (
        |  SELECT q_brand, needle, p_partkey,
        |         row_number() OVER (PARTITION BY q_brand, needle
        |                            ORDER BY score DESC, p_partkey) AS rn
        |  FROM scored) t
        |WHERE rn = 1 ORDER BY q_brand, needle, p_partkey""".stripMargin,

    // Ngram-strategy replay: same tokenize/idf/doclen recipe as fz01
    // (maxDfRatio defaults to 1.0 here — no prune), then per (doc, title)
    // the matched query positions cluster wherever the gap exceeds
    // nNgrams=3 (lag + running sum), the pair scores as its best cluster's
    // idf sum / sqrt(title length), and the top-1 title per doc breaks
    // score ties on title_id — mirroring the Spark side's tieBreakCol.
    "fz02_fuzzy_subspan_titles" ->
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
        |titles AS (
        |  SELECT doc_id AS title_id,
        |         array_to_string(string_split(text, ' ')[1:4], ' ') AS title
        |  FROM documents WHERE doc_id % 50 = 0),
        |rtok AS (
        |  SELECT title_id,
        |         unnest(regexp_extract_all(lower(title), '[a-z0-9]+')) AS tok
        |  FROM titles),
        |doclen AS (SELECT title_id, count(*) AS dl FROM rtok GROUP BY 1),
        |n AS (SELECT count(*) AS nd FROM titles),
        |idf AS (
        |  SELECT tok, ln(1 + CAST(nd AS DOUBLE) / df) AS idf
        |  FROM (SELECT tok, count(DISTINCT title_id) AS df
        |        FROM rtok GROUP BY 1), n),
        |qt AS (
        |  SELECT doc_id, generate_subscripts(toks, 1) AS qpos,
        |         unnest(toks) AS tok
        |  FROM (SELECT doc_id,
        |          regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |        FROM docs)),
        |m AS (
        |  SELECT DISTINCT q.doc_id, r.title_id, q.qpos, x.idf
        |  FROM qt q
        |  JOIN idf x ON x.tok = q.tok
        |  JOIN (SELECT DISTINCT title_id, tok FROM rtok) r ON r.tok = q.tok),
        |gaps AS (
        |  SELECT doc_id, title_id, qpos, idf,
        |    CASE WHEN qpos - lag(qpos) OVER (PARTITION BY doc_id, title_id
        |                                     ORDER BY qpos) > 3
        |         THEN 1 ELSE 0 END AS brk
        |  FROM m),
        |cl AS (
        |  SELECT doc_id, title_id, qpos, idf,
        |    sum(brk) OVER (PARTITION BY doc_id, title_id ORDER BY qpos
        |                   ROWS UNBOUNDED PRECEDING) AS cluster
        |  FROM gaps),
        |rawc AS (
        |  SELECT doc_id, title_id, cluster,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list(idf ORDER BY qpos)), (a, x) -> a + x) AS raw
        |  FROM cl GROUP BY 1, 2, 3),
        |sc AS (
        |  SELECT r.doc_id, r.title_id, max(r.raw) / sqrt(d.dl) AS score
        |  FROM rawc r JOIN doclen d ON d.title_id = r.title_id
        |  GROUP BY r.doc_id, r.title_id, d.dl)
        |SELECT doc_id, title_id FROM (
        |  SELECT doc_id, title_id,
        |         row_number() OVER (PARTITION BY doc_id
        |                            ORDER BY score DESC, title_id) AS rn
        |  FROM sc WHERE score >= 0.5) t
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin
  )
}
