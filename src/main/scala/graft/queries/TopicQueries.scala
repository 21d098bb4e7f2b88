package graft.queries

import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.DiscreteVectorClassifier
import graft.topic.TopicTree
import graft.topic.TopicTree._

/** Topic-tree + one-vs-all classifier demo queries (iterative ML — rows-only
  * checks; behavior gated by TopicTreeSpec's reference-style quality
  * floors). Documents get deterministic hash-derived token vectors, the
  * reference's Word2Vec lookup stubbed with a fixed embedding function. */
object TopicQueries {

  private def tokenVec(tok: String, dim: Int): Seq[Double] = {
    val h = scala.util.hashing.MurmurHash3.stringHash(tok)
    (0 until dim).map { i =>
      val x = scala.util.hashing.MurmurHash3.productHash((h, i))
      (x % 1000) / 1000.0
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Annotation event-log merge: latest-wins with delete stickiness
    // (synthetic log derived from events; oracle mirrors the window)
    "an01_annotation_merge" -> ((s, d) => {
      val ann = Tables.events(s, d).select(
        array(col("event_type")).as("tokens"),
        concat_ws("", lit("t"), pmod(col("user_id"), lit(5)).cast("string")).as("tag"),
        col("value").as("score"),
        col("event_id").as("timestamp"),
        when(col("value") < 1, "delete").otherwise(null).as("operation"))
      graft.topic.Annotations.merge(ann)
        .select(expr("tokens[0]").as("token"), col("tag"), col("score"),
          col("timestamp"))
        .orderBy("token", "tag")
    }),

    // Multi-leg entity mention detection over documents: the 10 most
    // frequent bigrams become 2-leg entities; mentions located per doc
    "en01_entity_mentions" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(
        col("doc_id"), split(col("text"), " ").as("tokens"))
      val entities = docs
        .select(explode(expr(
          "transform(sequence(1, greatest(size(tokens) - 1, 1)), i -> slice(tokens, i, 2))"))
          .as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(10)
        .select(lit("frequent").as("tag"),
          (monotonically_increasing_id() + 1).cast("int").as("entityIndex"),
          col("bigram").as("synonym"))
      graft.operators.EntityMatcher.matchEntities(docs, "doc_id", "tokens", entities)
        .groupBy("doc_id").agg(count(lit(1)).as("n_mentions"))
        .orderBy("doc_id")
    }),

    // Co-occurrence term proposal: tokens over-represented in a language
    "co01_cooccurrence_terms" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(
        col("doc_id"), split(col("text"), " ").as("tokens"), col("lang").as("tag"))
      graft.operators.Cooccurrence.proposeTerms(docs, "tokens", "tag",
        minInTag = 2, liftFloor = 1.05, topN = 5)
        .select(col("tag"), col("token"), col("in_tag_docs"), col("global_docs"),
          round(col("lift"), 6).as("lift_r"))
        .orderBy("tag", "token")
    }),

    // Online clustering over documents (partition-local updates + treeReduce
    // merge), then a scoring pass assigning each doc its best class
    "tp01_topic_clusters" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("tokens"))
        .as[(Long, Seq[String])]
        .map { case (id, toks) => (toks.take(50), toks.take(50).map(tokenVec(_, 8))) }
      val tree = TopicTree.fit(NodeSpec("root", Clustering, classes = Seq(0, 1, 2, 3)), docs)
      tree.transform(docs)
        .select(expr("tokens[0]").as("first_token"),
          expr("array_max(map_values(classScores))").as("best_score"))
        .groupBy(lit(1).as("one"))
        .agg(count(lit(1)).as("n_docs"), avg(col("best_score")).as("avg_best"))
    }),

    // One-vs-all LinearSVC over the embeddings table's labels
    "tp02_one_vs_all" -> ((s, d) => {
      import s.implicits._
      val emb = Tables.embeddings(s, d)
      // the table's `label` column is independent of the embeddings, so a
      // classifier can't learn it; derive a learnable 4-class label from the
      // signs of the first two components instead
      val numClasses = 4
      val data = emb.select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])]
        .map { case (id, v) =>
          val l = (if (v.head > 0) 2 else 0) + (if (v(1) > 0) 1 else 0)
          val oneHot = Array.fill(numClasses)(0.0)
          oneHot(l) = 1.0
          (id, Vectors.dense(v.map(_.toDouble).toArray), Vectors.dense(oneHot), l)
        }.toDF("vec_id", "features", "labels", "label")
      val model = DiscreteVectorClassifier.fit(data, "features", "labels", parallelism = 4)
      model.transform(data, "features")
        .select(col("vec_id"), col("label"),
          expr("array_position(prediction, CAST(1.0 AS DOUBLE)) - 1").as("predicted"))
        .withColumn("correct", (col("predicted") === col("label")).cast("int"))
        .agg(count(lit(1)).as("n"), sum(col("correct")).as("n_correct"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "an01_annotation_merge" ->
      """WITH ann AS (
        |  SELECT event_type AS token,
        |         concat('t', CAST(user_id % 5 AS VARCHAR)) AS tag,
        |         value AS score, event_id AS ts,
        |         CASE WHEN value < 1 THEN 'delete' END AS op
        |  FROM events),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY token, tag
        |                               ORDER BY ts DESC) AS rn
        |  FROM ann)
        |SELECT token, tag, score, ts AS timestamp
        |FROM ranked WHERE rn = 1 AND (op IS NULL OR op <> 'delete')
        |ORDER BY token, tag""".stripMargin,

    "co01_cooccurrence_terms" ->
      """WITH docs AS (
        |  SELECT doc_id, lang AS tag, string_split(text, ' ') AS w FROM documents),
        |dt AS (
        |  SELECT doc_id, tag, unnest(list_distinct(w)) AS tok FROM docs),
        |tagsizes AS (
        |  SELECT tag, count(*) AS tag_docs FROM docs GROUP BY tag),
        |total AS (SELECT count(*) AS n FROM docs),
        |global AS (SELECT tok, count(*) AS global_docs FROM dt GROUP BY tok),
        |intag AS (
        |  SELECT tag, tok, count(*) AS in_tag_docs FROM dt GROUP BY tag, tok
        |  HAVING count(*) >= 2),
        |scored AS (
        |  SELECT i.tag, i.tok, i.in_tag_docs, g.global_docs,
        |         (CAST(i.in_tag_docs AS DOUBLE) / ts.tag_docs) /
        |         (CAST(g.global_docs AS DOUBLE) / t.n) AS lift
        |  FROM intag i JOIN global g ON i.tok = g.tok
        |  JOIN tagsizes ts ON i.tag = ts.tag CROSS JOIN total t),
        |kept AS (
        |  SELECT *, row_number() OVER (PARTITION BY tag
        |                               ORDER BY lift DESC, tok) AS rk
        |  FROM scored WHERE lift >= 1.05)
        |SELECT tag, tok AS token, in_tag_docs, global_docs,
        |       round(lift, 6) AS lift_r
        |FROM kept WHERE rk <= 5 ORDER BY tag, token""".stripMargin
  )
}
