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
}
