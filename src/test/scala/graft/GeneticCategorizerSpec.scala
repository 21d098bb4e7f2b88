package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.topic.GeneticCategorizer
import graft.topic.GeneticCategorizer.{Options, Prototype}

/** Reference-style quality floors for the genetic topic-prototype
  * discovery (reference topic/TopicTree.scala:22-429). */
class GeneticCategorizerSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  val vocab: Map[String, Seq[Double]] = Map(
    "disease" -> Seq(1.0, 0.9, 0.0, 0.1), "treatment" -> Seq(0.9, 1.0, 0.1, 0.0),
    "cancer" -> Seq(1.0, 0.8, 0.1, 0.0), "chemo" -> Seq(0.8, 1.0, 0.0, 0.1),
    "goal" -> Seq(0.0, 0.1, 1.0, 0.9), "match" -> Seq(0.1, 0.0, 0.9, 1.0),
    "team" -> Seq(0.0, 0.1, 1.0, 0.8), "score" -> Seq(0.1, 0.0, 0.8, 1.0))

  def doc(words: String*): (Seq[String], Seq[Seq[Double]]) =
    (words.toSeq, words.map(vocab(_)).toSeq)

  val medDocs = Seq(
    doc("disease", "treatment", "cancer", "chemo"),
    doc("cancer", "chemo", "disease", "treatment"),
    doc("treatment", "cancer", "chemo", "disease"))
  val sportDocs = Seq(
    doc("goal", "match", "team", "score"),
    doc("team", "score", "goal", "match"),
    doc("match", "team", "score", "goal"))

  test("slideVectors: incremental sums equal naive window sums") {
    val vs = Seq(Array(1.0, 0.0), Array(2.0, 1.0), Array(4.0, 2.0), Array(8.0, 3.0))
    val got = GeneticCategorizer.slideVectors(vs, 2).toSeq
    assert(got.map(t => (t._2, t._3)) == Seq((0, 2), (1, 3), (2, 4)))
    assert(got.map(_._1.toSeq) == Seq(Seq(3.0, 1.0), Seq(6.0, 3.0), Seq(12.0, 5.0)))
    // short input -> no windows; nulls tolerated
    assert(GeneticCategorizer.slideVectors(vs.take(1), 2).isEmpty)
  }

  test("findBest: discriminative margin rewards distinct claims") {
    val protos = IndexedSeq(
      Prototype(Seq("a"), Array(1.0, 0.0)),
      Prototype(Seq("b"), Array(0.0, 1.0)))
    val (j, margin) = GeneticCategorizer.findBest(Array(1.0, 0.05), protos)
    assert(j == 0)
    assert(margin > 0.8, s"margin $margin") // close to proto 0, far from proto 1
    // ambiguous vector: margin collapses toward zero
    val (_, m2) = GeneticCategorizer.findBest(Array(1.0, 1.0), protos)
    assert(m2 < 0.1, s"ambiguous margin $m2")
  }

  test("fit separates the two vocab clusters; transform emits spans") {
    val docs = spark.createDataset(
      Seq.fill(4)(medDocs ++ sportDocs).flatten).repartition(3)
    val model = GeneticCategorizer.fit(docs,
      Options(populationSize = 6, nTopics = 2, sentenceSize = 2,
        maxIterations = 3, seed = 7L))
    assert(model.topSentences.length == 2)
    val out = model.transform(spark.createDataset(medDocs ++ sportDocs))
      .select("tokens", "rawPrediction", "spans").collect()
    // quality floor: aggregated over each cluster's docs, the dominant
    // prototype differs (the genetic search is a heuristic — per-doc
    // unanimity is not guaranteed on a toy fixture, separation is)
    def dominant(pred: String => Boolean): Int = {
      val sums = out.filter(r => pred(r.getSeq[String](0).head))
        .map(_.getSeq[Double](1))
        .reduce((a, b) => a.zip(b).map { case (x, y) => x + y })
      sums.indexOf(sums.max)
    }
    val medProto = dominant(Set("disease", "cancer", "treatment").contains)
    val sportProto = dominant(Set("goal", "team", "match").contains)
    assert(medProto != sportProto,
      s"clusters collapsed to one prototype ($medProto)")
    // spans exist and are in-bounds
    out.foreach { r =>
      val toks = r.getSeq[String](0)
      val spans = r.getSeq[Seq[org.apache.spark.sql.Row]](2).flatten
      assert(spans.nonEmpty)
      spans.foreach { s =>
        assert(s.getInt(0) >= 0 && s.getInt(1) <= toks.length && s.getInt(0) < s.getInt(1))
      }
    }
    // determinism: same seed, same prototypes
    val model2 = GeneticCategorizer.fit(docs,
      Options(populationSize = 6, nTopics = 2, sentenceSize = 2,
        maxIterations = 3, seed = 7L))
    assert(model2.topSentences.map(_.tokens) == model.topSentences.map(_.tokens))
  }
}
