package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.topic.{Tags, TopicTree}
import graft.topic.TopicTree._

/** Round-2 topic-tree surface: JSON save/load round trip, topwords,
  * childSplitSize spawning, AllIn filter, Tag CRUD → tree. */
class TopicPersistenceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  val vocab: Map[String, Seq[Double]] = Map(
    "disease" -> Seq(1.0, 0.9, 0.0, 0.1), "treatment" -> Seq(0.9, 1.0, 0.1, 0.0),
    "cancer" -> Seq(1.0, 0.8, 0.1, 0.0), "chemo" -> Seq(0.8, 1.0, 0.0, 0.1),
    "goal" -> Seq(0.0, 0.1, 1.0, 0.9), "match" -> Seq(0.1, 0.0, 0.9, 1.0),
    "team" -> Seq(0.0, 0.1, 1.0, 0.8), "score" -> Seq(0.1, 0.0, 0.8, 1.0))

  def doc(words: String*): (Seq[String], Seq[Seq[Double]]) =
    (words.toSeq, words.map(vocab(_)).toSeq)

  val allDocs = Seq(
    doc("disease", "treatment"), doc("cancer", "chemo"),
    doc("disease", "cancer"), doc("treatment", "chemo"),
    doc("goal", "match"), doc("team", "score"),
    doc("goal", "team"), doc("match", "score"))

  test("save/load round trip reproduces scores, topwords, and hits exactly") {
    val docs = spark.createDataset(allDocs ++ allDocs).repartition(3)
    val tree = TopicTree.fit(
      NodeSpec("root", Clustering, classes = Seq(0, 1), maxTopWords = 4), docs)
    val path = "/tmp/graft_test_tree_roundtrip"
    tree.save(spark, path)
    val loaded = TopicTree.load(spark, path)

    assert(loaded.dim == tree.dim)
    assert(loaded.topWords == tree.topWords)
    assert(loaded.nodeHits == tree.nodeHits)
    val a = tree.transform(spark.createDataset(allDocs)).collect()
      .map(_.getAs[Map[Int, Double]]("classScores")).toSeq
    val b = loaded.transform(spark.createDataset(allDocs)).collect()
      .map(_.getAs[Map[Int, Double]]("classScores")).toSeq
    assert(a == b, "loaded tree scores differ from original")
  }

  test("topwords: each cluster's topwords come from its own vocab half") {
    val docs = spark.createDataset(allDocs ++ allDocs ++ allDocs)
    val tree = TopicTree.fit(
      NodeSpec("root", Clustering, classes = Seq(0, 1), maxTopWords = 4), docs)
    val tw = tree.topWords
    assert(tw.nonEmpty, "no topwords collected")
    val med = Set("disease", "treatment", "cancer", "chemo")
    // group topwords by class; each class's tokens must be homogeneous
    val byClass = tw.groupBy(_._2).view.mapValues(_.map(_._3).toSet).toMap
    byClass.values.foreach { toks =>
      assert(toks.subsetOf(med) || toks.intersect(med).isEmpty,
        s"mixed-cluster topwords: $toks")
    }
    // scores are cosine-derived: within (0, 1]
    assert(tw.forall(t => t._4 > 0.0 && t._4 <= 1.0 + 1e-9))
  }

  test("fitAdaptive spawns children once hits reach childSplitSize") {
    val docs = spark.createDataset(
      Seq.fill(10)(allDocs).flatten) // 80 docs > split size
    val spec = NodeSpec("root", Clustering, classes = Seq(0, 1),
      maxTopWords = 3, childSplitSize = 40)
    val tree = TopicTree.fitAdaptive(spec, docs, maxRounds = 2)
    assert(tree.root.children.length == 2, "expected one child per class")
    assert(tree.root.children.forall(_.spec.classes.length == 2),
      "children must get two fresh sub-classes")
    // fresh class ids don't collide with the parent's
    val ids = tree.root.allNodes.flatMap(_.spec.classes)
    assert(ids.distinct.length == ids.length, s"class id collision: $ids")
    // under the split size: no spawn
    val small = TopicTree.fitAdaptive(
      spec, spark.createDataset(allDocs), maxRounds = 2)
    assert(small.root.children.isEmpty)
  }

  test("AllIn filter requires every child class present among the facts") {
    // root emits 0 and 1; AllIn child keyed on BOTH 0 and 1 only passes
    // when both scores cross 0.5, child keyed on an absent class never does
    val spec = NodeSpec("root", Clustering, classes = Seq(0, 1),
      filterMode = AllIn,
      children = Seq(
        NodeSpec("both", Clustering, classes = Seq(0, 1)),
        NodeSpec("never", Clustering, classes = Seq(0, 99))))
    val docs = spark.createDataset(allDocs)
    val tree = TopicTree.fit(spec, docs)
    // "never" child: class 99 can't be a fact (no node emits it before the
    // gate), so its cluster must have seen zero docs
    val never = tree.root.children.find(_.spec.name == "never").get
    assert(never.hits == 0L, s"AllIn leaked ${never.hits} docs into 'never'")
  }

  test("windowed supervised scoring: mention in a long doc still scores high") {
    val annotations = Seq(
      (Seq("disease", "treatment"), 0, true), (Seq("cancer", "chemo"), 0, true),
      (Seq("goal", "match"), 0, false), (Seq("team", "score"), 0, false))
    // long sports doc with a 2-token medical mention buried inside
    val mixed = (Seq("goal", "match", "team", "disease", "treatment", "goal",
      "match", "team", "score", "goal"),
      Seq("goal", "match", "team", "disease", "treatment", "goal",
        "match", "team", "score", "goal").map(vocab(_)))
    val docs = spark.createDataset(Seq(mixed))
    val whole = TopicTree.fit(
      NodeSpec("root", Supervised, classes = Seq(0)), docs, annotations, vocab)
    val windowed = TopicTree.fit(
      NodeSpec("root", Supervised, classes = Seq(0), windowSize = 2),
      docs, annotations, vocab)
    def score(t: TopicTree.Tree) = t.transform(docs).collect()
      .head.getAs[Map[Int, Double]]("classScores")(0)
    // the sliding window isolates the mention; whole-doc averaging dilutes it
    assert(score(windowed) > score(whole),
      s"windowed ${score(windowed)} <= whole ${score(whole)}")
    assert(score(windowed) > 0.5, s"mention not detected: ${score(windowed)}")
  }

  test("evaluateSupervised: held-out metrics stamped on nodes and persisted") {
    val spec = NodeSpec("root", Supervised, classes = Seq(0))
    val annotations = (1 to 15).flatMap { i =>
      Seq((Seq("disease", "treatment"), 0, true), (Seq("cancer", "chemo"), 0, true),
        (Seq("goal", "match"), 0, false), (Seq("team", "score"), 0, false))
    }
    val docs = spark.createDataset(allDocs)
    val tree = TopicTree.fit(spec, docs, annotations, vocab)
    val report = TopicTree.evaluateSupervised(
      tree, spec, annotations, vocab, spark)
    assert(report.contains("root"), s"no metrics: $report")
    val m = report("root")
    assert(m("f1") > 0.9, s"separable fixture should score f1 ~1: $m")
    assert(m.keySet == Set("threshold", "precision", "recall", "f1", "auc", "n_test"))
    // stamped on the production tree and survives save/load
    assert(tree.root.metrics == m)
    val path = "/tmp/graft_test_tree_metrics"
    tree.save(spark, path)
    assert(TopicTree.load(spark, path).root.metrics == m)
  }

  test("tag CRUD: fold order, tombstone, resurrect, filter patching") {
    val ops = Seq(
      Tags.Tag(1, Tags.Op.Create, 10L, "alpha", outClasses = Seq(1, 2)),
      Tags.Tag(1, Tags.Op.Update, 20L, "alpha2", outClasses = Seq(1, 2)),
      Tags.Tag(1, Tags.Op.AddFilter, 30L, "", filterValue = Seq(7)),
      Tags.Tag(2, Tags.Op.Create, 10L, "beta", outClasses = Seq(3)),
      Tags.Tag(2, Tags.Op.Delete, 20L, ""),
      Tags.Tag(3, Tags.Op.Create, 10L, "gamma", outClasses = Seq(4)),
      Tags.Tag(3, Tags.Op.Delete, 20L, ""),
      Tags.Tag(3, Tags.Op.Create, 30L, "gamma2", outClasses = Seq(5)),
      Tags.Tag(4, Tags.Op.Create, 10L, "delta",
        outClasses = Seq(6), filterValue = Seq(7, 8)),
      Tags.Tag(4, Tags.Op.RemoveFilter, 20L, "", filterValue = Seq(8)))
    val resolved = Tags.resolve(spark.createDataset(ops))
      .collect().sortBy(_.id)
    assert(resolved.map(_.id).toSeq == Seq(1, 3, 4)) // 2 stays deleted
    val t1 = resolved(0)
    assert(t1.name == "alpha2" && t1.filterValue == Seq(7)) // update + addFilter
    assert(resolved(1).name == "gamma2") // delete then create resurrects
    assert(resolved(2).filterValue == Seq(7)) // removeFilter dropped 8
  }

  test("calculateTree attaches tags beneath covering outClasses") {
    val tags = Seq(
      Tags.Tag(0, Tags.Op.Create, 1L, "root", outClasses = Seq(1, 2),
        filterValue = Nil),
      Tags.Tag(1, Tags.Op.Create, 1L, "left", algo = "supervised",
        outClasses = Seq(3, 4), filterValue = Seq(1)),
      Tags.Tag(2, Tags.Op.Create, 1L, "grandchild",
        outClasses = Seq(5), filterValue = Seq(3, 4)))
    val spec = Tags.calculateTree(tags)
    assert(spec.name == "root" && spec.children.map(_.name) == Seq("left"))
    assert(spec.children.head.children.map(_.name) == Seq("grandchild"))
    assert(spec.children.head.algo == TopicTree.Supervised)
    // unattachable tag -> error (reference contract)
    val bad = tags :+ Tags.Tag(9, Tags.Op.Create, 1L, "orphan",
      outClasses = Seq(9), filterValue = Seq(42))
    assertThrows[IllegalArgumentException](Tags.calculateTree(bad))
  }
}
