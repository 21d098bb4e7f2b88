package graft.topic

import org.apache.spark.ml.classification.LinearSVC
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorKernels

/** Online hierarchical topic tree (reference SURVEY.md §2.11,
  * topic/Node.scala + ClusteringNode/ClassifierNode/AnalogyNode).
  *
  * Execution model preserved from the reference: the tree is a plain
  * serializable value; `fit` broadcasts it, every partition walks its
  * documents through a LOCAL mutable copy (online cluster updates), and the
  * per-partition trees are combined with `treeReduce(mergeWith)` — a
  * partial-aggregation pattern that scales with partitions and never moves
  * documents. Classifier nodes fit a `LinearSVC` per class on the driver
  * afterwards (annotated points only). `transform` broadcasts the fitted
  * tree and scores documents in a single map.
  *
  * Documents are (tokens, vectors): one embedding per token, any dimension
  * (the reference hardcoded 200; here it is derived from the data).
  */
object TopicTree {

  sealed trait Algo
  case object Clustering extends Algo
  case object Supervised extends Algo
  case object Analogy extends Algo

  /** Filter modes controlling which children see a document
    * (reference NodeParams.FilterMode). */
  sealed trait FilterMode
  case object NoFilter extends FilterMode
  case object AnyIn extends FilterMode    // child sees doc if any of its
                                          // inClasses is among the facts
  case object BestScore extends FilterMode

  /** One node of the tree. `classes` are the class ids this node can emit. */
  case class NodeSpec(
      name: String,
      algo: Algo,
      classes: Seq[Int],
      filterMode: FilterMode = NoFilter,
      maxTopWords: Int = 8,
      // analogy: per class, (referenceWord, baseWord) — score of token t =
      // cosine(vec(reference) - vec(base) + vec(t), classDirection)
      analogyRefs: Map[Int, (String, String)] = Map.empty,
      children: Seq[NodeSpec] = Nil)

  /** Per-class online cluster state: prototype running means. */
  final class ClusterState(val dim: Int, val k: Int) extends Serializable {
    val centers: Array[Array[Double]] = Array.fill(k)(new Array[Double](dim))
    val counts: Array[Long] = new Array[Long](k)

    def affect(v: Array[Double]): Int = {
      // nearest non-empty center by cosine; an empty center claims the point
      // unless it already sits close to an existing center (k-center style
      // seeding — otherwise every point funnels into the first center)
      var best = -1
      var bestScore = -2.0
      var firstEmpty = -1
      var i = 0
      while (i < k) {
        if (counts(i) == 0L) { if (firstEmpty < 0) firstEmpty = i }
        else {
          val c = VectorKernels.cosine(centers(i), v)
          if (c > bestScore) { best = i; bestScore = c }
        }
        i += 1
      }
      if (firstEmpty >= 0 && (best < 0 || bestScore < 0.75)) best = firstEmpty
      // online running mean update
      val c = centers(best)
      val n = counts(best) + 1
      var j = 0
      while (j < dim) { c(j) += (v(j) - c(j)) / n; j += 1 }
      counts(best) = n
      best
    }

    def score(v: Array[Double]): Array[Double] = {
      val out = new Array[Double](k)
      var i = 0
      while (i < k) {
        out(i) = if (counts(i) == 0) 0.0
        else (VectorKernels.cosine(centers(i), v) + 1.0) / 2.0
        i += 1
      }
      out
    }

    /** Weighted merge of another partition's state (reference
      * ClusteringNode.mergeWith). Greedy center alignment by cosine. */
    def mergeWith(o: ClusterState): ClusterState = {
      val used = Array.fill(o.k)(false)
      var i = 0
      while (i < k) {
        if (o.counts.exists(_ > 0)) {
          // best unused center of `o` for centers(i)
          var best = -1; var bestScore = -2.0
          var j = 0
          while (j < o.k) {
            if (!used(j) && o.counts(j) > 0) {
              val c = if (counts(i) == 0) 1.0 else VectorKernels.cosine(centers(i), o.centers(j))
              if (c > bestScore) { best = j; bestScore = c }
            }
            j += 1
          }
          if (best >= 0) {
            used(best) = true
            val n1 = counts(i); val n2 = o.counts(best)
            if (n2 > 0) {
              val tot = n1 + n2
              var d = 0
              while (d < dim) {
                centers(i)(d) = (centers(i)(d) * n1 + o.centers(best)(d) * n2) / tot
                d += 1
              }
              counts(i) = tot
            }
          }
        }
        i += 1
      }
      this
    }
  }

  /** A fitted/fitting node: spec + mutable state. */
  final class Node(val spec: NodeSpec, dim: Int) extends Serializable {
    val cluster: ClusterState =
      if (spec.algo == Clustering) new ClusterState(dim, spec.classes.length) else null
    var svmWeights: Map[Int, (Array[Double], Double)] = Map.empty // class -> (w, b)
    val children: Array[Node] = spec.children.map(c => new Node(c, dim)).toArray

    def walk(docVec: Array[Double], tokens: Seq[String],
             vecs: Seq[Array[Double]], facts: collection.mutable.Map[Int, Double],
             train: Boolean, analogyVocab: Map[String, Array[Double]]): Unit = {
      val scores: Seq[(Int, Double)] = spec.algo match {
        case Clustering =>
          val s =
            if (train) { val c = cluster.affect(docVec); cluster.score(docVec) }
            else cluster.score(docVec)
          spec.classes.zip(s)
        case Supervised =>
          spec.classes.map { cls =>
            svmWeights.get(cls) match {
              case Some((w, b)) =>
                val margin = VectorKernels.dot(w, docVec) + b
                cls -> (math.atan(margin) / math.Pi + 0.5)
              case None => cls -> 0.0
            }
          }
        case Analogy =>
          spec.classes.map { cls =>
            spec.analogyRefs.get(cls) match {
              case Some((ref, base)) =>
                (for {
                  rv <- analogyVocab.get(ref)
                  bv <- analogyVocab.get(base)
                } yield {
                  // best token analogy score: cosine(ref - base + token, ref)
                  val scores = vecs.map { tv =>
                    val cand = new Array[Double](dim)
                    var i = 0
                    while (i < dim) { cand(i) = rv(i) - bv(i) + tv(i); i += 1 }
                    (VectorKernels.cosine(cand, rv) + 1) / 2
                  }
                  cls -> (if (scores.isEmpty) 0.0 else scores.max)
                }).getOrElse(cls -> 0.0)
              case None => cls -> 0.0
            }
          }
      }
      scores.foreach { case (cls, s) => if (s > facts.getOrElse(cls, 0.0)) facts(cls) = s }

      val passing: Array[Node] = spec.filterMode match {
        case NoFilter => children
        case AnyIn => children.filter(_.spec.classes.exists(c => facts.getOrElse(c, 0.0) > 0.5))
        case BestScore =>
          if (children.isEmpty) children
          else Array(children.maxBy(_.spec.classes.map(c => facts.getOrElse(c, 0.0)).max))
      }
      passing.foreach(_.walk(docVec, tokens, vecs, facts, train, analogyVocab))
    }

    def mergeWith(o: Node): Node = {
      if (cluster != null && o.cluster != null) cluster.mergeWith(o.cluster)
      children.zip(o.children).foreach { case (a, b) => a.mergeWith(b) }
      this
    }

    def allNodes: Seq[Node] = this +: children.flatMap(_.allNodes).toSeq
  }

  /** The fitted tree handle. */
  final class Tree(val root: Node, val dim: Int,
                   val analogyVocab: Map[String, Array[Double]]) extends Serializable {

    /** Score documents: one row per doc with a map class -> score. */
    def transform(docs: Dataset[(Seq[String], Seq[Seq[Double]])]): DataFrame = {
      val spark = docs.sparkSession
      import spark.implicits._
      val bc = spark.sparkContext.broadcast(this)
      docs.map { case (tokens, vecs) =>
        val t = bc.value
        val va = vecs.map(_.toArray)
        val dv = meanVec(va, t.dim)
        val facts = collection.mutable.Map.empty[Int, Double]
        t.root.walk(dv, tokens, va, facts, train = false, t.analogyVocab)
        (tokens, facts.toMap)
      }.toDF("tokens", "classScores")
    }
  }

  private def meanVec(vs: Seq[Array[Double]], dim: Int): Array[Double] = {
    val out = new Array[Double](dim)
    if (vs.isEmpty) return out
    vs.foreach { v => var i = 0; while (i < dim) { out(i) += v(i); i += 1 } }
    var i = 0
    while (i < dim) { out(i) /= vs.length; i += 1 }
    out
  }

  /** Fit the tree: one pass of partition-local online updates merged by
    * treeReduce, then per-class LinearSVC fits for supervised nodes using
    * `annotations` (tokens labelled with a class, inRel = positive).
    */
  def fit(spec: NodeSpec,
          docs: Dataset[(Seq[String], Seq[Seq[Double]])],
          annotations: Seq[(Seq[String], Int, Boolean)] = Nil,
          vocab: Map[String, Seq[Double]] = Map.empty): Tree = {
    val spark = docs.sparkSession
    import spark.implicits._
    val dim = docs.head()._2.headOption.map(_.length)
      .orElse(vocab.values.headOption.map(_.length))
      .getOrElse(0)
    val vocabArr = vocab.map { case (k, v) => k -> v.toArray }

    // 1. distributed online pass (clustering state)
    val specBc = spark.sparkContext.broadcast((spec, dim, vocabArr))
    // RDD mapPartitions (trees are plain Java-serializable values, not
    // encoder-backed rows) + treeReduce: log-depth partial merges
    val fitted = docs.rdd.mapPartitions { it =>
      val (sp, d, av) = specBc.value
      val local = new Node(sp, d)
      it.foreach { case (tokens, vecs) =>
        val va = vecs.map(_.toArray)
        local.walk(meanVec(va, d), tokens, va,
          collection.mutable.Map.empty, train = true, av)
      }
      Iterator(local)
    }.treeReduce(_ mergeWith _, depth = 2)

    // 2. driver-side supervised fits from annotations: per supervised node,
    // one LinearSVC per class (other classes' points = negatives — the
    // reference's brother-nodes-as-negatives scheme)
    val supervised = fitted.allNodes.filter(_.spec.algo == Supervised)
    if (supervised.nonEmpty && annotations.nonEmpty) {
      val points = annotations.map { case (tokens, cls, inRel) =>
        val vecs = tokens.flatMap(vocabArr.get)
        (meanVec(vecs, dim), cls, inRel)
      }.filter(_._1.exists(_ != 0.0))
      supervised.foreach { node =>
        node.svmWeights = node.spec.classes.flatMap { cls =>
          val pos = points.filter(p => p._2 == cls && p._3)
          val neg = points.filter(p => p._2 != cls || !p._3)
          if (pos.isEmpty || neg.isEmpty) None
          else {
            val train = spark.createDataFrame(
              (pos.map(p => (1.0, Vectors.dense(p._1))) ++
                neg.map(p => (0.0, Vectors.dense(p._1))))
            ).toDF("label", "features")
            val svc = new LinearSVC().setMaxIter(50).setRegParam(0.01).fit(train)
            Some(cls -> (svc.coefficients.toArray, svc.intercept))
          }
        }.toMap
      }
    }
    new Tree(fitted, dim, vocabArr)
  }
}
