package graft.topic

import org.apache.spark.ml.classification.LinearSVC
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorKernels
import scala.collection.mutable.ArrayBuffer

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
  * Round-2 surface (reference file:line cited per feature):
  *  - per-class TOPWORDS with hill-climbing replacement
  *    (ClusteringNode.scala:311-330 onInit / :417-448 tryAsPoint);
  *  - child spawning on `childSplitSize` (ClusteringNode.scala:318-330
  *    score-gate + :572-598 fillChildren) — realized as driver-coordinated
  *    refit rounds (`fitAdaptive`), the deterministic Spark equivalent of
  *    the reference's online mid-stream spawn;
  *  - `AllIn` filter mode (NodeParams.scala:142-148);
  *  - JSON save/load of the full fitted state (Node.scala:216-246
  *    saveAsJson / :307-318 load, NodeParams.scala:127-134 loadFromJson) —
  *    written as Spark JSON-lines datasets so a tree snapshot is just
  *    another table;
  *  - per-node `hits` (NodeParams.scala:58).
  *
  * Documents are (tokens, vectors): one embedding per token, any dimension
  * (the reference hardcoded 200; here it is derived from the data).
  */
object TopicTree {

  sealed trait Algo
  case object Clustering extends Algo
  case object Supervised extends Algo
  case object Analogy extends Algo

  private def algoName(a: Algo): String = a match {
    case Clustering => "clustering"
    case Supervised => "supervised"
    case Analogy => "analogy"
  }
  private[topic] def algoOf(s: String): Algo = s match {
    case "clustering" => Clustering
    case "supervised" => Supervised
    case "analogy" => Analogy
  }

  /** Filter modes controlling which children see a document
    * (reference NodeParams.FilterMode, NodeParams.scala:142-148). */
  sealed trait FilterMode
  case object NoFilter extends FilterMode
  case object AnyIn extends FilterMode    // child sees doc if ANY of its
                                          // classes is among the facts
  case object AllIn extends FilterMode    // ... if ALL of its classes are
  case object BestScore extends FilterMode

  private def filterName(f: FilterMode): String = f match {
    case NoFilter => "noFilter"
    case AnyIn => "anyIn"
    case AllIn => "allIn"
    case BestScore => "bestScore"
  }
  private[topic] def filterOf(s: String): FilterMode = s match {
    case "noFilter" => NoFilter
    case "anyIn" => AnyIn
    case "allIn" => AllIn
    case "bestScore" => BestScore
  }

  /** One node of the tree. `classes` are the class ids this node can emit.
    * `childSplitSize` > 0 arms adaptive spawning (see fitAdaptive).
    * `windowSize` > 0 makes supervised nodes score the best SLIDING TOKEN
    * WINDOW instead of the whole document (reference ClassifierNode.scala:
    * 99-166 token scanning) — a mention of the class anywhere in a long
    * document is enough to score high. */
  case class NodeSpec(
      name: String,
      algo: Algo,
      classes: Seq[Int],
      filterMode: FilterMode = NoFilter,
      maxTopWords: Int = 8,
      // analogy: per class, (referenceWord, baseWord) — score of token t =
      // cosine(vec(reference) - vec(base) + vec(t), classDirection)
      analogyRefs: Map[Int, (String, String)] = Map.empty,
      children: Seq[NodeSpec] = Nil,
      childSplitSize: Int = 0,
      windowSize: Int = 0)

  /** Per-class online cluster state: prototype running means + topwords. */
  final class ClusterState(val dim: Int, val k: Int, val maxTopWords: Int = 8)
      extends Serializable {
    val centers: Array[Array[Double]] = Array.fill(k)(new Array[Double](dim))
    val counts: Array[Long] = new Array[Long](k)
    // per center: up to maxTopWords (token, vector, cosine-to-center) —
    // the reference's points/sequences arrays (ClusteringNode.scala:50-60)
    val topTokens: Array[ArrayBuffer[(String, Array[Double], Double)]] =
      Array.fill(k)(ArrayBuffer.empty)

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

    /** Topword maintenance: route the token to its best center and keep it
      * if it beats the weakest incumbent — the hill-climbing replacement of
      * the reference's tryAsPoint (ClusteringNode.scala:417-448), with
      * cosine-to-center as the (anti-)GAP objective. */
    def observeToken(token: String, v: Array[Double]): Unit = {
      var best = -1
      var bestScore = -2.0
      var i = 0
      while (i < k) {
        if (counts(i) > 0) {
          val c = VectorKernels.cosine(centers(i), v)
          if (c > bestScore) { best = i; bestScore = c }
        }
        i += 1
      }
      if (best < 0) return
      val buf = topTokens(best)
      val idx = buf.indexWhere(_._1 == token)
      if (idx >= 0) {
        if (bestScore > buf(idx)._3) buf(idx) = (token, v, bestScore)
      } else if (buf.length < maxTopWords) {
        buf += ((token, v, bestScore))
      } else {
        var mi = 0
        var ms = buf(0)._3
        var j = 1
        while (j < buf.length) { if (buf(j)._3 < ms) { mi = j; ms = buf(j)._3 }; j += 1 }
        if (bestScore > ms) buf(mi) = ((token, v, bestScore))
      }
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
      * ClusteringNode.mergeWith capability): center alignment by GLOBAL
      * cosine order, with empty-slot adoption for poorly matching centers.
      *
      * The alignment matters at scale: with many small partitions a local
      * state often has only ONE non-empty center, and a this-center-major
      * greedy (each of my centers grabs the best remaining o-center) fuses
      * unrelated clusters whenever the only candidate is a bad one —
      * cascaded over a treeReduce, every cluster collapses into one. So
      * pairs merge best-cosine-first, a pair below the same 0.75 closeness
      * bar `affect` uses for seeding does NOT fuse while an empty slot can
      * adopt the center instead, and only centers with nowhere else to go
      * merge into a mismatched slot. */
    def mergeWith(o: ClusterState): ClusterState = {
      val oNonEmpty = (0 until o.k).filter(o.counts(_) > 0)
      val pairs = for {
        i <- 0 until k if counts(i) > 0
        j <- oNonEmpty
      } yield (VectorKernels.cosine(centers(i), o.centers(j)), i, j)
      val takenI = Array.fill(k)(false)
      val assigned = collection.mutable.LinkedHashMap.empty[Int, Int] // j -> i
      pairs.sortBy(p => (-p._1, p._2, p._3)).foreach { case (c, i, j) =>
        if (!takenI(i) && !assigned.contains(j) && c >= 0.75) {
          takenI(i) = true; assigned(j) = i
        }
      }
      // unmatched o-centers adopt empty slots (ascending j: deterministic)
      val emptySlots = collection.mutable.Queue((0 until k).filter(counts(_) == 0): _*)
      oNonEmpty.filterNot(assigned.contains).foreach { j =>
        if (emptySlots.nonEmpty) {
          val i = emptySlots.dequeue(); takenI(i) = true; assigned(j) = i
        }
      }
      // leftovers have nowhere better: weighted-mean into their best center
      oNonEmpty.filterNot(assigned.contains).foreach { j =>
        val pool0 = (0 until k).filterNot(takenI)
        val pool = if (pool0.nonEmpty) pool0 else (0 until k)
        assigned(j) = pool.maxBy(i =>
          if (counts(i) == 0) 2.0 else VectorKernels.cosine(centers(i), o.centers(j)))
      }
      assigned.toSeq.sortBy(_._1).foreach { case (j, i) =>
        val n1 = counts(i); val n2 = o.counts(j)
        val tot = n1 + n2
        var d = 0
        while (d < dim) {
          centers(i)(d) = (centers(i)(d) * n1 + o.centers(j)(d) * n2) / tot
          d += 1
        }
        counts(i) = tot
        // merge topwords: union by token (max score), keep top N by
        // (score desc, token) — deterministic regardless of merge order
        val merged = (topTokens(i) ++ o.topTokens(j))
          .groupBy(_._1).map(_._2.maxBy(_._3)).toSeq
          .sortBy(t => (-t._3, t._1))
          .take(maxTopWords)
        topTokens(i).clear()
        topTokens(i) ++= merged
      }
      this
    }

    /** Clustering quality (reference ClusteringNode.scala:449-453 `GAP`):
      * per-center distance `1 - cosine(center, strongest topword)` of the
      * prototype topword to the running doc-mean, weighted by the center's
      * affected-doc mass (the reference's pGAP × pScores/ΣpScores with
      * pGAP recomputed against the CURRENT center — the stored observation
      * score is stale once the running mean has moved). Centers that never
      * earned a topword keep the reference's initial pGAP of 1.0; NaN when
      * no center has any mass (callers map that to 0, as leafsGAP does). */
    def gap: Double = {
      var acc = 0.0
      var mass = 0.0
      var i = 0
      while (i < k) {
        if (counts(i) > 0) {
          var best = -2.0
          topTokens(i).foreach { case (_, v, _) =>
            val c = VectorKernels.cosine(centers(i), v)
            if (c > best) best = c
          }
          val g = if (best < -1.0) 1.0 else 1.0 - best
          acc += g * counts(i)
          mass += counts(i)
        }
        i += 1
      }
      if (mass == 0.0) Double.NaN else acc / mass
    }

    /** Fitted topword points across all centers — the analogue of the
      * reference's `points.size` used by Node.betterThan's under-fit test. */
    def topwordCount: Int = {
      var n = 0; var i = 0
      while (i < k) { n += topTokens(i).length; i += 1 }
      n
    }
  }

  /** A fitted/fitting node: spec + mutable state. */
  final class Node(val spec: NodeSpec, dim: Int) extends Serializable {
    val cluster: ClusterState =
      if (spec.algo == Clustering) new ClusterState(dim, spec.classes.length, spec.maxTopWords)
      else null
    var svmWeights: Map[Int, (Array[Double], Double)] = Map.empty // class -> (w, b)
    var hits: Long = 0L // docs that reached this node (NodeParams.scala:58)
    var metrics: Map[String, Double] = Map.empty // per-node eval (ClassifierNode.scala:258-383)
    val children: Array[Node] = spec.children.map(c => new Node(c, dim)).toArray

    def walk(docVec: Array[Double], tokens: Seq[String],
             vecs: Seq[Array[Double]], facts: collection.mutable.Map[Int, Double],
             train: Boolean, analogyVocab: Map[String, Array[Double]]): Unit = {
      if (train) hits += 1
      val scores: Seq[(Int, Double)] = spec.algo match {
        case Clustering =>
          val s =
            if (train) {
              cluster.affect(docVec)
              // token-level topword maintenance (one routing per token)
              var i = 0
              while (i < tokens.length && i < vecs.length) {
                cluster.observeToken(tokens(i), vecs(i)); i += 1
              }
              cluster.score(docVec)
            }
            else cluster.score(docVec)
          spec.classes.zip(s)
        case Supervised =>
          spec.classes.map { cls =>
            svmWeights.get(cls) match {
              case Some((w, b)) =>
                // windowSize > 0: best sliding-window margin (mean window
                // vector), else whole-doc vector
                val margin =
                  if (spec.windowSize > 0 && vecs.nonEmpty) {
                    val ws = spec.windowSize
                    val slid = GeneticCategorizer.slideVectors(vecs, ws)
                    if (slid.isEmpty) VectorKernels.dot(w, docVec) + b
                    else slid.map { case (sum, _, _) =>
                      var m = b; var i = 0
                      while (i < sum.length) { m += w(i) * sum(i) / ws; i += 1 }
                      m
                    }.max
                  } else VectorKernels.dot(w, docVec) + b
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
        case AllIn => children.filter(_.spec.classes.forall(c => facts.getOrElse(c, 0.0) > 0.5))
        case BestScore =>
          if (children.isEmpty) children
          else Array(children.maxBy(_.spec.classes.map(c => facts.getOrElse(c, 0.0)).max))
      }
      passing.foreach(_.walk(docVec, tokens, vecs, facts, train, analogyVocab))
    }

    def mergeWith(o: Node): Node = {
      if (cluster != null && o.cluster != null) cluster.mergeWith(o.cluster)
      hits += o.hits
      children.zip(o.children).foreach { case (a, b) => a.mergeWith(b) }
      this
    }

    def allNodes: Seq[Node] = this +: children.flatMap(_.allNodes).toSeq

    /** Tree-level clustering GAP (reference Node.scala:128-134
      * `clusteringGAP` + ClusteringNode.scala:455-464 `leafsGAP`): inner
      * nodes sum their children; clustering LEAVES contribute their own
      * mass-weighted gap (NaN/Inf → 0, as the reference maps them); other
      * leaves contribute 0. */
    def clusteringGAP: Double =
      if (children.nonEmpty) children.map(_.clusteringGAP).sum
      else if (cluster != null) {
        val g = cluster.gap
        if (g.isNaN || g.isInfinite) 0.0 else g
      } else 0.0

    /** Quality order between two fitted trees (reference Node.scala:
      * 192-201): the tree with fewer under-fitted clustering nodes (< 2
      * topword points) wins outright; otherwise the lower clusteringGAP
      * wins. Used to pick the better of two independently fitted / merged
      * trees. */
    def betterThan(that: Node): Boolean = {
      def emptyCount(n: Node): Int =
        n.allNodes.count(x => x.cluster != null && x.cluster.topwordCount < 2)
      val thisEmpty = emptyCount(this)
      val thatEmpty = emptyCount(that)
      // lexicographic (emptyCount, gap) — algebraically identical to the
      // reference's longer guard expression; gaps evaluate lazily so the
      // empty-count-decided case skips two tree walks
      thisEmpty < thatEmpty ||
        (thisEmpty == thatEmpty && this.clusteringGAP < that.clusteringGAP)
    }
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

    /** Per-class topwords across all clustering nodes:
      * (node, class, token, score) — the reference's per-node topword
      * product (ClusteringNode.scala:311-330). */
    def topWords: Seq[(String, Int, String, Double)] =
      root.allNodes.filter(_.cluster != null).flatMap { n =>
        n.spec.classes.zipWithIndex.flatMap { case (cls, i) =>
          n.cluster.topTokens(i).sortBy(t => (-t._3, t._1))
            .map { case (tok, _, s) => (n.spec.name, cls, tok, s) }
        }
      }

    /** Per-node hit counts (docs seen during fit). */
    def nodeHits: Seq[(String, Long)] = root.allNodes.map(n => (n.spec.name, n.hits))

    /** Whole-tree clustering quality; lower is better (see
      * [[Node.clusteringGAP]]). */
    def clusteringGAP: Double = root.clusteringGAP

    /** True when this fitted tree beats `that` (see [[Node.betterThan]]). */
    def betterThan(that: Tree): Boolean = root.betterThan(that.root)

    /** Persist the complete fitted state as Spark JSON-lines datasets under
      * `path` (`nodes/`, `vocab/`) — the analogue of the reference's
      * saveAsJson (Node.scala:229-246): nodes are encoded flat with child
      * INDICES, exactly like the reference's EncodedNode array. */
    def save(spark: SparkSession, path: String): Unit = {
      import spark.implicits._
      val flat = ArrayBuffer.empty[SavedNode]
      encodeNode(root, flat)
      spark.createDataset(flat.toSeq).coalesce(1)
        .write.mode("overwrite").json(s"$path/nodes")
      val vocabRows = analogyVocab.toSeq.map { case (t, v) => SavedVocab(t, v.toSeq) }
      spark.createDataset(vocabRows).coalesce(1)
        .write.mode("overwrite").json(s"$path/vocab")
    }
  }

  // --- persistence model (flat encoding, child indices) -------------------
  case class SavedTopWord(center: Int, token: String, vector: Seq[Double], score: Double)
  case class SavedSvm(cls: Int, weights: Seq[Double], intercept: Double)
  case class SavedAnalogyRef(cls: Int, ref: String, base: String)
  case class SavedMetric(key: String, value: Double)
  case class SavedNode(
      id: Int, children: Seq[Int], name: String, algo: String,
      classes: Seq[Int], filterMode: String, maxTopWords: Int,
      childSplitSize: Int, windowSize: Int, hits: Long, dim: Int,
      centers: Seq[Seq[Double]], counts: Seq[Long],
      topwords: Seq[SavedTopWord], svms: Seq[SavedSvm],
      analogyRefs: Seq[SavedAnalogyRef], metrics: Seq[SavedMetric])
  case class SavedVocab(token: String, vector: Seq[Double])

  private def encodeNode(n: Node, out: ArrayBuffer[SavedNode]): Int = {
    val id = out.length
    out += null // reserve slot; children encode after (depth-first, root=0)
    val childIds = n.children.map(c => encodeNode(c, out)).toSeq
    out(id) = SavedNode(
      id = id, children = childIds, name = n.spec.name,
      algo = algoName(n.spec.algo), classes = n.spec.classes,
      filterMode = filterName(n.spec.filterMode),
      maxTopWords = n.spec.maxTopWords, childSplitSize = n.spec.childSplitSize,
      windowSize = n.spec.windowSize,
      hits = n.hits, dim = if (n.cluster == null) 0 else n.cluster.dim,
      centers = if (n.cluster == null) Nil else n.cluster.centers.map(_.toSeq).toSeq,
      counts = if (n.cluster == null) Nil else n.cluster.counts.toSeq,
      topwords =
        if (n.cluster == null) Nil
        else n.cluster.topTokens.zipWithIndex.flatMap { case (buf, i) =>
          buf.map { case (tok, v, s) => SavedTopWord(i, tok, v.toSeq, s) }
        }.toSeq,
      svms = n.svmWeights.toSeq.sortBy(_._1)
        .map { case (c, (w, b)) => SavedSvm(c, w.toSeq, b) },
      analogyRefs = n.spec.analogyRefs.toSeq.sortBy(_._1)
        .map { case (c, (r, b)) => SavedAnalogyRef(c, r, b) },
      metrics = {
        // persist the node-local clustering gap alongside user metrics
        // (reference serializes pGAP in its encoder, ClusteringNode.scala:53)
        val withGap =
          if (n.cluster == null) n.metrics
          else {
            val g = n.cluster.gap
            n.metrics + ("gap" -> (if (g.isNaN || g.isInfinite) 0.0 else g))
          }
        withGap.toSeq.sortBy(_._1).map { case (k, v) => SavedMetric(k, v) }
      })
    id
  }

  /** Load a tree saved by [[Tree.save]]. Schema is pinned to the encoder's
    * (no inference drift). */
  def load(spark: SparkSession, path: String): Tree = {
    import spark.implicits._
    val nodeEnc = Encoders.product[SavedNode]
    val saved = spark.read.schema(nodeEnc.schema).json(s"$path/nodes")
      .as[SavedNode].collect().sortBy(_.id)
    val vocabEnc = Encoders.product[SavedVocab]
    val vocab = spark.read.schema(vocabEnc.schema).json(s"$path/vocab")
      .as[SavedVocab].collect().map(v => v.token -> v.vector.toArray).toMap
    val dim = saved.map(_.dim).max max
      vocab.values.headOption.map(_.length).getOrElse(0)

    def rebuildSpec(id: Int): NodeSpec = {
      val s = saved(id)
      NodeSpec(s.name, algoOf(s.algo), s.classes, filterOf(s.filterMode),
        s.maxTopWords,
        s.analogyRefs.map(a => a.cls -> (a.ref, a.base)).toMap,
        s.children.map(rebuildSpec), s.childSplitSize, s.windowSize)
    }
    val rootNode = new Node(rebuildSpec(0), dim)
    def restore(node: Node, id: Int): Unit = {
      val s = saved(id)
      node.hits = s.hits
      node.metrics = s.metrics.map(m => m.key -> m.value).toMap
      node.svmWeights = s.svms.map(m => m.cls -> (m.weights.toArray, m.intercept)).toMap
      if (node.cluster != null && s.centers.nonEmpty) {
        s.centers.zipWithIndex.foreach { case (c, i) =>
          c.copyToArray(node.cluster.centers(i))
        }
        s.counts.zipWithIndex.foreach { case (n, i) => node.cluster.counts(i) = n }
        s.topwords.foreach { tw =>
          node.cluster.topTokens(tw.center) += ((tw.token, tw.vector.toArray, tw.score))
        }
      }
      node.children.zip(s.children).foreach { case (c, cid) => restore(c, cid) }
    }
    restore(rootNode, 0)
    new Tree(rootNode, dim, vocab)
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
    val dim = docs.take(1).headOption.flatMap(_._2.headOption.map(_.length))
      .orElse(vocab.values.headOption.map(_.length))
      .getOrElse(0)
    val vocabArr = vocab.map { case (k, v) => k -> v.toArray }

    // 1. distributed online pass (clustering state)
    val specBc = spark.sparkContext.broadcast((spec, dim, vocabArr))
    // RDD mapPartitions (trees are plain Java-serializable values, not
    // encoder-backed rows) + treeReduce: log-depth partial merges.
    // Empty input (annotation-only refits) short-circuits to a blank tree.
    val rdd = docs.rdd
    val fitted =
      if (rdd.partitions.isEmpty) new Node(spec, dim)
      else rdd.mapPartitions { it =>
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

  /** Adaptive fit with child spawning (reference ClusteringNode.scala:
    * 318-330 + fillChildren :572-598): clustering leaves whose hit count
    * reaches `childSplitSize` spawn one clustering child per class, each
    * with two fresh sub-classes (the reference's binary classCenters), and
    * the tree is refit. The reference spawns ONLINE mid-partition, which
    * makes the result order-dependent; driver-coordinated refit rounds are
    * the deterministic Spark-first equivalent (bounded by `maxRounds` full
    * passes — each pass is one distributed job, no per-doc driver action).
    */
  def fitAdaptive(spec: NodeSpec,
                  docs: Dataset[(Seq[String], Seq[Seq[Double]])],
                  annotations: Seq[(Seq[String], Int, Boolean)] = Nil,
                  vocab: Map[String, Seq[Double]] = Map.empty,
                  maxRounds: Int = 3): Tree = {
    var current = spec
    var tree = fit(current, docs, annotations, vocab)
    var round = 1
    var changed = true
    while (changed && round < maxRounds) {
      val maxCls = allSpecs(current).flatMap(_.classes).foldLeft(0)(_ max _)
      val gen = Iterator.from(maxCls + 1)
      val (expanded, didChange) = expand(current, tree.root, gen)
      changed = didChange
      if (changed) {
        current = expanded
        tree = fit(current, docs, annotations, vocab)
      }
      round += 1
    }
    tree
  }

  /** Per-node performance evaluation (reference ClassifierNode.scala:
    * 258-383 evaluateClassifiers / PerformanceReport): annotations split
    * 80/20 with a SEEDED hash (deterministic, unlike the reference's
    * Random), classifiers refit on the train side only, the held-out side
    * scored and swept for the optimal threshold. Writes
    * {threshold, precision, recall, f1, auc, n_test} into each supervised
    * node's `metrics` and returns them by node name. */
  def evaluateSupervised(tree: Tree, spec: NodeSpec,
                         annotations: Seq[(Seq[String], Int, Boolean)],
                         vocab: Map[String, Seq[Double]],
                         spark: SparkSession,
                         trainRatio: Double = 0.8,
                         seed: Long = 7L): Map[String, Map[String, Double]] = {
    import spark.implicits._
    // split by POSITION hash, not content hash: annotation logs repeat the
    // same (tokens, class) many times, and a content hash would send every
    // duplicate to the same side (test folds could go single-class)
    val (trainIdx, testIdx) = annotations.indices.partition { i =>
      val h = scala.util.hashing.MurmurHash3.productHash((i, seed))
      (math.abs(h) % 1000) < trainRatio * 1000
    }
    val train = trainIdx.map(annotations)
    val test = testIdx.map(annotations)
    if (train.isEmpty || test.isEmpty) return Map.empty
    val dummy = spark.emptyDataset[(Seq[String], Seq[Seq[Double]])]
    val heldOutTree = fit(spec, dummy, train, vocab)
    val vocabArr = vocab.map { case (k, v) => k -> v.toArray }
    val out = heldOutTree.root.allNodes.filter(_.spec.algo == Supervised).map { node =>
      val scoredRows = test.flatMap { case (tokens, cls, inRel) =>
        if (!node.spec.classes.contains(cls)) None
        else {
          val vecs = tokens.flatMap(vocabArr.get)
          val dv = meanVec(vecs, heldOutTree.dim)
          val score = node.svmWeights.get(cls).map { case (w, b) =>
            math.atan(VectorKernels.dot(w, dv) + b) / math.Pi + 0.5
          }.getOrElse(0.0)
          Some((score, if (inRel) 1.0 else 0.0))
        }
      }
      val metrics =
        if (scoredRows.isEmpty || scoredRows.map(_._2).distinct.length < 2) Map.empty[String, Double]
        else {
          val m = graft.operators.Tuning.optimizeThreshold(
            scoredRows.toDF("score", "label"), "score", "label", "f1", bins = 100)
          Map("threshold" -> m.threshold, "precision" -> m.precision,
            "recall" -> m.recall, "f1" -> m.f1, "auc" -> m.auc,
            "n_test" -> scoredRows.length.toDouble)
        }
      node.spec.name -> metrics
    }.toMap
    // stamp metrics onto the PRODUCTION tree's matching nodes
    tree.root.allNodes.foreach { n =>
      out.get(n.spec.name).foreach(m => if (m.nonEmpty) n.metrics = m)
    }
    out.filter(_._2.nonEmpty)
  }

  private def allSpecs(s: NodeSpec): Seq[NodeSpec] = s +: s.children.flatMap(allSpecs)

  private def expand(spec: NodeSpec, node: Node, gen: Iterator[Int]): (NodeSpec, Boolean) = {
    if (spec.algo == Clustering && spec.childSplitSize > 0 &&
        spec.children.isEmpty && node.hits >= spec.childSplitSize) {
      // one child per class, two fresh sub-classes each; children inherit
      // the split size so the expansion can cascade across rounds
      val kids = spec.classes.map { cls =>
        NodeSpec(s"${spec.name}/$cls", Clustering,
          classes = Seq(gen.next(), gen.next()),
          filterMode = spec.filterMode,
          maxTopWords = spec.maxTopWords,
          childSplitSize = spec.childSplitSize)
      }
      (spec.copy(children = kids, filterMode = BestScore), true)
    } else {
      val (newChildren, flags) = spec.children.zip(node.children)
        .map { case (cs, cn) => expand(cs, cn, gen) }.unzip
      (spec.copy(children = newChildren), flags.exists(identity))
    }
  }
}
