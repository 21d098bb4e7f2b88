package graft.topic

import org.apache.spark.sql.{DataFrame, Dataset}
import graft.functions.VectorKernels
import scala.collection.mutable.ArrayBuffer

/** Genetic topic-prototype discovery (reference
  * topic/TopicTree.scala:22-429 VectorGeneticCategorizer): an individual is
  * a set of `nTopics` prototype "sentences" (a token window with its summed
  * vector); fitness of an individual is how discriminatively its prototypes
  * claim the corpus' sliding windows; evolution mixes strong individuals
  * keeping their most DIVERSE prototypes.
  *
  * Execution model preserved: fitness is one distributed pass per
  * generation — `mapPartitions` accumulates per-prototype scores + the best
  * matching window (child candidate) locally, `reduce` merges partials —
  * so the corpus never moves and generation cost is O(docs·windows·pop).
  * Differences from the reference, deliberate: RNG is SEEDED (the
  * reference's `new Random` makes runs irreproducible) and generations are
  * capped by `maxIterations` (the reference loops until improvement <= 0,
  * unbounded).
  */
object GeneticCategorizer {

  case class Options(
      populationSize: Int = 20,
      nTopics: Int = 5,
      sentenceSize: Int = 10,
      maxIterations: Int = 5,
      seed: Long = 42L)

  /** One topic prototype: the token window and its summed vector. */
  case class Prototype(tokens: Seq[String], vector: Array[Double])

  /** A matched span in a document (token offsets, discriminative score). */
  case class Span(from: Int, to: Int, score: Double)

  /** Sliding-window vector sum (reference slideVectors,
    * topic/TopicTree.scala:96-123): emits (windowSum, start, end) for every
    * full window, maintaining the sum incrementally (add head, subtract
    * tail) — O(len·dim), not O(len·window·dim). Also the standalone
    * `slideVectors` surface of SURVEY §2 row 42. */
  def slideVectors(vectors: Seq[Array[Double]], windowSize: Int): Iterator[(Array[Double], Int, Int)] = {
    if (vectors.isEmpty || vectors.head == null) return Iterator.empty
    val dim = vectors.head.length
    val arr = vectors.toArray
    val n = arr.length
    if (n < windowSize) return Iterator.empty
    val acc = new Array[Double](dim)
    var i = 0
    while (i < windowSize) {
      val v = arr(i); if (v != null) { var d = 0; while (d < dim) { acc(d) += v(d); d += 1 } }
      i += 1
    }
    Iterator.single((acc.clone(), 0, windowSize)) ++
      Iterator.range(windowSize, n).map { end =>
        val add = arr(end); val sub = arr(end - windowSize)
        if (add != null) { var d = 0; while (d < dim) { acc(d) += add(d); d += 1 } }
        if (sub != null) { var d = 0; while (d < dim) { acc(d) -= sub(d); d += 1 } }
        (acc.clone(), end - windowSize + 1, end + 1)
      }
  }

  /** Best prototype for a window: (index, discriminative margin) — the
    * reference's findBestSentence: bestSim minus the mean of the OTHER
    * prototypes' sims, so a window only scores when one prototype claims it
    * distinctly. */
  def findBest(v: Array[Double], protos: IndexedSeq[Prototype]): (Int, Double) = {
    var bestJ = 0; var bestSim = -2.0; var sumSim = 0.0
    var j = 0
    while (j < protos.length) {
      val s = VectorKernels.cosine(v, protos(j).vector)
      if (s > bestSim) { bestSim = s; bestJ = j }
      sumSim += s
      j += 1
    }
    val margin =
      if (protos.length <= 1) bestSim
      else bestSim - (sumSim - bestSim) / (protos.length - 1)
    (bestJ, margin)
  }

  /** Fitted model: the winning individual's prototypes. */
  final class Model(val topSentences: IndexedSeq[Prototype],
                    val sentenceSize: Int) extends Serializable {

    /** Score documents: per doc, every sliding window is claimed by its
      * best prototype; output per topic the max span score (rawPrediction),
      * a 0/1 membership (prediction), and the matched spans (reference
      * VectorGeneticCategorizerModel.transform span-change registration). */
    def transform(docs: Dataset[(Seq[String], Seq[Seq[Double]])]): DataFrame = {
      val spark = docs.sparkSession
      import spark.implicits._
      val bc = spark.sparkContext.broadcast(this)
      docs.map { case (tokens, vecs) =>
        val m = bc.value
        val protos = m.topSentences
        val va = vecs.map(v => if (v == null) null else v.toArray)
        val scores = Array.fill(protos.length)(0.0)
        val spans = Array.fill(protos.length)(List.empty[Span])
        var prevGroup = -1; var prevScore = 0.0; var prevFrom = -1; var prevTo = -1
        slideVectors(va, m.sentenceSize).foreach { case (wv, from, to) =>
          val (g, s) = findBest(wv, protos)
          if (prevGroup != -1 && g != prevGroup) {
            // group change: register the previous group's best stretch
            if (prevScore > scores(prevGroup)) scores(prevGroup) = prevScore
            spans(prevGroup) = spans(prevGroup) :+ Span(prevFrom, prevTo, prevScore)
            prevGroup = g; prevScore = s; prevFrom = from; prevTo = to
          } else if (prevGroup == -1 || s > prevScore) {
            prevGroup = g; prevScore = s; prevFrom = from; prevTo = to
          }
        }
        if (prevGroup != -1) {
          if (prevScore > scores(prevGroup)) scores(prevGroup) = prevScore
          spans(prevGroup) = spans(prevGroup) :+ Span(prevFrom, prevTo, prevScore)
        }
        val membership = scores.map(s => if (s > 0.0) 1.0 else 0.0)
        (tokens, scores.toSeq, membership.toSeq, spans.map(_.toSeq).toSeq)
      }.toDF("tokens", "rawPrediction", "prediction", "spans")
    }
  }

  /** Deterministic initial population: candidate windows are drawn at a
    * content-hash-derived offset per (doc, slot) and ranked by hash — a
    * seeded stand-in for the reference's orderBy(rand).take(...). */
  private def initialPopulation(docs: Dataset[(Seq[String], Seq[Seq[Double]])],
                                opts: Options): IndexedSeq[IndexedSeq[Prototype]] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sentSize = opts.sentenceSize
    val seed = opts.seed
    val want = opts.populationSize * opts.nTopics
    val candidates = docs.flatMap { case (tokens, vecs) =>
      val pairs = tokens.zip(vecs).filter(_._2 != null)
      if (pairs.length <= sentSize) Nil
      else {
        val h = scala.util.hashing.MurmurHash3.orderedHash(tokens, seed.toInt)
        (0 until 4).map { slot =>
          val start = math.abs(
            scala.util.hashing.MurmurHash3.productHash((h, slot))) %
            (pairs.length - sentSize)
          val win = pairs.slice(start, start + sentSize)
          val sum = new Array[Double](win.head._2.length)
          win.foreach { case (_, v) =>
            var d = 0; while (d < sum.length) { sum(d) += v(d); d += 1 }
          }
          (scala.util.hashing.MurmurHash3.productHash((h, slot, 1)),
            win.map(_._1), sum.toSeq)
        }
      }
    }.toDF("h", "tokens", "vector")
      // dedupe BEFORE ranking: duplicated docs yield identical (h, window)
      // candidates, and hash-ordering clusters those duplicates — without
      // this the top-N can collapse to copies of a few windows and the
      // whole population starts in one semantic cluster
      .dropDuplicates("tokens")
      .orderBy("h", "tokens")
      .limit(want)
      .as[(Int, Seq[String], Seq[Double])]
      .collect()
    candidates.zipWithIndex
      .groupBy(_._2 % opts.populationSize).toIndexedSeq.sortBy(_._1)
      .map { case (_, group) =>
        group.map { case ((_, t, v), _) => Prototype(t, v.toArray) }.toIndexedSeq
      }
  }

  /** Crossover (reference getNextGeneration, topic/TopicTree.scala:64-94):
    * each individual mixes with a seeded random partner; from the pooled,
    * fitness-sorted prototypes the child keeps the most mutually DIVERSE
    * ones (greedy farthest-from-chosen). */
  private def nextGeneration(
      scored: IndexedSeq[(IndexedSeq[(Prototype, Double)], Double)],
      rng: scala.util.Random): IndexedSeq[IndexedSeq[Prototype]] = {
    val n = scored.length
    scored.indices.map { i =>
      val p = { val r = rng.nextInt(math.max(n - 1, 1)); if (r >= i) r + 1 else r }
      val pool = (scored(i)._1 ++ scored(math.min(p, n - 1))._1)
        .sortBy { case (proto, s) => (-s, proto.tokens.mkString(" ")) }
      val k = scored(i)._1.length
      val chosen = ArrayBuffer(0)
      val available = scala.collection.mutable.TreeSet.empty[Int] ++ pool.indices.drop(1)
      while (chosen.length < k && available.nonEmpty) {
        // farthest available from the chosen set = minimal max-similarity
        var bestIdx = -1; var bestVal = Double.MaxValue
        available.foreach { aI =>
          var closest = -2.0
          chosen.foreach { cI =>
            val s = VectorKernels.cosine(pool(aI)._1.vector, pool(cI)._1.vector)
            if (s > closest) closest = s
          }
          if (closest < bestVal) { bestVal = closest; bestIdx = aI }
        }
        chosen += bestIdx
        available -= bestIdx
      }
      chosen.map(ci => pool(ci)._1).toIndexedSeq
    }
  }

  def fit(docs: Dataset[(Seq[String], Seq[Seq[Double]])],
          opts: Options = Options()): Model = {
    val spark = docs.sparkSession
    val sc = spark.sparkContext
    var population = initialPopulation(docs, opts)
    require(population.nonEmpty, "corpus yielded no candidate windows (docs shorter than sentenceSize?)")
    val rng = new scala.util.Random(opts.seed)
    var best = IndexedSeq.empty[(IndexedSeq[(Prototype, Double)], Double)]
    var lastScore = 0.0
    var improvement = Double.MaxValue
    var iter = 0
    while (improvement > 0 && iter < opts.maxIterations) {
      val bc = sc.broadcast(population)
      val sentSize = opts.sentenceSize
      // one distributed pass: per individual x prototype, accumulate
      // (fitness, best child window) — partial per partition, then reduce
      val partials = docs.rdd.mapPartitions { it =>
        val pop = bc.value
        val acc = pop.map(ind =>
          Array.fill(ind.length)((0.0, null: Prototype, -2.0)))
        it.foreach { case (tokens, vecs) =>
          val va = vecs.map(v => if (v == null) null else v.toArray)
          slideVectors(va, sentSize).foreach { case (wv, from, to) =>
            var i = 0
            while (i < pop.length) {
              val (j, s) = findBest(wv, pop(i))
              val (fit0, child0, childScore0) = acc(i)(j)
              acc(i)(j) =
                if (s > childScore0)
                  (fit0 + s / sentSize, Prototype(tokens.slice(from, to), wv), s)
                else (fit0 + s / sentSize, child0, childScore0)
              i += 1
            }
          }
        }
        Iterator.single(acc)
      }.reduce { (a, b) =>
        a.zip(b).map { case (ia, ib) =>
          ia.zip(ib).map {
            case ((f1, c1, s1), (f2, c2, s2)) =>
              (f1 + f2, if (s1 >= s2) c1 else c2, math.max(s1, s2))
          }
        }
      }
      bc.destroy()
      // child windows replace their prototypes (the reference's "best
      // child" promotion), individuals ranked by total fitness
      val newScored = population.zip(partials).map { case (ind, accRow) =>
        val protos = ind.zip(accRow).map { case (proto, (f, child, _)) =>
          (if (child != null) child else proto, f)
        }.sortBy(-_._2)
        (protos, accRow.map(_._1).sum)
      }
      best = (best ++ newScored).sortBy(-_._2).take(opts.populationSize)
      val score = best.map(_._2).sum
      improvement = score - lastScore
      lastScore = score
      if (improvement > 0 && iter + 1 < opts.maxIterations)
        population = nextGeneration(best, rng)
      iter += 1
    }
    new Model(best.head._1.map(_._1), opts.sentenceSize)
  }
}
