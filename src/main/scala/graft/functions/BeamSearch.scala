package graft.functions

/** Beam search over per-position option sequences (reference
  * search/PTree.scala:6-69 — POS-disambiguation search tree with
  * maxLeafs=32): at each position, every surviving path is extended with
  * every option, scored by a pairwise transition function, and the beam
  * keeps the best `beamWidth` paths. Driver/UDF-side utility — documents
  * are short; the distributed axis is rows, not the search. */
object BeamSearch {

  /** @param options    options per position (outer Seq = positions)
    * @param transition score of following `a` with `b` (higher = better)
    * @param beamWidth  max surviving paths per step (reference: 32)
    * @return best-scoring path (one option per position) and its score */
  def bestPath[T](options: Seq[Seq[T]],
                  transition: (T, T) => Double,
                  beamWidth: Int = 32): (Seq[T], Double) = {
    if (options.isEmpty) return (Seq.empty, 0.0)
    require(beamWidth >= 1, s"beamWidth must be >= 1, got $beamWidth")
    // a position with ZERO options empties the beam and the final maxBy
    // dies with a bare UnsupportedOperationException — raise by name
    // instead (callers supply at least one candidate per position; an
    // empty slot means the option builder upstream dropped everything)
    val bad = options.indexWhere(_.isEmpty)
    require(bad < 0,
      s"BeamSearch.bestPath: position $bad has no options — every " +
        "position needs at least one candidate")
    var beam: Seq[(List[T], Double)] =
      options.head.map(o => (List(o), 0.0))
    options.tail.foreach { opts =>
      beam = beam.flatMap { case (path, score) =>
        opts.map(o => ((o :: path), score + transition(path.head, o)))
      }.sortBy(-_._2).take(beamWidth)
    }
    val (bestRev, score) = beam.maxBy(_._2)
    (bestRev.reverse, score)
  }
}
