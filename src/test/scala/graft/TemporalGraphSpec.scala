package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Graph, Quantize, Sampling, Temporal}

/** Specs for the round-7 temporal/graph/quantization tier. Each operator's
  * query is also DuckDB-oracle-gated (rj01/sc01/sn01/gr01/gr02/qz01/ann06/
  * st01); these specs pin the semantic invariants the hash gate can't
  * express (equivalence to the naive plan, conservation laws, nesting).
  */
class TemporalGraphSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("applyAggDelta: equals full rebuild across new keys, repeated folds, empty delta") {
    val base = Seq((1L, 10.0), (1L, 5.5), (2L, 7.25)).toDF("k", "v")
    val d1 = Seq((2L, 1.0), (3L, 9.0)).toDF("k", "v") // 3 is a NEW key
    val d2 = spark.emptyDataset[(Long, Double)].toDF("k", "v")
    val d3 = Seq((1L, 0.75)).toDF("k", "v")
    val inc = Seq(d1, d2, d3).foldLeft(
      Temporal.aggregateState(base, "k", "v"))(
      (st, dl) => Temporal.applyAggDelta(st, dl, "k", "v"))
    val full = Temporal.aggregateState(
      Seq(base, d1, d2, d3).reduce(_ unionByName _), "k", "v")
    val got = inc.select(col("k"), col("n_rows"),
      col("total").cast("double")).as[(Long, Long, Double)].collect().toSet
    val want = full.select(col("k"), col("n_rows"),
      col("total").cast("double")).as[(Long, Long, Double)].collect().toSet
    assert(got == want)
  }

  test("rangeJoin equals the naive inequality join, any bucket width") {
    val points = Seq(
      (1L, 10L, ts("2024-01-01 00:00:05")),
      (2L, 10L, ts("2024-01-01 01:30:00")),
      (3L, 20L, ts("2024-01-01 00:00:05")),
      (4L, 10L, ts("2024-01-01 00:59:59"))
    ).toDF("pid", "k", "t")
    val ivs = Seq(
      (100L, 10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")),
      (101L, 10L, ts("2024-01-01 00:30:00"), ts("2024-01-01 02:00:00")),
      (102L, 20L, ts("2024-01-01 00:00:05"), ts("2024-01-01 00:00:06"))
    ).toDF("iid", "k", "lo", "hi")
    val naive = points.as("p").join(ivs.as("i"),
        col("p.k") === col("i.k") && col("p.t") >= col("i.lo") &&
          col("p.t") < col("i.hi"))
      .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSet
    for (w <- Seq(1L, 60L, 3600L, 86400L)) {
      val got = Temporal.rangeJoin(points, ivs, "k", "t", "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == naive, s"bucketWidth=$w")
    }
    // half-open: a point exactly at `hi` is excluded, at `lo` included
    assert(naive.contains((1L, 100L)) && naive.contains((3L, 102L)))
    assert(!naive.exists { case (p, i) => p == 4L && i == 102L })
  }

  test("scd2Intervals: versions chain, exactly one current per key") {
    val ev = Seq(
      (7L, ts("2024-01-01 00:00:00"), 1L),
      (7L, ts("2024-01-03 00:00:00"), 2L),
      (7L, ts("2024-01-02 00:00:00"), 3L),
      (8L, ts("2024-05-01 00:00:00"), 4L)
    ).toDF("k", "t", "id")
    val out = Temporal.scd2Intervals(ev, "k", "t", "id")
      .orderBy("k", "version")
      .select("k", "version", "id", "is_current")
      .as[(Long, Int, Long, Boolean)].collect().toSeq
    assert(out == Seq((7L, 1, 1L, false), (7L, 2, 3L, false),
      (7L, 3, 2L, true), (8L, 1, 4L, true)))
    // valid_to of version v == valid_from of version v+1 (no gaps/overlaps)
    val iv = Temporal.scd2Intervals(ev, "k", "t", "id")
      .where(col("k") === 7L).orderBy("version")
      .select("valid_from", "valid_to")
      .as[(java.sql.Timestamp, Option[java.sql.Timestamp])].collect()
    assert(iv.init.zip(iv.tail).forall { case ((_, to), (from, _)) =>
      to.contains(from) })
  }

  test("sessionize: gap splits, counts and bounds are per-session") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (1L, ts("2024-01-01 00:10:00"), 2L),  // within 30m gap
      (1L, ts("2024-01-01 01:10:00"), 3L),  // > 30m after -> new session
      (2L, ts("2024-01-01 00:00:00"), 4L)
    ).toDF("k", "t", "id")
    val out = Temporal.sessionize(ev, "k", "t", "id", gapSeconds = 1800.0)
      .orderBy("k", "session_seq")
      .select("k", "session_seq", "n_events")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("pageRankInt: mass bounded, uniform on a symmetric graph, deterministic") {
    // 4-cycle: perfectly symmetric, so every node ends with the same rank
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L),
      (2L, 1L), (3L, 2L), (4L, 3L), (1L, 4L)).toDF("src", "dst")
    val ranks = Graph.pageRankInt(edges, "src", "dst", iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(ranks.size == 4)
    assert(ranks.values.toSet.size == 1, s"symmetric graph skewed: $ranks")
    // total mass stays within scale (integer floors only lose mass)
    assert(ranks.values.sum <= 1000000000000L)
    assert(ranks.values.sum > 900000000000L)
    // hub attracts rank: star graph center out-ranks leaves
    val star = Seq((1L, 9L), (2L, 9L), (3L, 9L),
      (9L, 1L), (9L, 2L), (9L, 3L)).toDF("src", "dst")
    val s2 = Graph.pageRankInt(star, "src", "dst", iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(s2(9L) > s2(1L) && s2(1L) == s2(2L) && s2(2L) == s2(3L))
  }

  test("personalized pageRank: seeds-everywhere equals classic; mass stays near seeds") {
    val ring = (0L until 8L).flatMap(i =>
      Seq((i, (i + 1) % 8), ((i + 1) % 8, i))).toDF("src", "dst")
    val allNodes = (0L until 8L).toDF("node_id")
    val classic = Graph.pageRankInt(ring, "src", "dst", iterations = 3)
      .as[(Long, Long)].collect().toMap
    val uniformSeeded = Graph.personalizedPageRankInt(ring, "src", "dst",
        allNodes, iterations = 3).as[(Long, Long)].collect().toMap
    assert(classic == uniformSeeded,
      "teleporting to ALL nodes must equal classic PageRank exactly")
    val seeded = Graph.personalizedPageRankInt(ring, "src", "dst",
        Seq(0L).toDF("node_id"), iterations = 3)
      .as[(Long, Long)].collect().toMap
    // an even ring is bipartite: finite-round mass oscillates by parity,
    // so compare WITHIN each parity class — distance from the seed must
    // decay there — and the antipode (distance 4) gets nothing in 3 hops
    assert(seeded(0L) > seeded(2L) && seeded(1L) > seeded(3L) &&
      seeded(4L) == seeded.values.min,
      s"rank must decay with ring distance per parity class: $seeded")
    // seeds outside the graph are ignored; all-foreign seeds reject
    assertThrows[IllegalArgumentException] {
      Graph.personalizedPageRankInt(ring, "src", "dst",
        Seq(99L).toDF("node_id"), iterations = 1).collect()
    }
  }

  test("degreeStats: multigraph multiplicity vs distinct, zero-fill") {
    val edges = Seq((1L, 10L), (1L, 10L), (1L, 11L), (2L, 10L))
      .toDF("src", "dst")
    val out = Graph.degreeStats(edges, "src", "dst")
      .orderBy("node_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 2L, 0L, 0L),   // out 3 edges to 2 distinct, no in-edges
      (2L, 1L, 1L, 0L, 0L),
      (10L, 0L, 0L, 3L, 2L),  // in from 1 (twice) and 2
      (11L, 0L, 0L, 1L, 1L)))
  }

  test("asof tolerance: stale matches nulled, fresh kept, boundary inclusive") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 12:00:00"), 2L),
      (1L, ts("2024-01-02 12:00:00"), 3L)).toDF("k", "t", "lid")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 7L)).toDF("k", "t", "rid")
    val got = graft.operators.AsOfJoin.backwardWithin(left, right, "k", "t",
        Seq("rid"), "rid", toleranceSeconds = 3600 * 3.0)
      .select(col("lid"), col("asof.rid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(1L -> Some(7L), 2L -> Some(7L), 3L -> None))
    // exactly-at-tolerance is inclusive (<=)
    val edge = graft.operators.AsOfJoin.backwardWithin(left, right, "k", "t",
        Seq("rid"), "rid", toleranceSeconds = 3600.0)
      .select(col("lid"), col("asof.rid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(edge(1L) == Some(7L) && edge(2L).isEmpty)
  }

  test("snapshotDiff: add/remove/change classified, unchanged and null=null dropped") {
    val oldS = Seq((1L, Some("a")), (2L, Some("b")), (3L, None),
      (4L, Some("d"))).toDF("k", "v")
    val newS = Seq((1L, Some("a")), (2L, Some("B")), (3L, None),
      (5L, Some("e"))).toDF("k", "v")
    val got = Temporal.snapshotDiff(oldS, newS, "k", Seq("v"))
      .select("k", "change", "old_v", "new_v")
      .as[(Long, String, Option[String], Option[String])].collect().toSet
    assert(got == Set(
      (2L, "changed", Some("b"), Some("B")),
      (4L, "removed", Some("d"), None),
      (5L, "added", None, Some("e"))))
    // null -> value counts as changed (null-safe compare, not SQL-equals)
    val n2v = Temporal.snapshotDiff(
        Seq((9L, Option.empty[String])).toDF("k", "v"),
        Seq((9L, Some("x"))).toDF("k", "v"), "k", Seq("v"))
      .select("change").as[String].collect().toSeq
    assert(n2v == Seq("changed"))
  }

  test("triangleStats: known counts, canonicalization of dup/loop/reversed edges") {
    // square 1-2-3-4-1 plus diagonal 1-3 → triangles (1,2,3) and (1,3,4);
    // fed with a duplicate, a self-loop, and a reversed edge to prove
    // canonicalization
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L),
      (2L, 1L), (1L, 2L), (3L, 3L)).toDF("src", "dst")
    val got = Graph.triangleStats(edges, "src", "dst")
      .orderBy("node_id")
      .select("node_id", "degree", "triangles", "clustering")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 2L, 2.0 / 3.0),
      (2L, 2L, 1L, 1.0),
      (3L, 3L, 2L, 2.0 / 3.0),
      (4L, 2L, 1L, 1.0)))
  }

  test("triangleStats equals brute-force enumeration on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(150)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val adj = edges.collect { case (a, b) if a != b =>
      Set(math.min(a, b) -> math.max(a, b)) }.flatten.toSet
    val nodes = adj.flatMap { case (a, b) => Seq(a, b) }
    val naive = nodes.map { u =>
      val nb = adj.collect { case (a, b) if a == u => b
                             case (a, b) if b == u => a }
      u -> nb.toSeq.combinations(2).count {
        case Seq(x, y) => adj((math.min(x, y), math.max(x, y))) }
    }.toMap
    val got = Graph.triangleStats(edges.toDF("src", "dst"), "src", "dst")
      .select("node_id", "triangles").as[(Long, Long)].collect().toMap
    assert(got.keySet == nodes)
    nodes.foreach(u => assert(got(u) == naive(u).toLong,
      s"node $u: got ${got(u)} want ${naive(u)}"))
  }

  test("int8 quantization: codes saturate at ±127, max-abs element hits it") {
    val df = Seq((1L, Array(0.5f, -1.0f, 0.25f)), (2L, Array(0f, 0f, 0f)))
      .toDF("id", "v")
    val q = Quantize.int8Symmetric(df, "v")
      .select(col("id"), col("scale"), col("qvec"))
      .as[(Long, Double, Array[Int])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val (s1, q1) = q(1L)
    assert(s1 == 1.0 && q1.toSeq == Seq(64, -127, 32))
    assert(q(2L)._2.toSeq == Seq(0, 0, 0)) // zero vector -> zero codes
    // reconstruction error bound: |v - q*scale/127| <= scale/254 per dim
    val err = math.abs(0.5 - 64 * s1 / 127)
    assert(err <= s1 / 254 + 1e-12)
  }

  test("int8TopK: self excluded, scores are exact integer dot products") {
    val vecs = Seq(
      (1L, Array(1f, 0f)), (2L, Array(1f, 0.01f)), (3L, Array(-1f, 0f))
    ).toDF("id", "v")
    val out = Quantize.int8TopK(vecs.where(col("id") === 1L), vecs,
      "id", "v", k = 2)
      .select("neighbor_id", "rank", "score")
      .as[(Long, Int, Long)].collect().sortBy(_._2).toSeq
    // q(1)=[127,0], q(2)=[127,1], q(3)=[-127,0]
    assert(out == Seq((2L, 1, 127L * 127), (3L, 2, -127L * 127)))
  }

  test("stratifiedHashSample: rates move thresholds, samples nest") {
    val df = (0L until 2000L).map(i =>
      (i, if (i % 2 == 0) "a" else "b")).toDF("id", "g")
    val lo = Sampling.stratifiedHashSample(df, "id", "g",
      Map("a" -> 0.25, "b" -> 0.0)).select("id").as[Long].collect().toSet
    val hi = Sampling.stratifiedHashSample(df, "id", "g",
      Map("a" -> 0.5, "b" -> 0.0)).select("id").as[Long].collect().toSet
    assert(lo.subsetOf(hi), "raising a stratum rate must only add rows")
    assert(lo.forall(_ % 2 == 0), "zero-rate stratum leaked rows")
    // observed rate near nominal (hash is uniform; 1000 draws at 0.25)
    assert(math.abs(lo.size / 1000.0 - 0.25) < 0.08)
    // default applies to unlisted strata
    val withDefault = Sampling.stratifiedHashSample(df, "id", "g",
      Map("a" -> 0.0), default = 0.5).select("id").as[Long].collect()
    assert(withDefault.forall(_ % 2 == 1))
  }

  test("labelPropagation: cliques converge to min label, bridge stays put") {
    // two 4-cliques joined by one bridge edge 4–10: after two plurality
    // rounds each clique agrees on its min label, and the bridge's
    // single cross-vote cannot outvote a clique majority (hand-simulated;
    // triangles would NOT work — min-label ties leak across the bridge)
    val clique = (ns: Seq[Long]) =>
      for (a <- ns; b <- ns if a < b) yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) :+ ((4L, 10L)))
      .toDF("src", "dst")
    val got = Graph.labelPropagation(edges, "src", "dst", iterations = 2)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(got(_) == 1L), got.toString)
    assert(Seq(10L, 11L, 12L, 13L).forall(got(_) == 10L), got.toString)
    // zero rounds: everyone keeps their own id
    val id0 = Graph.labelPropagation(edges, "src", "dst", iterations = 0)
      .as[(Long, Long)].collect()
    assert(id0.forall { case (n, l) => n == l })
    // determinism: same labels under different input partitioning and
    // duplicated/reversed edges (symmetrize + distinct must normalize)
    val messy = edges.union(edges.select(col("dst").as("src"),
      col("src").as("dst"))).union(edges).repartition(13)
    val again = Graph.labelPropagation(messy, "src", "dst", iterations = 2)
      .as[(Long, Long)].collect().toMap
    assert(again == got)
  }

  test("kCore: cascade peels the tail, core degrees exact, convergence required") {
    // 4-clique (a 3-core) with a pendant chain 4-20-21: k=2 peels the
    // chain one node per round (21 first, then 20), k=3 also cuts nothing
    // of the clique; messy input (dup/reversed/self-loop) normalizes
    val clique = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = (clique ++ Seq((4L, 20L), (20L, 21L), (21L, 21L), (20L, 4L)))
      .toDF("src", "dst")
    val core3 = Graph.kCore(edges, "src", "dst", k = 3)
      .as[(Long, Long)].collect().toMap
    assert(core3 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val core2 = Graph.kCore(edges, "src", "dst", k = 2)
      .as[(Long, Long)].collect().toMap
    assert(core2.keySet == Set(1L, 2L, 3L, 4L) && core2(4L) == 3L)
    // k larger than any degree: empty core, still converges
    assert(Graph.kCore(edges, "src", "dst", k = 10).count() == 0)
    // a 6-path needs 3 peel rounds at k=2 (both pendant ends per round);
    // maxRounds below that must refuse rather than return a wrong cut
    val path = (1L to 6L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("src", "dst")
    intercept[IllegalArgumentException] {
      Graph.kCore(path, "src", "dst", k = 2, maxRounds = 2)
    }
  }

  test("intervalOverlapJoin: one row per overlapping pair across cells, half-open") {
    // left intervals per key k; epoch-second bounds chosen to span cells
    // (bucketWidth=10): [3,25) covers cells 0..2
    val left = Seq(("k", 1L, 3L, 25L), ("k", 2L, 30L, 35L),
      ("x", 3L, 0L, 100L))
      .toDF("key", "lid", "ls", "le")
    val right = Seq(("k", 10L, 0L, 50L),   // overlaps lid 1 AND 2
      ("k", 11L, 24L, 31L),                // overlaps both (edges)
      ("k", 12L, 25L, 30L),                // adjacent to both: NO overlap
      ("y", 13L, 0L, 100L))                // wrong key
      .toDF("key", "rid", "rs", "re")
    val got = graft.operators.Temporal.intervalOverlapJoin(
        left, right, "key", "ls", "le", "rs", "re", bucketWidth = 10L)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    // exactly one row per overlapping pair — the max-start-cell election
    // dedups pairs that share many cells (lid1×rid10 share cells 0..2)
    assert(got.sorted == Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L)))
    assert(got.size == got.distinct.size)
  }

  test("recursiveLDiversity: dominance fails, balanced passes, l floor") {
    val rows =
      Seq.fill(98)(("z1", "flu")) ++ Seq(("z1", "cold"), ("z1", "hiv")) ++
        (Seq.fill(5)(("z2", "a")) ++ Seq.fill(4)(("z2", "b")) ++
          Seq.fill(3)(("z2", "c"))) ++
        Seq.fill(4)(("z3", "only"))
    val got = graft.operators.DataQuality.recursiveLDiversity(
        rows.toDF("zip", "diag"), Seq("zip"), "diag", l = 2,
        cNum = 3, cDen = 1)
      .select("zip", "class_size", "n_sensitive", "top_freq", "tail_freq",
        "cl_diverse")
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("z1") == (("z1", 100L, 3L, 98L, 2L, false))) // 98 !< 3*2
    assert(got("z2") == (("z2", 12L, 3L, 5L, 7L, true)))    // 5 < 3*7
    assert(got("z3") == (("z3", 4L, 1L, 4L, 0L, false)))    // < l distinct
  }
}
