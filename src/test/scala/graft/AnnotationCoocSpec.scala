package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Cooccurrence, FuzzyLookup}
import graft.operators.FuzzyLookup.Options
import graft.topic.Annotations

class AnnotationCoocSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  test("annotation merge: latest wins, delete tombstones stick") {
    val df = Seq(
      (Seq("flu"), "illness", 0.5, 100L, null.asInstanceOf[String]),
      (Seq("flu"), "illness", 0.9, 200L, null.asInstanceOf[String]),   // latest -> survives
      (Seq("cold"), "illness", 0.7, 100L, null.asInstanceOf[String]),
      (Seq("cold"), "illness", 0.0, 300L, "delete"),                   // tombstone
      (Seq("cold"), "illness", 0.8, 200L, null.asInstanceOf[String]),  // older, must not resurrect
      (Seq("goal"), "sports", 0.6, 100L, null.asInstanceOf[String]))
      .toDF("tokens", "tag", "score", "timestamp", "operation")
    val merged = Annotations.merge(df)
      .select("tokens", "tag", "score").as[(Seq[String], String, Double)]
      .collect().toSet
    assert(merged == Set(
      (Seq("flu"), "illness", 0.9),
      (Seq("goal"), "sports", 0.6)))
  }

  test("cooccurrence: tag-specific tokens proposed, ubiquitous ones rejected") {
    val docs = Seq(
      (1L, Seq("fever", "cough", "the"), "illness"),
      (2L, Seq("fever", "chills", "the"), "illness"),
      (3L, Seq("fever", "cough", "the"), "illness"),
      (4L, Seq("goal", "match", "the"), "sports"),
      (5L, Seq("goal", "keeper", "the"), "sports"),
      (6L, Seq("goal", "match", "the"), "sports"))
      .toDF("docId", "tokens", "tag")
    val props = Cooccurrence.proposeTerms(docs, "tokens", "tag",
      minInTag = 2, liftFloor = 1.5, topN = 5)
      .select("tag", "token").as[(String, String)].collect().toSet
    assert(props.contains(("illness", "fever")) && props.contains(("sports", "goal")))
    assert(!props.exists(_._2 == "the"), "ubiquitous token must have lift ~1")
  }

  test("entity matcher: multi-leg mentions found exactly and with lev-1 typos") {
    val docs = Seq(
      (1L, Seq("Visit", "Saint", "John", "Hospital", "today")),
      (2L, Seq("the", "Sain", "John", "clinic")),      // typo in leg 1 (len>=4)
      (3L, Seq("nothing", "here"))).toDF("docId", "tokens")
    val entities = Seq(
      ("place", 1, Seq("saint", "john")),
      ("place", 2, Seq("hospital"))).toDF("tag", "entityIndex", "synonym")
    val out = graft.operators.EntityMatcher
      .matchEntities(docs, "docId", "tokens", entities)
      .select("docId", "entityIndex", "from", "to")
      .as[(Long, Int, Int, Int)].collect().toSet
    assert(out == Set((1L, 1, 1, 3), (1L, 2, 3, 4)))
    // doc 2's "Sain John": first leg is exact-match candidate generation,
    // so the typo'd FIRST leg is not found (documented limitation) — but a
    // typo in a later leg is:
    val entities2 = Seq(("place", 3, Seq("the", "sain", "john"))).toDF("tag", "entityIndex", "synonym")
    val out2 = graft.operators.EntityMatcher
      .matchEntities(docs, "docId", "tokens", entities2)
      .select("docId", "from").as[(Long, Int)].collect().toSet
    assert(out2 == Set((2L, 0)))
  }

  test("beam search: finds the best transition path, beam bounds survivors") {
    // positions with options; transition rewards equal consecutive values
    val opts = Seq(Seq(1, 2), Seq(2, 3), Seq(2, 9))
    val (path, score) = graft.functions.BeamSearch.bestPath[Int](opts,
      (a, b) => if (a == b) 1.0 else 0.0)
    assert(path == Seq(2, 2, 2) && score == 2.0)
    // beamWidth 1 = greedy: may miss the global optimum by design
    val (greedy, _) = graft.functions.BeamSearch.bestPath[Int](
      Seq(Seq(1), Seq(5, 1), Seq(1)), (a, b) => if (a == b) 1.0 else 0.0, beamWidth = 32)
    assert(greedy == Seq(1, 1, 1))
  }

  test("predict strategy: only the peak-likelihood span participates") {
    val left = Seq("visit the grand hospital of st john today").toDF("query")
    val right = Seq("st hospital", "john today visit").toDF("text")
    val weights = Map("hospital" -> 1.0, "st" -> 0.8, "john" -> 0.8,
      "grand" -> 0.2, "visit" -> 0.1, "the" -> 0.1, "of" -> 0.1, "today" -> 0.1)
    val out = FuzzyLookup.lookup(left, "query", right, "text",
      Options(strategy = "predict", termWeights = weights))
    val hits = out.where(col("text").isNotNull)
      .select("text").as[String].collect().toSeq
    // peak = "hospital" (pos 3); +-2 window keeps "st" (pos 5) but excludes
    // "john" (pos 6); low-likelihood tokens are dropped entirely, so the
    // john/today/visit doc must not match at all
    assert(hits == Seq("st hospital"))
  }
}
