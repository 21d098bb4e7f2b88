package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Workspace

/** Specs for the workspace JSON-model compiler (the bi01 gate hash-matches
  * a full report; these pin the formula-language corners the gate's model
  * doesn't exercise: precedence, literals, spaced column names, DateDiff
  * units, filter compilation, and loader/report error surfaces). */
class WorkspaceSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val cols = Set("BirthDate", "Date", "Code Pays", "price", "qty")

  test("formula compiler: reference surface maps to Catalyst SQL") {
    assert(Workspace.compileToSql("GetYear(BirthDate)", cols) ==
      "year(`BirthDate`)")
    assert(Workspace.compileToSql("Format(Date, 'yyyyMMM')", cols) ==
      "date_format(`Date`, 'yyyyMMM')")
    assert(Workspace.compileToSql("GetDay(Date)", cols) == "day(`Date`)")
    assert(Workspace.compileToSql("Code Pays", cols) == "`Code Pays`")
    assert(Workspace.compileToSql("DateDiff(BirthDate, Now(), 'yyyy')", cols)
      == "(year(current_date()) - year(`BirthDate`))")
    assert(Workspace.compileToSql("DateDiff(BirthDate, Date, 'dd')", cols)
      == "datediff(`Date`, `BirthDate`)")
    assert(Workspace.compileToSql("DateDiff(BirthDate, Date, 'mm')", cols)
      == "((year(`Date`) - year(`BirthDate`)) * 12 + " +
        "(month(`Date`) - month(`BirthDate`)))")
  }

  test("formula compiler: arithmetic precedence and literals") {
    // * binds tighter than + (split on the last top-level +/- first)
    assert(Workspace.compileToSql("price + qty * 2", cols) ==
      "(`price` + (`qty` * 2))")
    assert(Workspace.compileToSql("Round(price * 1000)", cols) ==
      "round((`price` * 1000))")
    // explicit parens beat the default precedence — prove by evaluation
    val r = Workspace.compileToSql("(price + qty) * 2", cols)
    val df = Seq((3.0, 2L)).toDF("price", "qty")
      .select(expr(r).as("v"))
    assert(df.head().getDouble(0) == 10.0)
  }

  test("formula compiler: unknown function and unknown column reject") {
    intercept[IllegalArgumentException] {
      Workspace.compileToSql("Frobnicate(price)", cols)
    }
    intercept[IllegalArgumentException] {
      Workspace.compileToSql("no_such_col", cols)
    }
    intercept[IllegalArgumentException] {
      Workspace.compileToSql("DateDiff(Date, Date, 'ss')", cols)
    }
  }

  private def fixtureModel(): Workspace.WsModel = {
    val dir = graft.sources.Scratch.dir(spark, "wsmodel", "spec")
    val json =
      """{"sources": ["s1"],
        | "tables": [{"name": "T", "source": "s1", "fields": [
        |   {"name": "Yr", "dataType": "int",
        |    "formule": "GetYear(d)", "visible": true, "order": 1},
        |   {"name": "Amount Milli", "dataType": "bigint",
        |    "formule": "Round(amount * 1000)", "visible": false, "order": 2},
        |   {"name": "K", "dataType": "string", "formule": "k", "order": 3},
        |   {"name": "Month", "dataType": "string",
        |    "formule": "Format(d, 'MMM')", "order": 4,
        |    "orderby": "Format(d, 'yyyyMM')"}]}],
        | "reports": [
        |   {"name": "by year", "table": "T", "axes": ["Yr"],
        |    "measures": [{"field": "Amount Milli", "agg": "sum"},
        |                 {"field": "K", "agg": "count_distinct"}]},
        |   {"name": "filtered", "table": "T", "axes": ["K"],
        |    "measures": [{"field": "Amount Milli", "agg": "max"}],
        |    "filter": "GetYear(d) - 2020"},
        |   {"name": "legend", "table": "T", "axes": ["Yr"],
        |    "legend": "K",
        |    "measures": [{"field": "Amount Milli", "agg": "sum"}]},
        |   {"name": "by month", "table": "T", "axes": ["Month"],
        |    "measures": [{"field": "Amount Milli", "agg": "sum"}]}]}
        |""".stripMargin
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/model.json"), json.getBytes("UTF-8"))
    Workspace.load(spark, s"$dir/model.json")
  }

  private def data() = Seq(
    ("2020-03-01", 1.25, "a"), ("2020-07-09", 2.00, "b"),
    ("2021-01-15", 0.50, "a"), ("2021-06-30", 3.75, "a"))
    .toDF("d0", "amount", "k")
    .select(to_date(col("d0")).as("d"), col("amount"), col("k"))

  test("loader + report: axes, typed measures, deterministic grid") {
    val model = fixtureModel()
    assert(model.sources == Seq("s1"))
    assert(model.tables.head.fields.map(_.name) ==
      Seq("Yr", "Amount Milli", "K", "Month"))
    val grid = Workspace.runReport(model, "by year", Map("T" -> data()))
    assert(grid.columns.toSeq ==
      Seq("Yr", "sum_amount_milli", "count_distinct_k"))
    val rows = grid.as[(Int, Long, Long)].collect().toSeq
    assert(rows == Seq((2020, 3250L, 2L), (2021, 4250L, 1L)))
    // the axis field's declared int dataType is enforced on the output
    assert(grid.schema("Yr").dataType.typeName == "integer")
  }

  test("report filter compiles through the formula language") {
    val model = fixtureModel()
    // filter "GetYear(d) - 2020" is non-zero (truthy) only for 2021 rows
    val grid = Workspace.runReport(model, "filtered", Map("T" -> data()))
    val rows = grid.as[(String, Long)].collect().toSeq
    assert(rows == Seq(("a", 3750L)))
  }

  test("legend report pivots the measure, absent combinations stay NULL") {
    val model = fixtureModel()
    val grid = Workspace.runReport(model, "legend", Map("T" -> data()))
    // sorted legend values become the measure columns
    assert(grid.columns.toSeq == Seq("Yr", "a", "b"))
    val rows = grid.as[(Int, Option[Long], Option[Long])].collect().toSeq
    assert(rows == Seq(
      (2020, Some(1250L), Some(2000L)),
      (2021, Some(4250L), None))) // no 'b' rows in 2021 -> NULL cell
  }

  test("orderby formula sorts the axis chronologically, not by display value") {
    val model = fixtureModel()
    val grid = Workspace.runReport(model, "by month", Map("T" -> data()))
    // the hidden sort key is dropped from the output
    assert(grid.columns.toSeq == Seq("Month", "sum_amount_milli"))
    val months = grid.select("Month").as[String].collect().toSeq
    // display "Mar Jul Jan Jun" would sort alphabetically Jan,Jul,Jun,Mar;
    // the yyyyMM orderby gives chronological order across both years
    assert(months == Seq("Mar", "Jul", "Jan", "Jun"))
  }

  private def fixtureVisuals(): Seq[Workspace.WsVisual] = {
    val dir = graft.sources.Scratch.dir(spark, "wsmodel", "spec_vis")
    val json =
      """{"visuals": [
        |  {"name": "bars", "chart": "Bars", "table": "T", "bindings": [
        |    {"slot": "Category", "field": "Yr"},
        |    {"slot": "Legend", "field": "K"},
        |    {"slot": "Measure", "field": "Amount Milli", "agg": "Sum"}]},
        |  {"name": "scatter", "chart": "Scatter", "table": "T", "bindings": [
        |    {"slot": "Category", "field": "K"},
        |    {"slot": "X-Axis", "field": "Amount Milli", "agg": "Sum"},
        |    {"slot": "Y-Axis", "field": "Amount Milli", "agg": "Count"}]},
        |  {"name": "slicer", "chart": "Filter", "table": "T", "bindings": [
        |    {"slot": "Field", "field": "Yr"}]},
        |  {"name": "bad slot", "chart": "Bars", "table": "T", "bindings": [
        |    {"slot": "Nope", "field": "Yr"},
        |    {"slot": "Measure", "field": "Amount Milli", "agg": "Sum"}]},
        |  {"name": "two legends", "chart": "Bars", "table": "T", "bindings": [
        |    {"slot": "Category", "field": "Yr"},
        |    {"slot": "Legend", "field": "K"},
        |    {"slot": "Legend", "field": "Month"},
        |    {"slot": "Measure", "field": "Amount Milli", "agg": "Sum"}]},
        |  {"name": "aggless", "chart": "Bars", "table": "T", "bindings": [
        |    {"slot": "Category", "field": "Yr"},
        |    {"slot": "Measure", "field": "Amount Milli"}]}]}
        |""".stripMargin
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/visuals.json"), json.getBytes("UTF-8"))
    Workspace.loadVisuals(spark, s"$dir/visuals.json")
  }

  test("visuals: a Bars binding compiles to the legend-pivot grid") {
    val grid = Workspace.runVisual(fixtureModel(), fixtureVisuals(), "bars",
      Map("T" -> data()))
    assert(grid.columns.toSeq == Seq("Yr", "a", "b"))
    assert(grid.as[(Int, Option[Long], Option[Long])].collect().toSeq ==
      Seq((2020, Some(1250L), Some(2000L)), (2021, Some(4250L), None)))
  }

  test("visuals: Scatter groups the axis with X/Y measures; Filter emits the domain") {
    val sc = Workspace.runVisual(fixtureModel(), fixtureVisuals(), "scatter",
      Map("T" -> data()))
    assert(sc.columns.toSeq ==
      Seq("K", "sum_amount_milli", "count_amount_milli"))
    assert(sc.as[(String, Long, Long)].collect().toSeq ==
      Seq(("a", 5500L, 3L), ("b", 2000L, 1L)))
    val sl = Workspace.runVisual(fixtureModel(), fixtureVisuals(), "slicer",
      Map("T" -> data()))
    assert(sl.as[Int].collect().toSeq == Seq(2020, 2021))
  }

  test("visuals: binding violations name the broken contract") {
    val model = fixtureModel()
    val vis = fixtureVisuals()
    val m = Map("T" -> data())
    assert(intercept[IllegalArgumentException] {
      Workspace.runVisual(model, vis, "bad slot", m)
    }.getMessage.contains("no slot 'Nope'"))
    assert(intercept[IllegalArgumentException] {
      Workspace.runVisual(model, vis, "two legends", m)
    }.getMessage.contains("takes one binding"))
    assert(intercept[IllegalArgumentException] {
      Workspace.runVisual(model, vis, "aggless", m)
    }.getMessage.contains("needs an aggregate"))
  }

  test("report errors name the missing piece") {
    val model = fixtureModel()
    val e1 = intercept[IllegalArgumentException] {
      Workspace.runReport(model, "nope", Map("T" -> data()))
    }
    assert(e1.getMessage.contains("unknown report"))
    val e2 = intercept[IllegalArgumentException] {
      Workspace.runReport(model, "by year", Map.empty)
    }
    assert(e2.getMessage.contains("not mounted"))
  }

  test("duplicate measure aliases and legend/axis collisions reject up front") {
    val model = fixtureModel()
    // two measures with the same agg+field alias to the same column name
    val dup = model.copy(reports = model.reports.map {
      case r if r.name == "by year" => r.copy(measures = Seq(
        Workspace.WsMeasure("Amount Milli", "sum"),
        Workspace.WsMeasure("Amount Milli", "sum")))
      case r => r
    })
    val e1 = intercept[IllegalArgumentException] {
      Workspace.runReport(dup, "by year", Map("T" -> data()))
    }
    assert(e1.getMessage.contains("duplicate report output column"))
    // a legend VALUE equal to an axis column name would collide post-pivot
    val clash = data().withColumn("k", lit("Yr"))
    val e2 = intercept[IllegalArgumentException] {
      Workspace.runReport(model, "legend", Map("T" -> clash))
    }
    assert(e2.getMessage.contains("collide with axis column"))
  }

  test("a malformed model document fails as a parse error, not a null row") {
    val dir = graft.sources.Scratch.dir(spark, "wsmodel", "badspec")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/bad.json"),
      "{not json at all".getBytes("UTF-8"))
    val e = intercept[Exception] {
      Workspace.load(spark, s"$dir/bad.json")
    }
    // FAILFAST surfaces a parse error (wrapped by Spark); the old
    // PERMISSIVE mode let this through as a single all-null row
    assert(!e.isInstanceOf[NullPointerException])
  }
}
