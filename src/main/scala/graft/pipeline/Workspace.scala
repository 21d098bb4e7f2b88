package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Workspace BI-model compiler (reference: vue/server/model.js:28-77 —
  * a model is `{sources, tables[{name, fields[{name, type, dataType,
  * formule, format, visible, order, level, orderby?}]}], reports}`;
  * vue/server/workspace.js:1-31 — workspaces persist model/visuals/
  * datasources JSON per user). The reference's server only stores and
  * serves that JSON (vue/server/api.js:138-163 parses the datasource and
  * echoes the query back); the query semantics it names — formula fields
  * like `GetYear(BirthDate)` / `Format(Date, 'yyyyMMM')` /
  * `DateDiff(Date, Now(), 'yyyy')` (vue/data/data.js:8-33) grouped by
  * axis fields and aggregated over measure fields (the chart descriptors
  * at vue/data/data.js:51-77) — are what this compiler expresses,
  * Spark-first: every formula compiles to a Catalyst expression string,
  * a report is one declarative groupBy/agg, and the whole plan stays
  * inside whole-stage codegen (no UDFs anywhere).
  *
  * The JSON is read through Spark's own JSON source with an explicit
  * schema (the TopicTree save/load discipline) — a model file is
  * driver-side configuration, so collecting it is bounded by the model's
  * own size, never by data.
  *
  * Formula language (the reference surface plus the obvious closure):
  *   - bare field references, including names with spaces/accents
  *     (`Code Pays`) — resolved against the mounted table's columns;
  *   - `GetYear(e)` / `GetMonth(e)` / `GetDay(e)` → int date parts;
  *   - `Format(e, 'pattern')` → `date_format` with the Java pattern the
  *     reference already uses (`yyyyMMM`, `yyyyMM`);
  *   - `DateDiff(a, b, 'unit')` with unit `yyyy`/`mm`/`dd` → signed
  *     whole-unit difference b−a (year/month arithmetic on date parts,
  *     day arithmetic on datediff — integer end to end);
  *   - `Round(e)` → nearest integer (the exact-measure idiom: a money
  *     double becomes an exactly-summable integer measure via
  *     `Round(price * 1000)` + a bigint field dataType);
  *   - `Now()` → `current_date()` (kept out of gated fixtures: it is
  *     non-deterministic by nature, exactly why the reference's demo
  *     model uses it only for patient age);
  *   - integer/string literals and `+ - * /` between compiled terms.
  *
  * Scale: compilation is pure driver-side string work on a KB-sized
  * model; execution is whatever the compiled single groupBy/agg plan is —
  * one shuffle on the axis key with map-side partial aggregation, same
  * as any hand-written report over the fact table.
  */
object Workspace {

  case class WsField(name: String, dataType: String, formule: String,
                     visible: Option[Boolean], order: Option[Long],
                     level: Option[Long], orderby: Option[String])
  case class WsTable(name: String, source: String,
                     fields: Seq[WsField])
  case class WsMeasure(field: String, agg: String)
  case class WsReport(name: String, table: String, axes: Seq[String],
                      measures: Seq[WsMeasure], filter: Option[String],
                      legend: Option[String])
  case class WsBinding(slot: String, field: String, agg: Option[String])
  case class WsVisual(name: String, chart: String, table: String,
                      bindings: Seq[WsBinding])
  case class WsVisuals(visuals: Seq[WsVisual])
  case class WsModel(sources: Seq[String], tables: Seq[WsTable],
                     reports: Seq[WsReport])

  /** Load a model.json (one JSON document, possibly multi-line — the
    * workspace.js storage shape) into the typed model. */
  def load(spark: SparkSession, path: String): WsModel = {
    val enc = Encoders.product[WsModel]
    // FAILFAST: a malformed document must die as a parse error here, not
    // as an all-null row that trips an opaque NPE later in runReport
    val rows = spark.read.schema(enc.schema)
      .option("multiLine", "true").option("mode", "FAILFAST").json(path)
      .as[WsModel](enc).collect()
    require(rows.length == 1, s"expected one model document at $path, " +
      s"got ${rows.length}")
    require(rows.head.tables != null && rows.head.reports != null,
      s"model document at $path is missing 'tables'/'reports'")
    rows.head
  }

  /** Load a visuals.json (the workspace's sibling document,
    * workspace.js:13-17) into its typed bindings. */
  def loadVisuals(spark: SparkSession, path: String): Seq[WsVisual] = {
    val enc = Encoders.product[WsVisuals]
    val rows = spark.read.schema(enc.schema)
      .option("multiLine", "true").option("mode", "FAILFAST").json(path)
      .as[WsVisuals](enc).collect()
    require(rows.length == 1, s"expected one visuals document at $path, " +
      s"got ${rows.length}")
    require(rows.head.visuals != null,
      s"visuals document at $path is missing 'visuals'")
    rows.head.visuals
  }

  /** The visual gallery's slot descriptors (vue/data/data.js:48-80):
    * slot name → (kind, arity). `axis` slots take plain fields, `measure`
    * slots take a field plus an aggregate (the measureFunctions list,
    * data.js:82-88: Sum / Count / Distinct Count / Average). */
  val visualGallery: Map[String, Seq[(String, String, String)]] = {
    val grouped = Seq(("Title", "string", "1"), ("Category", "axis", "*"),
      ("Legend", "axis", "1"), ("Measure", "measure", "*"))
    Map(
      "Lines" -> grouped,
      "Bars" -> grouped,
      "Scatter" -> Seq(("Title", "string", "1"), ("X-Axis", "measure", "1"),
        ("Y-Axis", "measure", "1"), ("Category", "axis", "1"),
        ("Legend", "axis", "1")),
      "Filter" -> Seq(("Field", "axis", "1")),
      "Table" -> Seq(("Field", "axis", "*")))
  }

  private val measureFunctions = Map(
    "sum" -> "sum", "count" -> "count", "distinct count" -> "count_distinct",
    "average" -> "avg")

  /** Validate a visual's bindings against its chart's slot descriptors
    * and compile it to its data grid through [[runReport]]:
    * Lines/Bars group the Category axes (legend pivots the measure),
    * Scatter groups Category+Legend with the X/Y measures, Filter/Table
    * emit the bound fields' DISTINCT ordered tuples (the domain a
    * slicer/table renders). Rejections name the violated contract:
    * unknown chart, unknown slot, an arity-1 slot bound twice, a measure
    * binding without an aggregate (or with an unknown one), an aggregate
    * on an axis slot, or a chart that needs a measure and has none. */
  def runVisual(model: WsModel, visuals: Seq[WsVisual], visualName: String,
                mounted: Map[String, DataFrame]): DataFrame = {
    val v = visuals.find(_.name == visualName).getOrElse(
      throw new IllegalArgumentException(s"unknown visual '$visualName' " +
        s"(have: ${visuals.map(_.name).mkString(", ")})"))
    val slots = visualGallery.getOrElse(v.chart,
      throw new IllegalArgumentException(s"unknown chart type " +
        s"'${v.chart}' (have: ${visualGallery.keys.toSeq.sorted.mkString(", ")})"))
    val slotByName = slots.map(s => s._1 -> s).toMap
    v.bindings.foreach { b =>
      val (_, kind, _) = slotByName.getOrElse(b.slot,
        throw new IllegalArgumentException(s"visual '${v.name}': chart " +
          s"'${v.chart}' has no slot '${b.slot}' " +
          s"(have: ${slots.map(_._1).mkString(", ")})"))
      if (kind == "measure") {
        val agg = b.agg.getOrElse(throw new IllegalArgumentException(
          s"visual '${v.name}': measure slot '${b.slot}' needs an " +
            s"aggregate (${measureFunctions.keys.toSeq.sorted.mkString(", ")})"))
        require(measureFunctions.contains(agg.toLowerCase),
          s"visual '${v.name}': unknown aggregate '$agg'")
      } else require(b.agg.isEmpty,
        s"visual '${v.name}': slot '${b.slot}' is an $kind slot — " +
          "it takes no aggregate")
    }
    slots.foreach { case (name, _, arity) =>
      val n = v.bindings.count(_.slot == name)
      require(arity == "*" || n <= 1,
        s"visual '${v.name}': slot '$name' takes one binding, got $n")
    }
    def bound(slot: String): Seq[WsBinding] = v.bindings.filter(_.slot == slot)
    def measuresOf(slotNames: String*): Seq[WsMeasure] =
      slotNames.flatMap(bound).map(b =>
        WsMeasure(b.field, measureFunctions(b.agg.get.toLowerCase)))
    v.chart match {
      case "Lines" | "Bars" =>
        val measures = measuresOf("Measure")
        require(measures.nonEmpty,
          s"visual '${v.name}': ${v.chart} needs at least one Measure")
        require(bound("Category").nonEmpty,
          s"visual '${v.name}': ${v.chart} needs at least one Category")
        runReport(model.copy(reports = Seq(WsReport(v.name, v.table,
          axes = bound("Category").map(_.field), measures = measures,
          filter = None, legend = bound("Legend").headOption.map(_.field)))),
          v.name, mounted)
      case "Scatter" =>
        val measures = measuresOf("X-Axis", "Y-Axis")
        require(measures.size == 2,
          s"visual '${v.name}': Scatter needs X-Axis and Y-Axis measures")
        val axes = (bound("Category") ++ bound("Legend")).map(_.field)
        require(axes.nonEmpty,
          s"visual '${v.name}': Scatter needs a Category or Legend axis")
        runReport(model.copy(reports = Seq(WsReport(v.name, v.table,
          axes = axes, measures = measures, filter = None, legend = None))),
          v.name, mounted)
      case "Filter" | "Table" =>
        val fields = bound("Field").map(_.field)
        require(fields.nonEmpty,
          s"visual '${v.name}': ${v.chart} needs a Field binding")
        val table = model.tables.find(_.name == v.table).getOrElse(
          throw new IllegalArgumentException(
            s"visual table '${v.table}' is not in the model"))
        val df = mounted.getOrElse(table.name,
          throw new IllegalArgumentException(
            s"table '${table.name}' is not mounted"))
        val columns = df.columns.toSet
        df.select(fields.map(f => fieldExpr(table, f, columns).as(f)): _*)
          .distinct()
          .orderBy(fields.map(col): _*)
    }
  }

  // ---- formula compiler ----------------------------------------------------

  /** Compile a reference `formule` string to a Spark SQL expression
    * string (then `expr()` — Catalyst parses, optimizes, and codegens
    * it like any hand-written column). */
  def compileFormula(formula: String, columns: Set[String]): Column =
    expr(compileToSql(formula.trim, columns))

  /** The formula → Spark-SQL-string step alone (what [[compileFormula]]
    * wraps in `expr`); public so callers can inspect/log compiled plans. */
  def compileToSql(f: String, columns: Set[String]): String = {
    val s = f.trim
    // binary arithmetic at top level (left-assoc, no precedence beyond
    // * / over + - ; parenthesized output keeps Catalyst's reading exact)
    splitTop(s, Seq('+', '-')).orElse(splitTop(s, Seq('*', '/'))) match {
      case Some((l, op, r)) =>
        s"(${compileToSql(l, columns)} $op ${compileToSql(r, columns)})"
      case None => compileAtom(s, columns)
    }
  }

  /** Split on the LAST top-level occurrence of one of `ops` (left
    * associativity), ignoring operators inside parens/quotes. Returns
    * None when the string is a single atom. */
  private def splitTop(s: String, ops: Seq[Char]): Option[(String, Char, String)] = {
    var depth = 0; var inQ = false; var found = -1
    for (i <- s.indices) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          // a sign whose previous non-space char is '(' or an operator
          // is unary, not binary
          val prev = s.substring(0, i).reverse.dropWhile(_ == ' ')
            .headOption.getOrElse('(')
          if (depth == 0 && ops.contains(c) &&
            !"+-*/(,".contains(prev) && i < s.length - 1)
            found = i
      }
    }
    if (found < 0) None
    else Some((s.substring(0, found), s.charAt(found), s.substring(found + 1)))
  }

  private def compileAtom(s0: String, columns: Set[String]): String = {
    val s = s0.trim
    require(s.nonEmpty, "empty formula atom")
    if (s.startsWith("(") && s.endsWith(")") && balanced(s.substring(1, s.length - 1)))
      return s"(${compileToSql(s.substring(1, s.length - 1), columns)})"
    if (s.startsWith("'") && s.endsWith("'")) return s // string literal
    if (s.matches("-?[0-9]+(\\.[0-9]+)?")) return s    // numeric literal
    val call = "([A-Za-z_][A-Za-z0-9_]*)\\s*\\((.*)\\)".r
    s match {
      case call(fn, argStr) =>
        val args = splitArgs(argStr)
        def arg(i: Int) = compileToSql(args(i), columns)
        def lit(i: Int): String = {
          val a = args(i).trim
          require(a.startsWith("'") && a.endsWith("'"),
            s"$fn expects a quoted literal at arg ${i + 1}, got: $a")
          a
        }
        fn.toLowerCase match {
          case "getyear"  => s"year(${arg(0)})"
          case "getmonth" => s"month(${arg(0)})"
          case "getday"   => s"day(${arg(0)})"
          case "format"   => s"date_format(${arg(0)}, ${lit(1)})"
          case "round"    => s"round(${arg(0)})"
          case "now"      => "current_date()"
          case "datediff" =>
            val unit = lit(2).stripPrefix("'").stripSuffix("'").toLowerCase
            val (a, b) = (arg(0), arg(1))
            unit match {
              case "yyyy" => s"(year($b) - year($a))"
              case "mm"   => s"((year($b) - year($a)) * 12 + (month($b) - month($a)))"
              case "dd"   => s"datediff($b, $a)"
              case u => throw new IllegalArgumentException(
                s"DateDiff unit must be yyyy/mm/dd, got '$u'")
            }
          case other => throw new IllegalArgumentException(
            s"unknown workspace formula function: $other (formula: $s)")
        }
      case _ =>
        // bare field reference — must exist on the mounted table; spaces
        // and non-ASCII survive via backticks
        require(columns.contains(s),
          s"formula references unknown column '$s' (have: " +
            s"${columns.toSeq.sorted.mkString(", ")})")
        s"`${s.replace("`", "``")}`"
    }
  }

  private def balanced(s: String): Boolean = {
    var depth = 0; var inQ = false
    s.forall { c =>
      if (inQ) { if (c == '\'') inQ = false; true }
      else c match {
        case '\'' => inQ = true; true
        case '(' => depth += 1; true
        case ')' => depth -= 1; depth >= 0
        case _ => true
      }
    } && depth == 0
  }

  private def splitArgs(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var inQ = false; var start = 0
    for (i <- s.indices) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
    }
    if (s.trim.nonEmpty || start > 0) out += s.substring(start)
    out.result().map(_.trim)
  }

  // ---- report execution ----------------------------------------------------

  private val aggs: Map[String, Column => Column] = Map(
    "sum" -> (c => sum(c)), "count" -> (c => count(c)),
    "min" -> (c => min(c)), "max" -> (c => max(c)),
    "avg" -> (c => avg(c)), "count_distinct" -> (c => countDistinct(c)))

  /** Compile one field of `table` to its typed (unaliased) Column: the
    * formula through the compiler, then the field's declared dataType as
    * a cast (the model's contract with its visuals — an `int` field IS
    * int, whatever the formula's natural type). */
  private def fieldExpr(table: WsTable, fieldName: String,
                        columns: Set[String]): Column = {
    val f = table.fields.find(_.name == fieldName).getOrElse(
      throw new IllegalArgumentException(
        s"report references unknown field '$fieldName' on table " +
          s"'${table.name}' (have: ${table.fields.map(_.name).mkString(", ")})"))
    val c = compileFormula(f.formule, columns)
    f.dataType.toLowerCase match {
      case "int"    => c.cast("int")
      case "bigint" => c.cast("long")
      case "double" => c.cast("double")
      case _        => c // string/date fields keep the formula's own type
    }
  }

  /** Run a named report: the mounted frames map table names (the model's
    * `Source`-qualified tables) to DataFrames — parquet scans, usually.
    * The result is the report's grid: one row per axis combination with
    * the aggregated measures, ordered by the axes (deterministic — the
    * grid a visual renders is order-stable).
    *
    * `legend` (the chart descriptors' arity-1 Legend slot,
    * vue/data/data.js:53,60,69) pivots the single measure across the
    * legend field's values — one column per value, sorted so the output
    * schema is deterministic. Legend values are collected on the driver
    * (a chart legend is small by its own contract — it has to fit in a
    * legend box); combinations absent from the data are NULL cells, the
    * grid a stacked/grouped chart consumes.
    *
    * A field's `orderby` formula (the model carries one whenever the
    * DISPLAY value doesn't sort — `Format(Date, 'yyyyMMM')` displays
    * "1995Jan" but sorts by `Format(Date, 'yyyyMM')`,
    * vue/server/model.js:52) sorts that axis by the compiled orderby
    * expression instead of the display column. The orderby expression
    * rides through the aggregation as an extra grouping key and is
    * dropped from the output; the model's contract is that orderby is
    * functionally aligned with the display formula (same granularity),
    * exactly as in the reference's month fields. */
  def runReport(model: WsModel, reportName: String,
                mounted: Map[String, DataFrame],
                maxLegendValues: Int = 10000): DataFrame = {
    val report = model.reports.find(_.name == reportName).getOrElse(
      throw new IllegalArgumentException(s"unknown report '$reportName' " +
        s"(have: ${model.reports.map(_.name).mkString(", ")})"))
    val table = model.tables.find(_.name == report.table).getOrElse(
      throw new IllegalArgumentException(
        s"report table '${report.table}' is not in the model"))
    val df = mounted.getOrElse(table.name,
      throw new IllegalArgumentException(
        s"table '${table.name}' is not mounted"))
    val columns = df.columns.toSet
    val filtered = report.filter.map(f =>
      df.where(compileFormula(f, columns).cast("boolean"))).getOrElse(df)
    require(report.axes.nonEmpty, "a report needs at least one axis field")
    require(report.measures.nonEmpty, "a report needs at least one measure")
    // axis fields with an orderby formula contribute a second, hidden
    // grouping key to sort on; `(displayCol, sortCol, hiddenName)`
    val axisParts = report.axes.zipWithIndex.map { case (a, i) =>
      val f = table.fields.find(_.name == a)
      val ob = f.flatMap(_.orderby).map { o =>
        (compileFormula(o, columns), s"_ob${i}_")
      }
      (fieldExpr(table, a, columns).as(a), ob)
    }
    val groupCols = axisParts.flatMap { case (display, ob) =>
      display +: ob.map { case (c, n) => c.as(n) }.toSeq
    }
    val sortCols = report.axes.zip(axisParts).map { case (a, (_, ob)) =>
      ob.map { case (_, n) => col(n) }.getOrElse(col(a))
    }
    val hidden = axisParts.flatMap(_._2.map(_._2))
    def aggFn(m: WsMeasure) = aggs.getOrElse(m.agg.toLowerCase,
      throw new IllegalArgumentException(
        s"unknown aggregate '${m.agg}' (have: ${aggs.keys.mkString(", ")})"))
    report.legend match {
      case Some(legendField) =>
        require(report.measures.size == 1,
          "a legend report takes exactly one measure (the chart contract)")
        val m = report.measures.head
        val legendCol = fieldExpr(table, legendField, columns).cast("string")
        // limit-bounded legend collect (round 18): a legend bound to a
        // high-cardinality field (an id column instead of a category)
        // would otherwise collect millions of strings to the driver and
        // then plan a same-width pivot — OOM before any named error.
        // 10000 is Spark's own spark.sql.pivotMaxValues default; the
        // probe never fetches more than bound+1 rows.
        // <= 0 disables (the guard-family opt-out); the probe limit is
        // overflow-clamped so Int.MaxValue means "effectively unbounded",
        // not a negative limit
        val maxLegend =
          if (maxLegendValues <= 0) Int.MaxValue - 1 else maxLegendValues
        val lim = math.min(maxLegend.toLong + 1L, Int.MaxValue.toLong).toInt
        val values = filtered.select(legendCol.as("_lv_"))
          .where(col("_lv_").isNotNull).distinct()
          .limit(lim)
          .collect().map(_.getString(0)).sorted.toSeq
        require(values.size <= maxLegend,
          s"legend field '$legendField' has more than $maxLegend distinct " +
            "values — a pivot that wide is an id column bound as a " +
            "legend, not a chart series; bind a categorical field")
        require(values.nonEmpty, s"legend field '$legendField' has no values")
        // a legend value that collides with an axis output column would
        // yield a duplicate name after the pivot — fail as a named
        // contract violation, not a downstream ambiguous-reference error
        val collide = values.toSet.intersect(report.axes.toSet)
        require(collide.isEmpty, s"legend value(s) ${collide.mkString(", ")} " +
          s"of field '$legendField' collide with axis column name(s)")
        filtered
          .withColumn("_legend_", legendCol)
          .groupBy(groupCols: _*)
          .pivot("_legend_", values)
          .agg(aggFn(m)(fieldExpr(table, m.field, columns)))
          .orderBy(sortCols: _*)
          .drop(hidden: _*)
      case None =>
        val measureNames = report.measures.map(m =>
          s"${m.agg.toLowerCase}_" +
            m.field.toLowerCase.replaceAll("[^a-z0-9]+", "_"))
        // two measures with the same agg+field (or a measure name equal
        // to an axis name) would alias to duplicate output columns —
        // reject up front like the other binding checks
        val dupes = (measureNames ++ report.axes)
          .groupBy(identity).collect { case (n, vs) if vs.size > 1 => n }
        require(dupes.isEmpty, "duplicate report output column name(s): " +
          dupes.mkString(", "))
        val measureCols = report.measures.zip(measureNames).map {
          case (m, n) => aggFn(m)(fieldExpr(table, m.field, columns)).as(n)
        }
        filtered.groupBy(groupCols: _*)
          .agg(measureCols.head, measureCols.tail: _*)
          .orderBy(sortCols: _*)
          .drop(hidden: _*)
    }
  }
}
