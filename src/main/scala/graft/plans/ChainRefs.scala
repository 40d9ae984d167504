package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

/** Cross-step scalar references for [[Pipeline]] transform chains —
  * the engine twin of the reference's chain reference resolver
  * (`plugins/transformers/chains/reference_resolver.py:23`): step
  * params may embed `@step.field`, `@step.field.sub[0]` and
  * `@step.field|function(args)` references to earlier step/source
  * outputs.
  *
  * Spark-first translation — the reference resolves each `@ref` by
  * LOOKING UP the prior step's already-computed pandas result on the
  * driver; here nothing has executed when a step is compiled, so a
  * reference instead compiles to a **bounded one-row frame** (an
  * aggregate of the referenced step's plan) that is broadcast-
  * cross-joined into the consuming step's input and substituted into
  * the expression as a generated `__ref_N` column. The whole chain
  * stays ONE lazy Catalyst plan: Catalyst dedups the shared subplan,
  * the scalar side is a broadcast (never a shuffle), and a
  * 10⁸-row consuming step pays one map-side join — the same
  * economics as a SQL scalar subquery.
  *
  * Pipe-function vocabulary (reference FUNCTIONS table,
  * `reference_resolver.py:70`), dispatched on the REFERENCED
  * column's schema:
  *  - aggregating (multi-row column → scalar): `sum`, `mean`, `max`,
  *    `min`, `length` (row count);
  *  - array (on an `ArrayType` field of a one-row step): `length`,
  *    `first`, `last`, `unique`, `sort`, `reverse`, `filter_null`,
  *    plus `sum`/`mean`/`max`/`min` folded over the elements;
  *  - scalar post-transforms: `abs`, `round(n)`, `int`, `float`,
  *    `str`, `bool`.
  *
  * A plain `@step.field` (no aggregating pipe, non-array) requires
  * the referenced step to produce EXACTLY one row — enforced lazily
  * inside the plan (`count==1` guard → `raise_error`), so the
  * one-plan property survives and a violated guard fails the job
  * loudly instead of picking an arbitrary row.
  *
  * Unresolved-reference semantics: a match whose step name IS a
  * defined source/step resolves (and an invalid field inside it
  * fails loudly with the available columns); text whose "step" name
  * is not defined is left verbatim — so `'%@example.com'` inside a
  * SQL string literal survives untouched, while a typo'd step name
  * still dies loudly at expression parse (`@` is not valid SQL).
  * This is the reference's non-strict mode with strict errors on
  * everything that was plausibly meant as a reference.
  */
object ChainRefs {

  /** `@step.path|func(args)` — the reference's REF_PATTERN
    * (`reference_resolver.py:66`), anchored to word boundaries so
    * `a@b.c` inside an operand never matches. */
  private val Ref =
    """@([A-Za-z0-9_]+)\.([A-Za-z0-9_]+(?:\.[A-Za-z0-9_]+|\[[0-9]+\])*)(?:\|([A-Za-z0-9_]+)(?:\(([^)]*)\))?)?""".r

  final case class ParsedRef(
      step: String, path: String, func: Option[String], args: Seq[String]) {
    def text: String =
      s"@$step.$path" + func.map(f =>
        "|" + f + (if (args.nonEmpty) args.mkString("(", ",", ")") else "")).getOrElse("")
  }

  private val aggFuncs = Set("sum", "mean", "max", "min", "length")
  private val arrayFuncs = Set(
    "length", "first", "last", "unique", "sort", "reverse", "filter_null",
    "sum", "mean", "max", "min")
  private val scalarFuncs = Set("abs", "round", "int", "float", "str", "bool")
  val knownFuncs: Set[String] = aggFuncs ++ arrayFuncs ++ scalarFuncs

  /** Ops whose params are expression-valued and support references. */
  val refOps: Set[String] = Set("filter", "select", "aggregate", "sort", "join")

  // ---------------------------------------------------------------- parse

  /** All references embedded in a string (left-to-right). */
  def findRefs(s: String): Seq[ParsedRef] =
    Ref.findAllMatchIn(s).map { m =>
      ParsedRef(
        m.group(1), m.group(2), Option(m.group(3)),
        Option(m.group(4)).map(
          _.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil))
    }.toList

  /** Every reference in a step's param tree (recursive over nested
    * maps/lists, like the reference's `resolve`). */
  def refsInParams(params: Map[String, Any]): Seq[ParsedRef] = {
    def walk(v: Any): Seq[ParsedRef] = v match {
      case s: String => findRefs(s)
      case m: Map[_, _] => m.values.toSeq.flatMap(walk)
      case m: java.util.Map[_, _] =>
        import scala.jdk.CollectionConverters._
        m.asScala.values.toSeq.flatMap(walk)
      case l: Seq[_] => l.flatMap(walk)
      case l: java.util.List[_] =>
        import scala.jdk.CollectionConverters._
        l.asScala.toSeq.flatMap(walk)
      case _ => Nil
    }
    params.values.toSeq.flatMap(walk)
  }

  /** Spec-time validation of one step's references (no frames
    * touched): resolvable refs must point at names defined BEFORE the
    * step, with a known pipe function, inside a ref-capable op. */
  def validateStep(
      entity: String, stepName: String, op: String,
      params: Map[String, Any], definedBefore: Set[String]): Unit = {
    val refs = refsInParams(params).filter(r => definedBefore.contains(r.step) ||
      // a ref-shaped token naming a LATER step is almost certainly a
      // chain-order mistake — flag it rather than letting it reach SQL
      r.func.exists(knownFuncs.contains))
    if (refs.nonEmpty && !refOps.contains(op))
      throw new IllegalArgumentException(
        s"pipeline '$entity': step '$stepName' (op '$op') embeds " +
          s"references ${refs.map(_.text).mkString(", ")} but only ops " +
          s"${refOps.toSeq.sorted.mkString(", ")} support them")
    refs.foreach { r =>
      if (!definedBefore.contains(r.step))
        throw new IllegalArgumentException(
          s"pipeline '$entity': step '$stepName' references undefined " +
            s"step '${r.step}' (${r.text}) — defined before it: " +
            s"${definedBefore.toSeq.sorted.mkString(", ")}")
      r.func.foreach { f =>
        if (!knownFuncs.contains(f))
          throw new IllegalArgumentException(
            s"pipeline '$entity': step '$stepName' reference ${r.text} " +
              s"uses unknown function '$f' — known: " +
              s"${knownFuncs.toSeq.sorted.mkString(", ")}")
      }
      if (r.args.exists(_.startsWith("@")))
        throw new IllegalArgumentException(
          s"pipeline '$entity': step '$stepName' reference ${r.text} " +
            "nests a reference in function args — not supported")
    }
  }

  // --------------------------------------------------------------- compile

  /** Rewrite a step's params, substituting each resolvable reference
    * with a generated `__ref_N` column, and return (rewritten params,
    * input frame with the reference columns broadcast-attached, the
    * generated column names to drop from the step's output). */
  def rewrite(
      params: Map[String, Any], in: DataFrame,
      ctx: Map[String, DataFrame]): (Map[String, Any], DataFrame, Seq[String]) = {
    val refs = refsInParams(params)
      .filter(r => ctx.contains(r.step))
      .distinctBy(_.text)
    if (refs.isEmpty) return (params, in, Nil)
    val named = refs.zipWithIndex.map { case (r, i) => r -> s"__ref_$i" }
    val byText = named.map { case (r, n) => r.text -> n }.toMap
    def rw(v: Any): Any = v match {
      case s: String =>
        Ref.replaceAllIn(s, m => {
          val t = m.matched
          scala.util.matching.Regex.quoteReplacement(byText.getOrElse(t, t))
        })
      case m: Map[_, _] => m.map { case (k, vv) => k.toString -> rw(vv) }
      case m: java.util.Map[_, _] =>
        import scala.jdk.CollectionConverters._
        m.asScala.map { case (k, vv) => k.toString -> rw(vv) }.toMap
      case l: Seq[_] => l.map(rw)
      case l: java.util.List[_] =>
        import scala.jdk.CollectionConverters._
        l.asScala.toSeq.map(rw)
      case other => other
    }
    // one 1-row frame per ref, folded into a single 1-row broadcast
    val refFrame = named
      .map { case (r, n) => scalarFrame(r, ctx(r.step)).toDF(n) }
      .reduce((a, b) => a.crossJoin(b))
    val attached = in.crossJoin(broadcast(refFrame))
    (params.map { case (k, v) => k -> rw(v) }, attached, named.map(_._2))
  }

  /** The 1-row, 1-column frame a single reference compiles to. */
  private def scalarFrame(r: ParsedRef, src: DataFrame): DataFrame = {
    val (c, headField) = pathColumn(src, r.path)
    val dt = src.select(c).schema.head.dataType
    val isArray = dt.isInstanceOf[ArrayType]
    r.func match {
      case Some(f) if aggFuncs.contains(f) && !isArray =>
        src.agg(scalarPost(aggOver(f, c), r).as("v")).select("v")
      case Some(f) if arrayFuncs.contains(f) && isArray =>
        oneRow(src, c, r).select(scalarPost(arrayFn(f, col("__v")), r).as("v"))
      case Some(f) if scalarFuncs.contains(f) =>
        oneRow(src, c, r).select(scalarPost(col("__v"), r).as("v"))
      case Some(f) =>
        throw new IllegalArgumentException(
          s"pipeline: reference ${r.text}: function '$f' does not apply " +
            s"to a ${if (isArray) "array" else "scalar"} field " +
            s"'$headField' of type ${dt.simpleString}")
      case None =>
        oneRow(src, c, r).select(col("__v").as("v"))
    }
  }

  /** Exactly-one-row pickup with a lazy in-plan guard: `first()` would
    * silently pick an arbitrary row of a multi-row step, so the count
    * rides along and a violation raises inside the job. */
  private def oneRow(src: DataFrame, c: Column, r: ParsedRef): DataFrame =
    src.agg(count(lit(1)).as("__n"), first(c).as("__first"))
      .select(
        when(col("__n") === 1, col("__first"))
          .otherwise(raise_error(concat(
            lit(s"pipeline: reference ${r.text} expects exactly 1 row, got "),
            col("__n").cast("string")))).as("__v"))

  private def aggOver(f: String, c: Column): Column = f match {
    case "sum" => sum(c)
    case "mean" => avg(c)
    case "max" => max(c)
    case "min" => min(c)
    case "length" => count(lit(1))
  }

  private def arrayFn(f: String, v: Column): Column = f match {
    case "length" => size(v)
    case "first" => element_at(v, 1)
    case "last" => element_at(v, -1)
    case "unique" => array_distinct(v)
    case "sort" => array_sort(v)
    case "reverse" => reverse(v)
    case "filter_null" => filter(v, x => x.isNotNull)
    case "max" => array_max(v)
    case "min" => array_min(v)
    case "sum" =>
      aggregate(v, lit(0.0), (acc, x) => acc + x.cast("double"))
    case "mean" =>
      aggregate(v, lit(0.0), (acc, x) => acc + x.cast("double")) /
        size(v).cast("double")
  }

  private def scalarPost(v: Column, r: ParsedRef): Column = r.func match {
    case Some("abs") => abs(v)
    case Some("round") =>
      round(v, r.args.headOption.map(_.toInt).getOrElse(0))
    case Some("int") => v.cast("long")
    case Some("float") => v.cast("double")
    case Some("str") => v.cast("string")
    case Some("bool") => v.cast("boolean")
    case _ => v
  }

  /** `field.sub[0]` path → (Column, head field name), with a loud
    * schema check on the head field (the reference's "Field not
    * found. Available: …" contract). */
  private def pathColumn(src: DataFrame, path: String): (Column, String) = {
    val seg = """([A-Za-z0-9_]+)|\[([0-9]+)\]""".r
    var c: Column = null
    var head: String = null
    seg.findAllMatchIn(path).foreach { m =>
      val key = m.group(1)
      if (key != null) {
        if (c == null) {
          if (!src.columns.contains(key))
            throw new IllegalArgumentException(
              s"pipeline: reference path '$path': field '$key' not found " +
                s"— available: ${src.columns.sorted.mkString(", ")}")
          head = key
          c = col(key)
        } else c = c.getField(key)
      } else {
        // reference indexing is 0-based (`reference_resolver.py:199`);
        // Column.getItem is 0-based for arrays too
        c = c.getItem(m.group(2).toInt)
      }
    }
    require(c != null, s"pipeline: empty reference path '$path'")
    (c, head)
  }
}
