package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** JSON-schema validation of LLM output — the QA gate a production
  * enrich pipeline runs BEFORE trusting `texts[output_label]`.
  *
  * The parity surface REQUESTS schema-constrained output (R8,
  * reference lib/job_processor.rb:181-205) but nothing in the
  * reference validates what actually comes back; models drift, JSON
  * modes truncate, and a silent bad record poisons downstream
  * training data. This operator checks the response against the
  * schema's constraint vocabulary (the reference's example schema,
  * docs/example/schemas/person_schema.yml:1-33: required / type /
  * minimum / maximum / enum / minLength) and routes failures to the
  * dead-letter channel exactly like the transport failures EnrichJob
  * already dead-letters (R11's fail-soft stance).
  *
  * Spark-first: every check is a pure `Column` expression over ONE
  * `get_json_object`/`from_json` pass — codegen'd, map-side, no UDF —
  * so the gate costs a projection at any corpus size. Checks CHAIN:
  * a constraint whose prerequisite failed (unparseable JSON, wrong
  * type) reports false, so the verdict row is total and deterministic
  * for every input.
  */
object SchemaValidate {

  /** One schema constraint; `check` builds the verdict Column given
    * the parse guard and the raw JSON column.
    */
  sealed trait Constraint extends Serializable {
    def reason: String
    private[SchemaValidate] def col(ok_parse: Column, j: Column): Column
  }

  private def field(j: Column, f: String): Column =
    get_json_object(j, s"$$.$f")

  private val IntRe = "^-?[0-9]+$"

  /** key must be present (JSON null counts as absent — the model
    * "answered" nothing) */
  final case class Required(f: String) extends Constraint {
    val reason = s"required:$f"
    private[SchemaValidate] def col(ok: Column, j: Column): Column =
      ok && field(j, f).isNotNull
  }

  /** value must be a JSON integer (not a quoted digit string, not
    * prose) */
  final case class IntType(f: String) extends Constraint {
    val reason = s"type:$f"
    private[SchemaValidate] def col(ok: Column, j: Column): Column =
      ok && coalesce(field(j, f).rlike(IntRe), lit(false))
  }

  /** minimum (presupposes IntType — false when the type check fails).
    * try_cast, not cast: under ANSI + codegen subexpression
    * elimination a plain cast evaluates even when the guard is false
    * and throws on non-numeric text. */
  final case class Min(f: String, v: Long) extends Constraint {
    val reason = s"min:$f"
    private[SchemaValidate] def col(ok: Column, j: Column): Column =
      IntType(f).col(ok, j) &&
        coalesce(field(j, f).try_cast("long") >= v, lit(false))
  }

  /** maximum (presupposes IntType) */
  final case class Max(f: String, v: Long) extends Constraint {
    val reason = s"max:$f"
    private[SchemaValidate] def col(ok: Column, j: Column): Column =
      IntType(f).col(ok, j) &&
        coalesce(field(j, f).try_cast("long") <= v, lit(false))
  }

  /** enum membership (presupposes Required) */
  final case class OneOf(f: String, values: Seq[String]) extends Constraint {
    val reason = s"enum:$f"
    private[SchemaValidate] def col(ok: Column, j: Column): Column =
      Required(f).col(ok, j) &&
        coalesce(field(j, f).isin(values: _*), lit(false))
  }

  /** string length floor */
  final case class MinLength(f: String, n: Int) extends Constraint {
    val reason = s"minLength:$f"
    private[SchemaValidate] def col(ok: Column, j: Column): Column =
      ok && coalesce(length(field(j, f)) >= n, lit(false))
  }

  // ---- r16 vocabulary extension (VERDICT r15 item 2) ----------------
  // The reference's fixtures exercise more than the person_schema
  // basics: array + items + minItems/maxItems, maxLength, nested-
  // object required, number (float) bounds, and format:
  // date-time/email (docs/example/schemas/person_schema.yml:15-31,
  // spec/json_mode_spec.rb:378-406 — the `complex_schema` fixture).
  // Same design as the originals: each check is a chained codegen'd
  // Column over the get_json_object extraction; nested paths come for
  // free because `field` builds a $.a.b JSONPath.
  //
  // TYPE checks lean on get_json_object's re-serialization contract:
  // a non-leaf match (array/object) comes back as COMPACT JSON (no
  // whitespace between tokens, standard string escaping), while a
  // LEAF string comes back unquoted — so `["a","b"]` is regex-exact
  // for all-string arrays, and the documented IntType caveat (a
  // quoted digit string is indistinguishable from a number once
  // unquoted) applies to EVERY type check here the same way: NumType
  // cannot tell 0.75 from "0.75", and ObjType/ArrayType cannot tell
  // {"a":1} / ["a"] from the STRINGS "{\"a\":1}" / "[\"a\"]",
  // because the leaf unquotes before the startsWith/regex probe. A
  // model answering a stringified structure therefore passes the
  // structural checks — plant prose, not quoted structures, to test,
  // and treat a passed check as "extractable as the declared type",
  // which is what the downstream get_json_object consumers actually
  // need (a stringified array that json_array_length can count IS
  // consumable by every extraction this gate protects).

  /** string length ceiling (absent field FAILS — pair with Required
    * when the field is optional-but-bounded is not the semantics you
    * want; this engine validates enrich output, where every bounded
    * field is also expected)
    */
  final case class MaxLength(f: String, n: Int) extends Constraint {
    val reason = s"maxLength:$f"
    private[SchemaValidate] def col(ok: Column, j: Column): Column =
      ok && coalesce(length(field(j, f)) <= n, lit(false))
  }

  /** value must be a JSON object (the nested-`required` prerequisite:
    * a model answering `"summary": "oops"` fails here first, and
    * every $.summary.* extraction downstream reports false by chain).
    * Both structural probes check the closing token too (r17 ADVICE):
    * a true object/array re-serializes compact as {…} / […], while a
    * plain-prose leaf like "{draft" unquotes to text that opens but
    * never closes — startsWith alone would wave it through. The
    * RESIDUAL caveat is any string whose text both opens AND closes
    * with the structural tokens — "{draft}" still passes, as does a
    * value that is itself valid stringified JSON; a full fix needs a
    * parse probe on the extracted fragment, which this cheap
    * token-pair check deliberately is not.
    */
  final case class ObjType(f: String) extends Constraint {
    val reason = s"objtype:$f"
    private[SchemaValidate] def col(ok: Column, j: Column): Column =
      ok && coalesce(
        field(j, f).startsWith("{") && field(j, f).endsWith("}"),
        lit(false))
  }

  /** value must be a JSON array (closing-token check: see [[ObjType]]) */
  final case class ArrayType(f: String) extends Constraint {
    val reason = s"array:$f"
    private[SchemaValidate] def col(ok: Column, j: Column): Column =
      ok && coalesce(
        field(j, f).startsWith("[") && field(j, f).endsWith("]"),
        lit(false))
  }

  /** every array element is a JSON string — `items: {type: string}`.
    * Exact against the compact re-serialization: elements separated
    * by bare commas, strings JSON-escaped, so one regex decides
    * (presupposes ArrayType; empty arrays pass — that's minItems' job)
    */
  final case class ItemsString(f: String) extends Constraint {
    val reason = s"items:$f"
    private val AllStrings =
      "^\\[\\]$|^\\[\"(?:[^\"\\\\]|\\\\.)*\"(?:,\"(?:[^\"\\\\]|\\\\.)*\")*\\]$"
    private[SchemaValidate] def col(ok: Column, j: Column): Column =
      ArrayType(f).col(ok, j) &&
        coalesce(field(j, f).rlike(AllStrings), lit(false))
  }

  /** array length floor (presupposes ArrayType) */
  final case class MinItems(f: String, n: Int) extends Constraint {
    val reason = s"minItems:$f"
    private[SchemaValidate] def col(ok: Column, j: Column): Column =
      ArrayType(f).col(ok, j) &&
        coalesce(json_array_length(field(j, f)) >= n, lit(false))
  }

  /** array length ceiling (presupposes ArrayType) */
  final case class MaxItems(f: String, n: Int) extends Constraint {
    val reason = s"maxItems:$f"
    private[SchemaValidate] def col(ok: Column, j: Column): Column =
      ArrayType(f).col(ok, j) &&
        coalesce(json_array_length(field(j, f)) <= n, lit(false))
  }

  private val NumRe = "^-?[0-9]+(\\.[0-9]+)?([eE][+-]?[0-9]+)?$"

  /** value must be a JSON number — `type: number` (int or float; the
    * IntType quoted-string caveat applies: leaves unquote, so "0.75"
    * the string passes — plant prose, not quoted digits, to test)
    */
  final case class NumType(f: String) extends Constraint {
    val reason = s"number:$f"
    private[SchemaValidate] def col(ok: Column, j: Column): Column =
      ok && coalesce(field(j, f).rlike(NumRe), lit(false))
  }

  /** float minimum (presupposes NumType; try_cast for the same
    * ANSI-subexpression-elimination reason as Min)
    */
  final case class MinNum(f: String, v: Double) extends Constraint {
    val reason = s"min:$f"
    private[SchemaValidate] def col(ok: Column, j: Column): Column =
      NumType(f).col(ok, j) &&
        coalesce(field(j, f).try_cast("double") >= v, lit(false))
  }

  /** float maximum (presupposes NumType) */
  final case class MaxNum(f: String, v: Double) extends Constraint {
    val reason = s"max:$f"
    private[SchemaValidate] def col(ok: Column, j: Column): Column =
      NumType(f).col(ok, j) &&
        coalesce(field(j, f).try_cast("double") <= v, lit(false))
  }

  /** `format:` string checks — the two formats the reference's
    * fixtures use. date-time is RFC 3339's timestamp grammar (the
    * JSON-schema spec's definition); email is the pragmatic
    * one-@-with-dotted-domain check every validator library ships
    * (full RFC 5322 is famously not a regex).
    */
  final case class Format(f: String, format: String) extends Constraint {
    val reason = s"format:$f"
    private val re = format match {
      case "date-time" =>
        "^\\d{4}-\\d{2}-\\d{2}[Tt]\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?([Zz]|[+-]\\d{2}:\\d{2})$"
      case "email" =>
        "^[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(\\.[A-Za-z0-9-]+)+$"
      case other =>
        throw new IllegalArgumentException(s"unknown format '$other'")
    }
    private[SchemaValidate] def col(ok: Column, j: Column): Column =
      ok && coalesce(field(j, f).rlike(re), lit(false))
  }

  /** Appends to `df`: `ok_parse`, one verdict column per constraint
    * (caller-supplied aliases), `valid`, and `reason` (the FIRST
    * failed check in declaration order, '' when valid) — all BIGINT
    * 0/1 flags so the frame is oracle- and hash-portable.
    */
  def verdicts(
      df: DataFrame, jsonCol: String,
      constraints: Seq[(String, Constraint)]): DataFrame = {
    val j = col(jsonCol)
    // corrupt detection must NOT use permissive from_json (it returns
    // a row of nulls, never a null struct) — try_parse_json is the
    // honest validity probe: NULL exactly when the text is not JSON
    val okParse = try_parse_json(j).isNotNull
    val withChecks = constraints.foldLeft(
      df.withColumn("ok_parse", okParse)) {
      case (acc, (alias, c)) =>
        acc.withColumn(alias, c.col(col("ok_parse"), j))
    }
    val allOk = constraints.map(_._1).foldLeft(col("ok_parse"))(
      (a, n) => a && col(n))
    // first-failing reason follows DECLARATION order: parse first,
    // then each constraint
    val reason = constraints.foldLeft(
      when(!col("ok_parse"), lit("parse"))) {
      case (acc, (alias, c)) => acc.when(!col(alias), lit(c.reason))
    }.otherwise(lit(""))
    withChecks
      .withColumn("valid", allOk)
      .withColumn("reason", reason)
  }

  /** Dead-letter split: (good, dead). `dead` keeps every column plus
    * the populated `reason` — the same fail-soft routing EnrichJob
    * applies to transport errors (record dropped, job continues).
    */
  def split(validated: DataFrame): (DataFrame, DataFrame) =
    // cast: callers may have re-emitted the flag as a 0/1 BIGINT for
    // hash portability
    (validated.filter(col("valid").cast("boolean")),
      validated.filter(!col("valid").cast("boolean")))

  /** Compile a PARSED JSON schema — the nested java.util maps/lists
    * `JobConfig.load` produces from a schema YAML file
    * (docs/example/schemas/person_schema.yml, the reference's own
    * format) — into the `(alias, Constraint)` list [[verdicts]]
    * consumes. The q252 scaleNote's "schema-file-to-Constraint
    * compiler is a pure driver-side fold", implemented (r16): runs
    * once at plan time, costs nothing per row.
    *
    * Walk order (= verdict/reason declaration order) is the schema's
    * own property order (snakeyaml preserves it): per property,
    * parent-required first, then the type check, then the keyword
    * checks, then (objects) the children recursively. Covered
    * keywords are exactly the vocabulary the reference's fixtures
    * exercise: type integer/number/array/object (a bare `type:
    * string` emits NO check — leaf values unquote, see the caveat
    * block above), minimum/maximum (integer ⇒ exact Long bounds,
    * number ⇒ Double), minLength/maxLength, enum, items:{type:
    * string}, minItems/maxItems, format date-time/email, and
    * required — including nested objects, which become dotted
    * JSONPaths. Unknown keywords are ignored (every real validator's
    * default-vocabulary stance); aliases are "ok_" + dotted path +
    * "_" + kind, so they stay legal column names.
    */
  def fromSchema(schema: Any): Seq[(String, Constraint)] = {
    import scala.jdk.CollectionConverters._
    def asMap(a: Any): Map[String, Any] = a match {
      case m: java.util.Map[_, _] =>
        m.asScala.map { case (k, v) => String.valueOf(k) -> (v: Any) }.toMap
      case m: Map[_, _] =>
        m.map { case (k, v) => String.valueOf(k) -> (v: Any) }
      case other => throw new IllegalArgumentException(
        s"schema node is not an object: ${String.valueOf(other).take(80)}")
    }
    def asSeq(a: Any): Seq[Any] = a match {
      case l: java.util.List[_] => l.asScala.toSeq
      case l: Seq[_]            => l
      case other => throw new IllegalArgumentException(
        s"expected a list: ${String.valueOf(other).take(80)}")
    }
    def dbl(a: Any): Double = a match {
      case n: Number => n.doubleValue()
      case s: String => s.toDouble
      case other => throw new IllegalArgumentException(s"not a number: $other")
    }
    def intOf(a: Any): Int = dbl(a).toInt
    def alias(path: String, kind: String): String =
      "ok_" + path.replace('.', '_') + "_" + kind
    def walk(node: Map[String, Any], prefix: String): Seq[(String, Constraint)] = {
      val requiredList = node.get("required")
        .map(asSeq(_).map(String.valueOf(_))).getOrElse(Nil)
      val required = requiredList.toSet
      // preserve the schema's property order — snakeyaml parses into
      // LinkedHashMaps, which is the only shape the file path ever
      // yields; hand-built Scala maps keep whatever iteration order
      // they have (use a ListMap if it matters)
      val ordered: Seq[(String, Any)] = node.get("properties") match {
        case Some(m: java.util.Map[_, _]) =>
          m.asScala.toSeq.map { case (k, v) => String.valueOf(k) -> (v: Any) }
        case Some(m: Map[_, _]) =>
          m.toSeq.map { case (k, v) => String.valueOf(k) -> (v: Any) }
        case Some(other) => throw new IllegalArgumentException(
          s"properties is not an object: ${String.valueOf(other).take(80)}")
        case None => Nil
      }
      val fromProps = ordered.flatMap { case (name, subAny) =>
        val sub = asMap(subAny)
        val path = if (prefix.isEmpty) name else s"$prefix.$name"
        val tpe = sub.get("type").map(String.valueOf(_))
        val req: Seq[(String, Constraint)] =
          if (required(name)) Seq(alias(path, "required") -> Required(path))
          else Nil
        val typeCheck: Seq[(String, Constraint)] = tpe match {
          case Some("integer") => Seq(alias(path, "type") -> IntType(path))
          case Some("number")  => Seq(alias(path, "number") -> NumType(path))
          case Some("array")   => Seq(alias(path, "array") -> ArrayType(path))
          case Some("object")  => Seq(alias(path, "objtype") -> ObjType(path))
          case _               => Nil // string/untyped: no leaf type probe
        }
        // integer bounds tighten fractional literals (minimum: 0.5 on
        // an integer means >= 1 — truncation would LOOSEN the bound)
        def intMin(v: Any) = Min(path, math.ceil(dbl(v)).toLong)
        def intMax(v: Any) = Max(path, math.floor(dbl(v)).toLong)
        val keywords: Seq[(String, Constraint)] = Seq(
          sub.get("minimum").map(v =>
            if (tpe.contains("integer")) alias(path, "min") -> intMin(v)
            else alias(path, "min") -> MinNum(path, dbl(v))),
          sub.get("maximum").map(v =>
            if (tpe.contains("integer")) alias(path, "max") -> intMax(v)
            else alias(path, "max") -> MaxNum(path, dbl(v))),
          sub.get("enum").map(v =>
            alias(path, "enum") -> OneOf(path, asSeq(v).map(String.valueOf(_)))),
          sub.get("minLength").map(v =>
            alias(path, "minlen") -> MinLength(path, intOf(v))),
          sub.get("maxLength").map(v =>
            alias(path, "maxlen") -> MaxLength(path, intOf(v))),
          // items only in its object form with type: string — the
          // draft-4 tuple form (a list) and other item types emit
          // nothing, per the ignore-unknown stance
          sub.get("items").flatMap {
            case m @ (_: java.util.Map[_, _] | _: Map[_, _])
              if asMap(m).get("type").exists(String.valueOf(_) == "string") =>
              Some(alias(path, "items") -> ItemsString(path))
            case _ => None // tuple form / non-string items: annotation
          },
          sub.get("minItems").map(v =>
            alias(path, "minitems") -> MinItems(path, intOf(v))),
          sub.get("maxItems").map(v =>
            alias(path, "maxitems") -> MaxItems(path, intOf(v))),
          // only the two formats this gate implements; anything else
          // is an annotation, exactly how real validators treat
          // unknown formats by default (Format's constructor throws
          // on unknowns by design — the COMPILER is where the
          // permissive stance lives)
          sub.get("format").map(String.valueOf(_))
            .filter(f => f == "date-time" || f == "email").map(f =>
            alias(path, "format") -> Format(path, f))
        ).flatten
        val children: Seq[(String, Constraint)] =
          if (tpe.contains("object")) walk(sub, path) else Nil
        req ++ typeCheck ++ keywords ++ children
      }
      // JSON Schema allows `required` names with no matching
      // `properties` entry — emit their Required checks too (after
      // the declared properties, in required-list order), or a record
      // missing them would silently validate as good
      val orphanReq = requiredList.filterNot(ordered.map(_._1).toSet).map { name =>
        val path = if (prefix.isEmpty) name else s"$prefix.$name"
        alias(path, "required") -> Required(path)
      }
      fromProps ++ orphanReq
    }
    val out = walk(asMap(schema), "")
    // dot-flattened aliases could collide across distinct paths
    // (summary_title vs summary.title); verdicts' withColumn fold
    // would then silently overwrite the first verdict — fail fast
    val dup = out.groupBy(_._1).collect { case (a, cs) if cs.size > 1 => a }
    if (dup.nonEmpty) throw new IllegalArgumentException(
      s"schema compiles to colliding verdict aliases: ${dup.mkString(", ")}" +
        " — rename the conflicting properties")
    out
  }
}
