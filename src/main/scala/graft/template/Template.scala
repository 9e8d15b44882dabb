package graft.template

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.Record

/** ERB-style prompt templates (reference lib/job_processor.rb:111-135).
  *
  * The reference evaluates full Ruby inside `<%= … %>` with `texts` /
  * `images` in scope (spec/job_processor_spec.rb:121 uses
  * `texts.keys.length`). Arbitrary Ruby is not portable, so this engine
  * supports the documented/observed expression forms:
  *
  *   - `texts[:label]` / `texts['label']` / `texts["label"]` — missing
  *     label renders "" (Ruby nil.to_s)
  *   - `id`
  *   - `texts.length` / `texts.size` / `texts.keys.length` / `texts.keys.size`
  *   - `images.length` / `images.size` / `images.count`
  *
  * This grammar is the SUPPORTED CONTRACT — it covers every ERB
  * expression the reference's own specs and example templates exercise
  * (verified by grep over /root/reference/spec and docs/example: only
  * `texts[:label]` and `texts.keys.length` appear). The standard ERB
  * escape `<%%` renders a literal `<%`. Anything else — unsupported
  * expressions, non-output `<% %>`/`<%# %>` tags, unterminated tags —
  * raises at COMPILE time on the driver: fail fast, not per-record on
  * executors. Templates are parsed ONCE (the reference re-reads +
  * re-parses per record, lib/job_processor.rb:113-114 — SURVEY.md §4.1
  * explicitly tells us not to copy that).
  *
  * Two backends from one AST:
  *   - [[Template.column]]: a pure Catalyst expression (concat/element_at/
  *     size) — whole-stage-codegen'd, no UDF boundary, usable in any
  *     DataFrame plan;
  *   - [[Template.render]]: a plain Scala function for driver-side tests
  *     and the mapPartitions enrich path.
  */
final case class Template(parts: Seq[Template.Part]) extends Serializable {
  import Template._

  /** Catalyst fast path — prompt as a codegen'd Column. */
  def column(id: Column, texts: Column, images: Column): Column = {
    val safeTexts = coalesce(texts, map())
    val safeImages = coalesce(images, array())
    val cols = parts.map {
      case Lit(s)           => lit(s)
      case TextLookup(l)    => coalesce(element_at(safeTexts, l), lit(""))
      case IdRef            => coalesce(id.cast("string"), lit(""))
      case TextsCount       => size(safeTexts).cast("string")
      case ImagesCount      => size(safeImages).cast("string")
    }
    if (cols.isEmpty) lit("") else concat(cols: _*)
  }

  /** Scala-side render, same semantics as [[column]]. */
  def render(r: Record.R): String = {
    val texts = Option(r.texts).getOrElse(Map.empty[String, String])
    val images = Option(r.images).getOrElse(Seq.empty[String])
    parts.map {
      case Lit(s)        => s
      case TextLookup(l) => texts.getOrElse(l, "")
      case IdRef         => Option(r.id).getOrElse("")
      case TextsCount    => texts.size.toString
      case ImagesCount   => images.size.toString
    }.mkString
  }
}

object Template {
  sealed trait Part extends Serializable
  final case class Lit(s: String) extends Part
  final case class TextLookup(label: String) extends Part
  case object IdRef extends Part
  case object TextsCount extends Part
  case object ImagesCount extends Part

  final class TemplateException(msg: String) extends IllegalArgumentException(msg)

  private val Tag = raw"<%=\s*(.*?)\s*%>".r
  private val TextsSym = raw"""texts\[\s*:(\w+)\s*\]""".r
  private val TextsStr = raw"""texts\[\s*['"]([^'"]+)['"]\s*\]""".r
  private val TextsLen = raw"""texts(?:\.keys)?\.(?:length|size|count)""".r
  private val ImagesLen = raw"""images\.(?:length|size|count)""".r

  /** Parse a template; unsupported expressions raise [[TemplateException]]. */
  def compile(source: String): Template = {
    val parts = Seq.newBuilder[Part]
    var pos = 0
    for (m <- Tag.findAllMatchIn(source)) {
      if (m.start > pos) parts += Lit(validateLiteral(source.substring(pos, m.start)))
      parts += parseExpr(m.group(1))
      pos = m.end
    }
    if (pos < source.length) parts += Lit(validateLiteral(source.substring(pos)))
    Template(parts.result())
  }

  /** Any `<%` left in a literal part after tag extraction is either the
    * standard ERB escape `<%%` (render a literal `<%` — so `<%%= x %>`
    * renders the text `<%= x %>`) or a malformed/unsupported tag:
    * a non-output tag (`<% … %>`, `<%# … %>` — full Ruby in the
    * reference, not portable, and silently passing them through would
    * send malformed prompts), an unterminated `<%=`, or a trailing
    * `<%`. Escapes are resolved here at compile time; everything else
    * fails fast on the driver.
    */
  private def validateLiteral(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val idx = s.indexOf("<%", i)
      if (idx < 0) { out.append(s.substring(i)); i = s.length }
      else {
        out.append(s.substring(i, idx))
        if (idx + 2 < s.length && s.charAt(idx + 2) == '%') {
          out.append("<%"); i = idx + 3 // <%% escape
        } else if (idx + 2 < s.length && s.charAt(idx + 2) == '=') {
          throw new TemplateException(
            "Unterminated <%= tag (no closing %>) — refusing to emit it as literal prompt text")
        } else {
          throw new TemplateException(
            "Unsupported or unterminated ERB tag at a '<%' — only <%= expression %> " +
              "output tags are supported (<% … %> / <%# … %> are full Ruby in the " +
              "reference and not portable); write <%% for a literal '<%'")
        }
      }
    }
    out.toString
  }

  private def parseExpr(expr: String): Part = expr match {
    case TextsSym(l)  => TextLookup(l)
    case TextsStr(l)  => TextLookup(l)
    case "id"         => IdRef
    case TextsLen()   => TextsCount
    case ImagesLen()  => ImagesCount
    case other => throw new TemplateException(
      s"Unsupported template expression: <%= $other %> — supported: " +
        "texts[:label], texts['label'], id, texts.length, texts.keys.length, images.length")
  }
}
