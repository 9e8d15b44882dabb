package graft.template

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Record

/** Template compiler parity tests — semantics from the reference's
  * generate_prompt (lib/job_processor.rb:111-121) and its specs
  * (spec/job_processor_spec.rb:121, spec/system_prompt_spec.rb:10).
  */
class TemplateSpec extends AnyFunSuite {
  private val rec = Record.R(
    id = "doc-1",
    texts = Map("input" -> "hello", "lang" -> "ja"),
    images = Seq("aGk=", "eW8="))

  test("plain text passes through untouched") {
    assert(Template.compile("no tags here").render(rec) == "no tags here")
  }

  test("symbol lookup texts[:label]") {
    assert(Template.compile("say <%= texts[:input] %>!").render(rec) == "say hello!")
  }

  test("string lookup texts['label'] and double-quoted") {
    assert(Template.compile("<%= texts['lang'] %>").render(rec) == "ja")
    assert(Template.compile("<%= texts[\"lang\"] %>").render(rec) == "ja")
  }

  test("missing label renders empty string (Ruby nil.to_s)") {
    assert(Template.compile("[<%= texts[:nope] %>]").render(rec) == "[]")
  }

  test("id reference") {
    assert(Template.compile("id=<%= id %>").render(rec) == "id=doc-1")
  }

  test("texts.keys.length and images.length") {
    assert(Template.compile("<%= texts.keys.length %>/<%= images.length %>")
      .render(rec) == "2/2")
  }

  test("multiple tags and multiline") {
    val t = Template.compile("A: <%= texts[:input] %>\nB: <%= texts[:lang] %>\n")
    assert(t.render(rec) == "A: hello\nB: ja\n")
  }

  test("null texts/images tolerated (reference defaults {} / [])") {
    val t = Template.compile("<%= texts[:x] %>|<%= images.length %>")
    assert(t.render(Record.R("i", null, null)) == "|0")
  }

  test("unsupported expression fails at compile time, not per record") {
    intercept[Template.TemplateException] {
      Template.compile("<%= system('rm -rf') %>")
    }
  }

  test("non-output ERB tags fail at compile time (no silent literal passthrough)") {
    intercept[Template.TemplateException] {
      Template.compile("a <% if x %>b<% end %> c")
    }
    intercept[Template.TemplateException] {
      Template.compile("a <%# comment %> b")
    }
    // '<%' inside a supported output tag is still fine
    assert(Template.compile("ok: <%= id %>").render(rec) == "ok: doc-1")
  }

  test("unterminated tags fail at compile time (no malformed-prompt passthrough)") {
    intercept[Template.TemplateException] {
      Template.compile("a <%= texts[:input]") // unterminated output tag
    }
    intercept[Template.TemplateException] {
      Template.compile("trailing <%")
    }
    intercept[Template.TemplateException] {
      Template.compile("a <% b") // unterminated non-output tag
    }
  }

  test("standard ERB <%% escape renders a literal '<%'") {
    assert(Template.compile("100<%% done").render(rec) == "100<% done")
    // '<%%= x %>' is the escaped spelling OF the tag text itself
    assert(Template.compile("show <%%= id %> raw").render(rec) == "show <%= id %> raw")
    assert(Template.compile("end <%%").render(rec) == "end <%")
    // escape composes with real tags in the same template
    assert(Template.compile("<%% <%= id %>").render(rec) == "<% doc-1")
  }

  test("Catalyst column path matches Scala render path") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val t = Template.compile(
      "id=<%= id %> in=<%= texts[:input] %> n=<%= texts.keys.length %> im=<%= images.length %>")
    val df = Seq(rec, Record.R("x", null, null))
      .toDF("id", "texts", "images")
    val got = df.select(t.column(col("id"), col("texts"), col("images")).as("p"))
      .collect().map(_.getString(0)).toSet
    val want = Set(t.render(rec), t.render(Record.R("x", null, null)))
    assert(got == want)
  }
}
