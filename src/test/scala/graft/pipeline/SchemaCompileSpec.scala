package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.SchemaValidate._

/** The schema-file-to-Constraint compiler (q252's scaleNote, made
  * code): `fromSchema` folds the PARSED YAML the reference's own
  * schema files produce (JobConfig.load's json_schema_filepath path)
  * into the constraint list `verdicts` consumes. Gated two ways:
  * against the reference's example schema verbatim
  * (docs/example/schemas/person_schema.yml:1-33) and against q252's
  * hand-declared list for the complex_schema shape
  * (spec/json_mode_spec.rb:378-406) — the latter ties the compiler
  * transitively to q252's driver oracle.
  */
class SchemaCompileSpec extends AnyFunSuite {

  private def yaml(text: String): Any =
    new org.yaml.snakeyaml.Yaml().load[Any](text)

  test("compiles the reference's person_schema.yml vocabulary in " +
    "declaration order (docs/example/schemas/person_schema.yml)") {
    val schema = yaml("""
      |type: object
      |properties:
      |  name:
      |    type: string
      |  age:
      |    type: integer
      |    minimum: 0
      |    maximum: 150
      |  occupation:
      |    type: string
      |  skills:
      |    type: array
      |    items:
      |      type: string
      |  address:
      |    type: object
      |    properties:
      |      street:
      |        type: string
      |      city:
      |        type: string
      |      country:
      |        type: string
      |    required:
      |      - city
      |      - country
      |required:
      |  - name
      |  - age
      |""".stripMargin)
    val got = SchemaValidate.fromSchema(schema)
    assert(got.map(_._2) == Seq(
      Required("name"),
      Required("age"), IntType("age"), Min("age", 0L), Max("age", 150L),
      ArrayType("skills"), ItemsString("skills"),
      ObjType("address"),
      Required("address.city"), Required("address.country")),
      got.map(_._2).toString)
    // aliases stay legal column names (dots flattened)
    assert(got.map(_._1).forall(_.matches("ok_[A-Za-z0-9_]+")), got.map(_._1))
    assert(got.map(_._1).distinct.size == got.size, "aliases must be unique")
  }

  test("compiles the complex_schema shape to exactly q252's hand list " +
    "plus the three structural extras (spec/json_mode_spec.rb:378-406)") {
    // property order matches q252's declaration order (JSON-schema
    // property order carries no semantics, so the fixture pins it)
    val schema = yaml("""
      |type: object
      |required: [summary, tags]
      |properties:
      |  summary:
      |    type: object
      |    required: [title, content]
      |    properties:
      |      title: {type: string, maxLength: 100}
      |      content: {type: string, minLength: 10}
      |  tags:
      |    type: array
      |    items: {type: string}
      |    minItems: 1
      |    maxItems: 5
      |  metadata:
      |    type: object
      |    properties:
      |      confidence: {type: number, minimum: 0.0, maximum: 1.0}
      |      created_at: {type: string, format: date-time}
      |  contact_email: {type: string, format: email}
      |""".stripMargin)
    val got = SchemaValidate.fromSchema(schema).map(_._2)
    // q252's registered, oracle-gated list (Sources.scala) — the
    // compiler must reproduce it in order, modulo the three checks
    // q252's fixture has no violation class for
    val q252Hand = Seq(
      ObjType("summary"),
      Required("summary.title"), MaxLength("summary.title", 100),
      Required("summary.content"), MinLength("summary.content", 10),
      ArrayType("tags"), ItemsString("tags"),
      MinItems("tags", 1), MaxItems("tags", 5),
      NumType("metadata.confidence"),
      MinNum("metadata.confidence", 0.0), MaxNum("metadata.confidence", 1.0),
      Format("metadata.created_at", "date-time"),
      Format("contact_email", "email"))
    val extras: Set[Constraint] =
      Set(Required("summary"), Required("tags"), ObjType("metadata"))
    assert(got.filterNot(extras) == q252Hand,
      s"compiled list must match q252's declaration order:\n$got")
    assert(got.filter(extras).toSet == extras, got.toString)
  }

  test("integer vs number bounds pick exact Long vs Double constraints") {
    val schema = yaml("""
      |type: object
      |properties:
      |  n: {type: integer, minimum: 3}
      |  x: {type: number, maximum: 0.5}
      |""".stripMargin)
    assert(SchemaValidate.fromSchema(schema).map(_._2) == Seq(
      IntType("n"), Min("n", 3L),
      NumType("x"), MaxNum("x", 0.5)))
  }

  test("unknown keywords are ignored; enum compiles to OneOf") {
    val schema = yaml("""
      |type: object
      |properties:
      |  lang: {type: string, enum: [en, fr, de], description: ignored}
      |""".stripMargin)
    assert(SchemaValidate.fromSchema(schema).map(_._2) ==
      Seq(OneOf("lang", Seq("en", "fr", "de"))))
  }

  // ---- r16 tail-review regressions ---------------------------------

  test("required names WITHOUT a properties entry still compile to " +
    "Required — legal JSON Schema, silently dropping it would let " +
    "missing fields validate as good") {
    val schema = yaml("""
      |type: object
      |required: [id, name]
      |properties:
      |  name: {type: string}
      |""".stripMargin)
    assert(SchemaValidate.fromSchema(schema).map(_._2) ==
      Seq(Required("name"), Required("id")))
  }

  test("colliding dot-flattened aliases fail FAST instead of silently " +
    "overwriting a verdict column in verdicts()") {
    val schema = yaml("""
      |type: object
      |properties:
      |  summary_title: {type: integer}
      |  summary:
      |    type: object
      |    properties:
      |      title: {type: integer}
      |""".stripMargin)
    val e = intercept[IllegalArgumentException](
      SchemaValidate.fromSchema(schema))
    assert(e.getMessage.contains("colliding"), e.getMessage)
  }

  test("fractional bounds on type: integer TIGHTEN (ceil min, floor " +
    "max) — truncation would loosen the constraint") {
    val schema = yaml("""
      |type: object
      |properties:
      |  age: {type: integer, minimum: 0.5, maximum: 10.5}
      |""".stripMargin)
    assert(SchemaValidate.fromSchema(schema).map(_._2) ==
      Seq(IntType("age"), Min("age", 1L), Max("age", 10L)))
  }

  test("unknown formats and tuple-form items are annotations, not " +
    "crashes (the permissive-vocabulary stance lives in the compiler)") {
    val schema = yaml("""
      |type: object
      |properties:
      |  created: {type: string, format: date}
      |  url: {type: string, format: uri}
      |  tags:
      |    type: array
      |    items:
      |      - {type: string}
      |""".stripMargin)
    assert(SchemaValidate.fromSchema(schema).map(_._2) ==
      Seq(ArrayType("tags")))
  }
}
