package graft

import java.nio.file.{Files, Path}

/** CLI exit-code contract (reference bin/job.rb:6-24,
  * spec/bin_job_spec.rb:42-54): bad usage → 1, missing YAML → 1,
  * init error → 1, happy path (fake backend) → 0 with JSONL output.
  */
class MainSpec extends SparkSpec {

  private def setup(): Path = {
    val d = Files.createTempDirectory("graft-main")
    Files.writeString(d.resolve("prompt.erb"), "sum: <%= texts[:content] %>")
    Files.writeString(d.resolve("job.yml"),
      s""":id: cli-test
         |:erb_filepath: prompt.erb
         |:backend_endpoint: http://localhost:9/v1
         |:model: m
         |:output_label: summary""".stripMargin)
    Files.writeString(d.resolve("in.jsonl"),
      """{"id": "1", "texts": {"content": "alpha"}}
        |bad json line
        |{"id": "2", "texts": {"content": "beta"}}
        |""".stripMargin)
    d
  }

  test("no args → usage, exit 1") { assert(Main.run(Array.empty) == 1) }

  test("reference parity: job.yml alone reads STDIN, writes JSONL to STDOUT") {
    spark // ensure the shared session exists so Main reuses it
    val d = setup()
    val oldIn = System.in
    val oldOut = System.out
    val bout = new java.io.ByteArrayOutputStream()
    val code =
      try {
        System.setIn(new java.io.ByteArrayInputStream(
          Files.readAllBytes(d.resolve("in.jsonl"))))
        System.setOut(new java.io.PrintStream(bout, true, "UTF-8"))
        Main.run(Array(d.resolve("job.yml").toString, "--fake"))
      } finally { System.setIn(oldIn); System.setOut(oldOut) }
    assert(code == 0)
    val lines = bout.toString("UTF-8").split("\n").filter(_.nonEmpty)
    assert(lines.length == 2) // corrupt line dropped, job still exit 0
    assert(lines.forall(l => l.startsWith("{") && l.endsWith("}")))
    assert(lines.forall(_.contains(""""summary":"FAKE[""")))
  }

  test("missing YAML file → exit 1") {
    assert(Main.run(Array("/nope/job.yml", "--in", "x", "--out", "y")) == 1)
  }

  test("invalid config (missing keys) → exit 1") {
    val d = setup()
    Files.writeString(d.resolve("bad.yml"), ":id: x")
    assert(Main.run(Array(d.resolve("bad.yml").toString,
      "--in", "x", "--out", "y")) == 1)
  }

  test("happy path with --fake: exit 0, corrupt line dead-lettered") {
    spark // ensure the shared session exists so Main reuses it
    val d = setup()
    val out = d.resolve("out").toString
    val err = d.resolve("err").toString
    val code = Main.run(Array(d.resolve("job.yml").toString,
      "--in", d.resolve("in.jsonl").toString,
      "--out", out, "--err", err, "--fake"))
    assert(code == 0)
    import spark.implicits._
    val lines = spark.read.text(out).as[String].collect()
    assert(lines.length == 2)
    assert(lines.forall(_.contains(""""summary":"FAKE[""")))
    assert(spark.read.text(s"$err/corrupt").count() == 1)
  }
}
