package graft.llm

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.time.Duration

import graft.core.JobConfig
import graft.pipeline.{EnrichJob, EnrichOptions}
import graft.SparkSpec

/** Live-backend integration suite, skip-if-unavailable — the
  * reference's contract (spec/integration_spec.rb:49-69 gates on
  * endpoint reachability, spec/spec_helper.rb:23-25 reads
  * LLM_API_ENDPOINT). Everything else in the repo tests OpenAiClient
  * via requestBody units + the fake backend; this exercises the real
  * transport end-to-end when an OpenAI-compatible server exists:
  *
  *   LLM_API_ENDPOINT=http://localhost:8080 [LLM_MODEL=qwen3-0.6b] sbt test
  *
  * With no reachable endpoint the suite cancels (yellow, not green) so
  * CI can't silently claim live coverage it didn't run.
  */
class LiveLlmSpec extends SparkSpec {

  private val endpoint = sys.env.get("LLM_API_ENDPOINT")
  private val model = sys.env.getOrElse("LLM_MODEL", "qwen3-0.6b")

  private def reachable(base: String): Boolean =
    try {
      val http = HttpClient.newBuilder()
        .connectTimeout(Duration.ofSeconds(3)).build()
      val req = HttpRequest.newBuilder()
        .uri(URI.create(s"$base/v1/models"))
        .timeout(Duration.ofSeconds(3)).GET().build()
      http.send(req, HttpResponse.BodyHandlers.ofString()).statusCode() > 0
    } catch { case _: Throwable => false }

  private def liveConfig(): JobConfig = {
    val d = Files.createTempDirectory("graft-live")
    Files.writeString(d.resolve("prompt.erb"),
      "Summarize in one sentence: <%= texts[:content] %>")
    Files.writeString(d.resolve("job.yml"),
      s""":id: live-test
         |:erb_filepath: prompt.erb
         |:backend_endpoint: ${endpoint.get}
         |:model: $model
         |:output_label: summary""".stripMargin)
    JobConfig.load(d.resolve("job.yml").toString)
  }

  test("live backend: enrich pipeline round-trips real completions") {
    assume(endpoint.isDefined, "LLM_API_ENDPOINT not set")
    assume(reachable(endpoint.get), s"${endpoint.get} not reachable")
    import spark.implicits._
    val records = Seq(
      ("live-1", Map("content" -> "Spark distributes dataframe computations across a cluster."), Seq.empty[String]),
      ("live-2", Map("content" -> "Deduplication removes near-identical documents from training data."), Seq.empty[String]))
      .toDF("id", "texts", "images")
    val result = EnrichJob.run(records, liveConfig(), new OpenAiClient(),
      EnrichOptions(concurrency = 2))
    val good = result.good.as[(String, Map[String, String], Seq[String])].collect()
    assert(result.deadLetter.count() == 0)
    assert(good.length == 2)
    good.foreach { case (_, texts, _) =>
      assert(texts.contains("summary") && texts("summary").nonEmpty,
        s"empty live completion: $texts")
      assert(texts.contains("content"), "input labels must be preserved")
    }
  }

  test("live backend: malformed model errors dead-letter, job survives") {
    assume(endpoint.isDefined, "LLM_API_ENDPOINT not set")
    assume(reachable(endpoint.get), s"${endpoint.get} not reachable")
    import spark.implicits._
    val d = Files.createTempDirectory("graft-live-bad")
    Files.writeString(d.resolve("prompt.erb"), "<%= texts[:content] %>")
    Files.writeString(d.resolve("job.yml"),
      s""":id: live-bad
         |:erb_filepath: prompt.erb
         |:backend_endpoint: ${endpoint.get}
         |:model: no-such-model-graft
         |:output_label: summary""".stripMargin)
    val cfg = JobConfig.load(d.resolve("job.yml").toString)
    val records = Seq(("x", Map("content" -> "hello"), Seq.empty[String]))
      .toDF("id", "texts", "images")
    val result = EnrichJob.run(records, cfg, new OpenAiClient(),
      EnrichOptions(maxRetries = 0))
    // fail-soft: the record dead-letters with the reference's error
    // prefix; the job itself never throws
    assert(result.good.count() + result.deadLetter.count() == 1)
  }
}
