package graft.llm

import graft.core.JobConfig

/** One chat message. `images` carries base64 JPEG payloads; when
  * non-empty the client renders the OpenAI multimodal content-parts
  * array (reference build_message_content, lib/job_processor.rb:212-236),
  * otherwise plain string content.
  */
final case class Msg(role: String, text: String, images: Seq[String] = Nil)
    extends Serializable

/** The engine's one effectful operator (SURVEY.md R7/E18): an
  * OpenAI-compatible chat completion. Implementations MUST be
  * Serializable (shipped to executors inside mapPartitions closures)
  * and keep any network state @transient.
  *
  * Contract (reference call_llm_api, lib/job_processor.rb:137-179):
  *  - returns `choices[0].message.content`, defaulting to "" when the
  *    path is missing;
  *  - any transport/API error surfaces as an exception whose message
  *    the pipeline wraps as "API request failed: …" and routes to the
  *    dead-letter channel (record dropped, job continues).
  */
trait LlmClient extends Serializable {
  def chat(messages: Seq[Msg], cfg: JobConfig): String
}

/** Deterministic fake backend for tests and benchmarks — response is a
  * pure function of the request (mirrors the reference's mocked
  * OpenAI::Client, spec/job_processor_spec.rb:78-94). Isolates engine
  * overhead from network in BENCH numbers.
  */
final class FakeLlmClient(
    /** optional canned transform applied to the user prompt */
    transform: String => String = FakeLlmClient.default)
    extends LlmClient {
  override def chat(messages: Seq[Msg], cfg: JobConfig): String = {
    val user = messages.reverseIterator.find(_.role == "user").map(_.text).getOrElse("")
    transform(user)
  }
}

object FakeLlmClient {
  /** echo-with-fingerprint: deterministic, prompt-dependent, cheap */
  val default: String => String = p =>
    s"FAKE[${Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(p))}]: $p"

  /** a backend that always fails — for dead-letter-path tests */
  def failing(msg: String): LlmClient = new LlmClient {
    override def chat(messages: Seq[Msg], cfg: JobConfig): String =
      throw new RuntimeException(msg)
  }
}
