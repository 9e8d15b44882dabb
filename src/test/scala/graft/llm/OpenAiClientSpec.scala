package graft.llm

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{JobConfig, ResponseFormat}

/** Request-body shape tests — the reference asserts these through a
  * mocked client (spec/json_mode_spec.rb:58-274,350-370,
  * spec/image_processing_spec.rb:73-89); we assert on the built JSON
  * directly, no server needed.
  */
class OpenAiClientSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  private def cfg(
      params: Map[String, Any] = Map.empty,
      rf: Option[ResponseFormat] = None,
      useImages: Boolean = false) =
    JobConfig("t", "tpl", "http://h", "model-x", "out",
      None, params, useImages, rf)

  test("minimal request: model + messages only") {
    val j = mapper.readTree(
      OpenAiClient.requestBody(Seq(Msg("user", "hi")), cfg()))
    assert(j.get("model").asText() == "model-x")
    assert(j.get("messages").get(0).get("role").asText() == "user")
    assert(j.get("messages").get(0).get("content").asText() == "hi")
    assert(!j.has("response_format"))
    assert(!j.has("temperature"))
  }

  test("params merged verbatim at top level") {
    val j = mapper.readTree(OpenAiClient.requestBody(
      Seq(Msg("user", "hi")),
      cfg(params = Map("temperature" -> 0.3, "max_tokens" -> 200))))
    assert(j.get("temperature").asDouble() == 0.3)
    assert(j.get("max_tokens").asInt() == 200)
  }

  test("system message precedes user message") {
    val j = mapper.readTree(OpenAiClient.requestBody(
      Seq(Msg("system", "sys"), Msg("user", "u")), cfg()))
    assert(j.get("messages").size() == 2)
    assert(j.get("messages").get(0).get("role").asText() == "system")
    assert(j.get("messages").get(1).get("role").asText() == "user")
  }

  test("simple json_mode → response_format {type: json_object}") {
    val j = mapper.readTree(OpenAiClient.requestBody(
      Seq(Msg("user", "u")), cfg(rf = Some(ResponseFormat.JsonMode))))
    assert(j.get("response_format").get("type").asText() == "json_object")
    assert(!j.get("response_format").has("schema"))
  }

  test("json schema → response_format {type, schema}") {
    val schema = new java.util.LinkedHashMap[String, Any]()
    schema.put("type", "object")
    val j = mapper.readTree(OpenAiClient.requestBody(
      Seq(Msg("user", "u")), cfg(rf = Some(ResponseFormat.JsonSchema(schema)))))
    val rf = j.get("response_format")
    assert(rf.get("type").asText() == "json_object")
    assert(rf.get("schema").get("type").asText() == "object")
  }

  test("multimodal: content becomes [text, image_url…] parts with data URIs") {
    val j = mapper.readTree(OpenAiClient.requestBody(
      Seq(Msg("user", "describe", Seq("AAA", "BBB"))), cfg(useImages = true)))
    val content = j.get("messages").get(0).get("content")
    assert(content.isArray && content.size() == 3)
    assert(content.get(0).get("type").asText() == "text")
    assert(content.get(0).get("text").asText() == "describe")
    assert(content.get(1).get("type").asText() == "image_url")
    assert(content.get(1).get("image_url").get("url").asText()
      == "data:image/jpeg;base64,AAA")
    assert(content.get(2).get("image_url").get("url").asText()
      == "data:image/jpeg;base64,BBB")
  }

  test("no images → plain string content even when use_images is on") {
    val j = mapper.readTree(OpenAiClient.requestBody(
      Seq(Msg("user", "plain", Nil)), cfg(useImages = true)))
    assert(j.get("messages").get(0).get("content").isTextual)
  }
}
