package graft.core

import java.nio.file.{Files, Path, Paths}
import java.{util => ju}

import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

/** The job definition — the reference's "query" (a YAML file;
  * reference lib/job_processor.rb:10,68-109, README.md:49-56).
  *
  * Loaded and validated ONCE on the driver; the resolved config (with
  * templates read and response_format decided) is then shipped to
  * executors as a plain serializable value — unlike the reference,
  * which re-reads template files per record
  * (lib/job_processor.rb:113-114, flagged in SURVEY.md §4.1).
  */
final case class JobConfig(
    id: String,
    /** resolved user-prompt template TEXT (not path — read once) */
    erbTemplate: String,
    /** normalized endpoint, trailing /v1 stripped (lib/job_processor.rb:59) */
    backendEndpoint: String,
    model: String,
    outputLabel: String,
    /** resolved system-prompt template text, if configured */
    systemErbTemplate: Option[String],
    /** extra request params merged verbatim (temperature, max_tokens, …) */
    params: Map[String, Any],
    useImages: Boolean,
    /** response_format patch; priority inline > file > simple
      * (lib/job_processor.rb:181-205) */
    responseFormat: Option[ResponseFormat],
    /** per-request timeout, reference default 240 s (lib/job_processor.rb:64) */
    requestTimeoutSec: Int = 240)
    extends Serializable

sealed trait ResponseFormat extends Serializable
object ResponseFormat {
  /** `{type: json_object}` */
  case object JsonMode extends ResponseFormat
  /** `{type: json_object, schema: …}`; schema kept as nested
    * java.io.Serializable maps/lists straight from YAML */
  final case class JsonSchema(schema: Any) extends ResponseFormat
}

object JobConfig {
  private val RequiredKeys =
    Seq("id", "erb_filepath", "backend_endpoint", "model", "output_label")

  /** Load + validate a job YAML. Error messages mirror the reference's
    * (lib/job_processor.rb:68-97) so CLI behavior is drop-in.
    */
  def load(yamlPath: String): JobConfig = {
    val path = Paths.get(yamlPath)
    val raw = new Yaml().load[ju.Map[String, Any]](Files.readString(path))
    if (raw == null) throw new IllegalArgumentException(s"Empty job definition: $yamlPath")
    // Ruby-symbol YAML keys (`:id:`) arrive from snakeyaml as ":id" —
    // normalize so the reference's own job files load unchanged
    // (reference loads with symbolize_names, lib/job_processor.rb:10).
    val cfg = raw.asScala.toMap.map { case (k, v) => (k.stripPrefix(":"), v) }
    val jobDir = path.toAbsolutePath.getParent

    val missing = RequiredKeys.filterNot(cfg.contains)
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"Missing required configuration keys: ${missing.mkString(", ")}")

    def str(k: String): String = String.valueOf(cfg(k))

    // relative paths resolve against the YAML's directory, `..` normalized
    // (reference resolve_erb_path, lib/job_processor.rb:99-109)
    def resolve(p: String): Path = {
      val pp = Paths.get(p)
      if (pp.isAbsolute) pp else jobDir.resolve(pp).normalize()
    }

    def readTemplate(key: String, label: String): String = {
      val p = resolve(str(key))
      if (!Files.exists(p))
        throw new IllegalArgumentException(s"$label file not found: $p")
      Files.readString(p)
    }

    val erbTemplate = readTemplate("erb_filepath", "ERB template")

    val systemTemplate = cfg.get("system_erb_filepath").map { _ =>
      readTemplate("system_erb_filepath", "System ERB template")
    }

    // response_format priority: inline schema > schema file > simple mode
    val responseFormat: Option[ResponseFormat] =
      cfg.get("json_schema") match {
        case Some(schema) => Some(ResponseFormat.JsonSchema(deepSerializable(schema)))
        case None =>
          cfg.get("json_schema_filepath") match {
            case Some(_) =>
              val p = resolve(str("json_schema_filepath"))
              if (!Files.exists(p))
                throw new IllegalArgumentException(s"JSON schema file not found: $p")
              val schema = new Yaml().load[Any](Files.readString(p))
              Some(ResponseFormat.JsonSchema(deepSerializable(schema)))
            case None =>
              if (truthy(cfg.get("json_mode"))) Some(ResponseFormat.JsonMode)
              else None
          }
      }

    val params: Map[String, Any] = cfg.get("params") match {
      case Some(m: ju.Map[_, _]) =>
        m.asScala.map { case (k, v) =>
          String.valueOf(k).stripPrefix(":") -> deepSerializable(v)
        }.toMap
      case _ => Map.empty
    }

    JobConfig(
      id = str("id"),
      erbTemplate = erbTemplate,
      backendEndpoint = normalizeEndpoint(str("backend_endpoint")),
      model = str("model"),
      outputLabel = str("output_label"),
      systemErbTemplate = systemTemplate,
      params = params,
      useImages = truthy(cfg.get("use_images")),
      responseFormat = responseFormat)
  }

  /** strip trailing /v1 or /v1/ (reference lib/job_processor.rb:59) */
  def normalizeEndpoint(e: String): String = e.replaceAll("/v1/?$", "")

  private def truthy(v: Option[Any]): Boolean = v match {
    case Some(b: java.lang.Boolean) => b
    case Some(s: String) => s == "true"
    case Some(null) | None => false
    case Some(_) => true
  }

  /** snakeyaml yields java.util maps/lists (serializable); keep as-is
    * but convert any exotic values to strings so broadcast never fails */
  private def deepSerializable(v: Any): Any = v match {
    case m: ju.Map[_, _] =>
      val out = new ju.LinkedHashMap[String, Any]()
      m.asScala.foreach { case (k, x) => out.put(String.valueOf(k), deepSerializable(x)) }
      out
    case l: ju.List[_] =>
      val out = new ju.ArrayList[Any]()
      l.asScala.foreach(x => out.add(deepSerializable(x)))
      out
    case null => null
    case x: java.io.Serializable => x
    case x => String.valueOf(x)
  }
}
