package graft.core

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.yaml.snakeyaml.Yaml

/** Pipeline configuration mirroring the reference's Pydantic models
  * (`/root/reference/src/data_extractor/models.py:14-84`): strict fail-fast
  * validation before any I/O, the "config_file or inline_config" invariant on
  * extract/load, and file ∪ inline merge with inline winning
  * (`engine.py:136-147`).
  */
object Config {

  final case class RetrySettings(maxAttempts: Int = 3, backoffSeconds: Double = 2.0)
  final case class Settings(logLevel: String = "INFO", retry: RetrySettings = RetrySettings(),
      logRowCounts: Boolean = false)
  final case class StepConfig(
      stepType: String,
      configFile: Option[String] = None,
      inlineConfig: Map[String, Any] = Map.empty) {
    /** Effective config: file merged with inline, inline wins. */
    def resolved: Map[String, Any] = {
      val fromFile = configFile.map(p => loadYamlMap(p)).getOrElse(Map.empty)
      fromFile ++ inlineConfig
    }
  }
  final case class IncrementalConfig(
      cursorField: String,
      cursorParam: String,
      initialValue: Option[Any] = None,
      statePath: String = ".pipeline_state.json")
  final case class PipelineConfig(
      name: String,
      extract: StepConfig,
      transform: Seq[StepConfig] = Nil,
      load: StepConfig,
      incremental: Option[IncrementalConfig] = None,
      settings: Settings = Settings())

  private def asScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, vv) => k.toString -> asScala(vv) }.toMap
    case l: java.util.List[_] => l.asScala.map(asScala).toSeq
    case other => other
  }

  def loadYamlMap(path: String): Map[String, Any] = {
    val text = Files.readString(Paths.get(path))
    parseYamlMap(text, path)
  }

  def parseYamlMap(text: String, where: String = "<inline>"): Map[String, Any] = {
    val raw = new Yaml().load[Any](text)
    asScala(raw) match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case null => Map.empty
      case other => throw new IllegalArgumentException(
        s"Config at $where must be a mapping, got ${other.getClass.getSimpleName}")
    }
  }

  private def requireStr(m: Map[String, Any], key: String, ctx: String): String =
    m.get(key) match {
      case Some(s: String) if s.nonEmpty => s
      case _ => throw new IllegalArgumentException(s"$ctx: missing required field '$key'")
    }

  private def parseStep(v: Any, ctx: String): StepConfig = v match {
    case m: Map[_, _] =>
      val mm = m.asInstanceOf[Map[String, Any]]
      val st = StepConfig(
        stepType = requireStr(mm, "type", ctx),
        configFile = mm.get("config_file").collect { case s: String => s },
        inlineConfig = mm.get("inline_config") match {
          case Some(ic: Map[_, _]) => ic.asInstanceOf[Map[String, Any]]
          case _ => Map.empty
        })
      st
    case _ => throw new IllegalArgumentException(s"$ctx: must be a mapping")
  }

  /** The reference requires extract/load to carry a config_file or an
    * inline_config (`models.py:39-46,60-67`).
    */
  private def requireConfigured(s: StepConfig, ctx: String): StepConfig = {
    if (s.configFile.isEmpty && s.inlineConfig.isEmpty)
      throw new IllegalArgumentException(s"$ctx: requires config_file or inline_config")
    s
  }

  def parse(text: String): PipelineConfig = {
    val root = parseYamlMap(text)
    val p = root.get("pipeline") match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
      case _ => throw new IllegalArgumentException("config: missing top-level 'pipeline' mapping")
    }
    val settings = p.get("settings") match {
      case Some(m: Map[_, _]) =>
        val mm = m.asInstanceOf[Map[String, Any]]
        val retry = mm.get("retry") match {
          case Some(r: Map[_, _]) =>
            val rm = r.asInstanceOf[Map[String, Any]]
            RetrySettings(
              maxAttempts = rm.get("max_attempts").collect { case i: Int => i }.getOrElse(3),
              backoffSeconds = rm.get("backoff_seconds").collect {
                case d: Double => d
                case i: Int => i.toDouble
              }.getOrElse(2.0))
          case _ => RetrySettings()
        }
        Settings(
          logLevel = mm.get("log_level").collect { case s: String => s }.getOrElse("INFO"),
          retry = retry,
          logRowCounts = mm.get("log_row_counts").collect { case b: Boolean => b }.getOrElse(false))
      case _ => Settings()
    }
    val incremental = p.get("incremental") match {
      case Some(m: Map[_, _]) =>
        val mm = m.asInstanceOf[Map[String, Any]]
        Some(IncrementalConfig(
          cursorField = requireStr(mm, "cursor_field", "incremental"),
          cursorParam = requireStr(mm, "cursor_param", "incremental"),
          initialValue = mm.get("initial_value"),
          statePath = mm.get("state_path").collect { case s: String => s }
            .getOrElse(".pipeline_state.json")))
      case _ => None
    }
    PipelineConfig(
      name = requireStr(p, "name", "pipeline"),
      extract = requireConfigured(
        parseStep(p.getOrElse("extract",
          throw new IllegalArgumentException("pipeline: missing 'extract'")), "extract"), "extract"),
      transform = p.get("transform") match {
        case Some(l: Seq[_]) => l.zipWithIndex.map { case (s, i) => parseStep(s, s"transform[$i]") }
        case _ => Nil
      },
      load = requireConfigured(
        parseStep(p.getOrElse("load",
          throw new IllegalArgumentException("pipeline: missing 'load'")), "load"), "load"),
      incremental = incremental,
      settings = settings)
  }

  def load(path: String): PipelineConfig = parse(Files.readString(Paths.get(path)))
}
