package graft.core

import java.nio.file.{Files, Paths, StandardCopyOption}
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._
import org.slf4j.LoggerFactory

/** Incremental-cursor state store mirroring the reference's `StateManager`
  * (`/root/reference/src/data_extractor/state.py:30-77`):
  *   - one JSON object file keyed by pipeline name,
  *   - atomic write (temp file + rename),
  *   - corrupt or non-object state resets to empty with a warning,
  *   - values unwrapped to plain JVM scalars (the reference unwraps numpy
  *     scalars the same way).
  */
class StateManager(path: String) {
  private val log = LoggerFactory.getLogger(getClass)
  private val mapper = new ObjectMapper()

  def readAll(): Map[String, Any] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return Map.empty
    try {
      val node = mapper.readValue(Files.readString(p), classOf[java.util.Map[String, Object]])
      node.asScala.toMap
    } catch {
      case e: Exception =>
        log.warn(s"State file $path unreadable (${e.getMessage}); resetting to empty")
        Map.empty
    }
  }

  def get(pipeline: String): Option[Any] = readAll().get(pipeline)

  /** Atomic read-modify-write of one pipeline's cursor. */
  def set(pipeline: String, value: Any): Unit = {
    val unwrapped = value match {
      case ts: java.sql.Timestamp => ts.toString
      case d: java.sql.Date => d.toString
      case bd: java.math.BigDecimal => bd.doubleValue()
      case other => other
    }
    val all = readAll() + (pipeline -> unwrapped)
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    val tmp = Files.createTempFile(
      Option(p.getParent).getOrElse(Paths.get(".")), ".state", ".tmp")
    Files.writeString(tmp, mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(all.asJava))
    try Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    catch {
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING)
    }
  }
}
