package graft.sinks

import java.nio.file.{Files, Paths}
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.DataFrame
import graft.core.Loader
import graft.core.PluginConfig._

/** Single-file JSON array sink mirroring the reference's `json_local` loader
  * (`/root/reference/src/data_extractor/loaders/json_local.py:17-40`): ONE
  * pretty-printed JSON array (records orient, indent default 2), parent dirs
  * created on connect, row order preserved.
  *
  * Deliberately NOT `df.write.json` (that emits JSONL part-files): the
  * contract is a single ordered array file, so rows are collected to the
  * driver — correct for this sink's single-machine output contract; at
  * cluster scale you'd use the parquet/JDBC sinks instead.
  */
class JsonLocalLoader(conf: Conf) extends Loader {
  private val path = conf.str("path").getOrElse(
    throw new IllegalArgumentException("json_local: 'path' is required"))
  private val indent = conf.intOr("indent", 2)

  override def connect(): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
  }

  override def load(df: DataFrame): Unit = {
    val mapper = new ObjectMapper()
    val arr = mapper.createArrayNode()
    val cols = df.columns
    df.collect().foreach { row =>
      val obj = arr.addObject()
      cols.zipWithIndex.foreach { case (c, i) =>
        row.get(i) match {
          case null => obj.putNull(c)
          case b: Boolean => obj.put(c, b)
          case n: Int => obj.put(c, n)
          case n: Long => obj.put(c, n)
          case n: Double => obj.put(c, n)
          case n: Float => obj.put(c, n.toDouble)
          case n: java.math.BigDecimal => obj.put(c, n)
          case other => obj.put(c, other.toString)
        }
      }
    }
    val writer =
      if (indent > 0) mapper.writerWithDefaultPrettyPrinter()
      else mapper.writer()
    Files.writeString(Paths.get(path), writer.writeValueAsString(arr))
  }
}
