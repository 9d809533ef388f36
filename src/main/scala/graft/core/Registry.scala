package graft.core

import org.apache.spark.sql.SparkSession
import graft.core.PluginConfig.Conf

/** Plugin registry mirroring the reference's decorator-based registry
  * (`/root/reference/src/data_extractor/registry.py:13-119`): string key →
  * factory, duplicate registration is an error, unknown keys raise with the
  * available-key list, and `listRegistered` powers `--list-modules`.
  */
class Registry[T](val kind: String) {
  private var factories = Map.empty[String, (SparkSession, Conf) => T]

  def register(key: String)(factory: (SparkSession, Conf) => T): Unit = synchronized {
    if (factories.contains(key))
      throw new IllegalStateException(s"Duplicate $kind registration: '$key'")
    factories += key -> factory
  }

  def resolve(key: String): (SparkSession, Conf) => T =
    factories.getOrElse(key, throw new IllegalArgumentException(
      s"Unknown $kind '$key'. Available: ${factories.keys.toSeq.sorted.mkString(", ")}"))

  def keys: Seq[String] = factories.keys.toSeq.sorted
}

object Registries {
  val extractors = new Registry[Extractor]("extractor")
  val transformers = new Registry[Transformer]("transformer")
  val loaders = new Registry[Loader]("loader")

  /** Force plugin object initializers (the reference imports subpackages to
    * run the registration decorators; we touch the objects).
    */
  def bootstrap(): Unit = {
    graft.sources.Sources.register()
    graft.transformers.Transformers.register()
    graft.sinks.Sinks.register()
  }

  def listRegistered(): String = {
    bootstrap()
    val sections = Seq(
      "Extractors" -> extractors.keys,
      "Transformers" -> transformers.keys,
      "Loaders" -> loaders.keys)
    sections.map { case (title, ks) =>
      s"$title:\n" + ks.map(k => s"  - $k").mkString("\n")
    }.mkString("\n")
  }
}
