package graft.core

import java.nio.file.{Files, Paths}

/** `.env` support mirroring the reference's dotenv load at import
  * (`/root/reference/src/data_extractor/__main__.py:8-10`): process env wins,
  * `.env` in the working directory (or `$GRAFT_ENV_FILE`) fills the gaps.
  * Sources take `env: String => Option[String]` seams, so this composes
  * without mutating JVM state.
  */
object EnvFile {
  def parse(p: java.nio.file.Path): Map[String, String] =
    if (!Files.exists(p)) Map.empty
    else Files.readAllLines(p).toArray(Array.empty[String]).toSeq
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains("="))
      .map { l =>
        val i = l.indexOf('=')
        l.take(i).trim -> l.drop(i + 1).trim.stripPrefix("\"").stripSuffix("\"")
      }.toMap

  lazy val fromFile: Map[String, String] =
    parse(Paths.get(sys.env.getOrElse("GRAFT_ENV_FILE", ".env")))

  /** Lookup: real environment first, then the .env file. */
  def get(name: String): Option[String] = sys.env.get(name).orElse(fromFile.get(name))
}
