package graft.sinks

import graft.core.Registries

/** Registration of the built-in loaders. */
object Sinks {
  @volatile private var done = false

  def register(): Unit = synchronized {
    if (done) return
    done = true
    Registries.loaders.register("json_local")((_, c) => new JsonLocalLoader(c))
    Registries.loaders.register("sql_database")((_, c) => new JdbcLoader(c))
    Registries.loaders.register("parquet_local")((_, c) => new ParquetLoader(c))
    Registries.loaders.register("orc_local")((_, c) => new OrcLoader(c))
    Registries.loaders.register("jsonl_local")((_, c) => new JsonlLoader(c))
    Registries.loaders.register("csv_local")((_, c) => new CsvLoader(c))
  }
}
