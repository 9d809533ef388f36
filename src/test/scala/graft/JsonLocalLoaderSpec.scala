package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.sinks.JsonLocalLoader
import graft.transformers.Transformers

/** Direct mirrors of `tests/test_json_local_loader.py` and
  * `tests/test_pass_through_transformer.py`.
  */
class JsonLocalLoaderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("json_local writes one ordered JSON array with typed values") {
    val dir = Files.createTempDirectory("jsonlocal")
    val path = dir.resolve("out.json")
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
      .toDF("id", "name", "score").orderBy("id")
    val loader = new JsonLocalLoader(Map("path" -> path.toString))
    loader.connect(); loader.load(df); loader.disconnect()

    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(path))
    assert(node.isArray && node.size() == 3)
    // row order preserved; numbers stay numbers, strings stay strings
    assert((0 until 3).map(i => node.get(i).get("id").asLong()) == Seq(1L, 2L, 3L))
    assert(node.get(0).get("name").isTextual && node.get(0).get("score").isDouble)
  }

  test("json_local streamed output is byte-identical to the ObjectWriter tree form") {
    // the loader streams through a JsonGenerator + DefaultPrettyPrinter;
    // this pins that the bytes equal the materialized-tree serialization
    // the sink used before the toLocalIterator rewrite (and that a Jackson
    // upgrade changing printer defaults would be caught, not silent)
    val dir = Files.createTempDirectory("jsonlocal_bytes")
    val path = dir.resolve("out.json")
    val rows = Seq((1L, "a", 1.5, true), (2L, "b", 2.5, false))
    val df = rows.toDF("id", "name", "score", "flag").orderBy("id")
    val loader = new JsonLocalLoader(Map("path" -> path.toString))
    loader.connect(); loader.load(df); loader.disconnect()

    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = mapper.createArrayNode()
    rows.foreach { case (id, name, score, flag) =>
      val o = arr.addObject()
      o.put("id", id); o.put("name", name); o.put("score", score); o.put("flag", flag)
    }
    val expected = mapper.writerWithDefaultPrettyPrinter().writeValueAsString(arr)
    assert(Files.readString(path) == expected)
    // no temp file left behind on success
    assert(!Files.exists(dir.resolve("out.json.tmp")))
  }

  test("json_local creates missing parent directories on connect") {
    val dir = Files.createTempDirectory("jsonlocal2")
    val nested = dir.resolve("a/b/c/out.json")
    val loader = new JsonLocalLoader(Map("path" -> nested.toString))
    loader.connect()
    loader.load(Seq((1, "x")).toDF("id", "v"))
    assert(Files.exists(nested))
  }

  test("csv_file -> parquet_local -> parquet_file round-trips through the engine") {
    val dir = Files.createTempDirectory("fmt_rt")
    val csv = dir.resolve("in.csv")
    Files.writeString(csv, "id,name,score\n1,a,1.5\n2,b,2.5\n")
    val out = dir.resolve("out_parquet").toString
    val cfg = graft.core.Config.parse(
      s"""pipeline:
         |  name: fmt_rt
         |  extract:
         |    type: csv_file
         |    inline_config: {path: "${csv.toString}"}
         |  load:
         |    type: parquet_local
         |    inline_config: {path: "$out", if_exists: replace}
         |""".stripMargin)
    new graft.core.Engine(spark).run(cfg)
    val back = new graft.sources.ParquetFileExtractor(spark, Map("path" -> out)).extract()
    assert(back.count() == 2)
    assert(back.columns.toSet == Set("id", "name", "score"))
    // csv inferSchema + parquet preserve types end-to-end
    assert(back.schema("id").dataType == org.apache.spark.sql.types.IntegerType)
    assert(back.schema("score").dataType == org.apache.spark.sql.types.DoubleType)
    // partition_by writes prunable directories
    val out2 = dir.resolve("out_part").toString
    val loader = new graft.sinks.ParquetLoader(
      Map("path" -> out2, "if_exists" -> "replace", "partition_by" -> Seq("name")))
    loader.load(back)
    assert(Files.exists(dir.resolve("out_part/name=a")))
  }

  test("orc_local -> orc_file round-trips with partition_by directories") {
    val dir = Files.createTempDirectory("orc_rt")
    val out = dir.resolve("out_orc").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5)).toDF("id", "name", "score")
    new graft.sinks.OrcLoader(
      Map("path" -> out, "if_exists" -> "replace", "partition_by" -> Seq("name")))
      .load(df)
    assert(Files.exists(dir.resolve("out_orc/name=a")))
    val back = new graft.sources.OrcFileExtractor(spark, Map("path" -> out)).extract()
    assert(back.count() == 3)
    assert(back.columns.toSet == Set("id", "name", "score"))
    assert(back.filter(col("name") === "a").count() == 2)
    // append honors existing data; fail throws on existing path
    new graft.sinks.OrcLoader(Map("path" -> out, "if_exists" -> "append",
      "partition_by" -> Seq("name"))).load(df.limit(1))
    assert(new graft.sources.OrcFileExtractor(spark, Map("path" -> out)).extract().count() == 4)
    intercept[Exception] {
      new graft.sinks.OrcLoader(Map("path" -> out, "if_exists" -> "fail")).load(df)
    }
  }

  test("jsonl_file -> jsonl_local round-trips ndjson through the engine") {
    val dir = Files.createTempDirectory("jsonl_rt")
    val in = dir.resolve("in.jsonl")
    Files.writeString(in,
      """{"id": 1, "text": "alpha", "score": 1.5}
        |{"id": 2, "text": "beta", "score": 2.5}
        |{"id": 3, "text": "gamma", "score": null}
        |""".stripMargin)
    val out = dir.resolve("out_jsonl").toString
    val cfg = graft.core.Config.parse(
      s"""pipeline:
         |  name: jsonl_rt
         |  extract:
         |    type: jsonl_file
         |    inline_config: {path: "${in.toString}"}
         |  load:
         |    type: jsonl_local
         |    inline_config: {path: "$out", if_exists: replace}
         |""".stripMargin)
    new graft.core.Engine(spark).run(cfg)
    val back = new graft.sources.JsonlFileExtractor(spark, Map("path" -> out)).extract()
    assert(back.count() == 3)
    assert(back.columns.toSet == Set("id", "text", "score"))
    assert(back.filter(col("text") === "beta").select("score").head().getDouble(0) == 2.5)
    // the written files are genuine one-object-per-line ndjson (splittable)
    val part = Files.list(java.nio.file.Paths.get(out)).toArray.map(_.toString)
      .filter(p => p.contains("part-") && p.endsWith(".json"))
    assert(part.nonEmpty)
    val lines = part.flatMap(p =>
      scala.jdk.CollectionConverters.ListHasAsScala(
        Files.readAllLines(java.nio.file.Paths.get(p))).asScala)
    assert(lines.count(_.trim.nonEmpty) == 3)
    lines.filter(_.trim.nonEmpty).foreach(l => assert(l.trim.startsWith("{")))
  }

  test("pass_through preserves rows, columns and values exactly") {
    val df = Seq((1L, "a", Some(1.5)), (2L, "b", None)).toDF("id", "name", "score")
    val out = Transformers.PassThrough.transform(df)
    assert(out.schema == df.schema)
    assert(out.collect().toSeq == df.collect().toSeq)
  }

  test("csv_local -> csv_file round-trips with header and partition_by") {
    val dir = Files.createTempDirectory("csv_rt")
    val out = dir.resolve("out_csv").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5)).toDF("id", "name", "score")
    new graft.sinks.CsvLoader(
      Map("path" -> out, "if_exists" -> "replace", "partition_by" -> Seq("name")))
      .load(df)
    assert(Files.exists(dir.resolve("out_csv/name=a")))
    val back = new graft.sources.CsvFileExtractor(spark,
      Map("path" -> out, "header" -> "true", "infer_schema" -> "true")).extract()
    assert(back.count() == 3)
    assert(back.columns.toSet == Set("id", "name", "score"))
    assert(back.filter(col("name") === "a").count() == 2)
    // append adds rows; fail throws on existing path
    new graft.sinks.CsvLoader(Map("path" -> out, "if_exists" -> "append",
      "partition_by" -> Seq("name"))).load(df.limit(1))
    assert(new graft.sources.CsvFileExtractor(spark,
      Map("path" -> out, "header" -> "true")).extract().count() == 4)
    intercept[Exception] {
      new graft.sinks.CsvLoader(Map("path" -> out, "if_exists" -> "fail")).load(df)
    }
  }
}
