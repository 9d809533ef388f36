package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Registries, StateManager}

/** State-machine + registry behavior (`tests/test_state_manager.py`,
  * `tests/test_registry.py`).
  */
class StateAndRegistrySpec extends AnyFunSuite {

  private def tmpState(): Path = {
    val dir = Files.createTempDirectory("graft-state")
    dir.resolve("state.json")
  }

  test("state round-trips values per pipeline") {
    val sm = new StateManager(tmpState().toString)
    sm.set("p1", 42L)
    sm.set("p2", "2024-01-01")
    assert(sm.get("p1").contains(42))
    assert(sm.get("p2").contains("2024-01-01"))
  }

  test("state overwrite keeps other pipelines") {
    val sm = new StateManager(tmpState().toString)
    sm.set("p1", 1)
    sm.set("p1", 2)
    sm.set("p2", 3)
    assert(sm.get("p1").contains(2))
    assert(sm.get("p2").contains(3))
  }

  test("corrupt state file resets to empty instead of crashing") {
    val p = tmpState()
    Files.createDirectories(p.getParent)
    Files.writeString(p, "{not json!!")
    val sm = new StateManager(p.toString)
    assert(sm.get("p1").isEmpty)
    sm.set("p1", 7) // and it is writable afterwards
    assert(sm.get("p1").contains(7))
  }

  test("non-object state resets to empty") {
    val p = tmpState()
    Files.writeString(p, "[1,2,3]")
    assert(new StateManager(p.toString).readAll().isEmpty)
  }

  test("missing state file reads empty") {
    assert(new StateManager(tmpState().toString).readAll().isEmpty)
  }

  test("registry: unknown key raises with Available list") {
    Registries.bootstrap()
    val e = intercept[IllegalArgumentException](Registries.extractors.resolve("nope"))
    assert(e.getMessage.contains("Unknown extractor 'nope'"))
    assert(e.getMessage.contains("Available:"))
    assert(e.getMessage.contains("json_file"))
  }

  test("registry: duplicate registration is an error") {
    Registries.bootstrap()
    val e = intercept[IllegalStateException] {
      Registries.extractors.register("json_file")((s, c) => null)
    }
    assert(e.getMessage.contains("Duplicate"))
  }

  test("list-modules output groups all three plugin kinds") {
    val s = Registries.listRegistered()
    assert(s.contains("Extractors:") && s.contains("Transformers:") && s.contains("Loaders:"))
    assert(s.contains("alpha_vantage") && s.contains("data_cleaning") && s.contains("sql_database"))
  }

  test("registry: every reference plugin key resolves (test_registry.py parity)") {
    Registries.bootstrap()
    // subset, not equality: other suites may register test-only plugins
    assert(Set("alpha_vantage", "json_file", "playwright_scraper", "rest_api")
      .subsetOf(Registries.extractors.keys.toSet))
    assert(Set("data_cleaning", "pass_through", "pydantic_validation", "technical_indicators")
      .subsetOf(Registries.transformers.keys.toSet))
    assert(Set("json_local", "sql_database").subsetOf(Registries.loaders.keys.toSet))
  }

  test("cli: flag parsing mirrors the reference argparse surface") {
    // long and short flags
    assert(Cli.parse(Array("-c", "p.yaml")) == Cli.Args(config = Some("p.yaml")))
    assert(Cli.parse(Array("--config", "p.yaml", "--full-refresh")) ==
      Cli.Args(config = Some("p.yaml"), fullRefresh = true))
    // -l works without --config and together with it (config ignored by main)
    assert(Cli.parse(Array("-l")) == Cli.Args(listModules = true))
    assert(Cli.parse(Array("--list-modules", "-c", "p.yaml")) ==
      Cli.Args(config = Some("p.yaml"), listModules = true))
    // errors: unknown flag, missing config, dangling -c
    intercept[IllegalArgumentException](Cli.parse(Array("--nope")))
    intercept[IllegalArgumentException](Cli.parse(Array.empty[String]))
    intercept[IllegalArgumentException](Cli.parse(Array("-f")))
    intercept[IllegalArgumentException](Cli.parse(Array("-c")))
  }

  test("state: atomic write leaves valid JSON, creates parent dirs, string cursors round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-state")
    val nested = dir.resolve("a/b/state.json")
    val st = new graft.core.StateManager(nested.toString)
    st.set("p1", "2024-01-02T03:04:05") // string cursor
    st.set("p2", 7)
    assert(java.nio.file.Files.exists(nested)) // parents created
    // file parses as a JSON object at any point after a write (atomic move)
    val parsed = new com.fasterxml.jackson.databind.ObjectMapper()
      .readValue(java.nio.file.Files.readString(nested), classOf[java.util.Map[String, Object]])
    assert(parsed.get("p1") == "2024-01-02T03:04:05")
    assert(new graft.core.StateManager(nested.toString).get("p1").contains("2024-01-02T03:04:05"))
    assert(st.get("unknown").isEmpty)
  }
}
