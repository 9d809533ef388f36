package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-14 bench protocol contracts: a throwing query is an ERROR flag,
  * never a fake timing; a slow memo-building first run re-runs with its
  * just-built entries evicted so the min still charges the build.
  */
class BenchProtocolSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("a deliberately broken query records an error flag, not a timing") {
    val good = (s: org.apache.spark.sql.SparkSession, d: String) =>
      s.range(5).toDF("x")
    val boom = (s: org.apache.spark.sql.SparkSession, d: String) => {
      s.range(5).toDF("x").filter(expr("assert_true(x < 2, 'boom')").isNull)
    }
    val res = Bench.runQueries("/root/testdata/sf0.001", "4", " spec",
      Seq("z_good" -> good, "z_boom" -> boom), 2, stopSession = false)
    val byName = res.map(r => r._1 -> r._3).toMap
    assert(byName("z_good") == false)
    assert(byName("z_boom") == true, "throwing query must carry the error flag")
  }

  test("memo eviction: evict removes the entry and unpersists its blocks; rebuild pays again") {
    val key = s"benchspec-evict-${System.nanoTime()}"
    var builds = 0
    def build() = graft.queries.Shared.memoized(spark, key) {
      builds += 1
      graft.operators.Dedup.cachedForReuse(spark.range(100).toDF("x"))
    }
    val before = graft.queries.Shared.memoKeys
    build(); build()
    assert(builds == 1, "second call must ride the memo")
    val built = graft.queries.Shared.memoKeys -- before
    assert(built == Set(key))
    assert(graft.queries.Shared.buildSeconds(key).exists(_ >= 0.0))
    graft.queries.Shared.evict(built)
    assert(!graft.queries.Shared.memoKeys.contains(key))
    build()
    assert(builds == 2, "post-eviction call must rebuild (pay the build again)")
    graft.queries.Shared.evict(Set(key))
  }
}
