package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Temporal
import graft.transformers.Transformers

/** Remaining operator-inventory exercises: the identity transformer (P1),
  * the engine's cursor aggregate (S10), and the as-of temporal join
  * (beyond-reference; oracle = DuckDB's native ASOF JOIN).
  */
object MiscQueries {

  val p1PassThrough: Q = Q(
    "p1_pass_through",
    "SELECT * FROM customer ORDER BY c_custkey") { (spark, dir) =>
    Transformers.PassThrough.transform(Tables.customer(spark, dir))
      .orderBy(col("c_custkey"))
  }

  /** S10 — the incremental engine's new-cursor computation:
    * `max(cursor_field)` over the raw extracted frame.
    */
  val s10CursorMax: Q = Q(
    "s10_cursor_max",
    "SELECT CAST(MAX(event_id) AS BIGINT) AS cursor FROM events") { (spark, dir) =>
    Tables.events(spark, dir).agg(max(col("event_id")).as("cursor"))
  }

  /** As-of join: each purchase matched to the user's latest signup at or
    * before it. Spark side is the union+running-window composition
    * ([[graft.operators.Temporal.asofJoin]]); DuckDB side is its native
    * ASOF JOIN — two very different implementations, same rows.
    */
  val qAsofSignup: Q = Q(
    "q_asof_signup",
    """SELECT p.event_id, p.user_id, p.ts, s.ts AS last_signup_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      |  ON p.user_id = s.user_id AND p.ts >= s.ts
      |ORDER BY p.event_id""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
    val signups = ev.filter(col("event_type") === "signup")
    Temporal.asofJoin(purchases, signups, Seq("user_id"), "ts",
      Map("ts" -> "last_signup_ts"))
      .select("event_id", "user_id", "ts", "last_signup_ts")
      .orderBy(col("event_id"))
  }

  val all: Seq[Q] = Seq(p1PassThrough, s10CursorMax, qAsofSignup)
}
