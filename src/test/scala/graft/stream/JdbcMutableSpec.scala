package graft.stream

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.Cdc
import graft.model.Schemas

/** The JDBC mutable sink ([[JdbcState.applyMutable]]) against Derby:
  * materialization, keyed delete, per-mask update elision, absent-key
  * no-op, and at-least-once replay convergence. */
class JdbcMutableSpec extends SparkSpec {
  import spark.implicits._

  private val derby = Some("org.apache.derby.jdbc.EmbeddedDriver")

  private def freshUrl(): String =
    s"jdbc:derby:${Files.createTempDirectory("graft-jdbc-mut")}/db;create=true"

  private def env(op: String, pos: Long, before: String, after: String) =
    (op, "db", "matomo_site", "2024-01-05T10:00:00", "mysql-bin.000001",
      pos, 0, before, after)

  private def typedOf(rows: Seq[(String, String, String, String, String,
      Long, Int, String, String)]): DataFrame =
    Cdc.typedChanges(
      rows.toDF("op", "schema", "table", "ts", "log_file", "log_pos",
          "row_index", "before", "after")
        .select(col("op"), col("schema"), col("table"),
          col("ts").cast("timestamp").as("ts"), col("log_file"),
          col("log_pos"), col("row_index"), col("before"), col("after")),
      "matomo_site")

  private def state(url: String): Map[Long, (String, String)] =
    graft.sources.Jdbc.readTable(spark, url, "state_matomo_site", derby)
      .select($"idsite", $"name", $"main_url")
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("materialize / delete / absent-key no-op; replay converges") {
    val url = freshUrl()
    // site 1: INSERT then UPDATE in one batch -> materialize last after-image
    // site 2: INSERT then DELETE -> gone
    // site 3: UPDATE with no prior state -> matches zero rows, dropped
    val batch = typedOf(Seq(
      env("INSERT", 100, null, """{"idsite":1,"name":"alpha","main_url":"http://a"}"""),
      env("UPDATE", 200, """{"idsite":1,"name":"alpha","main_url":"http://a"}""",
        """{"idsite":1,"name":"alpha2","main_url":"http://a"}"""),
      env("INSERT", 300, null, """{"idsite":2,"name":"beta","main_url":"http://b"}"""),
      env("DELETE", 400, """{"idsite":2,"name":"beta","main_url":"http://b"}""", null),
      env("UPDATE", 500, """{"idsite":3,"name":"ghost","main_url":"http://g"}""",
        """{"idsite":3,"name":"ghost2","main_url":"http://g"}""")))
    JdbcState.applyMutable(batch, JdbcState.SinkConfig(url, derby),
      "matomo_site", Seq("idsite"))
    val once = state(url)
    assert(once == Map(1L -> (("alpha2", "http://a"))))
    // crash-replay of the whole batch: REPLACE + DELETE + UPDATE all rebind
    // the same values — state identical, no duplicate rows
    JdbcState.applyMutable(batch, JdbcState.SinkConfig(url, derby),
      "matomo_site", Seq("idsite"))
    assert(state(url) == once)
  }

  test("pure-update chains elide: only chain-changed columns reach the target") {
    val url = freshUrl()
    val cfg = JdbcState.SinkConfig(url, derby)
    JdbcState.applyMutable(typedOf(Seq(
      env("INSERT", 100, null,
        """{"idsite":1,"name":"alpha","main_url":"http://REAL"}"""))),
      cfg, "matomo_site", Seq("idsite")) // seeded state: (alpha, http://REAL)

    // a later batch updates ONLY the name; both images carry a main_url the
    // target does not have — unchanged between images, so elision must keep
    // the TARGET's value, not apply the image's
    JdbcState.applyMutable(typedOf(Seq(
      env("UPDATE", 200,
        """{"idsite":1,"name":"alpha","main_url":"http://DECOY"}""",
        """{"idsite":1,"name":"renamed","main_url":"http://DECOY"}"""))),
      cfg, "matomo_site", Seq("idsite"))
    assert(state(url) == Map(1L -> (("renamed", "http://REAL"))))

    // a two-update chain a->b, b->b on name plus a main_url change in the
    // FIRST update only: chain-merged flags apply BOTH columns from the
    // last event's after-image
    JdbcState.applyMutable(typedOf(Seq(
      env("UPDATE", 300,
        """{"idsite":1,"name":"renamed","main_url":"http://REAL"}""",
        """{"idsite":1,"name":"renamed","main_url":"http://moved"}"""),
      env("UPDATE", 400,
        """{"idsite":1,"name":"renamed","main_url":"http://moved"}""",
        """{"idsite":1,"name":"final","main_url":"http://moved"}"""))),
      cfg, "matomo_site", Seq("idsite"))
    assert(state(url) == Map(1L -> (("final", "http://moved"))))
  }

  test("composite keys: matomo_goal (idsite, idgoal) binds every key column") {
    val url = freshUrl()
    val cfg = JdbcState.SinkConfig(url, derby)
    def goalEnv(op: String, pos: Long, before: String, after: String) =
      (op, "db", "matomo_goal", "2024-01-05T10:00:00", "mysql-bin.000001",
        pos, 0, before, after)
    def typedGoal(rows: Seq[(String, String, String, String, String,
        Long, Int, String, String)]) =
      Cdc.typedChanges(
        rows.toDF("op", "schema", "table", "ts", "log_file", "log_pos",
            "row_index", "before", "after")
          .select(col("op"), col("schema"), col("table"),
            col("ts").cast("timestamp").as("ts"), col("log_file"),
            col("log_pos"), col("row_index"), col("before"), col("after")),
        "matomo_goal")
    // two goals sharing idsite 1: the second key column must participate in
    // every DELETE/REPLACE/UPDATE predicate or the wrong sibling mutates
    JdbcState.applyMutable(typedGoal(Seq(
      goalEnv("INSERT", 100, null, """{"idsite":1,"idgoal":1,"name":"g11","deleted":0}"""),
      goalEnv("INSERT", 200, null, """{"idsite":1,"idgoal":2,"name":"g12","deleted":0}"""),
      goalEnv("INSERT", 300, null, """{"idsite":2,"idgoal":1,"name":"g21","deleted":0}"""))),
      cfg, "matomo_goal", Seq("idsite", "idgoal"))
    // pure update of (1,2) only; delete of (2,1) only
    JdbcState.applyMutable(typedGoal(Seq(
      goalEnv("UPDATE", 400,
        """{"idsite":1,"idgoal":2,"name":"g12","deleted":0}""",
        """{"idsite":1,"idgoal":2,"name":"g12x","deleted":0}"""),
      goalEnv("DELETE", 500,
        """{"idsite":2,"idgoal":1,"name":"g21","deleted":0}""", null))),
      cfg, "matomo_goal", Seq("idsite", "idgoal"))
    val rows = graft.sources.Jdbc.readTable(spark, url, "state_matomo_goal", derby)
      .select($"idsite", $"idgoal", $"name")
      .as[(Int, Int, String)].collect().toSet
    assert(rows == Set((1, 1, "g11"), (1, 2, "g12x")))
  }

  test("sink-mode stream result equals the batch applyMutable on parquet semantics") {
    val url = freshUrl()
    val cfg = JdbcState.SinkConfig(url, derby)
    val rows = Seq(
      env("INSERT", 100, null, """{"idsite":1,"name":"a","main_url":"u1"}"""),
      env("INSERT", 200, null, """{"idsite":2,"name":"b","main_url":"u2"}"""),
      env("UPDATE", 300, """{"idsite":2,"name":"b","main_url":"u2"}""",
        """{"idsite":2,"name":"b2","main_url":"u2"}"""),
      env("DELETE", 400, """{"idsite":1,"name":"a","main_url":"u1"}""", null))
    val typed = typedOf(rows)
    JdbcState.applyMutable(typed, cfg, "matomo_site", Seq("idsite"))
    val viaJdbc = state(url)
    val viaBatch = Cdc.applyMutable(
      StateStore.read(spark, "/nonexistent-mut-site",
        ChangeStream.stateSchema("matomo_site")),
      typed, Seq("idsite"))
      .select($"idsite", $"name", $"main_url")
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(viaJdbc == viaBatch)
  }
}
