package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Schemas

/** Hand-built typed change frames for the FIXTURES.md §A scenarios.
  *
  * Payload shape is a 3-column simplification of `matomo_site`
  * (reference: script_create_clickhouse_table.sql:268-288): `id` (key),
  * `name`, `note` (nullable) — enough to exercise key matching (F13),
  * changed-column elision (F8), and versioned append semantics.
  */
object CdcFixtures {

  val payload: StructType = StructType(Seq(
    StructField("id", LongType, nullable = true),
    StructField("name", StringType, nullable = true),
    StructField("note", StringType, nullable = true)))

  /** One change event: (op, version, before(id,name,note), after(id,name,note)). */
  type Ev = (String, Long, Option[(Option[Long], Option[String], Option[String])],
                           Option[(Option[Long], Option[String], Option[String])])

  def ins(v: Long, id: Long, name: String, note: Option[String] = None): Ev =
    ("INSERT", v, None, Some((Some(id), Some(name), note)))
  def upd(v: Long, id: Long, beforeName: String, afterName: String,
      beforeNote: Option[String] = None, afterNote: Option[String] = None): Ev =
    ("UPDATE", v, Some((Some(id), Some(beforeName), beforeNote)),
      Some((Some(id), Some(afterName), afterNote)))
  def del(v: Long, id: Long, name: String, note: Option[String] = None): Ev =
    ("DELETE", v, Some((Some(id), Some(name), note)), None)

  /** Build the typed change frame Cdc.applyMutable/applyVersioned consume. */
  def changes(spark: SparkSession, evs: Seq[Ev]): DataFrame = {
    import spark.implicits._
    val rows = evs.map { case (op, v, b, a) =>
      (op, v,
        b.map { case (i, n, t) => (i.map(Long.box).orNull, n.orNull, t.orNull) },
        a.map { case (i, n, t) => (i.map(Long.box).orNull, n.orNull, t.orNull) })
    }
    rows.toDF("op", Schemas.VersionCol, "b", "a")
      .select(col("op"), col(Schemas.VersionCol),
        when(col("b").isNotNull, struct(
          col("b._1").cast("long").as("id"), col("b._2").as("name"), col("b._3").as("note")))
          .as("before"),
        when(col("a").isNotNull, struct(
          col("a._1").cast("long").as("id"), col("a._2").as("name"), col("a._3").as("note")))
          .as("after"))
  }

  /** Mutable-table state frame: (id, name, note). */
  def state(spark: SparkSession, rows: Seq[(java.lang.Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (i, n, t) => (Option(i).map(_.toLong), Option(n), Option(t)) }
      .toDF("id", "name", "note")
      .select(col("id").cast("long"), col("name"), col("note"))
  }

  /** Versioned-history frame: (id, name, note, dateid). */
  def history(spark: SparkSession, rows: Seq[(Long, String, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.map { case (i, n, t, v) => (i, Option(n), Option(t), v) }
      .toDF("id", "name", "note", Schemas.VersionCol)
  }

  def collectMutable(df: DataFrame): Set[(Option[Long], Option[String], Option[String])] =
    df.collect().map { r =>
      (Option(r.get(r.fieldIndex("id"))).map(_.asInstanceOf[Long]),
        Option(r.getAs[String]("name")), Option(r.getAs[String]("note")))
    }.toSet

  def collectVersioned(df: DataFrame): Set[(Long, Option[String], Option[String], Long)] =
    df.collect().map { r =>
      (r.getAs[Long]("id"), Option(r.getAs[String]("name")),
        Option(r.getAs[String]("note")), r.getAs[Long](Schemas.VersionCol))
    }.toSet
}
