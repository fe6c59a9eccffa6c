package graft.music

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Constraint audits replacing MySQL's enforced DDL constraints
  * (SURVEY.md §2.1 rows C1–C3). Spark enforces nothing on read; these jobs
  * return the VIOLATING rows, so "constraint holds" ⇔ returned frame is
  * empty. Every audit is a distributed plan — no collect-to-driver — so the
  * same audits run unchanged over 100 TB: C1 is a scan with a pushed-down
  * null filter, C2 a partial+final hash aggregate, C3 a (broadcastable)
  * left-anti join on the FK key.
  */
object Constraints {

  import MusicSchema.TableDef

  /** C1 — NOT NULL: rows with a null in any non-nullable column. */
  def notNullViolations(df: DataFrame, t: TableDef): DataFrame = {
    val required = t.schema.fields.filterNot(_.nullable).map(_.name)
    if (required.isEmpty) df.limit(0)
    else df.filter(required.map(col(_).isNull).reduce(_ || _))
  }

  /** C2 — PK/UNIQUE: duplicated key tuples (incl. composite keys,
    * music_db.sql:40, 70, 85, 102). Returns (keyCols…, dup_count) per
    * violated key value.
    */
  def keyViolations(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)

  /** C3 — FOREIGN KEY: child rows whose FK value has no parent. Null FK
    * values are skipped (nullable FK `Song.album_id`, music_db.sql:67,73 —
    * singles are not orphans by design, pdf p.4; SURVEY.md §7.4).
    */
  def orphanViolations(
      child: DataFrame, childCols: Seq[String],
      parent: DataFrame, parentCols: Seq[String]): DataFrame = {
    val nonNull = child.filter(childCols.map(col(_).isNotNull).reduce(_ && _))
    val cond = childCols.zip(parentCols)
      .map { case (c, p) => nonNull(c) === parent(p) }
      .reduce(_ && _)
    nonNull.join(parent, cond, "left_anti")
  }

  /** Run every declared audit for the given loaded tables.
    * Returns (auditName → violations DataFrame); all must be empty.
    */
  def auditAll(tables: Map[String, DataFrame]): Map[String, DataFrame] = {
    val audits = MusicSchema.all.flatMap { t =>
      val df = tables(t.name)
      val c1 = Seq(s"${t.name}.not_null" -> notNullViolations(df, t))
      val c2 = t.unique.map(k =>
        s"${t.name}.unique(${k.mkString(",")})" -> keyViolations(df, k))
      val c3 = t.fks.map { case (cc, (pName, pc)) =>
        s"${t.name}.fk(${cc.mkString(",")}→$pName)" ->
          orphanViolations(df, cc, tables(pName), pc)
      }
      c1 ++ c2 ++ c3
    }
    audits.toMap
  }

  /** Convenience: audit the seed (or any registered load) and return the
    * names of violated constraints.
    */
  def violatedConstraints(tables: Map[String, DataFrame]): Seq[String] =
    auditAll(tables).collect {
      case (name, df) if !df.isEmpty => name
    }.toSeq.sorted
}
