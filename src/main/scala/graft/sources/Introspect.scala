package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.types.{CHColumn, CHType}

/** Catalog introspection (SURVEY.md sec 2.1 S5): derive the target schema
  * + PK list for a source table, the Spark analogue of the reference's
  * `information_schema.columns` + `table_constraints` reads (reference:
  * `src/adapter/postgres.rs:696-758`).
  *
  * For parquet/catalog sources the schema comes from the footer/catalog
  * (no scan); PKs are not expressible in parquet so they come from the
  * conventional natural-key registry below (the same role the reference's
  * PK query plays). Column indexes are renumbered sequentially 1-based
  * exactly like the reference (`postgres.rs:748-755`).
  */
object Introspect {

  /** Natural keys of the driver testdata tables (FIXTURES.md sec A). */
  val NaturalKeys: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey"),
    "nation" -> Seq("n_nationkey"),
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey"),
    "lineitem" -> Seq("l_orderkey", "l_linenumber"),
    "events" -> Seq("event_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  /** Schema of one table: (1-based column index, column). */
  def columns(df: DataFrame, pkCols: Set[String]): Seq[(Int, CHColumn)] =
    df.schema.fields.zipWithIndex.map { case (f, i) =>
      val pk = pkCols.contains(f.name)
      // PK columns are non-nullable in the target, like the reference's
      // ReplacingMergeTree ORDER BY columns.
      (i + 1, CHColumn(f.name, CHType.fromSparkType(f.dataType, f.nullable && !pk),
        isPrimaryKey = pk))
    }.toIndexedSeq

  /** Introspect a testdata table by name. */
  def table(spark: SparkSession, sfDir: String, name: String): Seq[(Int, CHColumn)] = {
    val df = if (name == "events") Tables.events(spark, sfDir)
             else Tables.read(spark, sfDir, name)
    columns(df, NaturalKeys.getOrElse(name, Seq.empty).toSet)
  }

  /** Row-count estimate (S6) — exact count here; the reference reads
    * `pg_class.reltuples` and uses it only for progress logging. */
  def rowEstimate(df: DataFrame): Long = df.count()
}
