package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.decode.CopyText
import graft.ops.CoreOps
import graft.types.CHColumn

/** Live-Postgres snapshot path (S1 → D6/D7 → P1/P2/P14): turn a chunked
  * `COPY ... TO STDOUT` byte stream into a typed, aligned DataFrame in
  * one call — the composition a JDBC-less live source uses (the
  * reference streams COPY chunks through its parser into batched
  * INSERTs; here the parse happens once and Catalyst takes over).
  *
  * The chunk iterator is consumed on the driver (a COPY stream is one
  * connection — inherently serial, exactly like the reference's dedicated
  * COPY connection: `src/adapter/postgres.rs:832-910`); rows parallelize
  * from there, and the cast/mask projection is the same codegen'd
  * pipeline the parquet path uses.
  */
object CopySource {

  /** Parse chunks → rows of raw text fields (null = `\N`). */
  def parseChunks(chunks: Iterator[Array[Byte]]): Vector[Vector[Option[String]]] = {
    val parser = new CopyText.Parser
    (chunks.flatMap(parser.feed) ++ parser.finish()).toVector
  }

  /** Full snapshot: chunks + target schema → typed DataFrame with
    * alignment, masking and the permissive cast semantics (P5-P14). */
  def snapshot(
      spark: SparkSession,
      chunks: Iterator[Array[Byte]],
      target: Seq[CHColumn],
      maskColumns: Set[String] = Set.empty,
      parallelism: Int = 0): DataFrame = {
    val names = target.map(_.name)
    val textSchema = StructType(names.map(StructField(_, StringType, nullable = true)))
    val rows = parseChunks(chunks).map { fields =>
      // source column count must match the COPY column list = target order
      Row.fromSeq(names.indices.map(i => fields.lift(i).flatten.orNull))
    }
    val slices = if (parallelism > 0) parallelism
      else spark.sparkContext.defaultParallelism
    val textDf = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, slices)), textSchema)
    textDf.select(target.map { c =>
      val base =
        if (maskColumns.contains(c.name))
          org.apache.spark.sql.functions.lit(null).cast(StringType)
        else col(c.name)
      CoreOps.castTextToTarget(base, c.chType).as(c.name)
    }: _*)
  }
}
