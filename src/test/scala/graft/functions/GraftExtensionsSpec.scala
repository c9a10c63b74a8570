package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The shared session is built with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (SparkTestBase)
  * — the production config-time wiring — so these specs prove the SQL
  * surface end-to-end WITHOUT the runtime `GraftFunctions.register` call
  * that HashExprsSpec exercises. */
class GraftExtensionsSpec extends AnyFunSuite with SparkTestBase {

  test("SQL fingerprint64/simhash_text equal the Column API expressions") {
    import spark.implicits._
    Seq((1L, "hello world"), (2L, ""), (3L, "αβγ unicode"))
      .toDF("id", "text").createOrReplaceTempView("ext_docs")

    val viaSql = spark.sql(
      """SELECT id, fingerprint64(text) AS fp, simhash_text(text) AS sh
        |FROM ext_docs""".stripMargin)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val viaCols = spark.table("ext_docs")
      .select(col("id"), GraftFunctions.fingerprint64(col("text")),
        GraftFunctions.simhashText(col("text")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(viaSql == viaCols)
  }

  test("SQL minhash_text produces the k-lane signature; literal-arg discipline") {
    val sig = spark.sql(
      "SELECT minhash_text('some document text', 5, 64) AS sig")
      .collect().head.getSeq[Long](0)
    assert(sig.length == 64)

    // non-literal k must be rejected at analysis, not silently misread
    val err = intercept[Exception] {
      spark.sql("SELECT minhash_text('x', 5 + 0, 64) AS sig").collect()
    }
    def mentionsLiteral(t: Throwable): Boolean =
      t != null && (t.getMessage.contains("int literal")
        || mentionsLiteral(t.getCause))
    assert(mentionsLiteral(err), s"unexpected error: ${err.getMessage}")
  }

  test("SQL functions stay codegen'd: no UDF node in the plan") {
    // parquet-backed (a local relation would fold to LocalTableScan and
    // evaluate interpreted, hiding the codegen path under test)
    graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "documents")
      .createOrReplaceTempView("ext_docs_pq")
    val plan = spark.sql("SELECT fingerprint64(text) FROM ext_docs_pq")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"UDF node found:\n$plan")
    // the starred prefix marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [fingerprint64"), s"not codegen'd:\n$plan")
  }
}
