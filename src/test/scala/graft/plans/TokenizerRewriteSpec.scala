package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}
import graft.SparkTestBase

/** The optimizer rule is installed by GraftExtensions (the SparkTestBase
  * session config), so plain SQL / Column formulations of blank-guarded
  * regex tokenization should optimize into the kernels.
  */
class TokenizerRewriteSpec extends AnyFunSuite with SparkTestBase {

  private def guardedSql(inner: String) =
    s"CASE WHEN length(trim(text)) = 0 THEN array() " +
      s"ELSE split(trim(text), '\\\\s+') END$inner"

  // parquet-backed frame: a local Seq would be constant-folded into a
  // LocalRelation before the plan can show the rewritten expression
  private lazy val docs =
    graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "documents")

  test("guarded split rewrites to tokenize_ws in the optimized plan") {
    val df = docs.selectExpr(s"${guardedSql("")} AS toks")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("tokenize_ws"), optimized)
    assert(!optimized.contains("split("), optimized)
  }

  test("size(guarded split) rewrites to token_count_ws; counts unchanged") {
    val df = docs.selectExpr(s"size(${guardedSql("")}) AS n")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("token_count_ws"), optimized)
    val withRule = df.selectExpr("sum(n)").head.getLong(0)
    val key = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, TokenizerRewrite.ruleName)
      val withoutRule = docs.selectExpr(s"size(${guardedSql("")}) AS n")
        .selectExpr("sum(n)").head.getLong(0)
      assert(withRule == withoutRule)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("bare (unguarded) split is NOT rewritten — blank semantics differ") {
    val df = docs.selectExpr("split(trim(text), '\\\\s+') AS toks")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("tokenize_ws"), optimized)
  }

  test("rewritten results equal the unoptimized semantics") {
    import spark.implicits._
    val rows = Seq("the quick  brown fox", "", " ", "\tlead", "trail\t", "a  b")
    val df = rows.toDF("text")
    // Column-API formulation of the same guarded shape
    val guarded = when(length(trim($"text")) === 0,
      array().cast(ArrayType(StringType)))
      .otherwise(split(trim($"text"), "\\s+"))
    val viaRule = df.select(guarded.as("toks")).as[Seq[String]].collect().toSeq
    // reference: evaluate WITHOUT the session optimizer (literal eval)
    val expected = rows.map { s =>
      val t = { var a = 0; var b = s.length
        while (a < b && s.charAt(a) == ' ') a += 1
        while (b > a && s.charAt(b - 1) == ' ') b -= 1
        s.substring(a, b) }
      if (t.isEmpty) Seq.empty[String] else t.split("\\s+", -1).toSeq
    }
    assert(viaRule == expected)
  }
}
