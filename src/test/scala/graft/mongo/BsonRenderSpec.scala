package graft.mongo

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class BsonRenderSpec extends AnyFunSuite with SparkTestBase {

  test("objectid hex, datetime text, binary base64 (mongodb.rs:379-406)") {
    import spark.implicits._
    val df = Seq((
      Array[Byte](0x5f, 0x1a, 0x2b.toByte, 0xff.toByte),
      java.sql.Timestamp.valueOf("2025-08-18 05:16:08.490845"),
      "hello".getBytes("UTF-8")
    )).toDF("oid", "dt", "bin")
    val r = df.select(
      BsonRender.objectIdHex(col("oid")),
      BsonRender.datetimeText(col("dt")),
      BsonRender.binaryBase64(col("bin"))).head
    assert(r.getString(0) == "5f1a2bff")
    assert(r.getString(1) == "2025-08-18 05:16:08") // second precision
    assert(r.getString(2) == java.util.Base64.getEncoder.encodeToString("hello".getBytes))
  }

  test("epoch millis render: integer division, null -> epoch 0 (mongodb.rs:408-441)") {
    import spark.implicits._
    val df = Seq(Some(1755494168999L), Some(999L), None).toDF("ms")
    val got = df.select(BsonRender.epochMillisToTimestamp(col("ms")).cast("string"))
      .collect().map(_.getString(0)).toSeq
    assert(got(0) == "2025-08-18 05:16:08") // .999 truncated
    assert(got(1) == "1970-01-01 00:00:00")
    assert(got(2) == "1970-01-01 00:00:00") // missing -> 0
  }

  test("first-element array rule (mongodb.rs:443-492)") {
    import spark.implicits._
    val df = Seq(
      (1, Seq(("int", "1"), ("string", "x"), ("int", "3"))),   // int first
      (2, Seq(("double", "1.5"), ("int", "2"))),               // double first
      (3, Seq(("string", "a"), ("int", "9"))),                 // string first
      (4, Seq(("doc", "{}"), ("int", "1"))),                   // other -> []
      (5, Seq.empty[(String, String)])                         // empty -> []
    ).toDF("id", "raw")
      .withColumn("arr", expr("transform(raw, e -> named_struct('kind', e._1, 'text', e._2))"))
    val got = df.select(col("id"), BsonRender.firstElementTypedArray(col("arr")))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1).toList).toMap
    assert(got(1) == List("1", "0", "3")) // non-int renders default 0
    assert(got(2) == List("1.5", "2.0"))
    assert(got(3) == List("a", "9"))
    assert(got(4) == Nil)
    assert(got(5) == Nil)
  }
}
