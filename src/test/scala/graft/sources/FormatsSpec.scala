package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class FormatsSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-formats").toString

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("documents round-trips losslessly through every format") {
    val docs = Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val want = rowsOf(docs)
    val dir = tmp()
    Formats.Supported.foreach { f =>
      val got = rowsOf(Formats.roundTrip(docs, f, dir))
      assert(got == want, s"format $f lost rows")
    }
  }

  test("lineitem (timestamps, doubles) round-trips losslessly") {
    val li = Tables.read(spark, "/root/testdata/sf0.001", "lineitem")
    val want = rowsOf(li)
    val dir = tmp()
    Formats.Supported.foreach { f =>
      val got = rowsOf(Formats.roundTrip(li, f, dir))
      assert(got == want, s"format $f lost rows")
    }
  }

  test("adversarial text survives CSV and JSON: quotes, commas, newlines, nulls") {
    import spark.implicits._
    val nasty = Seq(
      (1L, "plain"),
      (2L, "comma, inside"),
      (3L, "quote \" inside"),
      (4L, "newline\ninside"),
      (5L, "crlf\r\ninside"),
      (6L, ""),
      (7L, null),
      (8L, "tab\tinside"),
      (9L, "both \"quotes\", commas,\nand a newline"),
      (10L, "unicode 日本語 ü ö"))
      .toDF("id", "text")
    val want = rowsOf(nasty)
    val dir = tmp()
    Seq("csv", "json").foreach { f =>
      val got = rowsOf(Formats.roundTrip(nasty, f, dir))
      assert(got == want, s"format $f mangled text")
    }
    // null and empty string must remain DISTINCT
    val back = Formats.roundTrip(nasty, "csv", dir)
    assert(back.filter(col("text").isNull).select("id").as[Long].collect().toSeq == Seq(7L))
    assert(back.filter(col("text") === "").select("id").as[Long].collect().toSeq == Seq(6L))
  }

  test("binary columns round-trip as base64 through CSV and JSON") {
    import spark.implicits._
    val rows = Seq(
      (1L, Array[Byte](0, 1, 2, -1, -128, 127)),
      (2L, "RIFF....WAVE".getBytes("UTF-8")),
      (3L, Array.empty[Byte]),
      (4L, null.asInstanceOf[Array[Byte]]))
    val df = rows.toDF("id", "payload")
    val dir = tmp()
    Formats.Supported.foreach { f =>
      val back = Formats.roundTrip(df, f, dir)
        .collect().map(r => r.getLong(0) ->
          Option(r.getAs[Array[Byte]]("payload")).map(_.toSeq)).toMap
      rows.foreach { case (id, bytes) =>
        assert(back(id) == Option(bytes).map(_.toSeq), s"format $f id $id")
      }
      // the round-tripped schema is BinaryType again, not string
      assert(Formats.roundTrip(df, f, dir).schema("payload").dataType ==
        org.apache.spark.sql.types.BinaryType, s"format $f")
    }
  }

  test("events timestamps keep microsecond precision through text formats") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001").limit(200)
    val want = rowsOf(ev)
    val dir = tmp()
    Seq("csv", "json", "orc").foreach { f =>
      assert(rowsOf(Formats.roundTrip(ev, f, dir)) == want, s"format $f")
    }
  }

  test("TIMESTAMP_NTZ columns round-trip losslessly through every format") {
    // NTZ as a first-class column type (Spark 4 infers it from parquet
    // timestamp[us] without UTC adjustment): micro precision and the NTZ
    // type itself must survive — no silent widening to zoned timestamp
    val ntz = Tables.events(spark, "/root/testdata/sf0.001").limit(200)
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    assert(ntz.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val want = rowsOf(ntz)
    val dir = tmp()
    Formats.Supported.foreach { f =>
      val back = Formats.roundTrip(ntz, f, dir)
      assert(back.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampNTZType, s"format $f kept NTZ")
      assert(rowsOf(back) == want, s"format $f lost rows")
    }
  }
}
