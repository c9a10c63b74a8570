package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.pipe.ParquetStateSink

/** The Structured-Streaming CDC path must produce the identical final
  * state as the batch pipe applying the same changelog (SURVEY.md sec 2.6:
  * the micro-batch engine is our S2 poll loop with checkpointed offsets).
  */
class StreamingCdcSpec extends AnyFunSuite with SparkTestBase {

  case class Change(op: String, seq: Long, user_id: Long, v: Double)

  test("streaming foreachBatch converges to the batch-apply state; restart resumes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val tmp = Files.createTempDirectory("graft-stream").toString
    val sink = new ParquetStateSink(s"$tmp/state", Seq("user_id"), Seq("v"))(spark)

    val input = MemoryStream[Change]
    val q = StreamingCdc.writer(input.toDF(), sink, s"$tmp/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())

    // batch 1: inserts + an intra-batch delete (delete wins regardless of order)
    input.addData(
      Change("I", 1, 1, 1.0), Change("I", 2, 2, 2.0),
      Change("D", 3, 1, 0.0), Change("I", 4, 1, 9.0)) // delete wins in-batch
    val run1 = q.start(); run1.awaitTermination()

    val s1 = sink.read().select("user_id", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s1 == Map(2L -> 2.0)) // user 1 deleted despite later in-batch insert

    // batch 2 (new trigger run, same checkpoint): resurrection across batches
    input.addData(Change("I", 5, 1, 7.0), Change("U", 6, 2, 3.0))
    val run2 = StreamingCdc.writer(input.toDF(), sink, s"$tmp/ckpt").start()
    run2.awaitTermination()

    val s2 = sink.read().select("user_id", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s2 == Map(1L -> 7.0, 2L -> 3.0))
  }
}
