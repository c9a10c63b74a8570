package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A changelog row for the keyed-state streaming path. */
case class ChangeEvent(op: String, seq: Long, user_id: Long,
    last_ts: java.sql.Timestamp, total_value: Double, n_events: Long)

/** Keyed user state maintained by the streaming engine. */
case class UserState(user_id: Long, last_ts: java.sql.Timestamp,
    total_value: Double, n_events: Long)

/** Seen-fingerprint state for streaming dedup. */
case class SeenDoc(doc_id: Long, fp: Long, text: String)

/** Stateful streaming operators (`KeyValueGroupedDataset` + GroupState —
  * SURVEY.md sec 2.6 maps the reference's only cross-batch state to
  * checkpoint offsets; these add the keyed-state layer a training-data
  * pipeline needs on top).
  */
object StatefulOps {

  /** CDC state maintained IN the streaming engine (mapGroupsWithState)
    * instead of collapse-at-read: per key and micro-batch, upserts apply
    * in seq order and a delete wins over the batch's upserts regardless of
    * interleaving (the reference's deletes-after-upserts rule); a later
    * batch's upsert resurrects the key. Emits the post-batch state per
    * touched key (deleted keys emit a tombstone with n_events = -1). */
  def userStateStream(changes: Dataset[ChangeEvent]): Dataset[UserState] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserState](GroupStateTimeout.NoTimeout) {
        (key: Long, events: Iterator[ChangeEvent], state: GroupState[UserState]) =>
          val batch = events.toSeq
          val ups = batch.filter(_.op != "D").sortBy(_.seq)
          val hasDelete = batch.exists(_.op == "D")
          val afterUps = ups.lastOption match {
            case Some(last) => Some(UserState(key, last.last_ts, last.total_value, last.n_events))
            case None => state.getOption
          }
          if (hasDelete) {
            state.remove()
            UserState(key, null, 0.0, -1L) // tombstone marker
          } else {
            afterUps.foreach(state.update)
            afterUps.getOrElse(UserState(key, null, 0.0, -1L))
          }
      }
  }

  /** Streaming exact-dedup with keyed fingerprint state
    * (flatMapGroupsWithState): a document is emitted only the first time
    * its fingerprint+text is seen across the whole stream; later arrivals
    * drop. State per group is the first-seen doc (bounded: one row per
    * distinct text). */
  def dedupStream(docs: Dataset[SeenDoc]): Dataset[SeenDoc] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.fp)
      .flatMapGroupsWithState[List[SeenDoc], SeenDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_: Long, incoming: Iterator[SeenDoc], state: GroupState[List[SeenDoc]]) =>
          val seen = state.getOption.getOrElse(Nil)
          val seenTexts = scala.collection.mutable.Set(seen.map(_.text): _*)
          val fresh = scala.collection.mutable.ListBuffer.empty[SeenDoc]
          incoming.toSeq.sortBy(_.doc_id).foreach { d =>
            if (!seenTexts.contains(d.text)) { // fp collision-safe
              seenTexts += d.text
              fresh += d
            }
          }
          if (fresh.nonEmpty) state.update(seen ++ fresh)
          fresh.iterator
      }
  }

  /** Event-time windowed counts with a watermark: late events beyond the
    * watermark are dropped, windows finalize once the watermark passes.
    * (The CDC path needs no watermark — WAL order forbids lateness — but
    * pipeline analytics over event streams do.) */
  def windowedCounts(
      events: DataFrame, tsCol: String, watermark: String, windowLen: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))
}
