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

/** Dedup state per fingerprint group: ONLY the 64-bit content hashes of
  * the texts seen so far — never the texts. State size is 8 bytes per
  * distinct document ever seen in the group (groups are fingerprint
  * buckets, so normally 1), bounded regardless of document length. */
case class SeenHashes(hashes: List[Long])

/** Stateful streaming operators (`KeyValueGroupedDataset` + GroupState —
  * SURVEY.md sec 2.6 maps the reference's only cross-batch state to
  * checkpoint offsets; these add the keyed-state layer a training-data
  * pipeline needs on top).
  */
object StatefulOps {

  /** Event-time boundary normalization: `withWatermark` and event-time
    * windows require `TimestampType`; a `TIMESTAMP_NTZ` column (what
    * Spark 4 infers from parquet `timestamp[us]` without UTC adjustment)
    * hard-fails with EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE. Rather than
    * pushing that trap onto every caller, cast NTZ to session-TZ
    * timestamp at the operator boundary — with the project-wide UTC
    * session TZ the cast re-labels the same instant exactly. */
  private def asEventTime(df: DataFrame, tsCol: String): DataFrame =
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        graft.sources.Tables.requireUtcSession(
          df.sparkSession, s"StatefulOps event-time column '$tsCol'")
        df.withColumn(tsCol, col(tsCol).cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

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
          // upserts are I/U ONLY — a truncate marker ('T') must clear the
          // key like a delete, never apply its empty payload as state
          // (note: keyed grouping only clears keys the 'T' row reaches; a
          // table-wide truncate must be fanned out upstream)
          val ups = batch.filter(e => e.op == "I" || e.op == "U").sortBy(_.seq)
          val hasDelete = batch.exists(e => e.op == "D" || e.op == "T")
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

  /** Second hash of the text, ALGORITHMICALLY independent of the caller's
    * fingerprint: xxHash64 (seed 42, = Spark's `xxhash64`), while the group
    * key is the base-31 polynomial fingerprint64. A salted fingerprint64
    * is NOT independent — fingerprint64(salt+T) is a pure function of
    * (len(T), fingerprint64(T)) mod 1e9+7, so same-length texts colliding
    * on the group key were GUARANTEED to collide on the salted hash too,
    * silently dropping a distinct document. With a genuinely different
    * hash family a within-group false drop needs a simultaneous
    * fingerprint64 + xxHash64 collision. */
  private[streaming] def contentHash(text: String): Long =
    graft.functions.GraftHash.xxh64(
      org.apache.spark.unsafe.types.UTF8String.fromString(text))

  /** One group's dedup step, pure and unit-testable: returns (hashes to
    * add to state, docs to emit). State sees ONLY content hashes. */
  private[streaming] def mergeSeen(
      seen: Set[Long], incoming: Seq[SeenDoc]): (List[Long], List[SeenDoc]) = {
    val seenNow = scala.collection.mutable.Set.empty[Long] ++ seen
    val freshHashes = scala.collection.mutable.ListBuffer.empty[Long]
    val fresh = scala.collection.mutable.ListBuffer.empty[SeenDoc]
    incoming.sortBy(_.doc_id).foreach { d =>
      val h = contentHash(d.text)
      if (!seenNow.contains(h)) {
        seenNow += h
        freshHashes += h
        fresh += d
      }
    }
    (freshHashes.toList, fresh.toList)
  }

  /** Streaming exact-dedup with keyed fingerprint state
    * (flatMapGroupsWithState): a document is emitted only the first time
    * its (fingerprint, content hash) is seen across the whole stream;
    * later arrivals drop. State per group is the list of 64-bit content
    * hashes — O(8 bytes × distinct docs), NEVER the document texts, so
    * state growth is independent of corpus byte size. Distinct texts in
    * one fingerprint group are both kept unless they ALSO collide under
    * xxHash64 — an independent hash family, so the joint collision is
    * vanishingly rare (unlike a salted fingerprint64, which same-length
    * group-key colliders hit deterministically). */
  def dedupStream(docs: Dataset[SeenDoc]): Dataset[SeenDoc] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.fp)
      .flatMapGroupsWithState[SeenHashes, SeenDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_: Long, incoming: Iterator[SeenDoc], state: GroupState[SeenHashes]) =>
          val seen = state.getOption.map(_.hashes).getOrElse(Nil)
          val (freshHashes, fresh) = mergeSeen(seen.toSet, incoming.toSeq)
          if (freshHashes.nonEmpty) state.update(SeenHashes(seen ++ freshHashes))
          fresh.iterator
      }
  }

  /** Streaming sessionization: Spark's native `session_window` over an
    * unbounded event stream — sessions merge on overlap as events arrive
    * and FINALIZE (append-mode emit) once the watermark passes the
    * session's gap-extended end. Same output columns as the batch
    * `sessionize` declared query, so batch/stream parity is directly
    * testable: run both over the same events and the closed sessions must
    * agree exactly.
    *
    * Scale: state per in-flight session is one (key, window, aggregates)
    * row in the state store, merged by the engine; the watermark bounds
    * retention — state holds only sessions still open within the lateness
    * horizon, independent of stream length. */
  def sessionizeStream(
      events: DataFrame, tsCol: String, keyCol: String, valueCol: String,
      gap: String, watermark: String): DataFrame =
    asEventTime(events, tsCol)
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,6)")).cast("double").as("session_value"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("n_events"), col("session_value"))

  /** Stream-stream interval join: each left event pairs with every right
    * event of the same key whose timestamp falls in
    * `[left.ts − lookback, left.ts]` — the enrichment join (clicks × the
    * purchases that preceded them) as a genuine two-stream join, not a
    * static lookup. LEFT OUTER: a left event with no right match within
    * the interval emits once with nulls after the watermark proves no
    * match can still arrive.
    *
    * Scale: both sides carry watermarks and the time bound is two-sided,
    * so the engine evicts right-side state older than `lookback` plus the
    * lateness horizon and left-side state once matched-or-expired — state
    * is bounded by (rate × window), not stream length. One shuffle per
    * side on the key.
    *
    * Output columns: leftCols* (prefixed `l_`), rightCols* (prefixed
    * `r_`, null for unmatched). */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String,
      lookback: String, watermark: String): DataFrame = {
    val ln = asEventTime(left, tsCol)
    val rn = asEventTime(right, tsCol)
    val l = ln.columns.foldLeft(ln) { (d, c) => d.withColumnRenamed(c, s"l_$c") }
      .withWatermark(s"l_$tsCol", watermark)
    val r = rn.columns.foldLeft(rn) { (d, c) => d.withColumnRenamed(c, s"r_$c") }
      .withWatermark(s"r_$tsCol", watermark)
    l.join(r,
      col(s"l_$keyCol") === col(s"r_$keyCol") &&
        col(s"r_$tsCol") >= col(s"l_$tsCol") - expr(s"INTERVAL $lookback") &&
        col(s"r_$tsCol") <= col(s"l_$tsCol"),
      "leftOuter")
  }

  /** Event-time windowed counts with a watermark: late events beyond the
    * watermark are dropped, windows finalize once the watermark passes.
    * (The CDC path needs no watermark — WAL order forbids lateness — but
    * pipeline analytics over event streams do.) */
  def windowedCounts(
      events: DataFrame, tsCol: String, watermark: String, windowLen: String): DataFrame =
    asEventTime(events, tsCol)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))
}
