package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extension (beyond reference parity — SURVEY §2.11:
  * the reference is strictly batch; this is the streaming surface a
  * Spark-native engine adds for the `events` table shape).
  *
  * Two canonical flows:
  *  - watermarked tumbling-window aggregation (counts/sums per event_type)
  *  - stateful sessionization via GroupState (gap-timeout sessions), the
  *    streaming twin of the batch w3_sessionize query so both sides of the
  *    lambda-free architecture agree on session semantics.
  *
  * Both run on any streaming source; tests drive them with MemoryStream.
  */
object EventStream {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
                         user_id: Long, event_type: String, value: Double)

  /** Tumbling-window aggregate with a 10-minute watermark: the standard
    * late-data-tolerant rollup. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("value_sum"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("value_sum"))

  /** Streaming exact dedup — the training-data pipeline's dedup-at-ingest
    * twin of Dedup.exact: duplicates of a fingerprint are dropped as they
    * arrive, with the watermark bounding how long each fingerprint's state
    * lives (dropDuplicatesWithinWatermark — without the bound, state grows
    * with the number of distinct documents forever). Scale note: state is
    * hash-partitioned by fingerprint, so the dedup shuffles once on the
    * same key the batch groupBy uses. */
  def dedupStream(docs: DataFrame, textCol: String,
                  watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp", graft.operators.TextAnalysis.fingerprint(col(textCol)))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")

  final case class CandidatePair(doc_a: Long, doc_b: Long)

  /** Streaming MinHash-LSH near-dup candidates — the near-dup twin of
    * [[dedupStream]] for dedup-at-ingest. The signature is ONE codegen'd
    * scalar per row ([[graft.functions.TextHash.minhash]]), so the stream
    * never shuffles raw text: rows are banded in a projection and the only
    * shuffle is the state partitioning on the LSH bucket key. Each bucket
    * remembers the FIRST document that claimed it; later arrivals emit
    * (first, later) candidate pairs for downstream exact-Jaccard
    * verification — the batch LSH contract (bulky work only for bucket
    * survivors) carried to streaming. Pairs among non-first bucket members
    * are not emitted; the verifier's cluster step completes components,
    * exactly as in the batch pipeline. Bucket state expires one hour past
    * the bucket's newest event via event-time timeout, so state is bounded
    * by the distinct buckets inside the watermark+horizon window, not by
    * stream lifetime. */
  def nearDupCandidates(docs: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, numHashes: Int = 8, rowsPerBand: Int = 2,
                        watermark: String = "10 minutes"): Dataset[CandidatePair] = {
    import docs.sparkSession.implicits._
    val nBands = numHashes / rowsPerBand
    val sig = docs
      .withWatermark("ts", watermark)
      .select(col(idCol).as("doc_id"), col("ts"),
        graft.functions.TextHash.minhash(col(textCol), n, numHashes).as("mh"))
      .filter(col("mh").isNotNull)
    val bandKeys = (0 until nBands).map { b =>
      val slice = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(j => col("mh").getItem(j))
      md5(concat_ws("|", lit(b) +: slice: _*))
    }
    sig
      .select(col("doc_id"), col("ts"), explode(array(bandKeys: _*)).as("band_key"))
      .as[(Long, java.sql.Timestamp, String)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[Long, CandidatePair](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        case (_, rows, state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val rs = rows.toSeq
            val ids = rs.map(_._1).distinct.sorted
            val first = state.getOption.getOrElse(ids.head)
            state.update(first)
            state.setTimeoutTimestamp(rs.map(_._2.getTime).max, "1 hour")
            ids.filterNot(_ == first)
              .map(d => CandidatePair(math.min(first, d), math.max(first, d)))
              .iterator
          }
      }
      // a pair colliding in several bands repeats; buckets are independent
      // state partitions, so the dedup is the consumer's (batch verify
      // dropDuplicates) — documented contract, matching the batch
      // candidate generator's pre-distinct shape
  }

  final case class SessionState(start: Long, lastTs: Long, nEvents: Int)
  final case class SessionOut(user_id: Long, session_start: Long,
                              session_end: Long, n_events: Int)

  /** Gap-based sessionization with flatMapGroupsWithState: a session
    * closes when a later event arrives more than `gapMinutes` after its
    * last event (the batch twin is w3_sessionize, so both agree on session
    * semantics). EVERY session closed within a micro-batch is emitted — a
    * batch spanning three sessions emits two closed ones (mapGroups' one-
    * row-per-group contract would silently drop all but the last).
    * Production deployments add EventTimeTimeout + watermark to also close
    * sessions on silence; kept timeout-free here so the semantics stay
    * purely event-driven and deterministic. */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (userId, rows, state: GroupState[SessionState]) =>
          val gapMs = gapMinutes * 60 * 1000L
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          // fold the batch into the running state; emit every closed session
          var cur = state.getOption
          val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.lastTs <= gapMs =>
                cur = Some(s.copy(lastTs = t, nEvents = s.nEvents + 1))
              case Some(s) =>
                closed += SessionOut(userId, s.start, s.lastTs, s.nEvents)
                cur = Some(SessionState(t, t, 1))
              case None =>
                cur = Some(SessionState(t, t, 1))
            }
          }
          cur.foreach(state.update)
          closed.iterator
      }
  }

  /** One tagged as-of input row: side 0 = right (score/view row carrying
    * `value`), side 1 = left (click to enrich; `value` ignored). ts in
    * the events table's epoch-nano longs. */
  final case class AsofEvent(user_id: Long, ts: Long, side: Int,
                             event_id: Long, value: Double)
  final case class AsofRight(ts: Long, event_id: Long, value: Double)
  final case class AsofOut(user_id: Long, ts: Long, event_id: Long,
                           view_ts: Option[Long], view_event_id: Option[Long],
                           view_value: Option[Double])

  /** Streaming backward as-of — the event-time twin of
    * [[graft.operators.TimeJoins.asofBackward]]: enrich each left event
    * with the latest right row at-or-before its timestamp on the same
    * key. State per key is ONE right payload (the latest by the batch
    * operator's exact tie order: ts, then event_id, then value), so
    * state size is keys x one row, not history.
    *
    * Parity contract (the stream==batch spec): identical output to the
    * batch operator as long as event time does not regress ACROSS
    * micro-batches; rows may arrive in any order WITHIN a batch (each
    * batch is sorted before folding, and a stale right row never
    * overwrites newer state). A right row late by more than one batch
    * cannot retro-correct already-emitted left rows — the standard
    * append-mode relaxation; production callers bound it with a
    * watermark upstream exactly like [[dedupStream]].
    *
    * State eviction: one payload per key still accumulates one entry per
    * DISTINCT key forever — unbounded over an unbounded key domain
    * (session ids, request ids). `idleTtl` bounds it: a key with no
    * traffic for that long drops its payload (processing-time timeout,
    * the [[org.apache.spark.sql.streaming.GroupState]] TTL mechanism),
    * and a later left on that key reads null — exactly what the batch
    * operator answers when its right history is likewise age-trimmed.
    * Pick idleTtl >= the upstream watermark delay so eviction never
    * races legitimately-late rows. */
  def asofStream(tagged: Dataset[AsofEvent],
                 idleTtl: Option[java.time.Duration] = None): Dataset[AsofOut] = {
    import tagged.sparkSession.implicits._
    val timeoutConf =
      if (idleTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    tagged
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofRight, AsofOut](
        OutputMode.Append(), timeoutConf) {
        case (_, _, state: GroupState[AsofRight]) if state.hasTimedOut =>
          state.remove()
          Iterator.empty
        case (userId, rows, state: GroupState[AsofRight]) =>
          def newer(c: AsofRight, e: AsofEvent): Boolean =
            c.ts < e.ts || (c.ts == e.ts && (c.event_id < e.event_id ||
              (c.event_id == e.event_id && c.value < e.value)))
          var cur = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[AsofOut]
          // the batch window's exact order: ts, then side (right before
          // left at equal ts), then the right payload tie order
          rows.toSeq.sortBy(e => (e.ts, e.side, e.event_id, e.value))
            .foreach { e =>
              if (e.side == 0) {
                if (cur.forall(newer(_, e)))
                  cur = Some(AsofRight(e.ts, e.event_id, e.value))
              } else out += AsofOut(userId, e.ts, e.event_id,
                cur.map(_.ts), cur.map(_.event_id), cur.map(_.value))
            }
          cur.foreach(state.update)
          idleTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
          out.iterator
      }
  }

  /** Pending-left buffer of [[asofForwardStream]]: lefts that have not
    * yet seen a right row at-or-after their timestamp. */
  final case class AsofPendingLefts(lefts: Seq[AsofEvent])

  /** Streaming forward as-of — the event-time twin of
    * [[graft.operators.TimeJoins.asofForward]] (time-to-next-event:
    * enrich each left with the EARLIEST right at-or-after it). The
    * forward direction inverts the state problem: a left's match may not
    * have arrived yet, so state per key is the BUFFER of pending lefts,
    * and every right arrival resolves the whole buffer at once (all
    * pending lefts have ts <= the right's ts under monotone event time)
    * — state is bounded by the lefts between consecutive rights, never
    * by history.
    *
    * Tie rules are the batch operator's exactly: a right at the same
    * instant as a left matches it, and equal-timestamp rights resolve to
    * the greatest (event_id, value) payload. With `tolerance`, a pending
    * left whose gap to the arriving right exceeds it emits UNMATCHED
    * (null right columns) — the same row the batch operator emits.
    * Without tolerance a left with no future right ever stays pending
    * (a forward join cannot prove a non-match until input ends); bound
    * that with a tolerance, exactly as a production time-to-event query
    * must anyway — and bound the BUFFER with `idleTtl`: a key idle past
    * it resolves its pending lefts as unmatched and drops its state
    * (processing-time timeout, same mechanism as [[asofStream]]).
    *
    * Parity contract: identical to the batch operator when event time
    * does not regress across micro-batches and equal-timestamp rows
    * share a batch; arrival order within a batch is free. */
  def asofForwardStream(tagged: Dataset[AsofEvent],
                        tolerance: Option[Long] = None,
                        idleTtl: Option[java.time.Duration] = None): Dataset[AsofOut] = {
    import tagged.sparkSession.implicits._
    val timeoutConf =
      if (idleTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    tagged
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofPendingLefts, AsofOut](
        OutputMode.Append(), timeoutConf) {
        // idle-TTL: a key whose rights stopped arriving RESOLVES its
        // pending lefts as unmatched (the row the batch operator emits
        // when no right falls inside tolerance) instead of buffering
        // forever — best-effort by construction: a right arriving after
        // the timeout cannot retro-match, the same relaxation as every
        // late-data bound in this file
        case (userId, _, state: GroupState[AsofPendingLefts])
            if state.hasTimedOut =>
          val out = state.getOption.map(_.lefts).getOrElse(Nil).map(l =>
            AsofOut(userId, l.ts, l.event_id, None, None, None))
          state.remove()
          out.iterator
        case (userId, rows, state: GroupState[AsofPendingLefts]) =>
          val pending = scala.collection.mutable.ArrayBuffer.empty[AsofEvent]
          state.getOption.foreach(pending ++= _.lefts)
          val out = scala.collection.mutable.ArrayBuffer.empty[AsofOut]
          // event order, lefts BEFORE rights at equal ts (at-or-after
          // includes the same instant), equal-ts rights ascending so the
          // LAST — the greatest payload, the batch tie-winner — is the
          // one remembered when the group resolves
          val evs = rows.toSeq.sortBy(e => (e.ts, -e.side, e.event_id, e.value))
          var i = 0
          while (i < evs.length) {
            val e = evs(i)
            if (e.side == 1) { pending += e; i += 1 }
            else {
              // consume the whole equal-ts right group; winner = last
              var win = e
              while (i + 1 < evs.length && evs(i + 1).side == 0 &&
                evs(i + 1).ts == e.ts) { i += 1; win = evs(i) }
              pending.foreach { l =>
                val matches = tolerance.forall(t => win.ts - l.ts <= t)
                out += (if (matches)
                  AsofOut(userId, l.ts, l.event_id,
                    Some(win.ts), Some(win.event_id), Some(win.value))
                else AsofOut(userId, l.ts, l.event_id, None, None, None))
              }
              pending.clear()
              i += 1
            }
          }
          if (pending.isEmpty) state.remove()
          else {
            state.update(AsofPendingLefts(pending.toSeq))
            idleTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
          }
          out.iterator
      }
  }

  /** One resolved row of [[asofNearestStream]]: the closest right row in
    * either direction, `from` naming the winning side like the batch
    * operator's `asof_from`. */
  final case class AsofNearOut(user_id: Long, ts: Long, event_id: Long,
                               near_ts: Option[Long],
                               near_event_id: Option[Long],
                               near_value: Option[Double],
                               from: Option[String])

  /** [[asofNearestStream]] state: the latest right payload (the backward
    * candidate for future lefts) plus the lefts awaiting their forward
    * candidate. */
  final case class AsofNearState(latest: Option[AsofRight],
                                 pending: Seq[(AsofEvent, Option[AsofRight])])

  /** Streaming nearest as-of — the event-time twin of
    * [[graft.operators.TimeJoins.asofNearest]] (sensor/tick alignment:
    * the right row with the smallest |gap|, equal gaps to the
    * at-or-before side). COMPOSES the two machines above, exactly like
    * the batch operator composes its passes: the backward half is
    * [[asofStream]]'s one-payload-per-key state (each left snapshots the
    * latest right at-or-before on arrival), the forward half is
    * [[asofForwardStream]]'s pending buffer (the next right to arrive IS
    * the earliest at-or-after, so it resolves every pending left in one
    * step). A left whose backward gap is 0 resolves instantly — no
    * future right can beat it (ties go to "before").
    *
    * `tolerance` bounds the WINNING gap, after direction choice — the
    * batch rule: if the closer side is out of tolerance the row emits
    * unmatched even when the farther side would have qualified. Without
    * a right ever arriving after a left, that left stays pending (same
    * boundary as the forward twin). Parity contract as
    * [[asofForwardStream]]. */
  def asofNearestStream(tagged: Dataset[AsofEvent],
                        tolerance: Option[Long] = None,
                        idleTtl: Option[java.time.Duration] = None): Dataset[AsofNearOut] = {
    import tagged.sparkSession.implicits._
    val timeoutConf =
      if (idleTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    tagged
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofNearState, AsofNearOut](
        OutputMode.Append(), timeoutConf) {
        // idle-TTL: pending lefts resolve with their backward candidate
        // alone — exactly the row the batch operator emits when no right
        // ever follows — and the key's state drops; best-effort like
        // every late-data bound here
        case (userId, _, state: GroupState[AsofNearState])
            if state.hasTimedOut =>
          val st = state.getOption.getOrElse(AsofNearState(None, Nil))
          val out = st.pending.map { case (l, b) =>
            val ok = b.isDefined && tolerance.forall(t => l.ts - b.get.ts <= t)
            if (ok) AsofNearOut(userId, l.ts, l.event_id, b.map(_.ts),
              b.map(_.event_id), b.map(_.value), Some("before"))
            else AsofNearOut(userId, l.ts, l.event_id, None, None, None, None)
          }
          state.remove()
          out.iterator
        case (userId, rows, state: GroupState[AsofNearState]) =>
          def newer(c: AsofRight, e: AsofEvent): Boolean =
            c.ts < e.ts || (c.ts == e.ts && (c.event_id < e.event_id ||
              (c.event_id == e.event_id && c.value < e.value)))
          val st = state.getOption.getOrElse(AsofNearState(None, Nil))
          var latest = st.latest
          val pending =
            scala.collection.mutable.ArrayBuffer.empty[(AsofEvent, Option[AsofRight])]
          pending ++= st.pending
          val out = scala.collection.mutable.ArrayBuffer.empty[AsofNearOut]

          def emit(l: AsofEvent, b: Option[AsofRight],
                   f: Option[AsofRight]): Unit = {
            val gapB = b.map(r => l.ts - r.ts)
            val gapF = f.map(r => r.ts - l.ts)
            val pickB = b.isDefined && (f.isEmpty || gapB.get <= gapF.get)
            val (win, gap, side) =
              if (pickB) (b, gapB, "before") else (f, gapF, "after")
            val ok = win.isDefined && tolerance.forall(t => gap.get <= t)
            out += (if (ok)
              AsofNearOut(userId, l.ts, l.event_id, win.map(_.ts),
                win.map(_.event_id), win.map(_.value), Some(side))
            else AsofNearOut(userId, l.ts, l.event_id, None, None, None, None))
          }

          // rights BEFORE lefts at equal ts (backward includes the same
          // instant and gap 0 is unbeatable); an equal-ts right GROUP is
          // adjacent in this order and resolves the buffer as one unit
          // against its payload-greatest member — the batch tie-winner
          // in both directions
          val evs = rows.toSeq.sortBy(e => (e.ts, e.side, e.event_id, e.value))
          var i = 0
          while (i < evs.length) {
            val e = evs(i)
            if (e.side == 0) {
              var win = e
              while (i + 1 < evs.length && evs(i + 1).side == 0 &&
                evs(i + 1).ts == e.ts) { i += 1; win = evs(i) }
              val f = AsofRight(win.ts, win.event_id, win.value)
              pending.foreach { case (l, b) => emit(l, b, Some(f)) }
              pending.clear()
              if (latest.forall(newer(_, win))) latest = Some(f)
              i += 1
            } else {
              if (latest.exists(_.ts == e.ts)) // gap 0: ties go before
                emit(e, latest, None)
              else pending += ((e, latest))
              i += 1
            }
          }
          if (latest.isEmpty && pending.isEmpty) state.remove()
          else {
            state.update(AsofNearState(latest, pending.toSeq))
            idleTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
          }
          out.iterator
      }
  }

  /** Incremental dedup at ingest — the streaming twin of
    * [[graft.operators.Dedup.incrementalDedup]]: each micro-batch of
    * newly arrived documents screens against the STATIC curated history
    * inside foreachBatch (Spark's documented shape for multi-pass
    * per-batch logic no single streaming plan can express — the operator
    * runs an exact-fingerprint pass, two band joins and shingle
    * verification, with batch-only localCheckpoints). Verdicts depend
    * only on (document, history) — the screen is asymmetric by design,
    * nothing pairs batch docs with each other — so the union of
    * micro-batch outputs is EXACTLY the batch operator over the same
    * rows regardless of micro-batch boundaries (the parity spec's
    * contract). State never grows: history stays a static frame with
    * its own (cacheable) plan; the stream side is only ever one
    * micro-batch. */
  def screenStream(docs: DataFrame, history: DataFrame, idCol: String,
                   textCol: String, n: Int, numHashes: Int,
                   rowsPerBand: Int, threshold: Double)
                  (sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], _: Long) =>
        sink(graft.operators.Dedup.incrementalDedup(
          history, b.toDF(), idCol, textCol, n, numHashes, rowsPerBand,
          threshold))
      }
      .start()

  /** [[screenStream]] fed from a persisted
    * [[graft.operators.DedupLedger]] instead of recomputing history
    * fingerprints and band rows every micro-batch — the production
    * at-ingest shape: the ledger frames are static parquet scans (pure
    * functions of history text, so verdicts are identical to the
    * recompute form), `history` supplies text for band-collision
    * survivors only, and per-micro-batch cost tracks the micro-batch. */
  def screenStreamLedgered(docs: DataFrame, history: DataFrame,
                   ledgerFp: DataFrame, ledgerBands: DataFrame,
                   idCol: String, textCol: String, n: Int, numHashes: Int,
                   rowsPerBand: Int, threshold: Double)
                  (sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], _: Long) =>
        sink(graft.operators.Dedup.incrementalDedupLedgered(
          history, ledgerFp, ledgerBands, b.toDF(), idCol, textCol,
          n, numHashes, rowsPerBand, threshold))
      }
      .start()

  /** Boilerplate removal at ingest: apply a PERSISTED dictionary (built
    * batch-side by [[graft.operators.TextAnalysis.boilerplateDictionary]],
    * the same build/consume split as the dedup ledger) to each arriving
    * micro-batch — stateless given the dictionary, so stream == batch
    * doc-for-doc. */
  def boilerplateStream(docs: DataFrame, dict: DataFrame,
                        idCol: String, textCol: String)
                       (sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], _: Long) =>
        sink(graft.operators.TextAnalysis.applyBoilerplateDictionary(
          b.toDF(), idCol, textCol, dict))
      }
      .start()

  /** At-ingest BPE token accounting: the PERSISTED merge table (fit
    * batch-side by [[graft.operators.Bpe.train]], published via
    * [[graft.operators.Bpe.save]] — the same fit/apply split as the
    * dictionary and the dedup ledger) applied to each arriving
    * micro-batch. Stateless given the artifact, a shuffle-free codegen
    * projection per batch, so stream == batch doc-for-doc. */
  def bpeTokenStream(docs: DataFrame, merges: Seq[graft.operators.Bpe.Merge],
                     idCol: String, textCol: String)
                    (sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], _: Long) =>
        sink(graft.operators.Bpe.tokenCounts(b.toDF(), idCol, textCol, merges))
      }
      .start()

  /** Batch-mode smoke: run the windowed aggregation over the parquet
    * events table read as a one-shot stream (Trigger.AvailableNow). */
  def runBatchOverParquet(spark: SparkSession, sfDir: String, outDir: String): Unit = {
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    // stream ONLY the events table — the sf dir holds every table's parquet
    val stream = spark.readStream.schema(schema).parquet(s"$sfDir/events.parquet")
    // ts arrives as epoch-nano longs (legacy nanosAsLong files) or as a
    // native timestamp (micros files) depending on the writer vintage
    val tsAsTimestamp = schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer DIV: `/` promotes the epoch-nano long (~1.7e18, past
        // double's 2^53 exact range) to double, so the truncated micros
        // could drift ~1us and land a boundary event in a different hour
        // window than the batch twin's exact DIV arithmetic
        timestamp_micros(expr("ts div 1000"))
      case _ => col("ts").cast("timestamp")
    }
    val q = windowedCounts(stream.withColumn("ts", tsAsTimestamp))
      .writeStream
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", s"$outDir/data")
      .option("checkpointLocation", s"$outDir/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
