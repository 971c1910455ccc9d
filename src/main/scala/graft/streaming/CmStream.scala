package graft.streaming

import graft.queries.Pipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** Streaming Count-Min — q120's sketch maintained live. The insight is
  * that a CM table IS a grouped count over a FIXED key space
  * (depth × width = 48 cells), so the streaming form needs no custom
  * state machine at all: Structured Streaming's built-in stateful
  * aggregation over `cmProjection` carries the registers, state is
  * bounded by the sketch geometry however long the stream runs, and
  * update-mode emits only cells a batch touched.
  *
  * Parity contract (CmStreamSpec): after any prefix of the stream, the
  * emitted table equals the batch `cmProjection(...).groupBy.count`
  * over the same rows — counts are associative, so micro-batching
  * cannot change them.
  */
object CmStream {

  /** `tokens` must be a streaming frame with a `w` string column. */
  def table(tokens: DataFrame): DataFrame =
    Pipeline.cmProjection(tokens)
      .groupBy(col("i"), col("bucket"))
      .agg(count(lit(1)).as("c"))

  def start(tokens: DataFrame)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    table(tokens).writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch(sink)
      .start()

  /** Live tokens → the LANDED ledgered sketch: each micro-batch folds
    * into [[graft.sources.CmStoreLayout]] under its micro-batch id, so
    * a replayed micro-batch (the foreachBatch restart case Structured
    * Streaming documents — the same id is re-delivered) is a ledger
    * no-op instead of a double-count. This closes the loop the
    * idempotent stores close for free: stream → store is exactly-once
    * END TO END for an ADDITIVE sketch, by exactly the discipline the
    * JDBC sink proves for row landing (batch-id dedup inside the
    * committed state). State in the stream itself: NONE — the store
    * carries the counts; the micro-batch frame is just that batch's
    * raw tokens.
    */
  def startStore(tokens: DataFrame, dir: String): StreamingQuery =
    tokens.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.CmStoreLayout.fold(
          batch.sparkSession, dir, s"cm-micro-$id", batch)
        ()
      }
      .start()
}

/** Streaming HyperLogLog — q117's registers maintained live, by the
  * same argument as [[CmStream]]: the register table is a grouped MAX
  * over a fixed key space (sources × 256 buckets), so Structured
  * Streaming's stateful aggregation is the whole operator. max is
  * idempotent and associative — replays and micro-batch boundaries
  * cannot change the registers — and state stays register-bounded on
  * an unbounded stream (the reason `uniq` sketches exist at all).
  *
  * The estimate itself stays a CHEAP downstream read over ≤256 rows
  * per source (q117's integer-exact harmonic fold), computed by the
  * sink whenever it wants a number — the stream maintains registers,
  * not estimates, exactly like a production sketch store.
  */
object HllStream {

  /** `docs` must be a streaming frame with source + text columns. */
  def registers(docs: DataFrame): DataFrame =
    graft.queries.Pipeline.hllRegistersOf(docs)

  def start(docs: DataFrame)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    registers(docs).writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch(sink)
      .start()
}

/** Streaming contingency table — the q148/q155 association family
  * maintained live, by the same argument as [[CmStream]]: the
  * (event_type, k-bucket) table is a grouped COUNT over a fixed
  * ≤ r·c key space (≤ 5×10 cells on this schema), so Structured
  * Streaming's built-in stateful aggregation is the whole operator —
  * state stays cell-bounded on an unbounded stream, and counts are
  * associative so micro-batch boundaries cannot change them (replays
  * are the sink's exactly-once job, as for [[CmStream]]).
  *
  * χ², Cramér's V, the contingency coefficient and Theil's U stay
  * CHEAP downstream reads over the summary rows
  * (`Events.cramersVFromCont` is the worked finale), computed by the
  * sink whenever it wants the statistics — the stream maintains the
  * table, not the coefficients, exactly like a production sketch
  * store.
  */
object ContingencyStream {

  /** `events` must be a streaming frame with event_type + props
    * columns (the landed-events projection both transports drain).
    */
  def table(events: DataFrame): DataFrame =
    graft.queries.Events.contingencyOf(events)

  def start(events: DataFrame)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    table(events).writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch(sink)
      .start()
}

/** Streaming audience bitmaps — q171's word table maintained live.
  * The state IS the production bitmap: (event_type, user_id div 64)
  * words carried by Structured Streaming's built-in stateful
  * aggregation under `bit_or`, which is idempotent AND associative —
  * micro-batch boundaries and replays cannot flip a bit, so this leg
  * is exactly-once without any sink-side ledger (stronger than the
  * count-based sketches, whose replay discipline is the sink's job).
  * State is bounded by audience/64 words per type — the same bound
  * the batch answer itself has, i.e. the size a production bitmap
  * store carries for the audience it serves.
  *
  * The set algebra (AND/OR/XOR/ANDNOT cardinalities) stays a CHEAP
  * downstream read over the word table
  * (`Events.audienceAlgebraFromWords`, shared with the batch query),
  * computed by the sink whenever it wants the numbers — the stream
  * maintains bitmaps, not statistics.
  */
object BitmapStream {

  /** `events` must be a streaming frame with event_type + user_id. */
  def words(events: DataFrame): DataFrame =
    graft.queries.Events.audienceWordsOf(events)

  def start(events: DataFrame)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    words(events).writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch(sink)
      .start()
}

/** Streaming mixture-weight inputs — q183's per-source token counts
  * maintained live, by the [[CmStream]] argument: the count table is
  * a grouped COUNT over the ≤ |sources| key space, so state stays
  * source-bounded on an unbounded stream and counts are associative
  * (replay delivery is the sink's exactly-once job, as for
  * [[CmStream]]). The α-sampling weights themselves stay a CHEAP
  * downstream read over the summary rows
  * (`Pipeline.alphaWeightsFromCounts`, shared with the batch query) —
  * the stream maintains counts, not weights, so a curation loop can
  * re-derive the mixture whenever a batch lands.
  */
object MixStream {

  /** `docs` must be a streaming frame with source + text columns. */
  def counts(docs: DataFrame): DataFrame =
    Pipeline.tokenCountsOf(docs)

  def start(docs: DataFrame)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    counts(docs).writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch(sink)
      .start()
}

/** Streaming Benford digit table — q178's first-digit counts
  * maintained live, by the [[CmStream]] argument: the table is a
  * grouped COUNT over the fixed ≤ 9·types key space, so state stays
  * cell-bounded forever and counts are associative (replay delivery
  * is the sink's exactly-once job). The χ²-vs-Benford statistic stays
  * a CHEAP downstream read over the cells
  * (`Events.benfordFromCounts`, shared with the batch query) — a
  * fabrication monitor that re-scores as every batch lands.
  */
object BenfordStream {

  /** `events` must be a streaming frame with event_type + value. */
  def table(events: DataFrame): DataFrame =
    graft.queries.Events.digitCountsOf(events)

  def start(events: DataFrame)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    table(events).writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch(sink)
      .start()
}

/** Streaming quantileTiming — q172's fixed-resolution histogram
  * maintained live, by the [[CmStream]] argument: the timing grid is
  * ≤ 2 838 cells per type FOREVER (exact 1 ms < 1024, 16 ms to 30 s,
  * one overflow cell), so the live table is the built-in stateful
  * grouped count over the SHARED batch projection
  * (`Events.timingHistOf`). The quantile read (all-integer ceil
  * ranks) stays a cheap downstream fold over the cells.
  */
object TimingStream {

  /** `events` must be a streaming frame with event_type + value. */
  def table(events: DataFrame): DataFrame =
    graft.queries.Events.timingHistOf(events)

  def start(events: DataFrame)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    table(events).writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch(sink)
      .start()

  /** Live events → the LANDED ledgered histogram (the
    * [[CmStream.startStore]] wiring for the timing grid): each
    * micro-batch folds under its id, so a foreachBatch-restart replay
    * is a ledger no-op — exactly-once end to end for the additive
    * histogram.
    */
  def startStore(events: DataFrame, dir: String): StreamingQuery =
    events.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TimingStoreLayout.fold(
          batch.sparkSession, dir, s"timing-micro-$id", batch)
        ()
      }
      .start()
}

/** Streaming DDSketch — q176's γ-bucket table maintained live. The
  * boundary table is STATIC (the shared sequentially-multiplied γ
  * chain), so bucket assignment is a stream-static broadcast range
  * join — the production DD insert path — and the one stateful
  * aggregation is the grouped count over the ≤ 643-cell/type space:
  * state bounded by sketch geometry on an unbounded stream, relative
  * error 2% at every quantile forever. Batch pre-collapses to the ms
  * histogram before bucketing (`Events.ddBucketsOf`); the live form
  * cannot (one-aggregation rule), but the tables are identical by
  * construction — counts are associative and the bucketing is the
  * same broadcast probe (spec-pinned per prefix).
  */
object DdStream {

  /** `events` must be a streaming frame with event_type + value. */
  def table(events: DataFrame): DataFrame = {
    val bounds = graft.queries.Events.ddBounds(events.sparkSession)
    graft.queries.Events.ddBucketRowsOf(events, bounds)
      .groupBy(col("event_type"), col("k"), col("lo"))
      .agg(count(lit(1)).as("c"))
  }

  def start(events: DataFrame)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    table(events).writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch(sink)
      .start()

  /** Live events → the LANDED ledgered γ-bucket sketch (the
    * [[CmStream.startStore]] wiring for DDSketch): each micro-batch
    * folds under its id — a foreachBatch-restart replay is a ledger
    * no-op, completing exactly-once stream → store for all three
    * additive sketches.
    */
  def startStore(events: DataFrame, dir: String): StreamingQuery =
    events.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.DdStoreLayout.fold(
          batch.sparkSession, dir, s"dd-micro-$id", batch)
        ()
      }
      .start()
}
