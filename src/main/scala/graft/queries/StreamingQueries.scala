package graft.queries

import java.util.concurrent.atomic.AtomicLong
import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{Q, Scratch, Tables}

/** Registered Structured Streaming queries — §2.11's registry face.
  *
  * The reference is batch-only (SURVEY.md §2.11), so until round 16 the
  * streaming surface (graft.streaming.*) was verified ONLY by its
  * stream==batch parity specs. These queries put the streaming engine
  * itself behind the driver's DuckDB gate: each one stages input files to
  * scratch, runs a real Structured Streaming job over them (file source →
  * transform → sink, `Trigger.AvailableNow`), and returns a deterministic
  * frame whose oracle is plain SQL over the ORIGINAL table — so the hash
  * compare checks the stream's windowing / dedup / exactly-once semantics
  * against an independent engine, not against our own batch path.
  *
  * Determinism contract: every query drains the whole landing directory
  * (AvailableNow with no maxFilesPerTrigger = one batch over a captured
  * file list), ends in a total order, and rounds float aggregates at the
  * 2-dp data grain (DecisionAudit `twoDpSum`, the w3 idiom).
  *
  * Scale notes per query are on the Q entries; the common one: the file
  * source lists and checkpoints FILES, so the pattern is insensitive to
  * corpus row count — at 100 TB the landing directory is an object-store
  * prefix and the same drain processes only files the checkpoint hasn't
  * seen (FileStreamSpec pins that contract on processFilesOnce).
  */
object StreamingQueries {

  /** Monotonic suffix for per-construction sinks/checkpoints: a resumed
    * checkpoint + memory/parquet sink pair must never be shared across
    * constructions (a reused checkpoint records the files as consumed and
    * the second run would drain nothing).
    */
  private val runSeq = new AtomicLong()

  /** Landing directories staged once per (scratch root, sf dir, copies) —
    * the "files that landed" fixture both event streams read. `copies=2`
    * writes the same rows twice as distinct files: an at-least-once
    * redelivery (replayed Kafka offsets, re-crawled files), which is what
    * st2's dedup exists to absorb. Memoized like the model pretrains so
    * guard suites and double-run smoke tests don't re-write the corpus
    * per construction; Bench stages through [[pretrainStage]] so query
    * timings measure the STREAM, not the fixture write.
    */
  private val staged = TrieMap.empty[String, String]

  def clearCaches(): Unit = staged.clear()

  // a path memo must never outlive the files it names (the cut-memo
  // discipline): Scratch.sweep invalidates this one too, not just Bench/
  // Verify's explicit clearCaches ordering
  graft.Scratch.onSweep(() => staged.clear())

  /** st1's previous memory-sink view, dropped when a NEWER construction
    * replaces it so repeated constructions (guard suites walk the registry
    * several times per JVM) don't grow the temp-view catalog without
    * bound. Dropping only unbinds the NAME — a DataFrame handle from the
    * earlier construction resolved the sink plan eagerly and keeps
    * working, so this has no stale-handle hazard.
    */
  private val lastSink = new java.util.concurrent.atomic.AtomicReference[String]()

  private def rotateSink(s: SparkSession, name: String): Unit = {
    val prev = lastSink.getAndSet(name)
    if (prev != null) { s.catalog.dropTempView(prev); () }
  }

  private def stageEvents(s: SparkSession, d: String, copies: Int): String = {
    val path = Scratch.dir(s, s"stev${copies}_${Scratch.key(d)}")
    staged.getOrElseUpdate(path, {
      if (copies == 1) {
        Tables.events(s, d)
          .withColumn("ts", Tables.eventTime(col("ts")))
          .write.mode("overwrite").parquet(path)
      } else {
        // the redelivered landing is byte-identical FILE COPIES of the
        // single-copy staging under fresh names — higher fidelity than
        // re-deriving (an at-least-once source redelivers the same bytes),
        // and it costs file copies, not `copies` more Spark jobs
        val conf = s.sparkContext.hadoopConfiguration
        val src = new org.apache.hadoop.fs.Path(stageEvents(s, d, 1))
        val dst = new org.apache.hadoop.fs.Path(path)
        val fs = src.getFileSystem(conf)
        fs.delete(dst, true)
        fs.mkdirs(dst)
        for {
          st <- fs.listStatus(src)
          if st.isFile && st.getPath.getName.startsWith("part-")
          c <- 1 to copies
        } org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath, fs,
          new org.apache.hadoop.fs.Path(dst, s"c${c}_${st.getPath.getName}"),
          false, conf)
      }
      path
    })
  }

  /** Bench hook: pay the landing-fixture writes outside query timing
    * (the `_edges_build` precedent — the fixture is test plumbing, the
    * stream run is the operator being measured). Gated per fixture like
    * needsAls/needsIvf: a filtered run stages only what its selected
    * queries read (single-copy for st1/st5, the doubled redelivery for
    * st2 — which implies the single-copy it is built from).
    */
  def pretrainStage(s: SparkSession, d: String,
      single: Boolean, doubled: Boolean): Unit = {
    if (single || doubled) stageEvents(s, d, 1)
    if (doubled) stageEvents(s, d, 2)
    ()
  }

  private def fileStream(s: SparkSession, landing: String): DataFrame =
    s.readStream.schema(s.read.parquet(landing).schema).parquet(landing)

  val all: Seq[Q] = Seq(

    // ST1: the watermarked tumbling aggregation run AS A STREAM over
    // landed files, drained once, collected from a complete-mode memory
    // sink. Oracle = w3's SQL verbatim: DuckDB aggregates the original
    // events table, so the hash compare proves the streaming engine's
    // event-time windowing (file source → watermark → window agg) equals
    // an independent batch engine. Complete+memory is sound here because
    // the RESULT is bounded (windows × types, never event count); the
    // unbounded-output production shape — append mode, parquet sink,
    // watermark-evicted state — is EventStream.processFilesOnce, pinned
    // by FileStreamSpec, and st2 below drives it through the gate.
    Q("st1_stream_hourly",
      (s, d) => {
        val landing = stageEvents(s, d, copies = 1)
        val n = runSeq.incrementAndGet()
        val sink = s"st1_sink_$n"
        val q = graft.streaming.EventStream
          .streamingTypeCounts(fileStream(s, landing), "1 hour", "10 minutes")
          .writeStream.format("memory").queryName(sink)
          .option("checkpointLocation", Scratch.dir(s, s"st1_ck_$n"))
          .outputMode("complete")
          .trigger(Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        val result = s.table(sink)
          .withColumn("win_start", col("win_start").cast("long"))
          .orderBy("win_start", "event_type")
        rotateSink(s, sink)
        result
      },
      Some("""SELECT epoch(time_bucket(INTERVAL '1 hour', ts))::BIGINT AS win_start,
             |  event_type, count(*) AS n, round(sum(value), 2) AS sv
             |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin)),

    // ST2: streaming exact dedup of an at-least-once source. The landing
    // fixture contains every event TWICE (distinct files — a full
    // redelivery); dropDuplicatesWithinWatermark(event_id) emits each id
    // once into an append-mode PARQUET sink (the unbounded-output path:
    // rows land in files, never in driver memory), and the query reads
    // the sink back and aggregates per type. Oracle = the same aggregate
    // over the ORIGINAL single-copy events: hash equality proves the
    // stream turned 2N at-least-once rows into exactly N. State is one
    // row per key within the watermark (bounded by arrival rate × delay
    // at 100 TB, not by corpus size — the documented contract of
    // dropDuplicatesWithinWatermark vs plain dropDuplicates).
    Q("st2_stream_dedup",
      (s, d) => {
        val landing = stageEvents(s, d, copies = 2)
        val n = runSeq.incrementAndGet()
        val out = Scratch.dir(s, s"st2_out_$n")
        val q = graft.streaming.EventStream
          .dedupedStream(fileStream(s, landing), "10 minutes", Seq("event_id"))
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", Scratch.dir(s, s"st2_ck_$n"))
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        s.read.parquet(out)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n, round(sum(value), 2) AS sv
             |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin)),

    // ST3: incremental corpus ingest, TWO drains against one checkpoint —
    // the streaming face of d8's ledger dedup driven end-to-end. Drain 1
    // ingests the corpus (in-batch content dedup, keep-first by doc_id);
    // then the SAME files land again (full re-crawl) and drain 2 — same
    // checkpoint, so the file source serves only the new files — finds
    // every content hash already in the ledger and appends NOTHING. The
    // returned per-lang profile of the corpus therefore equals DuckDB's
    // keep-first-per-md5 over the original documents: the hash compare
    // proves exactly-once across a restart + redelivery, which no batch
    // parity test can. (The ledger anti-join ships (hash) only — at
    // 100 TB it's hash-bucketed, per DocIngest's scale notes.)
    Q("st3_stream_ingest",
      (s, d) => {
        val n = runSeq.incrementAndGet()
        val landing = Scratch.dir(s, s"st3_land_$n")
        val corpus = Scratch.dir(s, s"st3_corpus_$n")
        val ledger = Scratch.dir(s, s"st3_ledger_$n")
        val ckpt = Scratch.dir(s, s"st3_ck_$n")
        val docs = Tables.documents(s, d)
        docs.write.mode("overwrite").parquet(landing)
        graft.streaming.DocIngest.ingestOnce(s, landing, corpus, ledger, ckpt)
        docs.write.mode("append").parquet(landing) // the re-crawl lands
        graft.streaming.DocIngest.ingestOnce(s, landing, corpus, ledger, ckpt)
        s.read.parquet(corpus)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).cast("long").as("chars"))
          .orderBy("lang")
      },
      Some("""WITH k AS (
             |  SELECT lang, n_chars,
             |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
             |  FROM documents)
             |SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
             |FROM k WHERE rn = 1 GROUP BY lang ORDER BY lang""".stripMargin)),

    // ST4: streaming CDC apply, THREE drains against one checkpoint. The
    // op log (u8's I/U/D derivation from events, LWW-ordered by
    // (ts, op_id)) lands in two halves — drain 1 folds half the log into
    // the versioned state table, drain 2 folds the rest on top — and then
    // the FIRST half lands AGAIN (an at-least-once redelivery) and drain
    // 3 must leave the state unchanged, because the fold is
    // max-of-(ts,op_id) per key: associative, commutative, idempotent.
    // The oracle is DuckDB's last-writer-wins over the WHOLE log, so the
    // hash compare proves incremental fold ∘ fold ∘ replay == one-shot
    // batch — tombstone retention included (a 'D' survivor is filtered,
    // and a redelivered older op cannot resurrect it). State costs one
    // partial-combining aggregate per drain and one row per key — the
    // 100 TB shape per CdcStream's scaladoc.
    Q("st4_stream_cdc",
      (s, d) => {
        val n = runSeq.incrementAndGet()
        val landing = Scratch.dir(s, s"st4_land_$n")
        val state = Scratch.dir(s, s"st4_state_$n")
        val ckpt = Scratch.dir(s, s"st4_ck_$n")
        val ops = Tables.events(s, d).select(
          col("user_id").as("key"), col("ts"),
          col("event_id").as("op_id"),
          when(col("event_type") === "view", "I")
            .when(col("event_type") === "purchase", "D")
            .otherwise("U").as("op"),
          round(col("value") * 100).cast("long").as("payload"))
        val firstHalf = ops.filter(pmod(col("op_id"), lit(2)) === 0)
        firstHalf.write.mode("overwrite").parquet(landing)
        graft.streaming.CdcStream.applyOnce(s, landing, state, ckpt)
        ops.filter(pmod(col("op_id"), lit(2)) === 1)
          .write.mode("append").parquet(landing)
        graft.streaming.CdcStream.applyOnce(s, landing, state, ckpt)
        firstHalf.write.mode("append").parquet(landing) // redelivered
        graft.streaming.CdcStream.applyOnce(s, landing, state, ckpt)
        graft.streaming.CdcStream.currentState(s, state)
          .select(col("key").as("user_id"), col("op").as("last_op"),
            col("payload").as("value_cents"))
          .orderBy("user_id")
      },
      Some("""WITH ops AS (
             |  SELECT user_id, ts, event_id,
             |    CASE WHEN event_type = 'view' THEN 'I'
             |      WHEN event_type = 'purchase' THEN 'D'
             |      ELSE 'U' END AS op,
             |    CAST(round(value * 100) AS BIGINT) AS c
             |  FROM events
             |), ranked AS (
             |  SELECT user_id, op, c,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM ops)
             |SELECT user_id, op AS last_op, c AS value_cents
             |FROM ranked WHERE rn = 1 AND op <> 'D'
             |ORDER BY user_id""".stripMargin)),

    // ST5: the stream-STREAM interval join run as two real file streams —
    // clicks and purchases read the landed events independently, join on
    // user_id with the two-sided event-time bound, and land every
    // attributed pair in an append-mode parquet sink. This is
    // EventStream.attributedPurchases, the SAME function body j12 oracles
    // on batch frames — here the watermarks are live (both sides' buffered
    // state is evictable once the watermark passes its interval; inner-join
    // matches emit as they arrive, so the single AvailableNow batch emits
    // every pair). Oracle = j12's SQL verbatim: DuckDB's interval join over
    // the original events equals the STREAMING join's sink, row for row —
    // the strongest gate a stream-stream operator can get without a second
    // engine that speaks watermarks.
    Q("st5_stream_join",
      (s, d) => {
        val landing = stageEvents(s, d, copies = 1)
        val n = runSeq.incrementAndGet()
        val out = Scratch.dir(s, s"st5_out_$n")
        val clicks = fileStream(s, landing)
          .filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        val purchases = fileStream(s, landing)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        // State-shard count is a per-STREAM sizing decision, frozen into
        // the checkpoint at first start: a stream-stream join materializes
        // FOUR state stores per shuffle partition per side, each paying a
        // commit per micro-batch, so shards are sized to the stream's
        // arrival rate (tens of thousands of buffered rows here), not to
        // the session's batch-shuffle width. A production deployment at
        // higher throughput starts its checkpoint with proportionally more
        // shards — same one-line conf, sized to the feed.
        // restored only AFTER termination: start() is async and the
        // stream captures the conf into its checkpoint during init
        val prevParts = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        try {
          val q = graft.streaming.EventStream
            .attributedPurchases(clicks, purchases, "1 hour", 3600L)
            .select(col("user_id"), col("click_id"), col("purchase_id"),
              (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
                .as("gap_us"),
              round(col("value"), 2).as("v"))
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", Scratch.dir(s, s"st5_ck_$n"))
            .outputMode("append")
            .trigger(Trigger.AvailableNow())
            .start()
          try q.awaitTermination() finally q.stop()
        } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
        s.read.parquet(out)
          .orderBy("user_id", "click_id", "purchase_id")
      },
      Some("""SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
             |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us,
             |  round(p.value, 2) AS v
             |FROM (SELECT * FROM events WHERE event_type = 'click') c
             |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
             |  ON c.user_id = p.user_id AND p.ts >= c.ts
             |  AND p.ts <= c.ts + INTERVAL 1 HOUR
             |ORDER BY c.user_id, click_id, purchase_id""".stripMargin)))
}
