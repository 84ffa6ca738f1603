package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.compile.ConstraintCompiler
import graft.dsl.Constraint._
import graft.dsl.ConstraintSuite
import graft.streaming.StreamValidator

/** Streaming validation: same compiled suite over a MemoryStream,
  * violations appended per micro-batch; watermarked windowed verdicts. */
/** Top-level so Spark's codegen'd encoder can instantiate it — a
  * spec-nested case class forces the interpreted-encoder fallback. */
case class StreamEv(doc_id: String, n_tok: Int, source: String,
    ts: Timestamp)

class StreamingSpec extends SparkSpec {
  import spark.implicits._
  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  test("violation stream emits per-batch violations") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Int, String)]
    val suite = ConstraintCompiler.compile(ConstraintSuite("s", Seq(
      Bounds("n_tok_max", "_2", None, Some(5)),
      IsIn("src", "_3", Seq("web", "books")))))
    val q = StreamValidator.violations(mem.toDF(), suite, "_1")
      .writeStream.format("memory").queryName("viol_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(("a", 3, "web"), ("b", 9, "web"), ("c", 3, "mars"))
      q.processAllAvailable()
      val got = spark.table("viol_sink")
        .select("doc_id", "constraint_id").as[(String, String)]
        .collect().toSet
      assert(got == Set(("b", "n_tok_max"), ("c", "src")))
      // second micro-batch appends
      mem.addData(("d", 99, "books"))
      q.processAllAvailable()
      assert(spark.table("viol_sink").count() == 3)
    } finally q.stop()
  }

  test("raw-JSON validation runs unchanged on a stream (JSONL firehose)") {
    // JsonValidator's schema-free path is a stateless per-row map, so a
    // STREAMING DataFrame flows through the same code: doc engine
    // compiled once on the driver, applied per micro-batch record,
    // malformed documents becoming violations — the streaming face of
    // the reference's validate(template, json) contract
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)] // (id, raw json)
    val compiled = graft.exec.JsonValidator.compile(
      ConstraintSuite("js", Seq(
        NotNull("id_req", "doc_id"),
        Bounds("n_max", "n_tok", None, Some(BigDecimal(10))))))
    val q = graft.exec.JsonValidator
      .violations(mem.toDF().toDF("id", "js"), "id", "js", compiled)
      .writeStream.format("memory").queryName("json_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        ("r1", """{"doc_id":"a","n_tok":3}"""),
        ("r2", """{"n_tok":3}"""),
        ("r3", """not json {"""))
      q.processAllAvailable()
      val b1 = spark.table("json_sink")
        .select("doc_id", "constraint_id").as[(String, String)]
        .collect().toSet
      assert(b1 == Set(("r2", "id_req"),
        ("r3", graft.exec.JsonValidator.DocumentConstraint)))
      // later micro-batch appends through the same compiled suite
      mem.addData(("r4", """{"doc_id":"d","n_tok":99}"""))
      q.processAllAvailable()
      assert(spark.table("json_sink").count() == 3)
      assert(spark.table("json_sink")
        .filter($"doc_id" === "r4" && $"constraint_id" === "n_max")
        .count() == 1)
    } finally q.stop()
  }

  test("stateful dedup: duplicates detected ACROSS micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)] // (fingerprint key, doc_id)
    val q = // NoTimeout: a TTL schedules periodic timeout batches and
      // processAllAvailable would never see the stream drain
      StreamValidator.dedupEvents(mem.toDF(), "_1", "_2", stateTtl = None)
      .writeStream.format("memory").queryName("dedup_sink")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(("k1", "d1"), ("k2", "d2"), ("k1", "d3")) // in-batch dup
      q.processAllAvailable()
      val b1 = spark.table("dedup_sink")
        .selectExpr("key", "doc_id", "first_doc_id")
        .as[(String, String, String)].collect().toSet
      assert(b1 == Set(("k1", "d3", "d1")))

      // next micro-batch: k1 again (cross-batch, state remembers d1),
      // k3 fresh (no event)
      mem.addData(("k1", "d4"), ("k3", "d5"))
      q.processAllAvailable()
      val all = spark.table("dedup_sink")
        .selectExpr("key", "doc_id", "first_doc_id", "n_seen")
        .as[(String, String, String, Long)].collect().toSet
      assert(all.contains(("k1", "d4", "d1", 3L)))
      assert(!all.exists(_._2 == "d5"))
    } finally q.stop()
  }

  test("windowed verdicts aggregate per event-time window and partition") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamEv]
    val suite = ConstraintCompiler.compile(ConstraintSuite("s", Seq(
      Bounds("n_tok_max", "n_tok", None, Some(5)))))
    val q = StreamValidator.windowedVerdicts(mem.toDF(), suite,
        "ts", "10 minutes", "5 minutes", Seq("source"))
      .writeStream.format("memory").queryName("verdict_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        StreamEv("a", 3, "web", ts(1)), StreamEv("b", 9, "web", ts(2)),
        StreamEv("c", 2, "books", ts(3)))
      q.processAllAvailable()
      // advance watermark far enough to finalize the first window
      mem.addData(StreamEv("z", 1, "web", ts(40)))
      q.processAllAvailable()
      val rows = spark.table("verdict_sink")
        .selectExpr("source", "n_rows", "n_bad_rows", "rows_ok")
        .as[(String, Long, Long, Boolean)].collect().toSet
      assert(rows.contains(("web", 2L, 1L, false)))
      assert(rows.contains(("books", 1L, 0L, true)))
    } finally q.stop()
  }

  test("windowed drift flags the shifted window against the reference") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamEv]
    // reference: uniform over the 4 bins of [0, 8)
    val q = StreamValidator.windowedDrift(mem.toDF(),
        "ts", "n_tok", lo = 0, hi = 8, buckets = 4,
        reference = Array(1.0, 1.0, 1.0, 1.0), threshold = 0.25,
        windowDuration = "10 minutes", watermarkDelay = "5 minutes",
        minRows = 4L)
      .writeStream.format("memory").queryName("drift_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      // window 10:00-10:10 matches the reference (one value per bin);
      // window 10:10-10:20 is concentrated in the top bin
      mem.addData(
        StreamEv("a", 1, "web", ts(1)), StreamEv("b", 3, "web", ts(2)),
        StreamEv("c", 5, "web", ts(3)), StreamEv("d", 7, "web", ts(4)),
        StreamEv("e", 7, "web", ts(11)), StreamEv("f", 7, "web", ts(12)),
        StreamEv("g", 7, "web", ts(13)), StreamEv("h", 6, "web", ts(14)))
      q.processAllAvailable()
      mem.addData(StreamEv("z", 1, "web", ts(59))) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("drift_sink")
        .selectExpr("window.start", "n_rows", "drifted")
        .as[(Timestamp, Long, Boolean)].collect()
        .map { case (w, n, d) => (w.toString, n, d) }.toSet
      assert(rows.contains(("2026-01-01 10:00:00.0", 4L, false)), rows)
      assert(rows.contains(("2026-01-01 10:10:00.0", 4L, true)), rows)
    } finally q.stop()
  }
}
