package graft.streaming

import graft.Tables
import graft.operators.Graph
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** One undirected edge under replay ([[graft.operators.Graph]]
  * increment shape). */
case class ReplayEdge(a: Long, b: Long)

/** Streaming graph maintenance (q210) — the last stateful family to
  * get its foreachBatch twin: dedup (q172-era), CDC (q172), IVM
  * (q177/q187/q199/q207), SCD2 (q194), ER (q198's batch increment),
  * and ANN (q205) all fold deltas through their batch algebra; the
  * graph labeling now does too. Each micro-batch of NEW edges folds
  * through [[Graph.ccIncrementFrames]] — the condensation argument is
  * per-batch exact, and min-label merges are associative across any
  * chunking of an insert log (each batch's merges commute with later
  * ones: the component minimum only ever decreases), so
  * stream(b1…bk) ≡ one-shot increment(∪bᵢ) ≡ the from-scratch
  * closure. q210's oracle is the LAST equality (q202's recursive
  * walk, blind to chunking); StreamGraphSpec pins the first two.
  *
  * Production shape: foreachBatch MERGEs the relabel delta into the
  * component-bucketed state table; here the state rolls forward as a
  * localCheckpoint'd frame (the harness stand-in, as in StreamIvm).
  * Per batch the cost is O(batch + members-of-merged-components) —
  * the labeling is read exchange-free, never rescanned wholesale. */
object StreamGraph {

  private val Chunks = 3

  /** q210 — stream the q202 delta slice ((a+b) mod 5 ≡ 0 co-purchase
    * edges) through the foreachBatch CC fold in [[Chunks]]
    * micro-batches over the persisted base labeling; return the final
    * (c_custkey, component) shaped exactly like q202's output. */
  def ccStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val table = Graph.ensureCcState(t)
    val deltaRows = Graph.customerCoEdges(t)
      .filter(($"a" + $"b") % 5 === 0)
      .orderBy($"a", $"b").as[ReplayEdge].collect().toSeq
    val chunks =
      if (deltaRows.isEmpty) Seq(Seq.empty[ReplayEdge])
      else deltaRows.grouped(
        math.max(1, (deltaRows.length + Chunks - 1) / Chunks)).toSeq
    val ss = spark.newSession()
    graft.expr.GraftFunctions.register(ss)
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    implicit val sqlCtx: SQLContext = ss.sqlContext
    val input = MemoryStream[ReplayEdge]
    @volatile var state: DataFrame = ss.table(table).localCheckpoint(true)
    val ckRoot = if (new java.io.File("/dev/shm").isDirectory) "/dev/shm"
      else System.getProperty("java.io.tmpdir")
    val ckDir = new java.io.File(ckRoot,
      "graft_stream_cc_" + java.util.UUID.randomUUID())
    val q = input.toDS().writeStream
      .option("checkpointLocation", ckDir.getPath)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[ReplayEdge], _: Long) =>
        state = Graph.ccIncrementFrames(batch.toDF(), state)
          .localCheckpoint(true)
        (): Unit
      }
      .start()
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    } finally {
      q.stop()
      graft.Tables.deleteRec(ckDir)
    }
    val rows = java.util.Arrays.asList(state.collect(): _*)
    spark.createDataFrame(rows, state.schema)
      .select($"id".as("c_custkey"), $"component")
      .orderBy($"c_custkey")
  }
}
