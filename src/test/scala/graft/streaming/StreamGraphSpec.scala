package graft.streaming

import graft.SparkSpec
import graft.operators.{Dedup, Graph}
import org.apache.spark.sql.functions._

/** q210: streaming CC maintenance — the chunked foreachBatch fold
  * lands on the one-shot increment's labeling AND the from-scratch
  * closure (the q205-style three-way equality). */
class StreamGraphSpec extends SparkSpec {

  test("streamed CC fold equals one-shot increment and from-scratch closure") {
    import spark.implicits._
    val streamed = StreamGraph.ccStream(spark, sf001.dir)
    val oneShot = Graph.ccCoPurchaseIncremental(sf001)
    assert(streamed.count() === sf001.customer.count())
    assert(streamed.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(streamed).isEmpty,
      "streamed CC fold diverges from the one-shot increment")
    val scratch = Dedup.connectedComponents(
        sf001.customer.select($"c_custkey"), Graph.customerCoEdges(sf001))
      .select($"id".as("c_custkey"), $"component")
    assert(streamed.exceptAll(scratch).isEmpty &&
      scratch.exceptAll(streamed).isEmpty,
      "streamed CC fold diverges from the from-scratch closure")
  }
}
