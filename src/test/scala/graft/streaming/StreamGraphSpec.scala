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

  test("streamed I/D fold equals one-shot apply and the closure over the final edges") {
    import spark.implicits._
    val b = StreamGraph.MaxStreamNode
    val streamed = StreamGraph.ccRetractStream(spark, sf001.dir)
    val oneShot = StreamGraph.ccRetractOneShot(spark, sf001.dir)
    assert(streamed.count() ===
      sf001.customer.filter($"c_custkey" < b).count())
    assert(streamed.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(streamed).isEmpty,
      "streamed I/D fold diverges from the one-shot apply")
    val finalEdges = Graph.customerCoEdges(sf001)
      .filter($"a" < b && $"b" < b && ($"a" + $"b") % 7 =!= 0)
    val scratch = Dedup.connectedComponents(
        sf001.customer.select($"c_custkey").filter($"c_custkey" < b),
        finalEdges)
      .select($"id".as("c_custkey"), $"component")
    assert(streamed.exceptAll(scratch).isEmpty &&
      scratch.exceptAll(streamed).isEmpty,
      "streamed I/D fold diverges from the from-scratch closure")
  }
}
