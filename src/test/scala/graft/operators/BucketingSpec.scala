package graft.operators

import org.apache.spark.sql.functions._

/** Bucketed tables must join WITHOUT a shuffle: the whole point of
  * paying the layout cost at write time. */
class BucketingSpec extends graft.SparkSpec {

  test("join of two tables bucketed on the key plans with zero Exchange operators") {
    val li = sf001.lineitem.select(col("l_orderkey"), col("l_quantity"))
    val or = sf001.orders.select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", 4)
    Bucketing.writeBucketed(or, "or_bucketed", "l_orderkey", 4)
    // disable auto-broadcast: at the scale bucketing targets, neither
    // fact table fits in a broadcast — force the big-join planning path
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark, "li_bucketed", "or_bucketed", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join:\n$plan")
      // and it still computes the right thing
      val expected = li.join(or, "l_orderkey").count()
      assert(joined.count() === expected && expected > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS or_bucketed")
    }
  }
}
