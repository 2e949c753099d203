package graft.serve

import graft.SparkSpec

/** Remote statement execution (the Livy-path rebuild, SURVEY §3.3):
  * a client session over Spark Connect submits statements to the
  * in-process gRPC service and gets the same answers the local
  * session computes. */
class RemoteExecSpec extends SparkSpec {

  test("a remote statement over Spark Connect matches local execution") {
    val port = RemoteExec.startService(spark)
    try {
      assert(port > 0)
      val sql =
        """SELECT o_orderstatus, COUNT(*) AS n
          |FROM parquet.`/root/testdata/sf0.001/orders.parquet`
          |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
      val remote = RemoteExec.submitSql(port, sql)
        .map(r => (r.getString(0), r.getLong(1)))
      val local = spark.sql(sql).collect().toSeq
        .map(r => (r.getString(0), r.getLong(1)))
      assert(remote === local && remote.nonEmpty)
    } finally RemoteExec.stopService()
  }

  test("submitSql rejects results beyond maxRows instead of collecting them unbounded") {
    val port = RemoteExec.startService(spark)
    try {
      // within the cap: fine
      assert(RemoteExec.submitSql(port, "SELECT id FROM range(10)", maxRows = 10).size === 10)
      // over the cap: loud failure, not an unbounded client-side collect
      val e = intercept[IllegalStateException] {
        RemoteExec.submitSql(port, "SELECT id FROM range(1000)", maxRows = 10)
      }
      assert(e.getMessage.contains("maxRows"))
    } finally RemoteExec.stopService()
  }

  test("a reusable remote session holds server-side state across statements (Livy session semantics)") {
    val port = RemoteExec.startService(spark)
    try {
      val session = RemoteExec.remoteSession(port)
      try {
        session.sql(
          """CREATE OR REPLACE TEMP VIEW remote_orders AS
            |SELECT * FROM parquet.`/root/testdata/sf0.001/orders.parquet`""".stripMargin)
          .collect()
        // second statement sees the first's session state
        val n = session.sql("SELECT COUNT(*) AS n FROM remote_orders")
          .collect().head.getLong(0)
        val want = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").count()
        assert(n === want)
      } finally session.close()
    } finally RemoteExec.stopService()
  }
}
