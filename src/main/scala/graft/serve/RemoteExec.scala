package graft.serve

import org.apache.spark.sql.SparkSession

/** Remote statement execution — the reference's dormant Livy path
  * (`assets/app_nfl.py:163-233`: template a PySpark source string,
  * POST it to a REST session endpoint, poll until the statement
  * finishes, scrape stdout) rebuilt on the idiomatic Spark mechanism,
  * Spark Connect: the driver hosts a gRPC `SparkConnectService`, and a
  * thin client session submits statements against `sc://host:port`,
  * receiving Arrow-encoded results. Same capability surface as the
  * Livy flow — create/reuse a remote session, submit a statement,
  * fetch its result — with a typed plan on the wire instead of spliced
  * code strings, and no polling (the RPC streams the result).
  *
  * SURVEY §3.3 records why the Livy flow itself is not reproduced:
  * the reference never wires its result into a response, and
  * code-string shipping is an anti-pattern Spark Connect exists to
  * replace.
  */
object RemoteExec {

  @volatile private var boundPort: Option[Int] = None

  /** Start the in-process Spark Connect gRPC endpoint on a free port;
    * returns the bound port. Idempotent per JVM (the service is a
    * singleton — repeated starts return the existing port). */
  def startService(spark: SparkSession): Int = synchronized {
    boundPort.getOrElse {
      val port = {
        val s = new java.net.ServerSocket(0)
        try s.getLocalPort finally s.close()
      }
      // the live SparkConf the service reads its binding port from
      org.apache.spark.SparkEnv.get.conf
        .set("spark.connect.grpc.binding.port", port.toString)
      org.apache.spark.sql.connect.service.SparkConnectService.start(spark.sparkContext)
      boundPort = Some(port)
      port
    }
  }

  def stopService(): Unit = synchronized {
    if (boundPort.isDefined) {
      org.apache.spark.sql.connect.service.SparkConnectService.stop(None, None)
      boundPort = None
    }
  }

  /** Submit one SQL statement over the wire and return its collected
    * rows — the Livy flow's "run statement, read its output", minus
    * the 250 ms polling loop. Each call uses a fresh remote session
    * (the reference reused its first Livy session; `remoteSession`
    * supports that pattern for callers issuing many statements). */
  def submitSql(port: Int, sql: String): Seq[org.apache.spark.sql.Row] = {
    val remote = remoteSession(port)
    try remote.sql(sql).collect().toSeq
    finally remote.close()
  }

  /** A reusable remote session against the in-process service —
    * session state (temp views, confs) lives server-side per session,
    * exactly like a Livy interactive session. */
  def remoteSession(port: Int): org.apache.spark.sql.connect.SparkSession =
    org.apache.spark.sql.connect.SparkSession.builder()
      .remote(s"sc://localhost:$port")
      .create()
}
