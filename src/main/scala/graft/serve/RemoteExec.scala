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
  @volatile private var boundAddress: Option[String] = None

  /** Start the in-process Spark Connect gRPC endpoint on a free port,
    * bound to the given address (default loopback); returns the bound
    * port. Idempotent per JVM (the service is a singleton — repeated
    * starts return the existing port).
    *
    * SECURITY: the endpoint is UNAUTHENTICATED and executes arbitrary
    * SQL/plans in the driver JVM — effectively remote code execution
    * for anyone who can reach the socket. The default bind is
    * therefore 127.0.0.1, matching the localhost-only clients
    * [[remoteSession]] creates; pass an explicit `bindAddress` only on
    * a network you trust end-to-end. Note the free-port probe below is
    * inherently racy (close-then-rebind TOCTOU): another process can
    * grab the port between the probe and the service start, in which
    * case start fails loudly — acceptable for this test/serving
    * harness, retry on failure. */
  def startService(spark: SparkSession, bindAddress: String = "127.0.0.1"): Int =
    synchronized {
      // a repeat start must not SILENTLY hand back a service bound to a
      // different interface than the caller asked for — in one
      // direction the caller's clients cannot connect, in the other a
      // loopback-expecting caller would get an already-network-exposed
      // endpoint
      boundAddress.foreach { addr =>
        require(addr == bindAddress,
          s"Spark Connect service already bound to $addr; cannot rebind to $bindAddress " +
            "(stopService first)")
      }
      boundPort.getOrElse {
        val port = {
          val s = new java.net.ServerSocket(0)
          try s.getLocalPort finally s.close()
        }
        // the live SparkConf the service reads its binding address/port from
        val conf = org.apache.spark.SparkEnv.get.conf
        conf.set("spark.connect.grpc.binding.address", bindAddress)
        conf.set("spark.connect.grpc.binding.port", port.toString)
        org.apache.spark.sql.connect.service.SparkConnectService.start(spark.sparkContext)
        boundPort = Some(port)
        boundAddress = Some(bindAddress)
        port
      }
    }

  def stopService(): Unit = synchronized {
    if (boundPort.isDefined) {
      org.apache.spark.sql.connect.service.SparkConnectService.stop(None, None)
      boundPort = None
      boundAddress = None
    }
  }

  /** Submit one SQL statement over the wire and return its collected
    * rows — the Livy flow's "run statement, read its output", minus
    * the 250 ms polling loop. Each call uses a fresh remote session
    * (the reference reused its first Livy session; `remoteSession`
    * supports that pattern for callers issuing many statements).
    *
    * The result is capped at `maxRows` client-side (LIMIT maxRows+1
    * pushed into the remote plan, so the overage costs one extra row
    * of transfer, not the full result): a runaway SELECT over Connect
    * would otherwise collect into client memory unbounded. Exceeding
    * the cap throws rather than silently truncating. */
  def submitSql(port: Int, sql: String, maxRows: Int = 100000): Seq[org.apache.spark.sql.Row] = {
    require(maxRows > 0, s"maxRows must be positive, got $maxRows")
    val remote = remoteSession(port)
    try {
      val rows = remote.sql(sql).limit(maxRows + 1).collect().toSeq
      if (rows.length > maxRows)
        throw new IllegalStateException(
          s"submitSql result exceeds maxRows=$maxRows; " +
            "add a LIMIT to the statement or raise maxRows deliberately")
      rows
    } finally remote.close()
  }

  /** A reusable remote session against the in-process service —
    * session state (temp views, confs) lives server-side per session,
    * exactly like a Livy interactive session. */
  def remoteSession(port: Int): org.apache.spark.sql.connect.SparkSession =
    org.apache.spark.sql.connect.SparkSession.builder()
      .remote(s"sc://localhost:$port")
      .create()
}
