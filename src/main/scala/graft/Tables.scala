package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed access to the driver-generated fixture tables
  * (`/root/testdata/<sf>/<table>.parquet`, schemas in FIXTURES.md §B).
  *
  * Each accessor is a fresh logical scan — Catalyst prunes columns and
  * pushes filters down to the parquet reader per query, so there is no
  * benefit (and a pruning penalty) to caching these eagerly. At cluster
  * scale the same code reads a partitioned table directory unchanged.
  *
  * Scan parallelism: the fixture files are each written as ONE parquet
  * row group, so a scan yields a single input split no matter the row
  * count — every downstream per-row expression (md5, shingles, cosine,
  * even lineitem aggregation map sides) would serialize on one core. A
  * production lake table arrives in many files/row groups and
  * parallelizes for free. To give local[n] that cluster-scan shape,
  * the non-dimension tables are rewritten ONCE per fixture dir into a
  * multi-file copy under `target/tblcache` (a few MB, built on first
  * access, shared by every query/session/JVM afterwards) — the
  * file-layout fix you would apply to the source table itself at
  * scale, rather than paying a per-query repartition exchange.
  */
final case class Tables(spark: SparkSession, dir: String) {
  // Make graft's native expressions (simhash64, cosine_sim) available
  // to any query built over these tables.
  graft.expr.GraftFunctions.register(spark)

  /** Every accessor reads through [[Tables.normalizeAllTs]]: whatever
    * physical timestamp encoding the fixture generator used this round
    * — the generator has already shipped TIMESTAMP(NANOS) (rounds 1–4)
    * and TIMESTAMP_NTZ micros (round 5+), and a real lake mixes all of
    * them across tables — downstream operators see one TIMESTAMP type.
    * The sweep is schema-driven, not per-column-by-hand: round 5 lost
    * five queries to a regeneration that flipped only `events.ts`, and
    * `orders.o_orderdate` / `lineitem.l_shipdate` carry the same risk. */
  private def t(name: String): DataFrame =
    Tables.normalizeAllTs(spark.read.parquet(s"$dir/$name.parquet"))

  /** Read through the multi-file layout cache (built on first use). */
  private def tp(name: String): DataFrame =
    Tables.normalizeAllTs(spark.read.parquet(Tables.parallelLayout(spark, dir, name)))

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def supplier: DataFrame   = t("supplier")
  def customer: DataFrame   = tp("customer")
  def part: DataFrame       = tp("part")
  def orders: DataFrame     = tp("orders")
  def lineitem: DataFrame   = tp("lineitem")
  def events: DataFrame     = tp("events")
  def documents: DataFrame  = tp("documents")
  def embeddings: DataFrame = tp("embeddings")
}

object Tables {

  /** Columns FIXTURES.md declares as event time (`events.ts`,
    * `orders.o_orderdate`, `lineitem.l_shipdate`). A `LongType` column
    * is reinterpreted as raw TIMESTAMP(NANOS) only for these names —
    * every other bigint (keys, counts) must pass through untouched. */
  private[graft] val TsColumns = Set("ts", "o_orderdate", "l_shipdate")

  /** Normalize EVERY timestamp-like column of a frame to TIMESTAMP,
    * whichever of the three encodings Spark surfaced from the parquet
    * footer:
    *  - `TimestampNTZType` — isAdjustedToUTC=0 micros; reinterpreted
    *    under the session zone (pinned UTC), matching DuckDB's naive
    *    TIMESTAMP semantics over the same file. Swept by TYPE, so any
    *    NTZ column of any table normalizes with no per-column code.
    *  - `LongType` with a [[TsColumns]] name — TIMESTAMP(NANOS) read
    *    under the `nanosAsLong` legacy conf (set once at session build
    *    by every graft entry point); truncated to micros, the same
    *    truncation DuckDB applies casting TIMESTAMP_NS → TIMESTAMP.
    *    (The parquet logical type is erased to a bare bigint by that
    *    conf, so this leg is name-gated rather than type-swept.)
    *  - `TimestampType` — already canonical; untouched.
    * One projection, no shuffle; Catalyst folds the cast into the
    * scan, so normalized columns still prune and push down. A frame
    * with nothing to normalize is returned as-is (zero plan delta). */
  private[graft] def normalizeAllTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case TimestampNTZType =>
          d.withColumn(f.name, col(f.name).cast(TimestampType))
        case LongType if TsColumns(f.name) =>
          d.withColumn(f.name, expr(s"timestamp_micros(${f.name} div 1000)"))
        case _ => d
      }
    }
  }

  /** Tables large enough that a serial scan hurts; dims stay as-is. */
  private[graft] val BigTables =
    Seq("customer", "part", "orders", "lineitem", "events", "documents", "embeddings")

  private val CacheFiles = 32
  private val buildLock = new Object

  /** Force-build the layout cache for every big table of a fixture dir
    * (used by Bench warm-up so no measured query pays the one-time
    * rewrite). */
  def warmLayout(spark: SparkSession, dir: String): Unit =
    BigTables.foreach(parallelLayout(spark, dir, _))

  /** Path of the multi-file copy of `dir/name.parquet`, building it on
    * first access. Thread-safe (JVM lock) AND process-safe: builders
    * serialize on an OS file lock, so exactly one process ever writes
    * or clears a given dest — a completed (_SUCCESS-marked) copy can
    * never be deleted out from under a concurrent reader, and debris
    * from a crashed writer is cleared only while holding the lock. */
  def parallelLayout(spark: SparkSession, dir: String, name: String): String = {
    // the source file's (length, mtime-millis, head-64KiB hash) is the
    // cache key: if a fixture parquet is regenerated in place, later
    // JVMs rebuild instead of silently reading the stale copy. The
    // content sample guards the (rare but real) case of a regeneration
    // with identical length inside mtime resolution. NOTE: in-place
    // regeneration still invalidates any CONCURRENT reader of the old
    // copy (its superseded fingerprint dir is swept by the next
    // builder) — regenerate fixtures only between runs.
    val src = new java.io.File(s"$dir/$name.parquet")
    // a table that is ALREADY a multi-file directory (production lake
    // layout; tools.ScaleUp output) parallelizes as-is — no rewrite
    if (src.isDirectory) return src.getPath
    val headHash: Long = {
      val in = new java.io.FileInputStream(src)
      try {
        val buf = new Array[Byte](65536)
        var h = 1469598103934665603L // FNV-1a 64
        // read until 64 KiB or EOF: a single read() may legally return
        // short, and a fingerprint that depends on read chunking would
        // differ across JVMs — letting one JVM's stale-sweep delete a
        // dir another JVM (with a different fp for the same file) is
        // still reading
        var off = 0
        var n = in.read(buf, off, buf.length - off)
        while (n > 0) {
          var i = off
          while (i < off + n) { h = (h ^ (buf(i) & 0xffL)) * 1099511628211L; i += 1 }
          off += n
          n = if (off < buf.length) in.read(buf, off, buf.length - off) else -1
        }
        h
      } finally in.close()
    }
    val fp = java.lang.Long.toHexString(
      (src.length() * 31L + src.lastModified()) * 31L + headHash)
    val dest = new java.io.File(
      "target/tblcache/" + dir.replace('/', '_') + "/" + name + "-" + fp)
    def done = new java.io.File(dest, "_SUCCESS").exists()
    if (!done) buildLock.synchronized {
      if (!done) {
        dest.getParentFile.mkdirs()
        // TABLE-wide lock (not per-fingerprint): also serializes the
        // stale-version sweep below against concurrent builders
        val ch = java.nio.channels.FileChannel.open(
          new java.io.File(dest.getParentFile, name + ".lock").toPath,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        val lock = ch.lock() // blocks until exclusive across processes
        try {
          if (!done) {
            // a TIMESTAMP(NANOS) fixture reads as raw long nanos under
            // the `nanosAsLong` conf (set at session build, not here —
            // Tables never mutates shared session conf), so the
            // rewrite is lossless; `events` normalizes after read
            val raw = spark.read.parquet(s"$dir/$name.parquet")
            val tmp = new java.io.File(
              dest.getPath + ".tmp-" + ProcessHandle.current().pid())
            raw.repartition(CacheFiles).write.mode("overwrite").parquet(tmp.getPath)
            // lock held: anything at dest is crashed-writer debris,
            // and sibling fingerprints are superseded versions of THIS
            // table (regenerated fixtures) — sweep both so the cache
            // holds one copy per table, not one per regeneration
            // `(-[0-9a-f]+)?` also reclaims pre-fingerprint bare-name
            // dirs from older builds; the live table lock (bare
            // `name.lock`, held right now) is explicitly excluded —
            // deleting it would let a concurrent process lock a fresh
            // inode and break mutual exclusion
            val stale = ("^" + java.util.regex.Pattern.quote(name) +
              "(-[0-9a-f]+)?(\\.lock|\\.tmp-\\d+)?$").r
            Option(dest.getParentFile.listFiles()).foreach(_.foreach { f =>
              if (stale.findFirstIn(f.getName).isDefined &&
                  f.getName != tmp.getName && f.getName != name + ".lock")
                deleteRec(f)
            })
            if (!tmp.renameTo(dest))
              throw new java.io.IOException(
                s"could not publish table layout cache ${dest.getPath}")
          }
        } finally {
          lock.release()
          ch.close()
        }
      }
    }
    dest.getPath
  }

  /** Recursive delete (shared by the layout cache, the bucketed-table
    * writer, and the replay checkpoint cleanup). */
  private[graft] def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete(): Unit
  }
}
