package graft

import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Fail-fast gate: pin the fixture schemas and ANALYZE every declared
  * query before anything executes.
  *
  * Motivation (round 5): the driver regenerated the fixture parquet
  * between rounds and flipped `events.ts` from TIMESTAMP(NANOS) to
  * TIMESTAMP_NTZ. Five queries started failing analysis with
  * DATATYPE_MISMATCH — caught only by the full execution smoke after
  * minutes of suite time, and invisible in the driver's correctness
  * artifact. This spec catches the same class of drift in seconds:
  *
  *  - the schema pin names the drifted column/encoding precisely, and
  *  - the analysis sweep (`queryExecution.analyzed`, no job run)
  *    covers every cheap-construction query in one pass.
  *
  * Construction-heavy queries (ml fits, CC loops, streaming replays —
  * the [[PlanAuditSpec]] exclusion list) genuinely execute when built,
  * so they stay with the execution smoke; their INPUTS are still
  * covered here via the schema pin.
  *
  * Named to sort first among the suites (sequential sbt test runs
  * suites in name order), so a fixture regeneration breaks the run in
  * its first seconds, loudly, with the drift named.
  */
class AnalysisSmokeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("fixture schemas are pinned (timestamp encoding drift breaks HERE)") {
    val t = sf001
    // every declared event-time column's raw encoding must be one of
    // the three known flavors (round 5 flipped events.ts; o_orderdate
    // and l_shipdate can drift the same way on any regeneration)...
    for ((table, c) <- Seq("events" -> "ts", "orders" -> "o_orderdate",
        "lineitem" -> "l_shipdate")) {
      val raw = spark.read.parquet(s"$dir/$table.parquet").schema(c).dataType
      assert(Set[DataType](TimestampType, TimestampNTZType, LongType).contains(raw),
        s"$table.$c arrived in an UNKNOWN parquet encoding: $raw — " +
          "extend Tables.normalizeAllTs before anything else this round")
    }
    // ...and the Tables boundary must normalize every flavor of every
    // column to TIMESTAMP (the schema-driven sweep, not per-column code)
    assert(t.events.schema("ts").dataType == TimestampType,
      s"Tables.events.ts not normalized: ${t.events.schema("ts").dataType}")
    // column-name/type pin for every fixture table the queries read;
    // a regenerated fixture with a renamed/retyped column names itself
    val expect = Map(
      "events" -> "event_id:bigint,ts:timestamp,user_id:bigint,event_type:string,value:double,props:string",
      "documents" -> "doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint",
      "embeddings" -> "vec_id:bigint,embedding:array<float>,label:int",
      "lineitem" -> ("l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint,l_linenumber:int," +
        "l_quantity:double,l_extendedprice:double,l_discount:double,l_tax:double," +
        "l_returnflag:string,l_linestatus:string,l_shipdate:timestamp"),
      "orders" -> ("o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string,o_totalprice:double," +
        "o_orderdate:timestamp,o_orderpriority:string"))
    val tables = Map[String, org.apache.spark.sql.DataFrame](
      "events" -> t.events, "documents" -> t.documents,
      "embeddings" -> t.embeddings, "lineitem" -> t.lineitem,
      "orders" -> t.orders)
    expect.foreach { case (name, want) =>
      val got = tables(name).schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
      assert(got == want, s"$name schema drifted:\n  got  $got\n  want $want")
    }
  }

  test("a re-encoded fixture table normalizes without per-column code") {
    // simulate the exact drift class that cost round 5: rewrite orders
    // with o_orderdate as TIMESTAMP_NTZ into a scratch fixture dir and
    // read it back through the Tables boundary — the schema sweep must
    // normalize it with no hand-placed normalize call for the column
    import org.apache.spark.sql.functions.{col, sum, unix_micros}
    val tmp = java.nio.file.Files.createTempDirectory("graft-drift").toString
    val orig = spark.read.parquet(s"$dir/orders.parquet")
    orig.withColumn("o_orderdate", col("o_orderdate").cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val got = Tables(spark, tmp).orders
    assert(got.schema("o_orderdate").dataType == TimestampType,
      s"NTZ-drifted o_orderdate not normalized: ${got.schema("o_orderdate").dataType}")
    // instants preserved, not just the type: checksum of epoch-micros
    val want = Tables(spark, dir).orders
      .agg(sum(unix_micros(col("o_orderdate")))).head.getLong(0)
    assert(got.agg(sum(unix_micros(col("o_orderdate")))).head.getLong(0) == want,
      "normalization changed instants")
    Tables.deleteRec(new java.io.File(tmp))
  }

  test("twins.json invariant: rows-only queries <-> hash-checked twins") {
    // keys are EXACTLY the queries with no oracle (a new no_oracle
    // query without a declared twin breaks here), and every twin/gate
    // itself carries an oracle
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(SparkEntry.twins.keySet == noOracle,
      s"twins keys != no-oracle queries:\n  twins-only ${SparkEntry.twins.keySet -- noOracle}" +
        s"\n  uncovered  ${noOracle -- SparkEntry.twins.keySet}")
    SparkEntry.twins.foreach { case (k, (twin, _)) =>
      assert(SparkEntry.oracleSql.contains(twin),
        s"$k's declared twin $twin has no oracle itself")
    }
  }

  test("every cheap-construction query ANALYZES against the fixture") {
    // resolution + type checking only — no job runs, so the whole
    // inventory is covered in seconds and a DATATYPE_MISMATCH or
    // unresolved column fails HERE, first, named
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(PlanAuditSpec.constructionHeavy)
      .flatMap { name =>
        try { SparkEntry.queries(name)(spark, dir).queryExecution.analyzed; None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(200)}") }
      }
    assert(offenders.isEmpty,
      s"${offenders.size} queries fail ANALYSIS:\n${offenders.mkString("\n")}")
  }
}
