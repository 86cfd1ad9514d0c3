package graft

import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** Pins the PHYSICAL schemas of the driver-generated testdata tables
  * (TESTDATA.md). Round 5's gate-breaker was a driver-side regeneration the
  * builder couldn't see (`events.ts` int64-nanos → TIMESTAMP_MICROS): this
  * spec reads the real parquet footers and fails with a one-line diagnosis
  * naming the drifted column/type, so the NEXT regeneration surfaces as a
  * red test instead of three silently-erroring queries. */
class TestdataContractSpec extends AnyFunSuite with SparkSpec {

  /** Expected Spark-side schema per table, as `name:simpleString` pairs.
    * timestamp[us] with isAdjustedToUTC=false reads as timestamp_ntz under
    * Spark 4's default inferTimestampNTZ. */
  val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double", "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int", "l_quantity" -> "double",
      "l_extendedprice" -> "double", "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp_ntz",
      "user_id" -> "bigint", "event_type" -> "string", "value" -> "double",
      "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint", "embedding" -> "array<float>",
      "label" -> "int"))

  /** One-line drift diagnosis, or None when `actual` matches. */
  def diagnose(table: String, exp: Seq[(String, String)],
               actual: StructType): Option[String] = {
    val act = actual.fields.map(f => f.name -> f.dataType.simpleString).toSeq
    if (act == exp) None
    else {
      val actM = act.toMap
      val expM = exp.toMap
      val missing = exp.collect { case (n, _) if !actM.contains(n) => n }
      val extra = act.collect { case (n, _) if !expM.contains(n) => n }
      val drifted = exp.collect {
        case (n, t) if actM.get(n).exists(_ != t) => s"$n: expected $t, got ${actM(n)}"
      }
      val order = if (missing.isEmpty && extra.isEmpty && drifted.isEmpty)
        Seq(s"column order changed: ${act.map(_._1).mkString(",")}") else Nil
      Some(s"testdata drift in `$table`: " + (
        drifted ++ missing.map(n => s"$n: missing") ++
          extra.map(n => s"$n: unexpected") ++ order).mkString("; "))
    }
  }

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"$sf physical schemas match TESTDATA.md contract") {
      val dir = s"/root/testdata/$sf"
      assume(new java.io.File(dir).isDirectory, s"$dir not present")
      val problems = expected.toSeq.sortBy(_._1).flatMap { case (t, exp) =>
        diagnose(t, exp, spark.read.parquet(s"$dir/$t.parquet").schema)
      }
      assert(problems.isEmpty, problems.mkString("\n"))
    }
  }

  test("diagnose names the drifted column/type under a synthetic drift") {
    // simulate the exact round-5 regression: ts changes physical type
    val out = "target/tmp/drift_events"
    spark.range(10).selectExpr("id AS event_id", "id AS ts", "id AS user_id",
      "'x' AS event_type", "CAST(id AS DOUBLE) AS value", "'{}' AS props")
      .write.mode("overwrite").parquet(out)
    val msg = diagnose("events", expected("events"),
      spark.read.parquet(out).schema)
    assert(msg.isDefined)
    assert(msg.get.contains("ts: expected timestamp_ntz, got bigint"), msg.get)
  }
}
