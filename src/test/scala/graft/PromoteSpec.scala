package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/**
 * Port of the reference promote_attribute battery
 * (tests/test_hierarchical_packer.py:776-1005, TestPromoteAttribute).
 *
 * first/last follow input row order exactly like the reference: the packer
 * captures a per-row id up front (preserveChildOrder=true) and sorts child
 * lists by it, which makes "input order" distributed-safe.
 */
class PromoteSpec extends SparkSpec {

  val promoteSpec: HierarchySpec = HierarchySpec(Seq(
    LevelSpec("country", Seq(NamedField("code"))),
    LevelSpec("city", Seq(NamedField("id"))),
    LevelSpec("street", Seq(NamedField("name")))))

  lazy val packer = new Packer(promoteSpec)

  def promoteDf: DataFrame = {
    val schema = StructType(Seq(
      StructField("country.code", StringType),
      StructField("country.name", StringType),
      StructField("country.city.id", StringType),
      StructField("country.city.population", LongType),
      StructField("country.city.street.name", StringType),
      StructField("country.city.street.length_km", DoubleType)))
    val rows = Seq(
      Row("US", "United States", "NYC", 8000000L, "Broadway", 21.0),
      Row("US", "United States", "NYC", 8000000L, "5th Ave", 10.0),
      Row("US", "United States", "LA", 4000000L, "Sunset Blvd", 35.0),
      Row("CA", "Canada", "TOR", 3000000L, "Queen St", 5.0),
      Row("CA", "Canada", "TOR", 3000000L, "King St", 3.0))
    spark.createDataFrame(rows.asJava, schema)
  }

  private def col1[A](df: DataFrame, c: String): Seq[Any] =
    df.select(ColName.topCol(c)).collect().map(_.get(0)).toSeq

  private def byKey(df: DataFrame, key: String, value: String): Map[String, Any] =
    df.select(ColName.topCol(key), ColName.topCol(value)).collect()
      .map(r => r.getString(0) -> r.get(1)).toMap

  test("sum city to country (reference test_sum_city_to_country)") {
    val out = packer.promoteAttribute(promoteDf, "population",
      fromLevel = "city", toLevel = "country", agg = Agg.Sum)
    val vals = byKey(out, "country.code", "country.population")
    assert(vals("US") == 12000000.0 && vals("CA") == 3000000.0)
  }

  test("sum street to city (reference test_sum_street_to_city)") {
    val out = packer.promoteAttribute(promoteDf, "length_km",
      fromLevel = "street", toLevel = "city", agg = Agg.Sum)
    val vals = byKey(out, "country.city.id", "country.city.length_km")
    assert(vals("NYC") == 31.0 && vals("LA") == 35.0 && vals("TOR") == 8.0)
  }

  test("list aggregation collects child values (reference test_list_aggregation)") {
    val out = packer.promoteAttribute(promoteDf, "length_km",
      fromLevel = "street", toLevel = "city", agg = Agg.List)
    val nyc = byKey(out, "country.city.id", "country.city.length_km")("NYC")
    assert(nyc.asInstanceOf[scala.collection.Seq[Double]].sorted.toSeq == Seq(10.0, 21.0))
  }

  test("set aggregation with alias (reference test_set_aggregation)") {
    val out = packer.promoteAttribute(promoteDf, "id",
      fromLevel = "city", toLevel = "country", agg = Agg.Set, alias = Some("city_ids"))
    assert(out.columns.contains("country.city_ids"))
    val us = byKey(out, "country.code", "country.city_ids")("US")
    assert(us.asInstanceOf[scala.collection.Seq[String]].sorted.toSeq == Seq("LA", "NYC"))
  }

  test("mean aggregation (reference test_mean_aggregation)") {
    val out = packer.promoteAttribute(promoteDf, "length_km",
      fromLevel = "street", toLevel = "city", agg = Agg.Mean)
    assert(byKey(out, "country.city.id", "country.city.length_km")("NYC") == 15.5)
  }

  test("min and max (reference test_min_max)") {
    val mn = packer.promoteAttribute(promoteDf, "length_km",
      fromLevel = "street", toLevel = "city", agg = Agg.Min)
    val mx = packer.promoteAttribute(promoteDf, "length_km",
      fromLevel = "street", toLevel = "city", agg = Agg.Max)
    assert(byKey(mn, "country.city.id", "country.city.length_km")("NYC") == 10.0)
    assert(byKey(mx, "country.city.id", "country.city.length_km")("NYC") == 21.0)
  }

  test("count aggregation (reference test_count_aggregation)") {
    val out = packer.promoteAttribute(promoteDf, "length_km",
      fromLevel = "street", toLevel = "city", agg = Agg.Count)
    assert(byKey(out, "country.city.id", "country.city.length_km")("NYC") == 2L)
  }

  test("first/last with alias follow input row order (reference test_first_last)") {
    val f = packer.promoteAttribute(promoteDf, "name",
      fromLevel = "street", toLevel = "city", agg = Agg.First, alias = Some("first_street"))
    val l = packer.promoteAttribute(promoteDf, "name",
      fromLevel = "street", toLevel = "city", agg = Agg.Last, alias = Some("last_street"))
    assert(byKey(f, "country.city.id", "country.city.first_street")("NYC") == "Broadway")
    assert(byKey(l, "country.city.id", "country.city.last_street")("NYC") == "5th Ave")
  }

  test("single returns the uniform value (reference test_single_uniform)") {
    val schema = StructType(Seq(
      StructField("country.code", StringType),
      StructField("country.city.id", StringType),
      StructField("country.city.currency", StringType),
      StructField("country.city.street.name", StringType),
      StructField("country.city.street.length_km", DoubleType)))
    val df = spark.createDataFrame(Seq(
      Row("US", "NYC", "USD", "Broadway", 21.0),
      Row("US", "LA", "USD", "Sunset", 35.0)).asJava, schema)
    val out = packer.promoteAttribute(df, "currency",
      fromLevel = "city", toLevel = "country", agg = Agg.Single)
    assert(col1(out, "country.currency") == Seq("USD"))
  }

  test("single on non-uniform values returns one of them (reference test_single_non_uniform)") {
    val out = packer.promoteAttribute(promoteDf, "population",
      fromLevel = "city", toLevel = "country", agg = Agg.Single)
    val us = byKey(out, "country.code", "country.population")("US")
    assert(us == 8000000L || us == 4000000L)
  }

  test("custom alias names the output column (reference test_alias_parameter)") {
    val out = packer.promoteAttribute(promoteDf, "length_km",
      fromLevel = "street", toLevel = "city", agg = Agg.Sum,
      alias = Some("total_street_length"))
    assert(out.columns.contains("country.city.total_street_length"))
  }

  test("invalid direction raises (reference test_invalid_direction_raises)") {
    val e = intercept[HierarchyConfigError] {
      packer.promoteAttribute(promoteDf, "code",
        fromLevel = "country", toLevel = "city", agg = Agg.List)
    }
    assert(e.getMessage.contains("immediate child"))
  }

  test("non-adjacent levels raise (reference test_non_adjacent_levels_raises)") {
    val e = intercept[HierarchyConfigError] {
      packer.promoteAttribute(promoteDf, "length_km",
        fromLevel = "street", toLevel = "country", agg = Agg.Sum)
    }
    assert(e.getMessage.contains("immediate child"))
  }

  test("missing attribute raises with available fields (reference test_missing_attribute_raises)") {
    val e = intercept[HierarchyConfigError] {
      packer.promoteAttribute(promoteDf, "nonexistent",
        fromLevel = "street", toLevel = "city", agg = Agg.Sum)
    }
    assert(e.getMessage.contains("not found"))
  }

  test("works on an already-packed frame (reference test_from_packed_frame)") {
    val packed = packer.pack(promoteDf, "city")
    val out = packer.promoteAttribute(packed, "population",
      fromLevel = "city", toLevel = "country", agg = Agg.Sum)
    assert(out.columns.contains("country.population"))
    val vals = byKey(out, "country.code", "country.population")
    assert(vals("US") == 12000000.0 && vals("CA") == 3000000.0)
  }

  test("enrich adds multiple attribute columns at once (reference test_multiple_specs)") {
    val packed = packer.pack(promoteDf, "city")
    val out = packer.enrich(packed, "country",
      LevelAttribute("id", "city", Agg.Count, alias = Some("city_count")),
      LevelAttribute("population", "city", Agg.Sum, alias = Some("total_pop")))
    assert(out.columns.contains("country.city_count"))
    assert(out.columns.contains("country.total_pop"))
    val counts = byKey(out, "country.code", "country.city_count")
    val pops = byKey(out, "country.code", "country.total_pop")
    assert(counts("US") == 2L && counts("CA") == 1L)
    assert(pops("US") == 12000000.0 && pops("CA") == 3000000.0)
  }

  test("enrich same-level attribute access via single (reference test_same_level_spec)") {
    val packed = packer.pack(promoteDf, "city")
    val out = packer.enrich(packed, "country",
      LevelAttribute("name", "country", Agg.Single, alias = Some("cname")))
    assert(out.columns.contains("country.cname"))
    val names = byKey(out, "country.code", "country.cname")
    assert(names("US") == "United States" && names("CA") == "Canada")
  }

  test("enrich default alias is the attribute name (reference test_default_alias)") {
    val packed = packer.pack(promoteDf, "city")
    val out = packer.enrich(packed, "country",
      LevelAttribute("population", "city", Agg.Sum))
    assert(out.columns.contains("country.population"))
    val pops = byKey(out, "country.code", "country.population")
    assert(pops("US") == 12000000.0 && pops("CA") == 3000000.0)
  }
}
