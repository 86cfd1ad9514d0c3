package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Direct unit coverage for the metadata/discovery/validation surface
  * (M1-M9) — complementing the oracle queries that exercise them
  * end-to-end. */
class MetaSpec extends AnyFunSuite with SparkSpec {

  private val p = new Packer(Fixtures.streamingSpec)

  test("level names, root/leaf, ancestors and descendants (M1/M2)") {
    val s = Fixtures.streamingSpec
    assert(s.levelNames == Seq("country", "city", "street"))
    assert(s.rootLevel == "country" && s.leafLevel == "street")
    assert(s.ancestorLevels("street") == Seq("country", "city"))
    assert(s.ancestorLevels("country") == Nil)
    assert(s.descendantLevels("country") == Seq("city", "street"))
    assert(s.descendantLevels("street") == Nil)
    assertThrows[HierarchyConfigError](s.levelIndex("nope"))
    assert(s.nextLevel("country").map(_.name).contains("city"))
    assert(s.nextLevel("street").isEmpty)
  }

  test("getLevelColumns returns qualified id + required columns") {
    val ap = new Packer(Fixtures.apartmentSpec)
    assert(ap.getLevelColumns("apartment") ==
      Seq("country.city.street.building.apartment.id",
        "country.city.street.building.apartment.id"))
    assert(p.getLevelColumns("city") == Seq("country.city.id"))
  }

  test("levelKeys short/long forms; ancestors force long form (M3)") {
    val s = Fixtures.streamingSpec
    assert(s.levelKeys("city") == Seq("country.city.id"))
    assert(s.levelKeys("city", longForm = false) == Seq("id"))
    assert(s.levelKeys("street", includeAncestors = true) ==
      Seq("country.id", "country.city.id", "country.city.street.id"))
  }

  test("getLevelFields/getLevelSchema on flat AND packed schemas (M4)") {
    val flat = Fixtures.streamingDf(spark)
    assert(p.getLevelFields("city", flat.schema).toSet == Set("id", "country_id"))
    assert(p.getLevelFields("city", flat.schema, longForm = true).toSet ==
      Set("country.city.id", "country.city.country_id"))
    val packed = p.pack(flat, "street")
    // packed: street is an Array[Struct] column; city fields stay flat
    assert(p.getLevelFields("street", packed.schema).toSet == Set("id", "city_id"))
    assert(p.getLevelSchema("street", packed.schema).toMap.apply("id") == StringType)
    // child level names are excluded from the parent's field list
    assert(!p.getLevelFields("city", packed.schema).contains("street"))
  }

  test("inferCurrentLevel across packing states (M5)") {
    val flat = Fixtures.streamingDf(spark)
    assert(p.inferCurrentLevel(flat.schema) == "street")
    assert(p.inferCurrentLevel(p.pack(flat, "street").schema) == "city")
    assert(p.inferCurrentLevel(p.pack(flat, "city").schema) == "country")
    assert(p.inferCurrentLevel(p.pack(flat, "country").schema) == "country")
    val junk = StructType(Seq(StructField("unrelated", LongType)))
    assertThrows[HierarchyError](p.inferCurrentLevel(junk))
  }

  test("describe names every level with keys and paths (M6)") {
    val text = p.describe
    assert(text.contains("Levels (3)"))
    for (l <- Seq("country", "city", "street")) assert(text.contains(l))
    assert(text.contains("root") && text.contains("leaf"))
    assert(text.contains("country.city.street"))
  }

  test("validateSchema flags missing key fields in packed structs (M9)") {
    val flat = Fixtures.streamingDf(spark)
    val ok = p.validateSchema(p.pack(flat, "street").schema, Some("city"))
    assert(ok.isCompatible && ok.errors.isEmpty)
    assert(ok.presentLevels.toSet == Set("country", "city", "street"))

    // drop the street id INSIDE the packed struct → structural error
    val broken = p.pack(flat, "street").withColumn("country.city.street",
      transform(ColName.topCol("country.city.street"),
        x => struct(x.getField("city_id").alias("city_id"))))
    val res = p.validateSchema(broken.schema)
    assert(!res.isCompatible)
    assert(res.errors.exists(_.contains("missing expected key fields: id")))

    // wrong expected level → error
    val lvl = p.validateSchema(p.pack(flat, "street").schema, Some("street"))
    assert(lvl.errors.exists(_.contains("inferred level is 'city'")))
  }

  test("discoverLevels: flat schema gives depths, paths, parents; nothing packed") {
    val schema = StructType(Seq(
      StructField("country.id", LongType),
      StructField("country.name", StringType),
      StructField("country.city.id", LongType),
      StructField("country.city.street.id", LongType),
      StructField("country.city.street.name", StringType),
      StructField("loose_scalar", LongType))) // non-hierarchical, ignored
    val d = Discovery.discoverLevels(schema)
    assert(d.map(_.path) == Seq("country", "country.city", "country.city.street"))
    assert(d.map(_.depth) == Seq(0, 1, 2))
    assert(d.map(_.parent) == Seq(None, Some("country"), Some("city")))
    assert(d.forall(!_.isPacked))
    assert(d.head.fields == Seq("id", "name"))
    assert(d.last.fields == Seq("id", "name"))
  }

  test("discoverLevels: packed and partially packed schemas mark isPacked") {
    val packedStreet = ArrayType(StructType(Seq(
      StructField("id", LongType), StructField("name", StringType))))
    val partial = StructType(Seq(
      StructField("country.id", LongType),
      StructField("country.city.id", LongType),
      StructField("country.city.street", packedStreet)))
    val d = Discovery.discoverLevels(partial)
    assert(d.map(l => l.name -> l.isPacked) ==
      Seq("country" -> false, "city" -> false, "street" -> true))
    // fully packed from the root: one top-level struct column
    val full = StructType(Seq(StructField("country", StructType(Seq(
      StructField("id", LongType),
      StructField("city", ArrayType(StructType(Seq(
        StructField("id", LongType),
        StructField("street", packedStreet))))))))))
    val d2 = Discovery.discoverLevels(full)
    assert(d2.map(l => l.name -> l.isPacked) ==
      Seq("country" -> true, "city" -> true, "street" -> true))
    assert(d2.map(_.depth) == Seq(0, 1, 2))
  }

  test("discoverLevels: sibling branches, custom separator, intermediate backfill") {
    val siblings = StructType(Seq(
      StructField("org.team.id", LongType),
      StructField("org.site.id", LongType))) // two branches under org
    val d = Discovery.discoverLevels(siblings)
    assert(d.map(_.path).toSet == Set("org", "org.site", "org.team"))
    assert(d.filter(_.depth == 1).flatMap(_.parent).toSet == Set("org"))
    // "org" itself has no direct fields — backfilled as an intermediate
    assert(d.find(_.path == "org").get.fields.isEmpty)
    val slash = Discovery.discoverLevels(
      StructType(Seq(StructField("a/b/c", LongType))), ColName("/"))
    assert(slash.map(_.path) == Seq("a", "a/b"))
    assert(slash.last.fields == Seq("c"))
  }

  test("discoverLevels: empty and non-hierarchical schemas yield no levels") {
    assert(Discovery.discoverLevels(StructType(Nil)).isEmpty)
    assert(Discovery.discoverLevels(StructType(Seq(
      StructField("x", LongType), StructField("y", StringType)))).isEmpty)
  }

  test("validateSchema: no hierarchy columns at all is incompatible") {
    val res = p.validateSchema(StructType(Seq(StructField("unrelated", LongType))))
    assert(!res.isCompatible)
    assert(res.presentLevels.isEmpty)
    assert(res.missingLevels == Seq("country", "city", "street"))
    assert(res.errors.exists(_.contains("No hierarchy levels found")))
    // present/missing partition the level set (reference: disjointness test)
    assert(res.presentLevels.toSet.intersect(res.missingLevels.toSet).isEmpty)
  }

  test("validateSchema: expected-level mismatch and non-scalar keys are errors") {
    val flat = Fixtures.streamingDf(spark)
    val mism = p.validateSchema(flat.schema, Some("city"))
    assert(!mism.isCompatible)
    assert(mism.errors.exists(_.contains("inferred level is")))
    val badType = StructType(Seq(
      StructField("country.id", ArrayType(LongType)), // key must be scalar
      StructField("country.city.id", LongType),
      StructField("country.city.street.id", LongType)))
    val res = p.validateSchema(badType)
    assert(!res.isCompatible)
    assert(res.errors.exists(e => e.contains("country.id") && e.contains("scalar")))
  }

  test("validate counts nulls per key in one pass; raises when asked (M8)") {
    val flat = Fixtures.streamingDf(spark)
      .withColumn("country.city.street.id",
        when(ColName.topCol("country.city.street.id") === "s0_0", lit(null))
          .otherwise(ColName.topCol("country.city.street.id")))
    val counts = p.validate(flat, "street", raiseOnError = false)
    assert(counts("country.city.street.id") == 1L)
    assert(counts("country.id") == 0L)
    assertThrows[HierarchyValidationError](p.validate(flat, "street"))
  }
}
