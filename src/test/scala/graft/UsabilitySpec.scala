package graft

import org.apache.spark.sql.types._

/**
 * Port of the reference's TestUsabilityHelpers battery
 * (tests/test_hierarchical_packer.py:1311-1525) on the SAME 5-level
 * apartment hierarchy (TEST_HIERARCHY, test_hierarchical_packer.py:20-29):
 * multi-key city level, key alias, required apartment id. One test per
 * reference test, cited by name. The Polars `.lazy()` / DataFrame-vs-schema
 * acceptance variants collapse to the schema form here (Spark frames are
 * lazy already and every helper takes a StructType).
 */
class UsabilitySpec extends SparkSpec {
  import Fixtures._

  private lazy val p = new Packer(apartmentSpec)
  private def s = apartmentSpec
  private def flat = apartmentDf(spark)

  // ---- properties: level_names / root_level / leaf_level (ref :1318-1325)

  test("level_names lists all five levels in order (ref test_level_names)") {
    assert(s.levelNames == Seq("country", "city", "street", "building", "apartment"))
  }

  test("root_level is country (ref test_root_level)") {
    assert(s.rootLevel == "country")
  }

  test("leaf_level is apartment (ref test_leaf_level)") {
    assert(s.leafLevel == "apartment")
  }

  // ---- ancestors / descendants (ref :1331-1358)

  test("ancestor levels of the root are empty (ref test_get_ancestor_levels_root_returns_empty)") {
    assert(s.ancestorLevels("country") == Nil)
  }

  test("ancestor levels of a middle level (ref test_get_ancestor_levels_middle)") {
    assert(s.ancestorLevels("street") == Seq("country", "city"))
  }

  test("ancestor levels of the leaf (ref test_get_ancestor_levels_leaf)") {
    assert(s.ancestorLevels("apartment") == Seq("country", "city", "street", "building"))
  }

  test("descendant levels of the leaf are empty (ref test_get_descendant_levels_leaf_returns_empty)") {
    assert(s.descendantLevels("apartment") == Nil)
  }

  test("descendant levels of a middle level (ref test_get_descendant_levels_middle)") {
    assert(s.descendantLevels("city") == Seq("street", "building", "apartment"))
  }

  test("descendant levels of the root (ref test_get_descendant_levels_root)") {
    assert(s.descendantLevels("country") == Seq("city", "street", "building", "apartment"))
  }

  test("unknown level raises and names the level (ref test_get_ancestor_levels_unknown_raises)") {
    val e = intercept[HierarchyConfigError](s.ancestorLevels("unknown"))
    assert(e.getMessage.contains("unknown"))
  }

  // ---- get_level_keys (ref :1364-1392)

  test("level keys, single-key root, short form (ref test_get_level_keys_short_root)") {
    assert(s.levelKeys("country", longForm = false) == Seq("code"))
  }

  test("level keys, multi-key level, short form (ref test_get_level_keys_short_multi_key)") {
    assert(s.levelKeys("city", longForm = false) == Seq("id", "name"))
  }

  test("level keys, long form (ref test_get_level_keys_long)") {
    assert(s.levelKeys("city") == Seq("country.city.id", "country.city.name"))
  }

  test("level keys with ancestors (ref test_get_level_keys_with_ancestors)") {
    assert(s.levelKeys("city", includeAncestors = true) ==
      Seq("country.code", "country.city.id", "country.city.name"))
  }

  test("ancestors force long form regardless of the form flag " +
    "(ref test_get_level_keys_ancestors_always_long_form)") {
    val dflt = s.levelKeys("city", includeAncestors = true)
    val short = s.levelKeys("city", includeAncestors = true, longForm = false)
    assert(dflt == short)
    assert(dflt.forall(_.contains(".")), "ancestor keys should be fully qualified")
  }

  test("leaf keys with ancestors span the whole path " +
    "(ref test_get_level_keys_leaf_with_ancestors)") {
    val keys = s.levelKeys("apartment", includeAncestors = true)
    assert(keys.contains("country.code"))
    assert(keys.contains("country.city.street.building.apartment.id"))
  }

  // ---- get_level_fields on the FLAT schema (ref :1398-1427)

  test("level fields, flat schema, short form (ref test_get_level_fields_flat_short)") {
    assert(p.getLevelFields("building", flat.schema).toSet == Set("number", "id"))
  }

  test("level fields, flat schema, long form (ref test_get_level_fields_flat_long)") {
    assert(p.getLevelFields("building", flat.schema, longForm = true).toSet ==
      Set("country.city.street.building.number", "country.city.street.building.id"))
  }

  test("level fields exclude child columns (ref test_get_level_fields_excludes_child_columns)") {
    val fields = p.getLevelFields("city", flat.schema)
    assert(fields.contains("id") && fields.contains("name"))
    assert(!fields.exists(_.contains("street")))
  }

  // ---- get_level_fields on the PACKED schema (ref :1433-1448)

  test("level fields on a packed schema, short form (ref test_get_level_fields_packed_short)") {
    val packed = p.pack(flat, "city")
    val fields = p.getLevelFields("city", packed.schema)
    assert(fields.contains("id") && fields.contains("name"))
    assert(!fields.contains("street"))
  }

  test("level fields on a packed schema, long form (ref test_get_level_fields_packed_long)") {
    val packed = p.pack(flat, "city")
    val fields = p.getLevelFields("city", packed.schema, longForm = true)
    assert(fields.contains("country.city.id") && fields.contains("country.city.name"))
    assert(!fields.exists(_.contains("street")))
  }

  // ---- infer_current_level (ref :1454-1477)

  test("flat apartment data infers the leaf level (ref test_infer_current_level_flat_is_leaf)") {
    assert(p.inferCurrentLevel(flat.schema) == "apartment")
  }

  test("packed to street infers city (ref test_infer_current_level_packed_to_street)") {
    assert(p.inferCurrentLevel(p.pack(flat, "street").schema) == "city")
  }

  test("packed to city infers country (ref test_infer_current_level_packed_to_city)") {
    assert(p.inferCurrentLevel(p.pack(flat, "city").schema) == "country")
  }

  test("packed to the root still infers country (ref test_infer_current_level_packed_to_country)") {
    assert(p.inferCurrentLevel(p.pack(flat, "country").schema) == "country")
  }

  // ---- get_level_schema (ref :1483-1501)

  test("level schema on the flat frame excludes children (ref test_get_level_schema_flat)") {
    val m = p.getLevelSchema("building", flat.schema).toMap
    assert(m.contains("number") && m.contains("id"))
    assert(!m.contains("apartment"))
  }

  test("level schema on a packed frame excludes the child struct " +
    "(ref test_get_level_schema_packed)") {
    val m = p.getLevelSchema("city", p.pack(flat, "city").schema).toMap
    assert(m.contains("id") && m.contains("name"))
    assert(!m.contains("street"))
  }

  test("level schema carries the column types (ref test_get_level_schema_returns_correct_types)") {
    val m = p.getLevelSchema("country", flat.schema).toMap
    assert(m("code") == StringType)
  }

  // ---- describe (ref :1507-1525)

  test("describe names every level (ref test_describe_contains_level_names)") {
    val desc = p.describe
    s.levelNames.foreach(n => assert(desc.contains(n), s"describe missing level $n"))
  }

  test("describe tags root and leaf (ref test_describe_contains_root_leaf_tags)") {
    val desc = p.describe
    assert(desc.contains("root") && desc.contains("leaf"))
  }

  test("describe states the separator (ref test_describe_contains_separator)") {
    assert(p.describe.contains("separator=\".\""))
  }

  test("describe lists the key names (ref test_describe_contains_key_names)") {
    val desc = p.describe
    assert(desc.contains("code"))   // country key
    assert(desc.contains("number")) // building key
  }
}
