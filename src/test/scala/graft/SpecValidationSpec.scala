package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/**
 * Port of the reference's spec-construction, build_from_tables error-path,
 * error-message-quality, and prepare_level_table batteries
 * (tests/test_hierarchical_packer.py:572-750, TestComposableLevels,
 * TestErrorMessages, TestPrepareLevelTable).
 */
class SpecValidationSpec extends SparkSpec {

  private def df(cols: (String, Seq[String])*) = {
    val schema = StructType(cols.map { case (n, _) => StructField(n, StringType) })
    val n = cols.head._2.size
    val rows = (0 until n).map(i => Row(cols.map(_._2(i)): _*))
    spark.createDataFrame(rows.asJava, schema)
  }

  test("spec construction validates names, arity, and root parent_keys " +
    "(reference test_from_levels_*)") {
    // valid 3-level chain with parent_keys
    val ok = HierarchySpec(Seq(
      LevelSpec("country", Seq(NamedField("code"))),
      LevelSpec("city", Seq(NamedField("id")), parentKeys = Seq("country_code")),
      LevelSpec("street", Seq(NamedField("name")), parentKeys = Seq("city_id"))))
    assert(ok.levelNames == Seq("country", "city", "street"))

    // parent_keys arity must match the parent's id arity
    val arity = intercept[IllegalArgumentException] {
      HierarchySpec(Seq(
        LevelSpec("parent", Seq(NamedField("id1"), NamedField("id2"))),
        LevelSpec("child", Seq(NamedField("id")), parentKeys = Seq("parent_id"))))
    }
    assert(arity.getMessage.contains("parent_keys"))

    // root level must not declare parent_keys
    val root = intercept[IllegalArgumentException] {
      HierarchySpec(Seq(LevelSpec("root", Seq(NamedField("id")), parentKeys = Seq("invalid"))))
    }
    assert(root.getMessage.toLowerCase.contains("root level"))

    // duplicate level names rejected
    val dup = intercept[IllegalArgumentException] {
      HierarchySpec(Seq(
        LevelSpec("a", Seq(NamedField("id"))), LevelSpec("a", Seq(NamedField("id")))))
    }
    assert(dup.getMessage.contains("duplicate"))

    // key_aliases accepted and preserved
    val aliased = HierarchySpec(
      Seq(LevelSpec("parent", Seq(NamedField("id")))),
      keyAliases = Map("parent.id" -> "parent.child.parent_id"))
    assert(aliased.keyAliases == Map("parent.id" -> "parent.child.parent_id"))
  }

  val pcSpec: HierarchySpec = HierarchySpec(Seq(
    LevelSpec("parent", Seq(NamedField("id"))),
    LevelSpec("child", Seq(NamedField("id")), parentKeys = Seq("parent_id"))))

  test("buildFromTables raises on a missing table for the target level " +
    "(reference test_build_from_tables_missing_table_raises)") {
    val p = new Packer(pcSpec)
    val e = intercept[HierarchyValidationError] {
      p.buildFromTables(Map("parent" -> df("id" -> Seq("p1"), "name" -> Seq("Parent 1"))),
        targetLevel = Some("child"))
    }
    assert(e.getMessage.contains("Missing table"))
  }

  test("buildFromTables raises when the child level lacks parent_keys " +
    "(reference test_build_from_tables_missing_parent_keys_raises)") {
    val spec = HierarchySpec(Seq(
      LevelSpec("parent", Seq(NamedField("id"))),
      LevelSpec("child", Seq(NamedField("id"))))) // no parentKeys
    val p = new Packer(spec)
    val e = intercept[HierarchyValidationError] {
      p.buildFromTables(Map(
        "parent" -> df("id" -> Seq("p1"), "name" -> Seq("Parent 1")),
        "child" -> df("id" -> Seq("c1"), "name" -> Seq("Child 1"), "parent_id" -> Seq("p1"))))
    }
    assert(e.getMessage.contains("parent_keys"))
  }

  test("buildFromTables with an empty table map raises") {
    val e = intercept[HierarchyValidationError] {
      new Packer(pcSpec).buildFromTables(Map.empty)
    }
    assert(e.getMessage.toLowerCase.contains("at least one table"))
  }

  test("HierarchyValidationError carries level context and details " +
    "(reference test_validation_error_includes_level, " +
    "test_hierarchical_packer.py:662-672)") {
    val e = new HierarchyValidationError("Test error message",
      level = Some("test_level"), details = Map("key" -> "value"))
    assert(e.getMessage.contains("[Level: test_level]"))
    assert(e.level.contains("test_level"))
    assert(e.details == Map("key" -> "value"))
    // and the level-less form renders the bare message
    assert(new HierarchyValidationError("bare").getMessage == "bare")
  }

  test("validate's raised error carries the level and per-key null counts " +
    "as structured details (reference error-context idiom)") {
    val p = new Packer(Fixtures.streamingSpec)
    val flat = Fixtures.streamingDf(spark)
      .withColumn("country.city.street.id",
        org.apache.spark.sql.functions.when(
          ColName.topCol("country.city.street.id") === "s0_0",
          org.apache.spark.sql.functions.lit(null))
          .otherwise(ColName.topCol("country.city.street.id")))
    val e = intercept[HierarchyValidationError](p.validate(flat, "street"))
    assert(e.level.contains("street"))
    assert(e.details.get("country.city.street.id").contains("1"))
    assert(e.getMessage.contains("[Level: street]"))
  }

  test("unknown-level errors name the level and list the known ones " +
    "(reference test_missing_level_error_is_descriptive)") {
    val spec = HierarchySpec(Seq(LevelSpec("known", Seq(NamedField("id")))))
    val e = intercept[HierarchyConfigError](spec.levelIndex("unknown"))
    assert(e.getMessage.contains("unknown") && e.getMessage.contains("known"))
  }

  test("prepareLevelTable adds the level prefix to every column " +
    "(reference test_prepare_level_table_adds_prefix)") {
    val p = new Packer(pcSpec)
    val prepared = p.prepareLevelTable("child",
      df("id" -> Seq("c1", "c2"), "name" -> Seq("Child 1", "Child 2"),
        "parent_id" -> Seq("p1", "p1")))
    assert(prepared.columns.toSet ==
      Set("parent.child.id", "parent.child.name", "parent.child.parent_id"))
  }

  test("prepareLevelTable applies the column mapping before prefixing " +
    "(reference test_prepare_level_table_with_column_mapping)") {
    val spec = HierarchySpec(Seq(LevelSpec("item", Seq(NamedField("id")))))
    val p = new Packer(spec)
    val prepared = p.prepareLevelTable("item",
      df("item_id" -> Seq("1", "2"), "item_name" -> Seq("A", "B")),
      columnMapping = Map("item_id" -> "id", "item_name" -> "name"))
    assert(prepared.columns.toSet == Set("item.id", "item.name"))
  }

  test("getLevelColumns returns id + required columns per level " +
    "(reference test_get_level_columns_returns_expected)") {
    val spec = HierarchySpec(Seq(
      LevelSpec("parent", Seq(NamedField("id")), requiredFields = Seq("name")),
      LevelSpec("child", Seq(NamedField("id"), NamedField("code")))))
    val p = new Packer(spec)
    val parentCols = p.getLevelColumns("parent")
    assert(parentCols.contains("parent.id") && parentCols.contains("parent.name"))
    val childCols = p.getLevelColumns("child")
    assert(childCols.contains("parent.child.id") && childCols.contains("parent.child.code"))
  }
}
