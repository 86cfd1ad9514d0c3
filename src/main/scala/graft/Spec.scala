package graft

import org.apache.spark.sql.Column

/** Errors mirroring the reference's exception taxonomy
  * (nexpresso/hierarchical_packer.py:84-119). */
class HierarchyError(msg: String) extends RuntimeException(msg)
class HierarchyConfigError(msg: String) extends HierarchyError(msg)

/** Validation failure with optional level context and structured details —
  * the reference renders the level as a `[Level: x]` suffix
  * (hierarchical_packer.py:93-109; tests/test_hierarchical_packer.py:662-672). */
class HierarchyValidationError(
    msg: String,
    val level: Option[String] = None,
    val details: Map[String, String] = Map.empty)
  extends HierarchyError(level.fold(msg)(l => s"$msg [Level: $l]"))

class SchemaValidationError(msg: String) extends HierarchyError(msg)

/** A field used as (part of) a level id: either a plain column name or a
  * computed expression with an explicit alias (reference: expression-valued
  * id_fields require `.alias()`, hierarchical_packer.py:2550-2569). */
sealed trait IdField { def name: String }
final case class NamedField(name: String) extends IdField
final case class ComputedField(name: String, expr: Column) extends IdField

object IdField {
  import scala.language.implicitConversions
  implicit def fromString(s: String): IdField = NamedField(s)
}

/**
 * One level of a hierarchy (reference: LevelSpec,
 * hierarchical_packer.py:122-150).
 *
 * @param name           level name (un-prefixed)
 * @param idFields       fields identifying a row of this level
 * @param requiredFields fields that must be non-null for a row to be a real
 *                       member of the level (used by splitLevels)
 * @param orderBy        columns (referencing flat, fully-prefixed names)
 *                       ordering this level's rows inside its parent's list
 * @param parentKeys     this level's columns referencing the parent's
 *                       idFields (for relational build); same arity as the
 *                       parent's idFields
 */
final case class LevelSpec(
    name: String,
    idFields: Seq[IdField],
    requiredFields: Seq[String] = Nil,
    orderBy: Seq[Column] = Nil,
    parentKeys: Seq[String] = Nil) {
  require(name.nonEmpty, "level name must be non-empty")
  require(idFields.nonEmpty, s"level '$name' needs at least one id field")
  def idNames: Seq[String] = idFields.map(_.name)
}

/** Derived per-level metadata (reference: LevelMetadata,
  * hierarchical_packer.py:153-165, built at 2571-2603).
  *
  * @param path         separator-joined escaped path root..this level
  * @param prefix       path + separator ("" for a root with no prefix usage)
  * @param ancestorKeys fully-qualified id column names of all strict
  *                     ancestors (flat form)
  * @param idColumns    fully-qualified id column names of this level
  */
final case class LevelMetadata(
    index: Int,
    name: String,
    path: String,
    prefix: String,
    ancestorKeys: Seq[String],
    idColumns: Seq[String],
    spec: LevelSpec)

/** A whole hierarchy (reference: HierarchySpec,
  * hierarchical_packer.py:243-302).
  *
  * @param keyAliases map target-column -> source-column; the target is
  *                   materialized as an alias of the source before packing
  *                   and dropped afterwards
  */
final case class HierarchySpec(
    levels: Seq[LevelSpec],
    keyAliases: Map[String, String] = Map.empty,
    colName: ColName = ColName.default) {
  require(levels.nonEmpty, "hierarchy needs at least one level")
  require(levels.map(_.name).distinct.size == levels.size,
    s"duplicate level names: ${levels.map(_.name).mkString(", ")}")
  require(levels.head.parentKeys.isEmpty,
    s"root level '${levels.head.name}' must not declare parent_keys")
  levels.sliding(2).foreach {
    case Seq(parent, child) if child.parentKeys.nonEmpty =>
      require(child.parentKeys.size == parent.idFields.size,
        s"level '${child.name}': parent_keys arity ${child.parentKeys.size} != " +
          s"parent '${parent.name}' id arity ${parent.idFields.size}")
    case _ =>
  }

  /** Metadata for every level, root first. */
  val metadata: Seq[LevelMetadata] = {
    val builder = Seq.newBuilder[LevelMetadata]
    var pathSegs = Vector.empty[String]
    var ancestors = Vector.empty[String]
    levels.zipWithIndex.foreach { case (lvl, i) =>
      pathSegs :+= lvl.name
      val path = colName.joinPath(pathSegs)
      val prefix = path + colName.separator
      val idCols = lvl.idFields.map(f => prefix + colName.escapeField(f.name))
      builder += LevelMetadata(i, lvl.name, path, prefix, ancestors, idCols, lvl)
      ancestors ++= idCols
    }
    builder.result()
  }

  private val byName: Map[String, LevelMetadata] = metadata.map(m => m.name -> m).toMap

  def levelNames: Seq[String] = levels.map(_.name)
  def rootLevel: String = levels.head.name
  def leafLevel: String = levels.last.name

  def meta(level: String): LevelMetadata =
    byName.getOrElse(level,
      throw new HierarchyConfigError(
        s"unknown level '$level'; known: ${levelNames.mkString(", ")}"))

  def levelIndex(level: String): Int = meta(level).index

  /** Strict ancestors, root first (reference: get_ancestor_levels). */
  def ancestorLevels(level: String): Seq[String] =
    levelNames.take(levelIndex(level))

  /** Strict descendants, nearest first (reference: get_descendant_levels). */
  def descendantLevels(level: String): Seq[String] =
    levelNames.drop(levelIndex(level) + 1)

  /** The immediate child level, if any (reference: next_level,
    * hierarchical_packer.py:339-356). */
  def nextLevel(level: String): Option[LevelSpec] =
    levels.lift(levelIndex(level) + 1)

  /** Key column names of a level. Long form = fully-prefixed flat names;
    * short form = bare field names. Ancestors force long form
    * (reference: get_level_keys, hierarchical_packer.py:507-549). */
  def levelKeys(level: String, includeAncestors: Boolean = false,
                longForm: Boolean = true): Seq[String] = {
    val m = meta(level)
    val own = if (longForm || includeAncestors) m.idColumns else m.spec.idNames
    if (includeAncestors) m.ancestorKeys ++ own else own
  }
}

/** A cross-level aggregation request (reference: LevelAttribute dataclass,
  * hierarchical_packer.py:167-188). */
final case class LevelAttribute(
    attribute: String,
    fromLevel: String,
    agg: String = "list",
    alias: Option[String] = None)

/** Result of structural schema validation (reference:
  * SchemaValidationResult, hierarchical_packer.py:218-240). */
final case class SchemaValidationResult(
    isCompatible: Boolean,
    inferredLevel: Option[String],
    presentLevels: Seq[String],
    missingLevels: Seq[String],
    errors: Seq[String],
    warnings: Seq[String])

/** A level inferred from a schema (reference: DiscoveredLevel,
  * hierarchical_packer.py:190-215). */
final case class DiscoveredLevel(
    name: String,
    depth: Int,
    path: String,
    fields: Seq[String],
    parent: Option[String],
    isPacked: Boolean)
