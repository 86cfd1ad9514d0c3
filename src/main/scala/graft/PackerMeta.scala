package graft

import org.apache.spark.sql.types._

/**
 * Schema-level metadata, discovery, and structural validation for a
 * hierarchy (reference: hierarchical_packer.py M1-M9 — pure metadata code,
 * no Spark jobs; everything walks a [[StructType]]).
 */
trait PackerMetaOps {
  def spec: HierarchySpec

  private def cn = spec.colName
  private def sep = cn.separator
  private def metas = spec.metadata

  /** Unwrap a List wrapper: List[Struct] → Struct, Struct → Struct. */
  private def unwrapStruct(dt: DataType): Option[StructType] = dt match {
    case ArrayType(s: StructType, _) => Some(s)
    case s: StructType => Some(s)
    case _ => None
  }

  /** M5: detect whether a schema is flat, partially packed, or packed, and
    * return the level each row currently represents (reference:
    * infer_current_level, hierarchical_packer.py:638-691). */
  def inferCurrentLevel(schema: StructType): String = {
    val names = schema.fieldNames.toSet
    metas.foreach { meta =>
      if (names.contains(meta.path)) {
        // only Struct / Array[Struct] counts as packed — an array-of-scalar
        // column that happens to share a level path is a flat attribute
        // (consistent with unwrapStruct in validateSchema/getLevelSchema)
        if (unwrapStruct(schema(meta.path).dataType).isDefined)
          return if (meta.index == 0) meta.name else metas(meta.index - 1).name
      }
    }
    metas.reverseIterator.foreach { meta =>
      if (schema.fieldNames.exists(_.startsWith(meta.prefix))) return meta.name
    }
    throw new HierarchyError(
      "Cannot infer current level: the schema does not match any recognisable " +
        s"hierarchy state. Schema columns: ${schema.fieldNames.mkString(", ")}")
  }

  /** M4: field names belonging to a level, for flat OR packed schemas
    * (reference: get_level_fields, hierarchical_packer.py:551-636).
    * longForm=true returns fully-qualified dotted paths. */
  def getLevelFields(level: String, schema: StructType,
                     longForm: Boolean = false): Seq[String] =
    getLevelSchema(level, schema).map { case (name, _) =>
      if (longForm) spec.meta(level).prefix + name else name
    }

  /** M4: field name → DataType for a level (reference: get_level_schema,
    * hierarchical_packer.py:693-749). Short field names. */
  def getLevelSchema(level: String, schema: StructType): Seq[(String, DataType)] = {
    val meta = spec.meta(level)
    val childNames = metas.drop(meta.index + 1).map(_.name).toSet
    // packed case: the level's path is a column
    if (schema.fieldNames.contains(meta.path)) {
      unwrapStruct(schema(meta.path).dataType) match {
        case Some(st) =>
          return st.fields.toIndexedSeq.collect {
            case f if !childNames.contains(f.name) => f.name -> f.dataType
          }
        case None =>
      }
    }
    // flat case
    schema.fields.toIndexedSeq.flatMap { f =>
      if (!f.name.startsWith(meta.prefix)) None
      else {
        val remainder = f.name.substring(meta.prefix.length)
        val isChild = childNames.exists(n => remainder == n || remainder.startsWith(n + sep))
        if (isChild) None else Some(remainder -> f.dataType)
      }
    }
  }

  /** All qualified columns belonging to a level: id columns plus required
    * columns (reference: get_level_columns, hierarchical_packer.py:1845-1857). */
  def getLevelColumns(level: String): Seq[String] = {
    val m = spec.meta(level)
    m.idColumns ++ m.spec.requiredFields.map(f => m.prefix + cn.escapeField(f))
  }

  /** M6: human-readable hierarchy summary (reference: describe,
    * hierarchical_packer.py:751-795). */
  def describe: String = {
    val n = metas.size
    val lines = Seq.newBuilder[String]
    lines += s"""Packer (separator="$sep")"""
    lines += s"  Levels ($n):"
    metas.foreach { meta =>
      val tags = (if (meta.index == 0) Seq("root") else Nil) ++
        (if (meta.index == n - 1) Seq("leaf") else Nil)
      val tagStr = if (tags.nonEmpty) s"  (${tags.mkString(", ")})" else ""
      lines += s"    ${meta.index}. ${meta.name}$tagStr"
      lines += s"""       Path: "${meta.path}""""
      val keys = if (meta.idColumns.nonEmpty)
        meta.idColumns.map(_.substring(meta.prefix.length)).mkString(", ") else "(none)"
      lines += s"       Keys: $keys"
      if (meta.ancestorKeys.nonEmpty)
        lines += s"       Ancestor keys: ${meta.ancestorKeys.mkString(", ")}"
    }
    lines.result().mkString("\n")
  }

  /** M9: structural (no-data) compatibility check of a schema against this
    * spec (reference: validate_schema, hierarchical_packer.py:1719-1843). */
  def validateSchema(schema: StructType,
                     expectedLevel: Option[String] = None): SchemaValidationResult = {
    val errors = Seq.newBuilder[String]
    val warnings = Seq.newBuilder[String]
    val present = Seq.newBuilder[String]
    val missing = Seq.newBuilder[String]
    val names = schema.fieldNames.toSet

    val inferred: Option[String] =
      try Some(inferCurrentLevel(schema))
      catch { case _: HierarchyError =>
        warnings += ("Could not infer current packing level from schema. " +
          s"Schema columns: ${schema.fieldNames.mkString(", ")}")
        None
      }
    (expectedLevel, inferred) match {
      case (Some(e), Some(i)) if e != i =>
        errors += s"Expected data at level '$e' but inferred level is '$i'."
      case _ =>
    }

    metas.foreach { meta =>
      var levelFound = false
      val (flatFound, flatMissing) = meta.idColumns.partition(names.contains)
      flatFound.foreach { idCol =>
        schema(idCol).dataType match {
          case _: ArrayType | _: StructType | _: MapType =>
            errors += s"[Level: ${meta.name}] Key column '$idCol' has type " +
              s"${schema(idCol).dataType.simpleString} but expected a scalar type."
          case _ =>
        }
      }
      if (flatFound.nonEmpty) {
        levelFound = true
        if (flatMissing.nonEmpty)
          warnings += s"[Level: ${meta.name}] Some key columns missing from flat " +
            s"schema: ${flatMissing.mkString(", ")}. Found: ${flatFound.mkString(", ")}."
      }
      if (names.contains(meta.path)) {
        unwrapStruct(schema(meta.path).dataType) match {
          case Some(st) if st.fields.nonEmpty =>
            levelFound = true
            val structNames = st.fieldNames.toSet
            val shortIds = meta.idColumns.map(_.substring(meta.prefix.length))
            val missingIds = shortIds.filterNot(structNames.contains)
            if (missingIds.nonEmpty)
              errors += s"[Level: ${meta.name}] Packed column '${meta.path}' is " +
                s"missing expected key fields: ${missingIds.mkString(", ")}. " +
                s"Struct fields: ${st.fieldNames.sorted.mkString(", ")}."
          case _ =>
            if (flatFound.isEmpty)
              warnings += s"[Level: ${meta.name}] Column '${meta.path}' exists but " +
                s"has type ${schema(meta.path).dataType.simpleString}, expected " +
                "Array[Struct] or Struct."
        }
      }
      if (levelFound) present += meta.name else missing += meta.name
    }

    val presentSeq = present.result()
    if (presentSeq.isEmpty)
      errors += "No hierarchy levels found in schema. Expected columns with " +
        s"prefix patterns like: ${metas.take(3).map(_.prefix).mkString(", ")}..."

    val errs = errors.result()
    SchemaValidationResult(errs.isEmpty, inferred, presentSeq, missing.result(),
      errs, warnings.result())
  }
}

/** M7: static hierarchy discovery from a schema — no spec needed
  * (reference: discover_levels, hierarchical_packer.py:839-936). */
object Discovery {

  def discoverLevels(schema: StructType,
                     colName: ColName = ColName.default): Seq[DiscoveredLevel] = {
    val sep = colName.separator
    val levels = scala.collection.mutable.Map.empty[Seq[String], scala.collection.mutable.Set[String]]
    val packedPaths = scala.collection.mutable.Set.empty[Seq[String]]

    def fieldsOf(path: Seq[String]): scala.collection.mutable.Set[String] =
      levels.getOrElseUpdate(path, scala.collection.mutable.Set.empty[String])

    def unwrap(dt: DataType): DataType = dt match {
      case ArrayType(inner, _) => inner
      case other => other
    }

    def discoverFromStruct(st: StructType, parentPath: Seq[String]): Unit =
      st.fields.foreach { f =>
        unwrap(f.dataType) match {
          case inner: StructType if inner.fields.nonEmpty =>
            val childPath = parentPath :+ f.name
            fieldsOf(childPath)
            packedPaths += childPath
            discoverFromStruct(inner, childPath)
          case _ => fieldsOf(parentPath) += f.name
        }
      }

    schema.fields.foreach { f =>
      val parts = colName.splitPath(f.name)
      unwrap(f.dataType) match {
        case inner: StructType if inner.fields.nonEmpty =>
          fieldsOf(parts)
          packedPaths += parts
          discoverFromStruct(inner, parts)
        case _ if parts.size >= 2 =>
          fieldsOf(parts.init) += parts.last
        case _ => // single-component scalar — not hierarchical
      }
    }

    // backfill intermediate paths
    levels.keys.toSeq.foreach { path =>
      (1 until path.size).foreach(i => fieldsOf(path.take(i)))
    }

    levels.keys.toSeq
      .sortBy(p => (p.size, p.mkString(sep)))
      .map { path =>
        DiscoveredLevel(
          name = path.last,
          depth = path.size - 1,
          path = colName.joinPath(path),
          fields = levels(path).toSeq.sorted,
          parent = if (path.size > 1) Some(path(path.size - 2)) else None,
          isPacked = packedPaths.contains(path))
      }
  }
}
