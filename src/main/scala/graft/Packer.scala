package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Extra-column policy for pack (reference: ExtraColumnsMode). */
sealed trait ExtraColumns
object ExtraColumns {
  case object Preserve extends ExtraColumns
  case object Drop extends ExtraColumns
  case object Error extends ExtraColumns
}

/** Physical pack strategy chosen by [[Packer.choosePackStrategy]]. */
sealed trait PackStrategy
object PackStrategy {
  case object Plain extends PackStrategy
  case object Salted extends PackStrategy
  case object SplitJoin extends PackStrategy
}

/** Full pack recommendation from [[Packer.planPack]]: the strategy pick
  * plus a probe-estimated shuffle payload and the partition count it
  * implies. ADVICE, deliberately not auto-applied — partition sizing
  * follows the operator's shuffle payload and the pipeline author's
  * session, so the caller decides (set `spark.sql.shuffle.partitions`,
  * or pass the count to a repartition) exactly like
  * [[graft.ext.Tuning.scaleShuffleTo]]. */
final case class PackPlan(strategy: PackStrategy,
                          estimatedShuffleBytes: Long,
                          recommendedPartitions: Int)

/** Root-attribute strategy for pack (reference: ParentStrategy). */
sealed trait ParentStrategy
object ParentStrategy {
  case object Aggregate extends ParentStrategy
  /** Pull heavy root attributes into a dim table and re-join after packing
    * only structural columns; the dim side is broadcast when small. */
  case object SplitJoin extends ParentStrategy
}

/**
 * Converts between flat "dotted-column" tables and nested List[Struct]
 * hierarchies (reference: nexpresso/hierarchical_packer.py, HierarchicalPacker).
 *
 * Spark-first design notes (vs. the reference's single-node Polars engine):
 *  - Packing one level = one `groupBy(ancestorKeys)` — a hash shuffle keyed
 *    on that level's ancestors; K levels packed = K successively coarser
 *    shuffles. Executor memory is bounded by the shuffle, so the reference's
 *    `pack_streaming` disk-bucketing machinery is unnecessary (see
 *    [[Packer.packStreaming]]).
 *  - `collect_list` order is nondeterministic after a shuffle, so child-list
 *    order is enforced EXPLICITLY: children are collected as
 *    struct(sortKeys..., rowId, payload), `sort_array`-ed, then `transform`-ed
 *    back to the payload. Mirrors the reference's sort-inside-agg
 *    (hierarchical_packer.py:2684-2688) without a global sort.
 *  - Row order: Polars has a contiguous engine row index; Spark does not.
 *    We use `monotonically_increasing_id()` (monotone within a partition,
 *    stable for ordered sources). Top-level row order after pack is
 *    unguaranteed — same caveat as the reference (README.md:251-254).
 *  - Parent-attribute dedup = `first(col, ignoreNulls = true)` — exactly the
 *    reference's `drop_nulls().first()` (hierarchical_packer.py:2678).
 *
 * @param validateOnPack run the per-level aggregation-uniformity check
 *        (reference's eager validation gate, hierarchical_packer.py:1000-1001).
 *        The audit evidence (min/max per group) rides the pack's own
 *        aggregation — no second scan; cost is one narrow check job over
 *        the persisted packed output, which then serves downstream levels.
 *        CACHE LIFETIME: each validating pack leaves its final level's
 *        MEMORY_AND_DISK cache alive so the returned frame serves from it;
 *        on long-lived sessions running many packs, call
 *        [[Packer.releaseAuditCaches]] once the results are consumed —
 *        otherwise the caches persist until ContextCleaner reclaims the
 *        garbage-collected frames.
 */
final class Packer(
    val spec: HierarchySpec,
    val preserveChildOrder: Boolean = true,
    val validateOnPack: Boolean = false) extends PackerMetaOps with CrossLevelOps {

  import Packer._

  private val cn = spec.colName
  private def sep = cn.separator
  private def metas = spec.metadata

  // ---------------------------------------------------------------- helpers

  private def topCol(name: String): Column = ColName.topCol(name)

  private def hasCol(df: DataFrame, name: String): Boolean =
    df.schema.fieldNames.contains(name)

  /** Alias-key + row-id + computed-field preparation (reference:
    * _prepare_frame, hierarchical_packer.py:2342-2365). Returns the
    * prepared frame and the names of alias columns that were added. */
  private def prepareFrame(df: DataFrame): (DataFrame, Seq[String]) = {
    var cur = df
    val added = Seq.newBuilder[String]
    spec.keyAliases.foreach { case (target, source) =>
      if (!hasCol(cur, target) && hasCol(cur, source)) {
        cur = cur.withColumn(target, topCol(source))
        added += target
      }
    }
    if (preserveChildOrder && !hasCol(cur, RowIdCol))
      cur = cur.select((monotonically_increasing_id().alias(RowIdCol) +:
        cur.schema.fieldNames.toIndexedSeq.map(topCol)): _*)
    // computed id fields materialize as their fully-qualified flat column
    // (reference: _ensure_computed_fields, hierarchical_packer.py:2415-2436)
    metas.foreach { m =>
      m.spec.idFields.foreach {
        case ComputedField(name, expr) =>
          val qualified = m.prefix + cn.escapeField(name)
          if (!hasCol(cur, qualified)) cur = cur.withColumn(qualified, expr)
        case _ =>
      }
    }
    (cur, added.result())
  }

  private def dropIfPresent(df: DataFrame, names: Seq[String]): DataFrame = {
    val present = names.filter(hasCol(df, _))
    if (present.isEmpty) df else df.drop(present: _*)
  }

  /** Shared extra-columns policy gate: every pack entry point reports the
    * same condition with the same message and remediation hint. */
  private def applyExtraColumnsPolicy(df: DataFrame, policy: ExtraColumns): DataFrame = {
    val extras = identifyExtraColumns(df.schema)
    if (extras.isEmpty) df
    else policy match {
      case ExtraColumns.Error =>
        throw new HierarchyValidationError(
          s"Found ${extras.size} column(s) not part of the hierarchy: " +
            s"${extras.take(5).mkString(", ")}${if (extras.size > 5) "..." else ""}. " +
            "Use ExtraColumns.Preserve to keep them or Drop to remove them.")
      case ExtraColumns.Drop => df.drop(extras: _*)
      case ExtraColumns.Preserve => df // kept; uniformity enforced when validateOnPack
    }
  }

  /** Columns not belonging to any hierarchy level (reference:
    * _identify_extra_columns, hierarchical_packer.py:2479-2526). */
  def identifyExtraColumns(schema: StructType): Seq[String] = {
    // prefixes/paths are built from ESCAPED names; an unescaped
    // `name + sep` check would misclassify when a level name contains
    // the separator
    val prefixes = metas.map(_.prefix)
    val paths = metas.map(_.path).toSet
    val aliasTargets = spec.keyAliases.keySet
    schema.fieldNames.toIndexedSeq.filter { c =>
      c != RowIdCol && !paths.contains(c) && !aliasTargets.contains(c) &&
        !prefixes.exists(c.startsWith)
    }
  }

  // ------------------------------------------------------------------ pack

  /** P1: fold flat columns into nested List[Struct], one level at a time
    * from the leaf up to `toLevel` (reference: pack,
    * hierarchical_packer.py:941-1011). */
  def pack(df: DataFrame, toLevel: String,
           extraColumns: ExtraColumns = ExtraColumns.Preserve,
           parentStrategy: ParentStrategy = ParentStrategy.Aggregate): DataFrame =
    parentStrategy match {
      case ParentStrategy.SplitJoin => packSplitJoin(df, toLevel, extraColumns)
      case ParentStrategy.Aggregate =>
        val (prepared0, added) = prepareFrame(df)
        packAggregate(prepared0, toLevel, extraColumns, added)
    }

  /** Aggregate-strategy pack over an ALREADY-PREPARED frame — shared by
    * [[pack]] and [[packSplitJoin]] so the split path runs frame prep and
    * extra-column classification exactly once. */
  private def packAggregate(prepared: DataFrame, toLevel: String,
                            extraColumns: ExtraColumns, added: Seq[String],
                            preSharded: Boolean = false): DataFrame = {
    var cur = applyExtraColumnsPolicy(prepared, extraColumns)
    val targetIdx = spec.levelIndex(toLevel)
    // Multi-level packs group by successively coarser keys. One explicit
    // repartition on the COARSEST stage's keys satisfies every stage's
    // clustering requirement (HashPartitioning on a subset of each finer
    // stage's grouping keys), so the whole pack runs with a SINGLE
    // shuffle instead of one per level — the distributed analogue of the
    // reference's root-key bucketing (hierarchical_packer.py:1193),
    // applied by default because it is strictly fewer shuffles.
    val stages = (metas.size - 1 to targetIdx by -1)
      .filter(i => metas(i).ancestorKeys.nonEmpty)
    // preSharded: the caller (packStreaming) already repartitioned on the
    // ROOT keys — a subset of every stage's grouping keys — with an
    // explicit partition count. Re-repartitioning here would collapse
    // with (and override) that shuffle, silently discarding the caller's
    // `partitions` contract.
    if (!preSharded && stages.size >= 2) {
      val coarsest = metas(stages.last).ancestorKeys.filter(hasCol(cur, _))
      if (coarsest.nonEmpty) cur = cur.repartition(coarsest.map(topCol): _*)
    }
    val audit = new AuditCtx
    (metas.size - 1 to targetIdx by -1).foreach { i =>
      cur = packSingleLevel(cur, i, validate = validateOnPack, auditCtx = audit)
    }
    dropInternal(dropIfPresent(cur, added))
  }

  /** P2: pack exactly one level (reference: _pack_single_level,
    * hierarchical_packer.py:2614-2698). */
  private[graft] def packSingleLevel(df0: DataFrame, levelIdx: Int,
                                     validate: Boolean = false,
                                     auditCtx: AuditCtx = new AuditCtx): DataFrame = {
    var df = df0
    if (preserveChildOrder && !hasCol(df, RowIdCol))
      df = df.select((monotonically_increasing_id().alias(RowIdCol) +:
        df.schema.fieldNames.toIndexedSeq.map(topCol)): _*)

    val meta = metas(levelIdx)
    val names = df.schema.fieldNames.toIndexedSeq
    val levelCols = names.filter(c => meta.prefix.nonEmpty && c.startsWith(meta.prefix))
    if (levelCols.isEmpty) return df

    val groupKeys = meta.ancestorKeys

    // order_by expressions reference this level's flat columns, which are
    // about to be folded into the struct — materialize them first
    // (reference: hierarchical_packer.py:2651-2656).
    val orderExprs = meta.spec.orderBy
    val orderTempCols: Seq[String] =
      if (orderExprs.nonEmpty && groupKeys.nonEmpty) orderExprs.indices.map(i => s"$OrderTempPrefix$i")
      else Nil
    if (orderTempCols.nonEmpty)
      df = orderExprs.zip(orderTempCols).foldLeft(df) {
        case (d, (e, a)) => d.withColumn(a, e)
      }

    val structExpr = struct(levelCols.map(c =>
      topCol(c).alias(c.substring(meta.prefix.length))): _*).alias(meta.path)
    val others = df.schema.fieldNames.toIndexedSeq.filterNot(levelCols.contains)
    df = df.select((others.map(topCol) :+ structExpr): _*)

    if (groupKeys.isEmpty) return df

    val hasRowId = hasCol(df, RowIdCol)
    val excluded = groupKeys.toSet ++ orderTempCols + meta.path ++
      (if (hasRowId) Set(RowIdCol) else Set.empty[String])
    val remaining = df.schema.fieldNames.toIndexedSeq.filterNot(excluded.contains)

    val firstAggs = remaining.map(c => first(topCol(c), ignoreNulls = true).alias(c))

    val sortByCols = orderTempCols ++ (if (preserveChildOrder && hasRowId) Seq(RowIdCol) else Nil)
    val childList: Column =
      if (sortByCols.isEmpty) collect_list(topCol(meta.path)).alias(meta.path)
      else {
        // collect (sortKeys..., payload), sort by struct order (sort keys
        // lead; rowId is unique so payload never decides), strip to payload
        val keyed = struct((sortByCols.zipWithIndex.map { case (c, i) =>
          topCol(c).alias(s"__k$i") } :+ topCol(meta.path).alias("__payload")): _*)
        val sorted = sortKeyed(df.schema(meta.path).dataType, collect_list(keyed),
          sortByCols.size)
        transform(sorted, x => x.getField("__payload")).alias(meta.path)
      }

    val rowIdAgg =
      if (preserveChildOrder && hasRowId) Seq(min(topCol(RowIdCol)).alias(RowIdCol))
      else Nil

    // M10 audit folded into the SAME aggregation: uniform within a group
    // ⟺ min(c) <=> max(c) (nulls ignored by both, like the reference's
    // drop_nulls + n_unique). min/max are partial-aggregatable and add no
    // Expand step, unlike a countDistinct alongside collect_list.
    val auditAggs =
      if (validate && remaining.nonEmpty)
        remaining.zipWithIndex.flatMap { case (c, i) => Seq(
          min(topCol(c)).alias(s"${AuditPrefix}min_$i"),
          max(topCol(c)).alias(s"${AuditPrefix}max_$i")) }
      else Nil

    val aggs = firstAggs ++ Seq(childList) ++ rowIdAgg ++ auditAggs
    val packed = df.groupBy(groupKeys.map(topCol): _*).agg(aggs.head, aggs.tail: _*)
    if (auditAggs.isEmpty) packed
    else runUniformityAudit(packed, remaining, meta.name, auditCtx)
  }

  /** Sort an array of (__k0.., __payload) structs. Natural struct
    * ordering (`sort_array`) when the payload type is orderable; a
    * comparator over ONLY the sort-key fields otherwise (a map-typed
    * attribute would fail sort_array's orderability check even though
    * the payload never participates in the comparison — rowId in the
    * keys is unique). The comparator emulates struct ordering's
    * nulls-first ascending per key. */
  private def sortKeyed(payloadType: DataType, collected: Column,
                        nKeys: Int): Column = {
    val payloadOrderable =
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(payloadType)
    if (payloadOrderable) sort_array(collected)
    else array_sort(collected, (l, r) =>
      (0 until nKeys).foldRight(lit(0): Column) { (i, acc) =>
        val lf = l.getField(s"__k$i"); val rf = r.getField(s"__k$i")
        when(lf.isNull && rf.isNull, acc)
          .when(lf.isNull, -1).when(rf.isNull, 1)
          .when(lf < rf, -1).when(lf > rf, 1)
          .otherwise(acc)
      })
  }

  /** Root attribute columns: under the root prefix but not a root id, not
    * in any descendant level — neither a child's flat columns NOR an
    * already-packed child list column (reference: _root_attribute_columns). */
  private def rootAttributeColumns(schema: StructType): Seq[String] = {
    val root = metas.head
    val childPrefix = metas.lift(1).map(_.prefix)
    val childPath = metas.lift(1).map(_.path)
    val ids = root.idColumns.toSet
    schema.fieldNames.toIndexedSeq.filter { c =>
      c.startsWith(root.prefix) && !ids.contains(c) &&
        !childPrefix.exists(c.startsWith) && !childPath.contains(c) && c != RowIdCol
    }
  }

  /** P3: split_join strategy (reference: _pack_split_join,
    * hierarchical_packer.py:1033-1072). The dim table is unique-per-root-key;
    * join strategy is left to Catalyst/AQE — a forced broadcast would OOM
    * on exactly the heavy-root-attribute workloads SplitJoin targets. */
  private def packSplitJoin(df: DataFrame, toLevel: String,
                            extraColumns: ExtraColumns): DataFrame = {
    val (prepared, added) = prepareFrame(df)
    val root = metas.head
    val rootKeys = root.idColumns
    val attrCols = rootAttributeColumns(prepared.schema)
    if (rootKeys.isEmpty || attrCols.isEmpty)
      // fall back on the ALREADY-prepared frame — calling pack(df, ...)
      // here would run prepareFrame (row ids, aliases, computed fields)
      // a second time over the full input
      return dropIfPresent(packAggregate(prepared, toLevel, extraColumns, Nil), added)

    val dim = prepared.select((rootKeys ++ attrCols).map(topCol): _*)
      .dropDuplicates(rootKeys)
    val structural = prepared.drop(attrCols: _*)
    // already prepared — go straight to the aggregate path (alias drops
    // happen once, below, on the joined output)
    val packed = packAggregate(structural, toLevel, extraColumns, Nil)

    val out = if (toLevel != root.name) {
      // re-attach at top level, then restore the Aggregate strategy's
      // column ORDER (attrs interleaved at their prepared positions, not
      // appended) — the two strategies must be interchangeable for
      // positional consumers (union, as[caseClass]), not just name-equal
      val joined = packed.join(dim, rootKeys, "left")
      val keyCols = metas(spec.levelIndex(toLevel)).ancestorKeys
        .filter(joined.columns.contains)
      val inPrepared = prepared.schema.fieldNames.toSet
      val tailCols = packed.columns.toIndexedSeq
        .filterNot(inPrepared.contains).filterNot(keyCols.contains)
      val midSet = (packed.columns.toSet -- keyCols -- tailCols) ++ attrCols
      val ordered = keyCols ++
        prepared.schema.fieldNames.toIndexedSeq.filter(midSet.contains) ++ tailCols
      joined.select(ordered.map(topCol): _*)
    } else {
      // packing to root collapses each entity into a single struct column;
      // re-inject the attributes as struct fields. withField parses dots as
      // nested paths, so quote names (they may contain escaped separators)
      val structCol = root.path
      val prefix = root.prefix
      val withKeys = rootKeys.foldLeft(packed)((d, k) =>
        d.withColumn(k, topCol(structCol).getField(k.substring(prefix.length))))
      val joined = withKeys.join(dim, rootKeys, "left")
      val withFieldsCol = attrCols.foldLeft(topCol(structCol))((acc, c) =>
        acc.withField(ColName.quote(c.substring(prefix.length)), topCol(c)))
      // restore the Aggregate strategy's FIELD order inside the root
      // struct: ids+attrs at their prepared flat positions, then the
      // (already-packed) non-flat fields in their existing order
      val flatOrdered = prepared.schema.fieldNames.toIndexedSeq
        .filter(c => rootKeys.contains(c) || attrCols.contains(c))
        .map(_.substring(prefix.length))
      val packedFields = packed.schema(structCol).dataType
        .asInstanceOf[StructType].fieldNames.toIndexedSeq
      val restFields = packedFields.filterNot(flatOrdered.contains)
      // getField takes the name literally (unlike withField) — no quoting
      val orderedStruct = struct((flatOrdered ++ restFields).map(f =>
        withFieldsCol.getField(f).alias(f)): _*)
      joined.withColumn(structCol, orderedStruct).drop((rootKeys ++ attrCols): _*)
    }
    dropIfPresent(out, added)
  }

  // ---------------------------------------------------------------- unpack

  /** P4: unpack nested levels until `toLevel` (reference: unpack,
    * hierarchical_packer.py:1074-1101). Uses `explode_outer` so parents with
    * null/empty children survive as a row of nulls — Polars `explode`
    * semantics (null-children tests, test_complex_hierarchies.py:313-368). */
  def unpack(df: DataFrame, toLevel: String): DataFrame =
    dropInternal(unpackKeepInternal(df, toLevel))

  /** Explode (if List) + unnest one level's nested column in place
    * (reference: _explode_and_unnest, hierarchical_packer.py:2742-2765). */
  private def explodeAndUnnest(df0: DataFrame, meta: LevelMetadata): DataFrame = {
    var df = df0
    val dt = df.schema(meta.path).dataType
    val isList = dt.isInstanceOf[ArrayType]
    if (isList) df = df.withColumn(meta.path, explode_outer(topCol(meta.path)))
    val st = df.schema(meta.path).dataType match {
      case s: StructType => s
      case other => throw new HierarchyError(
        s"expected struct at '${meta.path}', got ${other.simpleString}")
    }
    val cols = df.schema.fieldNames.toIndexedSeq.flatMap { c =>
      if (c == meta.path)
        st.fieldNames.toIndexedSeq.map(f =>
          topCol(meta.path).getField(f).alias(meta.path + sep + f))
      else Seq(topCol(c))
    }
    df.select(cols: _*)
  }

  // -------------------------------------------------- split / (de)normalize

  /** P7: one standalone table per level (reference: split_levels,
    * hierarchical_packer.py:1252-1314). */
  def splitLevels(df: DataFrame): Map[String, DataFrame] = {
    val (prepared, added) = prepareFrame(df)
    val outputs = scala.collection.mutable.LinkedHashMap.empty[String, DataFrame]
    var current = prepared
    metas.foreach { meta =>
      if (hasCol(current, meta.path)) {
        val levelTable = unpackKeepInternal(current, meta.name)
        var out = levelTable
        val nextMeta = metas.lift(meta.index + 1)
        nextMeta match {
          case Some(nm) =>
            val dropCols = out.schema.fieldNames.toIndexedSeq
              .filter(c => c.startsWith(nm.prefix) || c == nm.path)
            out = dropIfPresent(out, dropCols)
            // NB not na.drop: it resolves dotted names as struct paths
            val subset = nm.ancestorKeys.filter(hasCol(out, _))
            if (subset.nonEmpty)
              out = out.filter(subset.map(topCol(_).isNotNull).reduce(_ && _))
          case None =>
            val required = meta.spec.requiredFields
              .map(f => meta.prefix + cn.escapeField(f)).filter(hasCol(out, _))
            if (required.nonEmpty)
              out = out.filter(required.map(topCol(_).isNotNull).reduce(_ && _))
        }
        out = dropIfPresent(out, added)
        outputs += meta.name -> dropInternal(out)
        current = levelTable
      }
    }
    outputs.toMap
  }

  /** unpack but keep the row-id column for downstream level extraction. */
  private def unpackKeepInternal(df: DataFrame, toLevel: String): DataFrame = {
    var cur = df
    var done = false
    metas.foreach { meta =>
      if (!done && hasCol(cur, meta.path)) {
        cur = explodeAndUnnest(cur, meta)
        if (meta.name == toLevel) done = true
      }
    }
    cur
  }

  /** P8: normalize = pack to root + splitLevels (reference:
    * hierarchical_packer.py:1316-1330). */
  def normalize(df: DataFrame, rootLevel: Option[String] = None): Map[String, DataFrame] =
    splitLevels(pack(df, rootLevel.getOrElse(spec.rootLevel)))

  /** P9: reconstruct nested columns from per-level tables (reference:
    * denormalize, hierarchical_packer.py:1332-1443). Child struct frames are
    * attached parent-ward with left joins on the ancestor keys. */
  def denormalize(tables: Map[String, DataFrame],
                  targetLevel: Option[String] = None): DataFrame = {
    if (tables.isEmpty) throw new HierarchyValidationError(
      "Expected at least one table to denormalize.")
    val targetName = targetLevel.getOrElse(spec.rootLevel)
    val targetIdx = spec.levelIndex(targetName)
    if (!tables.contains(spec.rootLevel)) throw new HierarchyValidationError(
      s"Missing root level '${spec.rootLevel}' in table mapping.")

    val prepared = scala.collection.mutable.Map.empty[String, DataFrame]
    val aliasAdded = scala.collection.mutable.Map.empty[String, Seq[String]]
    tables.foreach { case (name, t) =>
      val (p, added) = prepareFrame(t)
      prepared(name) = p
      aliasAdded(name) = added
    }

    (metas.size - 1 to 1 by -1).foreach { levelIdx =>
      val level = metas(levelIdx)
      val parentName = metas(levelIdx - 1).name
      prepared.get(level.name) match {
        case None =>
          if (levelIdx <= targetIdx) throw new HierarchyValidationError(
            s"Missing table for level '${level.name}'.")
        case Some(childDf) =>
          val parentDf = prepared.getOrElse(parentName,
            throw new HierarchyValidationError(s"Missing table for parent level '$parentName'."))
          var childPacked = packSingleLevel(childDf, levelIdx)
          val joinKeys = level.ancestorKeys
          var childStructFrame = childPacked.select((joinKeys.map(topCol) :+ topCol(level.path)): _*)
          val childAdded = aliasAdded.getOrElse(level.name, Nil)
          if (childAdded.nonEmpty) {
            childPacked = dropIfPresent(childPacked, childAdded)
            childStructFrame = dropIfPresent(childStructFrame, childAdded)
          }
          prepared(level.name) = childPacked
          prepared(parentName) = parentDf.join(childStructFrame, joinKeys, "left")
      }
    }

    var result = prepared.getOrElse(targetName,
      throw new HierarchyValidationError(s"Missing table for level '$targetName'."))
    result = dropIfPresent(result, aliasAdded.getOrElse(targetName, Nil))
    dropInternal(result)
  }

  // ------------------------------------------------------- relational build

  /** P10: relational tables → nested hierarchy (reference: build_from_tables,
    * hierarchical_packer.py:1445-1586). Each child table joins its parent on
    * `parent.idColumns == child.qualifiedParentKeys`; plain equi-joins, so
    * Catalyst is free to broadcast small dimension levels. */
  def buildFromTables(tables: Map[String, DataFrame],
                      targetLevel: Option[String] = None,
                      joinType: String = "left"): DataFrame = {
    require(joinType == "left" || joinType == "inner", s"joinType must be left|inner, got $joinType")
    if (tables.isEmpty) throw new HierarchyValidationError("Expected at least one table to build from.")
    val targetName = targetLevel.getOrElse(spec.rootLevel)
    val targetIdx = spec.levelIndex(targetName)
    metas.take(targetIdx + 1).foreach { m =>
      if (!tables.contains(m.name)) throw new HierarchyValidationError(
        s"Missing table for level '${m.name}'.")
    }

    val prepared = scala.collection.mutable.Map.empty[String, DataFrame]
    metas.foreach { m =>
      tables.get(m.name).foreach(t => prepared(m.name) = prepareLevelTableInternal(t, m))
    }

    (metas.size - 1 to 1 by -1).foreach { levelIdx =>
      val level = metas(levelIdx)
      val parentMeta = metas(levelIdx - 1)
      if (prepared.contains(level.name) && prepared.contains(parentMeta.name)) {
        val parentKeys = level.spec.parentKeys
        if (parentKeys.isEmpty) throw new HierarchyValidationError(
          s"Level '${level.name}' must have parent_keys defined for buildFromTables.")
        val parentIdCols = parentMeta.idColumns
        if (parentKeys.size != parentIdCols.size) throw new HierarchyValidationError(
          s"Level '${level.name}' has ${parentKeys.size} parent_keys but parent " +
            s"'${parentMeta.name}' has ${parentIdCols.size} id_fields.")
        val qualifiedParentKeys = parentKeys.map(pk => level.prefix + cn.escapeField(pk))
        val child = prepared(level.name)
        val parent = prepared(parentMeta.name)
        val cond = parentIdCols.zip(qualifiedParentKeys)
          .map { case (p, c) => parent(ColName.quote(p)) === child(ColName.quote(c)) }
          .reduce(_ && _)
        val joined = qualifiedParentKeys.map(k => child(ColName.quote(k)))
          .foldLeft(parent.join(child, cond, joinType))((d, c) => d.drop(c))
        prepared(parentMeta.name) = joined
      }
    }

    pack(prepared(spec.rootLevel), targetName)
  }

  /** P11: prepare a raw table for buildFromTables — rename via mapping then
    * prefix every column with the level path (reference: prepare_level_table,
    * hierarchical_packer.py:1588-1665). */
  def prepareLevelTable(levelName: String, df: DataFrame,
                        columnMapping: Map[String, String] = Map.empty): DataFrame = {
    val meta = spec.meta(levelName)
    val renamed =
      if (columnMapping.isEmpty) df
      else df.select(df.schema.fieldNames.toIndexedSeq.map { c =>
        topCol(c).alias(columnMapping.getOrElse(c, c))
      }: _*)
    prepareLevelTableInternal(renamed, meta)
  }

  private def prepareLevelTableInternal(df: DataFrame, meta: LevelMetadata): DataFrame =
    df.select(df.schema.fieldNames.toIndexedSeq.map(c =>
      topCol(c).alias(meta.prefix + cn.escapeField(c))): _*)

  // ------------------------------------------------------------ skew guard

  /** Two-phase ("salted") pack for SKEWED root keys: when one parent owns a
    * disproportionate share of leaf rows, the single `groupBy` of
    * [[packSingleLevel]] builds that parent's entire child list in one task.
    * Here the leaf level aggregates in two phases: (1) group by
    * (ancestorKeys, salt) where salt = hash(leaf ids) % buckets — children
    * of a hot parent spread across `saltBuckets` tasks building partial
    * chunks; (2) group by ancestorKeys, flatten + `array_sort` the chunks
    * and strip sort keys. Contents are identical to [[pack]] (equivalence
    * spec-tested); the final row still holds the whole list — inherent to
    * the data model — but sort/serialize work parallelizes.
    *
    * Deliberately does NOT pre-repartition on the coarsest keys (the
    * [[pack]] single-shuffle trick) — phase 1 must shuffle by (keys, salt)
    * for the skew spreading to happen. */
  def packSalted(df: DataFrame, toLevel: String, saltBuckets: Int = 32,
                 extraColumns: ExtraColumns = ExtraColumns.Preserve): DataFrame = {
    require(saltBuckets > 1, s"saltBuckets must be > 1, got $saltBuckets")
    val (prepared, added) = prepareFrame(df)
    var cur = applyExtraColumnsPolicy(prepared, extraColumns)
    val targetIdx = spec.levelIndex(toLevel)
    val leafIdx = metas.size - 1
    val audit = new AuditCtx
    cur = packSingleLevelSalted(cur, leafIdx, saltBuckets, audit)
    ((leafIdx - 1) to targetIdx by -1).foreach { i =>
      cur = packSingleLevel(cur, i, validate = validateOnPack, auditCtx = audit)
    }
    dropInternal(dropIfPresent(cur, added))
  }

  /** Leaf-level grouping-key skew probe: max/MEDIAN children-per-parent on
    * a `sampleFraction` sample. EAGER — runs one small Spark job at call
    * time (at scale the sample scan
    * is noise next to the pack shuffle it informs). Median, not mean: with
    * few parents a single hot key drags the mean up with it, capping
    * max/mean at the parent count; max/median stays unbounded under skew.
    * Returns the skew factor; 1.0 = perfectly uniform. AQE cannot help
    * here — its skew handling covers joins, not the hash aggregation a
    * pack is built from. */
  def leafSkewFactor(df: DataFrame, sampleFraction: Double = 0.01): Double = {
    val (prepared, _) = prepareFrame(df)
    val keys = metas.last.ancestorKeys.filter(hasCol(prepared, _))
    if (keys.isEmpty) return 1.0
    // project keys BEFORE sampling — syntactic column pruning, so the
    // probe never deserializes payload columns even from a cache
    val keysOnly = prepared.select(keys.map(topCol): _*)
    val sampled =
      if (sampleFraction >= 1.0) keysOnly else keysOnly.sample(sampleFraction, seed = 42)
    val counts = sampled.groupBy(keys.map(topCol): _*).agg(count(lit(1)).alias("__n"))
    val row = counts
      .agg(max(col("__n")), percentile_approx(col("__n"), lit(0.5), lit(1000)))
      .collect()(0)
    if (row.isNullAt(0) || row.isNullAt(1) || row.getLong(1) == 0L) 1.0
    else row.getLong(0).toDouble / row.getLong(1)
  }

  /** Sampled physical-strategy probe for [[packAuto]] — the pack
    * analogue of AQE's statistics-driven re-planning (which cannot help
    * here: AQE re-plans joins, not hash aggregations):
    *  1. [[leafSkewFactor]] ≥ `skewFactor` → [[PackStrategy.Salted]]
    *     (spread the hot parent's children across a two-phase agg);
    *  2. else, root-attribute payload ≥ `splitJoinWidthFactor`× the rest
    *     of the row AND ≥ `minChildrenPerRoot` children per root →
    *     [[PackStrategy.SplitJoin]] (don't drag the duplicated root
    *     payload through the shuffle; re-attach it from a dim table);
    *  3. else [[PackStrategy.Plain]].
    * Widths are sampled mean `to_json` byte lengths — a serialization
    * proxy; only the ratio is used. All three strategies produce
    * identical contents (equality-tested); only the shuffle shape
    * differs, so a misprediction costs time, never correctness.
    *
    * EAGER: runs the probe's Spark jobs (sampled skew scan, keys-only
    * count, width sample) at CALL time, not at action time. */
  def choosePackStrategy(df: DataFrame, skewFactor: Double = 8.0,
                         sampleFraction: Double = 0.01,
                         splitJoinWidthFactor: Double = 1.0,
                         minChildrenPerRoot: Double = 4.0): PackStrategy = {
    if (leafSkewFactor(df, sampleFraction) >= skewFactor)
      return PackStrategy.Salted
    val (prepared, _) = prepareFrame(df)
    val attrCols = rootAttributeColumns(prepared.schema)
    val rootKeys = metas.head.idColumns.filter(hasCol(prepared, _))
    if (attrCols.isEmpty || rootKeys.isEmpty) return PackStrategy.Plain
    // children-per-root must come from the FULL frame: a fraction-f sample
    // of c-children roots sees ~max(1, c·f) children per sampled root, so
    // the sampled ratio collapses toward 1 and under-detects exactly the
    // parent-dominant shapes this probe exists for. Keys-only projection +
    // partial-agg approx_count_distinct keep the full pass cheap.
    val keyRow = prepared.select(rootKeys.map(topCol): _*)
      .agg(count(lit(1)).cast(DoubleType),
        approx_count_distinct(struct(rootKeys.map(topCol): _*)).cast(DoubleType))
      .collect()(0)
    if (keyRow.isNullAt(0) || keyRow.isNullAt(1) || keyRow.getDouble(1) == 0.0)
      return PackStrategy.Plain
    val childrenPerRoot = keyRow.getDouble(0) / keyRow.getDouble(1)
    if (childrenPerRoot < minChildrenPerRoot) return PackStrategy.Plain
    // width ratio is a per-row mean — a bounded sample is plenty. Widths
    // come from a schema-aware estimator ([[Packer.widthOf]]): serialized
    // bytes for fixed-width shapes are size() x element-width (codegen'd,
    // no serialization), strings/binary read octet_length directly, and
    // only irregular shapes (arrays of strings/structs, maps) fall back
    // to octet_length(to_json(...)) — the previous all-to_json probe
    // serialized ~150 KB of JSON per sampled row on thumbnail-heavy
    // presets (~1 s of the probe's 1.6 s). Only the attr/other RATIO is
    // consumed, and both sides use the same estimator.
    val s = (if (sampleFraction >= 1.0) prepared else prepared.sample(sampleFraction, seed = 42))
      .limit(WidthProbeRows)
    def width(cols: Seq[String]): Column =
      if (cols.isEmpty) lit(0.0)
      else cols.map(c => Packer.widthOf(prepared.schema(c).dataType, topCol(c)))
        .reduce(_ + _)
    val others = prepared.schema.fieldNames.toIndexedSeq
      .filterNot(attrCols.contains).filterNot(_ == RowIdCol)
    val row = s.agg(avg(width(attrCols)), avg(width(others))).collect()(0)
    if (row.isNullAt(0) || row.isNullAt(1)) return PackStrategy.Plain
    if (row.getDouble(0) >= splitJoinWidthFactor * row.getDouble(1))
      PackStrategy.SplitJoin
    else PackStrategy.Plain
  }

  /** [[choosePackStrategy]] plus a SHUFFLE-WIDTH recommendation from the
    * probe's own sampled bytes: estimated payload = full row count ×
    * sampled mean serialized row width ([[Packer.widthOf]] — the same
    * estimator the strategy ratio uses), partitions =
    * [[graft.ext.Tuning.partitionsForBytes]] at the ~128 MB per-reducer
    * target, floored at the session's parallelism. This closes the sf10
    * lesson ("partition sizing follows the operator's shuffle payload")
    * as library advice: a pack's groupBy drags the whole payload through
    * one exchange, so a session width tuned for one scale factor goes
    * super-linear at the next (q_pack_split_join, 16.2× → 5.4× at 10×
    * data once sized). RECOMMEND-ONLY — apply via
    * `spark.conf.set("spark.sql.shuffle.partitions", plan
    * .recommendedPartitions)` around the pack (the auto_pack_sized bench
    * arm), or ignore it: salted packs at coarse widths measurably PREFER
    * the session default (BASELINE.md sf10 notes), which is exactly why
    * this never self-applies.
    *
    * EAGER like the strategy probe, plus one keys-free `count` and one
    * sampled width pass. */
  def planPack(df: DataFrame, skewFactor: Double = 8.0,
               sampleFraction: Double = 0.01,
               splitJoinWidthFactor: Double = 1.0,
               minChildrenPerRoot: Double = 4.0,
               bytesPerPartition: Long = graft.ext.Tuning.DefaultBytesPerPartition,
               maxPartitions: Int = graft.ext.Tuning.DefaultMaxPartitions): PackPlan = {
    val strategy = choosePackStrategy(df, skewFactor, sampleFraction,
      splitJoinWidthFactor, minChildrenPerRoot)
    val (est, rec) = estimatedShuffle(df, sampleFraction, bytesPerPartition,
      maxPartitions)
    PackPlan(strategy, est, rec)
  }

  /** The width-probe half of [[planPack]]: (estimated shuffle bytes,
    * recommended partitions) without the strategy probe — shared with
    * [[packStreaming]]'s derived default width. Estimate 0 (empty frame /
    * all-null sample) signals "no usable probe" to callers. */
  private[graft] def estimatedShuffle(df: DataFrame,
                                      sampleFraction: Double = 0.01,
                                      bytesPerPartition: Long =
                                        graft.ext.Tuning.DefaultBytesPerPartition,
                                      maxPartitions: Int =
                                        graft.ext.Tuning.DefaultMaxPartitions): (Long, Int) = {
    val (prepared, _) = prepareFrame(df)
    val cols = prepared.schema.fieldNames.toIndexedSeq.filterNot(_ == RowIdCol)
    val widthExpr = cols.map(c =>
      Packer.widthOf(prepared.schema(c).dataType, topCol(c))).reduce(_ + _)
    val s = (if (sampleFraction >= 1.0) prepared
             else prepared.sample(sampleFraction, seed = 42))
      .limit(Packer.WidthProbeRows)
    val meanWidth = Option(s.agg(avg(widthExpr)).collect()(0).get(0))
      .map(_.asInstanceOf[Double]).getOrElse(0.0)
    val rows = prepared.count()
    val est = math.max(0L, (rows * meanWidth).toLong)
    val minParts = df.sparkSession.sparkContext.defaultParallelism
    val rec = graft.ext.Tuning.partitionsForBytes(est, bytesPerPartition,
      minPartitions = math.max(1, minParts), maxPartitions = maxPartitions)
    (est, rec)
  }

  /** Auto strategy dispatch: run [[choosePackStrategy]]'s pick. Contents
    * are identical under every strategy; only the shuffle shape changes.
    * EAGER: the probe runs Spark jobs at call time (see
    * [[choosePackStrategy]]); the returned pack itself stays lazy. */
  def packAuto(df: DataFrame, toLevel: String,
               extraColumns: ExtraColumns = ExtraColumns.Preserve,
               saltBuckets: Int = 32, skewFactor: Double = 8.0,
               sampleFraction: Double = 0.01,
               splitJoinWidthFactor: Double = 1.0,
               minChildrenPerRoot: Double = 4.0): DataFrame =
    choosePackStrategy(df, skewFactor, sampleFraction,
      splitJoinWidthFactor, minChildrenPerRoot) match {
      case PackStrategy.Salted => packSalted(df, toLevel, saltBuckets, extraColumns)
      case PackStrategy.SplitJoin =>
        pack(df, toLevel, extraColumns, ParentStrategy.SplitJoin)
      case PackStrategy.Plain => pack(df, toLevel, extraColumns)
    }

  private def packSingleLevelSalted(df0: DataFrame, levelIdx: Int,
                                    saltBuckets: Int,
                                    auditCtx: AuditCtx = new AuditCtx): DataFrame = {
    var df = df0
    if (preserveChildOrder && !hasCol(df, RowIdCol))
      df = df.select((monotonically_increasing_id().alias(RowIdCol) +:
        df.schema.fieldNames.toIndexedSeq.map(topCol)): _*)

    val meta = metas(levelIdx)
    val levelCols = df.schema.fieldNames.toIndexedSeq
      .filter(c => meta.prefix.nonEmpty && c.startsWith(meta.prefix))
    if (levelCols.isEmpty) return df
    val groupKeys = meta.ancestorKeys
    if (groupKeys.isEmpty) return packSingleLevel(df, levelIdx)

    val orderExprs = meta.spec.orderBy
    val orderTempCols: Seq[String] = orderExprs.indices.map(i => s"$OrderTempPrefix$i")
    df = orderExprs.zip(orderTempCols).foldLeft(df) {
      case (d, (e, a)) => d.withColumn(a, e)
    }
    // deterministic salt from this level's own ids: a hot parent's children
    // spread across buckets; the same child always lands in the same bucket.
    // With no id columns present, fall back to hashing ALL level columns —
    // an argless xxhash64 would be a constant and silently disable the
    // skew spreading this method exists for.
    val saltSource = {
      val ids = meta.idColumns.filter(hasCol(df, _))
      if (ids.nonEmpty) ids else levelCols
    }
    df = df.withColumn(SaltCol,
      pmod(xxhash64(saltSource.map(topCol): _*), lit(saltBuckets.toLong)))

    val structExpr = struct(levelCols.map(c =>
      topCol(c).alias(c.substring(meta.prefix.length))): _*).alias(meta.path)
    val others = df.schema.fieldNames.toIndexedSeq.filterNot(levelCols.contains)
    df = df.select((others.map(topCol) :+ structExpr): _*)

    val hasRowId = hasCol(df, RowIdCol)
    val excluded = groupKeys.toSet ++ orderTempCols + meta.path + SaltCol ++
      (if (hasRowId) Set(RowIdCol) else Set.empty[String])
    val remaining = df.schema.fieldNames.toIndexedSeq.filterNot(excluded.contains)
    val sortByCols = orderTempCols ++ (if (preserveChildOrder && hasRowId) Seq(RowIdCol) else Nil)

    def firstAggs = remaining.map(c => first(topCol(c), ignoreNulls = true).alias(c))
    def rowIdAgg = if (preserveChildOrder && hasRowId)
      Seq(min(topCol(RowIdCol)).alias(RowIdCol)) else Nil

    // M10 audit rides both phases: per-(keys,salt) min/max in phase 1,
    // min-of-mins / max-of-maxes per keys in phase 2 — composes exactly
    // because min/max are associative (see packSingleLevel's audit note).
    val doAudit = validateOnPack && remaining.nonEmpty
    val auditP1 =
      if (doAudit) remaining.zipWithIndex.flatMap { case (c, i) => Seq(
        min(topCol(c)).alias(s"${AuditPrefix}min_$i"),
        max(topCol(c)).alias(s"${AuditPrefix}max_$i")) }
      else Nil
    val auditP2 =
      if (doAudit) remaining.indices.flatMap { i => Seq(
        min(col(s"${AuditPrefix}min_$i")).alias(s"${AuditPrefix}min_$i"),
        max(col(s"${AuditPrefix}max_$i")).alias(s"${AuditPrefix}max_$i")) }
      else Nil

    // phase 1: partial chunks per (keys, salt) — keyed structs, unsorted
    val keyed =
      if (sortByCols.isEmpty) topCol(meta.path)
      else struct((sortByCols.zipWithIndex.map { case (c, i) =>
        topCol(c).alias(s"__k$i") } :+ topCol(meta.path).alias("__payload")): _*)
    val phase1Aggs = firstAggs ++ Seq(collect_list(keyed).alias(meta.path)) ++ rowIdAgg ++ auditP1
    val partial = df.groupBy((groupKeys :+ SaltCol).map(topCol): _*)
      .agg(phase1Aggs.head, phase1Aggs.tail: _*)

    // phase 2: merge chunks per keys — flatten, sort once, strip sort keys
    val merged: Column = {
      if (sortByCols.isEmpty) flatten(collect_list(topCol(meta.path))).alias(meta.path)
      else {
        val sorted = sortKeyed(df.schema(meta.path).dataType,
          flatten(collect_list(topCol(meta.path))), sortByCols.size)
        transform(sorted, x => x.getField("__payload")).alias(meta.path)
      }
    }
    val phase2Aggs = firstAggs ++ Seq(merged) ++ rowIdAgg ++ auditP2
    val packed = partial.groupBy(groupKeys.map(topCol): _*)
      .agg(phase2Aggs.head, phase2Aggs.tail: _*)
    if (!doAudit) packed
    else runUniformityAudit(packed, remaining, meta.name, auditCtx)
  }

  // ------------------------------------------------------- streaming parity

  /** P5: parity API for the reference's `pack_streaming`
    * (hierarchical_packer.py:1103-1211). The reference hash-buckets rows by
    * root key and packs each bucket via Parquet staging to bound single-node
    * memory; in Spark the pack's own hash shuffle already bounds per-task
    * memory, so this is `repartition(partitions, rootKeys)` + pack. The
    * repartition pre-shards groups exactly like the reference's buckets.
    *
    * `partitions = 0` (the default since round 12) DERIVES the shard
    * count from the frame's own estimated shuffle payload
    * ([[estimatedShuffle]] — the planPack width probe at the ~128 MB
    * per-reducer target, floored at the session parallelism), so the one
    * remaining fixed width in the pack family follows the data like
    * every other shuffle this library sizes. The reference's literal 64
    * (hierarchical_packer.py:1106 `num_buckets=64`) remains ONLY the
    * fallback when the probe is disabled or unusable
    * (`sampleFraction <= 0`, or an empty/all-null sample estimating 0
    * bytes). Explicit `partitions >= 1` passes through untouched — the
    * probe is EAGER (two Spark jobs), so callers who know their width
    * should keep passing it. */
  def packStreaming(df: DataFrame, toLevel: String, partitions: Int = 0,
                    extraColumns: ExtraColumns = ExtraColumns.Preserve,
                    sinkPath: Option[String] = None,
                    sampleFraction: Double = 0.01): DataFrame = {
    if (partitions < 0) throw new HierarchyConfigError(
      s"partitions must be >= 1 (or 0 = derive from the width probe), " +
        s"got $partitions")
    val derived =
      if (partitions >= 1) partitions
      else if (sampleFraction <= 0) Packer.DefaultStreamingPartitions
      else {
        val (est, rec) = estimatedShuffle(df, sampleFraction)
        if (est <= 0) Packer.DefaultStreamingPartitions else rec
      }
    packStreamingAt(df, toLevel, derived, extraColumns, sinkPath)
  }

  private def packStreamingAt(df: DataFrame, toLevel: String, partitions: Int,
                              extraColumns: ExtraColumns,
                              sinkPath: Option[String]): DataFrame = {
    val (prepared, added) = prepareFrame(df) // assign row ids BEFORE the shuffle
    val rootKeys = metas.head.idColumns.filter(hasCol(prepared, _))
    val sharded =
      if (rootKeys.isEmpty) prepared.repartition(partitions)
      else prepared.repartition(partitions, rootKeys.map(topCol): _*)
    // go straight to the aggregate path over the already-prepared shards:
    // preSharded stops packAggregate's own coarsest-key repartition from
    // collapsing with (and overriding) the explicit `partitions` shuffle
    val out = dropIfPresent(
      packAggregate(sharded, toLevel, extraColumns, Nil, preSharded = true), added)
    sinkPath match {
      // reference `defer=False`: sink eagerly, hand back the re-scan
      case Some(p) => out.write.mode("overwrite").parquet(p); out.sparkSession.read.parquet(p)
      case None => out
    }
  }

  /** Parquet-path source overload (the reference accepts `str | Path`
    * sources, hierarchical_packer.py:1105): scan-pack from disk without
    * the caller materializing a frame first. */
  def packStreaming(spark: org.apache.spark.sql.SparkSession, sourcePath: String,
                    toLevel: String, partitions: Int,
                    extraColumns: ExtraColumns,
                    sinkPath: Option[String]): DataFrame =
    packStreaming(spark.read.parquet(sourcePath), toLevel, partitions,
      extraColumns, sinkPath)

  /** P6: parity API for `unpack_streaming` (hierarchical_packer.py:1213-1250):
    * optional disk-to-disk staging around unpack.
    *
    * EAGER when `sinkPath` is set: the staging parquet write (overwrite)
    * executes at CALL time, mirroring the reference's eager staging dance —
    * schema-only consumers should call with `sinkPath = None`. */
  def unpackStreaming(df: DataFrame, toLevel: String,
                      sinkPath: Option[String] = None): DataFrame = {
    val out = unpack(df, toLevel)
    sinkPath match {
      case Some(p) => out.write.mode("overwrite").parquet(p); out.sparkSession.read.parquet(p)
      case None => out
    }
  }

  // ------------------------------------------------------------------ merge

  /** Incremental pack maintenance (upsert): merge newly-arrived FLAT rows
    * into an already-packed frame, repacking ONLY the touched entities.
    * This is the exact cross-batch merge that [[packStreaming]]'s
    * foreachBatch sink delegates to the storage layer — expressed as a
    * batch operator so any upsert-capable sink (or
    * `EventStreams.packUpsertEachBatch`) can maintain a packed table
    * incrementally.
    *
    * Plan shape (the 100 TB story): the delta's DISTINCT top-level keys
    * split `packed` with a semi + anti join — AQE broadcasts the key set
    * when the delta is small, so the untouched majority of the packed
    * table is a PASSTHROUGH: never unpacked, never shuffled. Only rows
    * for touched keys are unpacked to the leaf, unioned with the delta,
    * and repacked — incremental cost is O(delta + touched-entity
    * payload), not O(corpus).
    *
    * Semantics: for touched keys the result is exactly
    * `pack(oldFlatRows ++ newRows, toLevel)` — child order follows the
    * spec's `orderBy` when present; under bare `preserveChildOrder`,
    * existing children keep their packed order and new children append
    * after them (the union scans affected partitions before delta
    * partitions, so the repack's row ids preserve old-before-new).
    * Brand-new keys in `newRows` pack into fresh rows; parent-attribute
    * conflicts between old and new rows resolve like any pack
    * (first-non-null, uniformity-auditable via `validateOnPack`). */
  def mergePacked(packed: DataFrame, newRows: DataFrame, toLevel: String,
                  extraColumns: ExtraColumns = ExtraColumns.Preserve): DataFrame = {
    val targetIdx = spec.levelIndex(toLevel)
    // rows of a packed frame are identified by the grouping keys of its
    // last aggregating stage: toLevel's ancestorKeys — unless the target
    // is the ROOT fold (no ancestors), where they are the root level's
    // own id columns, which the fold moved INSIDE the root struct
    val rootFold = metas(targetIdx).ancestorKeys.isEmpty
    val keys: Seq[String] =
      if (!rootFold) metas(targetIdx).ancestorKeys
      else metas.lift(targetIdx + 1).map(_.ancestorKeys).getOrElse(Seq.empty)
    if (keys.isEmpty) throw new HierarchyConfigError(
      s"mergePacked needs top-level keys at '$toLevel' to identify entities")
    val rootMeta = metas(targetIdx)
    def packedKey(k: String): Column =
      if (!rootFold) topCol(k)
      else topCol(rootMeta.path).getField(k.substring(rootMeta.prefix.length))

    val (newPrepared, newAdded) = prepareFrame(newRows)
    val missing = keys.filterNot(hasCol(newPrepared, _))
    if (missing.nonEmpty) throw new HierarchyError(
      s"mergePacked: delta is missing top-level key columns: ${missing.mkString(", ")}")
    // canonical flat shape: computed helper keys AND the row ids
    // prepareFrame just assigned must go — the repack assigns UNION-WIDE
    // row ids so existing children sort before new ones; a leaked
    // delta-local id would leave the unpacked old rows null-id'd
    val newAligned = dropIfPresent(newPrepared, newAdded :+ RowIdCol)

    // distinct touched keys under FRESH aliases: the delta often shares
    // lineage with the packed frame (two filters of one source), and
    // unaliased attributes would make the split joins ambiguous
    // self-joins. Null-safe equality (<=>): pack keeps a null-keyed
    // group, and a delta row for it must reach that group.
    val tNames = keys.indices.map(i => s"__mt_$i")
    val touched = newPrepared.select(keys.zip(tNames).map {
      case (k, t) => topCol(k).alias(t) }: _*).distinct()
    val cond = keys.zip(tNames).map { case (k, t) =>
      packedKey(k) <=> col(t) }.reduce(_ && _)
    val untouched = packed.join(touched, cond, "left_anti")
    val affected = packed.join(touched, cond, "left_semi")

    // unpack affected entities to the LEAF and replay the pack over
    // old ++ new. unionByName(allowMissing) tolerates a narrower delta
    // (absent attributes arrive null, like any sparse flat input).
    val affectedFlat = unpack(affected, metas.last.name)
    val unioned = affectedFlat.unionByName(newAligned, allowMissingColumns = true)
    val mergedAffected = pack(unioned, toLevel, extraColumns)
    untouched.unionByName(mergedAffected, allowMissingColumns = true)
  }

  // -------------------------------------------------------------- validation

  /** Per-pack-invocation chain of M10 audit caches: each new cache
    * supersedes (unpersists) the previous one from the SAME invocation;
    * the final one is left alive to serve the returned frame, and is
    * registered in [[liveAuditCaches]] so [[releaseAuditCaches]] can
    * reclaim it once the caller has consumed the result. */
  private[graft] final class AuditCtx {
    private var prev: DataFrame = _
    def supersede(next: DataFrame): Unit = synchronized {
      if (prev != null) { prev.unpersist(false); liveAuditCaches.remove(prev) }
      prev = next
      liveAuditCaches.add(next)
    }
  }

  /** Final audit caches still alive from completed validating packs. */
  private val liveAuditCaches =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.IdentityHashMap[DataFrame, java.lang.Boolean]()))

  /** Unpersist every audit cache left alive by prior `validateOnPack`
    * packs on THIS Packer. Call after the packed results have been
    * consumed (written/collected): frames returned earlier stay correct —
    * they just recompute on next use. Safe to call repeatedly; packs in
    * flight on other threads re-register their caches as they finish. */
  def releaseAuditCaches(): Unit = {
    val snapshot = liveAuditCaches.toArray(Array.empty[AnyRef])
    snapshot.foreach { df =>
      try df.asInstanceOf[DataFrame].unpersist(false)
      catch { case _: Throwable => () }
      liveAuditCaches.remove(df)
    }
  }

  /** M10: grouped values must be identical within each group before the
    * first-non-null dedup (reference: _validate_aggregation_uniformity,
    * hierarchical_packer.py:2700-2740). The per-group evidence
    * (`min`/`max` audit columns) rides the pack's OWN groupBy — no second
    * scan of the raw frame. The packed output is persisted
    * (MEMORY_AND_DISK) so the eager check and the caller's downstream
    * action share one shuffle; the check job materializes the cache.
    * Cache lifetime is scoped to ONE pack invocation via [[AuditCtx]]:
    * within a call each level's cache supersedes (unpersists) the
    * previous level's, and the final cache stays hot to serve the
    * returned frame. Interleaved or concurrent packs on one Packer never
    * evict each other's results; ContextCleaner reclaims the survivors
    * once unreferenced. */
  private def runUniformityAudit(packedWithAudit: DataFrame, valueCols: Seq[String],
                                 levelName: String, ctx: AuditCtx): DataFrame = {
    val persisted = packedWithAudit.persist(StorageLevel.MEMORY_AND_DISK)
    val checks = valueCols.indices.map(i =>
      max(when(!(col(s"${AuditPrefix}min_$i") <=> col(s"${AuditPrefix}max_$i")), 1L)
        .otherwise(0L)))
    // this collect scans every partition → fully populates the cache
    val row = persisted.agg(checks.head, checks.tail: _*).collect()(0)
    ctx.supersede(persisted)
    valueCols.zipWithIndex.foreach { case (c, i) =>
      // agg over zero rows yields null — an empty frame has no violations
      if (!row.isNullAt(i) && row.getLong(i) > 0) {
        persisted.unpersist(false)
        throw new HierarchyValidationError(
          s"Column '$c' has non-uniform values within groups at level '$levelName'. " +
            "Values at coarser granularity should be identical within each group.",
          level = Some(levelName), details = Map("column" -> c))
      }
    }
    val auditCols = valueCols.indices.flatMap(i =>
      Seq(s"${AuditPrefix}min_$i", s"${AuditPrefix}max_$i"))
    persisted.drop(auditCols: _*)
  }

  /** M8: data validation — null counts in key columns, batched into ONE
    * aggregation pass (reference: validate, hierarchical_packer.py:1667-1717
    * runs one eager collect per key). EAGER: the aggregation job runs at
    * CALL time and the result is returned as a driver-side map. */
  def validate(df: DataFrame, level: String, raiseOnError: Boolean = true): Map[String, Long] = {
    val keys = spec.levelKeys(level, includeAncestors = true).filter(hasCol(df, _))
    if (keys.isEmpty) return Map.empty
    val aggs = keys.map(k => sum(when(topCol(k).isNull, 1L).otherwise(0L)).alias(k))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    // sum() over zero rows is null — an empty frame has zero null keys
    val counts = keys.zipWithIndex.map { case (k, i) =>
      k -> (if (row.isNullAt(i)) 0L else row.getLong(i))
    }.toMap
    val bad = counts.filter(_._2 > 0)
    if (bad.nonEmpty && raiseOnError) throw new HierarchyValidationError(
      s"Null values in key columns at level '$level': " +
        bad.map { case (k, n) => s"$k=$n" }.mkString(", "),
      level = Some(level),
      details = bad.map { case (k, n) => k -> n.toString })
    counts
  }

  /** M10 as a QUERYABLE report (the enforcing in-pack audit throws on the
    * first violation; reference: validate_aggregation_uniformity,
    * hierarchical_packer.py:1719-1780 raises the same way): for the pack
    * stage that folds `level` into its parent keys, count the groups in
    * which each coarser-granularity column is NOT uniform. Null semantics
    * match the in-pack audit exactly — nulls are ignored (min/max), a
    * group violates iff min(c) is not null-safe-equal to max(c), so an
    * all-null group is uniform and nulls alongside one distinct value are
    * uniform.
    *
    * Returns one row per audited column: (column STRING, violating_groups
    * BIGINT). Scale shape: groupBy(keys) with min/max partial aggregation
    * (map-side combine, no Expand) followed by a 1-row global sum, then a
    * driver-free unpivot of that single row — one shuffle total. */
  def uniformityReport(df0: DataFrame, level: String): DataFrame = {
    val (prepared, added) = prepareFrame(df0)
    val meta = metas(spec.levelIndex(level))
    require(meta.ancestorKeys.nonEmpty,
      s"level '$level' is the root — uniformity is defined within parent groups")
    val groupKeys = meta.ancestorKeys.filter(hasCol(prepared, _))
    // all ancestor keys absent would degrade groupBy() to ONE global
    // group and silently report whole-frame uniformity — error instead
    require(groupKeys.nonEmpty,
      s"none of the ancestor key columns ${meta.ancestorKeys.mkString("[", ", ", "]")} " +
        s"exist in the frame — cannot audit uniformity at level '$level'")
    val excluded = groupKeys.toSet ++ added + RowIdCol
    val audited = prepared.schema.fieldNames.toIndexedSeq.filter { c =>
      !excluded.contains(c) && !(meta.prefix.nonEmpty && c.startsWith(meta.prefix))
    }
    require(audited.nonEmpty,
      s"no coarser-granularity columns to audit at level '$level'")
    val mmAggs = audited.zipWithIndex.flatMap { case (c, i) => Seq(
      min(topCol(c)).alias(s"__mn_$i"), max(topCol(c)).alias(s"__mx_$i")) }
    val perGroup = prepared.groupBy(groupKeys.map(topCol): _*)
      .agg(mmAggs.head, mmAggs.tail: _*)
    val vioAggs = audited.indices.map(i =>
      sum(when(!(col(s"__mn_$i") <=> col(s"__mx_$i")), 1L).otherwise(0L))
        .alias(s"__v_$i"))
    val row = perGroup.agg(vioAggs.head, vioAggs.tail: _*)
    // unpivot the 1-row violation vector to (column, violating_groups);
    // sum over zero groups is null — an empty frame has no violations
    val stacked = audited.zipWithIndex.map { case (c, i) =>
      struct(lit(c).alias("column"),
        coalesce(col(s"__v_$i"), lit(0L)).alias("violating_groups")) }
    row.select(explode(array(stacked: _*)).alias("__r"))
      .select(col("__r.column").alias("column"),
        col("__r.violating_groups").alias("violating_groups"))
  }

  private def dropInternal(df: DataFrame): DataFrame =
    dropIfPresent(df, Seq(RowIdCol, SaltCol) ++
      df.schema.fieldNames.filter(_.startsWith(OrderTempPrefix)))
}

object Packer {
  /** Internal columns (reference: hierarchical_packer.py:37-38). */
  val RowIdCol = "__hier_row_id"
  val OrderTempPrefix = "__hier_order_"
  val SaltCol = "__hier_salt"
  val AuditPrefix = "__hier_audit_"
  /** Row cap for the choosePackStrategy width probe. */
  val WidthProbeRows = 1000
  /** [[Packer.packStreaming]]'s fallback shard count when the width probe
    * is disabled or unusable — the reference's literal `num_buckets=64`
    * (hierarchical_packer.py:1106). The probed default sizes from the
    * frame's estimated shuffle bytes instead. */
  val DefaultStreamingPartitions = 64

  /** Schema-aware per-row serialized-width estimate (bytes, Double) for
    * the [[Packer.choosePackStrategy]] probe. Fixed-width scalars are
    * plan-time constants, strings/binary read `octet_length` directly,
    * arrays of fixed-width elements cost `size(c) * elemWidth` — all
    * codegen'd, zero serialization — and only irregular shapes (arrays
    * of strings/structs, maps) fall back to `octet_length(to_json(...))`.
    * Only the RATIO between column groups is consumed and both groups
    * use the same estimator, so the unit (in-memory bytes vs JSON chars)
    * cancels. Known bias: a null struct counts its full fixed width —
    * fine for a strategy probe. */
  private[graft] def widthOf(dt: DataType, c: Column): Column = {
    def fixed(t: DataType): Option[Double] = t match {
      case BooleanType | ByteType => Some(1.0)
      case ShortType => Some(2.0)
      case IntegerType | FloatType | DateType => Some(4.0)
      case LongType | DoubleType | TimestampType | TimestampNTZType => Some(8.0)
      case _: DecimalType => Some(16.0)
      case _ => None
    }
    dt match {
      case t if fixed(t).isDefined => lit(fixed(t).get)
      case StringType | BinaryType =>
        coalesce(octet_length(c).cast(DoubleType), lit(0.0))
      case ArrayType(et, _) if fixed(et).isDefined =>
        coalesce(size(c).cast(DoubleType), lit(0.0)) * fixed(et).get
      case st: StructType =>
        if (st.fields.isEmpty) lit(0.0)
        else st.fields.toIndexedSeq
          .map(f => widthOf(f.dataType, c.getField(f.name))).reduce(_ + _)
      case _ =>
        coalesce(octet_length(to_json(struct(c))), lit(0)).cast(DoubleType)
    }
  }
}
