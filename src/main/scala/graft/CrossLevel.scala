package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-level aggregation kernel names (reference: PromoteAggregation,
  * hierarchical_packer.py:1860-1887). */
object Agg {
  val List = "list"; val Set = "set"; val Sum = "sum"; val Mean = "mean"
  val Min = "min"; val Max = "max"; val First = "first"; val Last = "last"
  val Count = "count"; val Single = "single"
  val all: Seq[String] = Seq(List, Set, Sum, Mean, Min, Max, First, Last, Count, Single)
}

/**
 * Cross-level query operators Q1-Q6 over packed frames (reference:
 * hierarchical_packer.py:1860-2238).
 *
 * Everything compiles to Spark higher-order functions (`transform`,
 * `exists`, `forall`, `aggregate`, `array_distinct`, ...) — codegen-friendly
 * Column trees, zero UDFs, zero shuffles: these are narrow, per-row
 * expressions over already-packed List[Struct] columns.
 *
 * All kernels are ANSI-mode-safe (Spark 4.x default): empty-list first/last
 * use `get` (null, never an error), mean uses `try_divide` (null on 0/0).
 */
trait CrossLevelOps { self: Packer =>

  private def cn2 = spec.colName
  private def metas2 = spec.metadata

  /** Q2 kernels applied at the FINAL (innermost) hop. Numeric results are
    * DoubleType for sum/mean (the reference preserves the input dtype via
    * Polars' engine; Spark HOF accumulation standardizes on double),
    * LongType for count. */
  private def finalAgg(agg: String): Column => Column = agg match {
    case Agg.List  => identity
    case Agg.Set    => e => array_distinct(filter(e, x => x.isNotNull))
    case Agg.Sum    => sumKernel
    // `let`-bound via [[once]] — NOT try_divide(sum(e), count(e)) on the
    // raw argument: kernels must reference `e` exactly ONCE. HOFs are
    // interpreted (no codegen CSE) and in attributeExpr `e` is the whole
    // nested transform chain, so a kernel referencing it k times costs
    // k^hops evaluations in multi-hop cascades. Lambda-variable references
    // are reads of the already-evaluated value, so inside `once` the
    // two-pass sum/count form is fine (and beats a per-element struct
    // accumulator, which allocates per element).
    case Agg.Mean   => e => once(e)(a =>
      try_divide(sumKernel(a), size(filter(a, x => x.isNotNull))))
    case Agg.Min    => e => array_min(e)
    case Agg.Max    => e => array_max(e)
    case Agg.First  => e => get(e, lit(0))
    case Agg.Last   => e => once(e)(a => get(a, size(a) - lit(1)))
    case Agg.Count  => e => size(e).cast(LongType)
    case Agg.Single => e => get(array_distinct(filter(e, x => x.isNotNull)), lit(0))
    case other => throw new HierarchyConfigError(
      s"unknown aggregation '$other'; known: ${Agg.all.mkString(", ")}")
  }

  /** Q2 kernels for INTERMEDIATE hops — identical except `count`, which sums
    * the per-child counts instead of re-counting the outer list
    * (hierarchical_packer.py:1873-1887). The sum-of-counts stays LongType
    * like the single-hop count (the reference keeps integer counts too);
    * exact for any count below 2^53. NB multi-hop `mean` is mean-of-means
    * BY DESIGN (hierarchical_packer.py:1920-1921) — do not "fix" it into a
    * true mean. */
  private def intermediateAgg(agg: String): Column => Column = agg match {
    case Agg.Count => e => sumKernel(e).cast(LongType)
    case other => finalAgg(other)
  }

  /** Spark has no array_sum built-in — `aggregate` HOF, null-tolerant
    * (Polars list.sum ignores nulls; empty list sums to 0). */
  private def sumKernel: Column => Column = e =>
    aggregate(e, lit(0.0), (acc, x) => acc + coalesce(x.cast(DoubleType), lit(0.0)))

  /** See [[ColExprs.once]] — let-binding so kernels reference their
    * (possibly deeply nested) argument exactly once. */
  private def once(e: Column)(body: Column => Column): Column =
    ColExprs.once(e)(body)

  /** Q1: ONE composable expression aggregating a descendant-level field up
    * to the packed level (reference: attribute_expr,
    * hierarchical_packer.py:1889-1991). Usable with filter/withColumn/sort/
    * arithmetic on a frame packed at `toLevel`. */
  def attributeExpr(attribute: String, fromLevel: String, toLevel: String,
                    agg: String = Agg.List): Column = {
    val fromIdx = spec.levelIndex(fromLevel)
    val toIdx = spec.levelIndex(toLevel)
    if (fromIdx < toIdx) throw new HierarchyConfigError(
      s"from_level '$fromLevel' (index $fromIdx) must be at the same or finer " +
        s"granularity as to_level '$toLevel' (index $toIdx).")
    val toMeta = metas2(toIdx)

    if (fromIdx == toIdx)
      return ColName.topCol(toMeta.prefix + cn2.escapeField(attribute))

    // traverse(0) = immediate child of toLevel (the outermost nested column);
    // traverse.last = fromLevel (innermost)
    val traverse = (toIdx + 1) to fromIdx
    val nHops = traverse.size
    // innermost: extract the attribute from a fromLevel element
    var inner: Column => Column = x => x.getField(attribute)
    ((nHops - 1) until 0 by -1).foreach { hop =>
      val parentMeta = metas2(traverse(hop - 1))
      val childMeta = metas2(traverse(hop))
      val fieldInParent = childMeta.path.substring(parentMeta.prefix.length)
      val aggFn = if (hop == nHops - 1) finalAgg(agg) else intermediateAgg(agg)
      val prev = inner
      inner = x => aggFn(transform(x.getField(fieldInParent), e => prev(e)))
    }
    val immChild = metas2(traverse.head)
    val outerAgg = if (nHops == 1) finalAgg(agg) else intermediateAgg(agg)
    outerAgg(transform(ColName.topCol(immChild.path), e => inner(e)))
  }

  /** Q3: batch-add cross-level attribute columns (reference: enrich,
    * hierarchical_packer.py:1993-2038). Frame must be packed at `atLevel`. */
  def enrich(df: DataFrame, atLevel: String, attrs: LevelAttribute*): DataFrame = {
    val toMeta = spec.meta(atLevel)
    attrs.foldLeft(df) { (d, a) =>
      val expr = attributeExpr(a.attribute, a.fromLevel, atLevel, a.agg)
      d.withColumn(toMeta.prefix + cn2.escapeField(a.alias.getOrElse(a.attribute)), expr)
    }
  }

  private def requireAdjacent(fromLevel: String, toLevel: String): LevelMetadata = {
    val fromIdx = spec.levelIndex(fromLevel)
    val toIdx = spec.levelIndex(toLevel)
    if (fromIdx != toIdx + 1) throw new HierarchyConfigError(
      s"from_level '$fromLevel' must be the immediate child of to_level " +
        s"'$toLevel'. Got indices $fromIdx and $toIdx.")
    metas2(fromIdx)
  }

  /** Q4: keep rows where AT LEAST ONE immediate child satisfies `condition`
    * (reference: any_child_satisfies, hierarchical_packer.py:2040-2101).
    * condition receives a child struct element. Rows with null child lists
    * are dropped (null predicate), matching Polars. */
  def anyChildSatisfies(df: DataFrame, fromLevel: String, toLevel: String,
                        condition: Column => Column): DataFrame = {
    val fromMeta = requireAdjacent(fromLevel, toLevel)
    df.filter(exists(ColName.topCol(fromMeta.path), condition))
  }

  /** Q5: keep rows where ALL immediate children satisfy `condition` —
    * vacuously TRUE for empty child lists (reference: all_children_satisfy,
    * hierarchical_packer.py:2103-2168; sum==len comparison). */
  def allChildrenSatisfy(df: DataFrame, fromLevel: String, toLevel: String,
                         condition: Column => Column): DataFrame = {
    val fromMeta = requireAdjacent(fromLevel, toLevel)
    df.filter(forall(ColName.topCol(fromMeta.path), condition))
  }

  /** Q6: pack so `fromLevel` is nested, then add the aggregated attribute at
    * `toLevel` (reference: promote_attribute, hierarchical_packer.py:2170-2238). */
  def promoteAttribute(df: DataFrame, attribute: String, fromLevel: String,
                       toLevel: String, agg: String = Agg.List,
                       alias: Option[String] = None): DataFrame = {
    val fromMeta = requireAdjacent(fromLevel, toLevel)
    val toMeta = spec.meta(toLevel)
    val packed = pack(df, fromLevel)
    validateListStructField(packed.schema, fromMeta.path, attribute, fromLevel)
    val outCol = toMeta.prefix + cn2.escapeField(alias.getOrElse(attribute))
    packed.withColumn(outCol, attributeExpr(attribute, fromLevel, toLevel, agg))
  }

  private def validateListStructField(schema: StructType, listCol: String,
                                      attribute: String, levelName: String): Unit = {
    if (!schema.fieldNames.contains(listCol)) throw new HierarchyConfigError(
      s"Expected packed column '$listCol' not found in schema. " +
        s"Available columns: ${schema.fieldNames.mkString(", ")}")
    val inner = schema(listCol).dataType match {
      case ArrayType(s: StructType, _) => s
      case s: StructType => s
      case other => throw new HierarchyConfigError(
        s"Expected struct inside list column '$listCol', got ${other.simpleString}.")
    }
    if (!inner.fieldNames.contains(attribute)) throw new HierarchyConfigError(
      s"Attribute '$attribute' not found at level '$levelName'. " +
        s"Available fields: ${inner.fieldNames.mkString(", ")}")
  }
}
