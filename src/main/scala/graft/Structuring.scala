package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Structuring utilities (reference: nexpresso/structuring_utils.py). */
object Structuring {

  /** S1: schema → nested plain map (structuring_utils.py:6-40).
    * Struct → Map(field -> ...), Array → Seq(inner), scalar → type name. */
  def schemaToMap(dtype: DataType): Any = dtype match {
    case st: StructType => st.fields.map(f => f.name -> schemaToMap(f.dataType)).toMap
    case ArrayType(inner, _) => Seq(schemaToMap(inner))
    case other => other.simpleString
  }

  /** S2: flatten one struct column, prefixing its fields `col<sep>field`
    * (structuring_utils.py:43-46). Other columns untouched; the struct's
    * fields appear at the struct column's position. */
  def unnestRename(df: DataFrame, colNameStr: String, separator: String = "."): DataFrame = {
    val field = df.schema.fields.find(_.name == colNameStr).getOrElse(
      throw new IllegalArgumentException(s"column '$colNameStr' not found"))
    val st = field.dataType match {
      case s: StructType => s
      case other => throw new IllegalArgumentException(
        s"column '$colNameStr' is ${other.simpleString}, not a struct")
    }
    val cols = df.schema.fields.toIndexedSeq.flatMap { f =>
      if (f.name == colNameStr)
        st.fieldNames.toIndexedSeq.map(fn =>
          ColName.topCol(colNameStr).getField(fn).alias(s"$colNameStr$separator$fn"))
      else Seq(ColName.topCol(f.name))
    }
    df.select(cols: _*)
  }

  /**
   * Schema-drift union (Spark-only addition): union N frames BY NAME,
   * filling columns a frame lacks with nulls and WIDENING shared
   * columns to their tightest common type (int → bigint, float →
   * double, …) via Catalyst's own `findTightestCommonType` — the shape
   * of reading heterogeneous parquet dumps whose schema evolved across
   * days. Column order follows first appearance across the inputs.
   * Incompatible shared types (e.g. string vs array) throw with the
   * column named. Purely a plan rewrite: casts + unionByName, no
   * shuffles, no data pass beyond the union itself.
   */
  def unionEvolve(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "unionEvolve needs at least one frame")
    val coercion = org.apache.spark.sql.catalyst.analysis.TypeCoercion
    // merged (name → widened type), ordered by first appearance
    val order = scala.collection.mutable.LinkedHashMap[String, DataType]()
    for (df <- dfs; f <- df.schema.fields) {
      order.get(f.name) match {
        case None => order(f.name) = f.dataType
        case Some(t) if t == f.dataType => ()
        case Some(t) =>
          order(f.name) = coercion.findTightestCommonType(t, f.dataType)
            .getOrElse(throw new IllegalArgumentException(
              s"unionEvolve: column '${f.name}' has incompatible types " +
                s"${t.simpleString} vs ${f.dataType.simpleString}"))
      }
    }
    val aligned = dfs.map { df =>
      val have = df.schema.fieldNames.toSet
      df.select(order.toSeq.map { case (n, t) =>
        if (have(n)) ColName.topCol(n).cast(t).alias(n)
        else org.apache.spark.sql.functions.lit(null).cast(t).alias(n)
      }: _*)
    }
    aligned.reduce(_.unionByName(_))
  }

  /** S3: recursively flatten ALL struct columns until none remain
    * (structuring_utils.py:49-58). Arrays are left intact (same as the
    * reference — only bare Structs unnest). */
  def unnestAll(df: DataFrame, separator: String = "."): DataFrame = {
    var cur = df
    var structCols = cur.schema.fields.collect { case f if f.dataType.isInstanceOf[StructType] => f.name }
    while (structCols.nonEmpty) {
      cur = structCols.foldLeft(cur)((d, c) => unnestRename(d, c, separator))
      structCols = cur.schema.fields.collect { case f if f.dataType.isInstanceOf[StructType] => f.name }
    }
    cur
  }
}
