package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Declarative spec for transforming (deeply) nested Struct/List columns.
 *
 * Mirrors the reference's `FieldValue = None | dict | Callable | Expr`
 * (nexpresso/expressions.py:33) as a sealed ADT:
 *
 *  - [[Keep]]        keep the column/field unchanged (reference `None`)
 *  - [[Lit]]         use the given Column as-is (reference bare `pl.Expr`;
 *                    note the reference documents that such expressions
 *                    reference the ORIGINAL struct, never transformed
 *                    siblings — expressions.py:270-274; same here: the
 *                    Column is used verbatim)
 *  - [[Fn]]          apply a function to the existing column/field
 *                    (reference `Callable`)
 *  - [[Nested]]      recurse into a Struct / List(Struct) / List(List(...))
 *                    (reference `dict`)
 */
sealed trait FieldValue
case object Keep extends FieldValue
final case class Lit(column: Column) extends FieldValue
final case class Fn(f: Column => Column) extends FieldValue
/** New/overwritten field computed from the ENCLOSING struct (the function
  * receives the parent struct column — inside arrays, the element). This is
  * the Spark equivalent of the reference's `pl.Expr` specs that use
  * `pl.field(...)`: references always resolve against the ORIGINAL input
  * struct, never transformed siblings (expressions.py:270-274). */
final case class Derive(f: Column => Column) extends FieldValue
final case class Nested(fields: Seq[(String, FieldValue)]) extends FieldValue
object Nested { def apply(fields: (String, FieldValue)*)(implicit d: DummyImplicit): Nested = Nested(fields.toSeq) }

/** Struct handling mode (reference StructMode, expressions.py:36):
  * Select keeps ONLY the listed fields; WithFields keeps all fields and
  * adds/overwrites the listed ones. */
sealed trait StructMode
case object SelectMode extends StructMode
case object WithFieldsMode extends StructMode

/**
 * Compiles nested field specs into Spark Columns (reference:
 * NestedExpressionBuilder, nexpresso/expressions.py:40-287).
 *
 * Spark-first design: list recursion uses the `transform` higher-order
 * function (codegen'd, no UDFs); struct edits use `struct(...)` /
 * `Column.withField`. The whole output stays inside whole-stage codegen
 * and never shuffles (narrow transformations only).
 */
final class NestedExprBuilder(schema: StructType, mode: StructMode = SelectMode) {

  /** E1/E3: one Column per top-level entry, in spec order. */
  def build(fields: Seq[(String, FieldValue)]): Seq[Column] =
    fields.map { case (name, spec) => topLevelField(name, spec) }

  private def topLevelField(name: String, spec: FieldValue): Column = {
    val fieldOpt = schema.fields.find(_.name == name)
    val base = ColName.topCol(name)
    fieldOpt match {
      case None => spec match {
        case Lit(c) => c.alias(name)
        case _ => throw new IllegalArgumentException(
          s"Column '$name' not found in schema. To create a new column, provide a Lit(Column).")
      }
      case Some(f) => spec match {
        case Keep       => base
        case Lit(c)     => c.alias(name)
        case Fn(fn)     => fn(base).alias(name)
        case Derive(fn) => fn(base).alias(name)
        case Nested(fs) => nestedField(f.dataType, fs, base).alias(name)
      }
    }
  }

  /** E5: dispatch on dtype — List/Array recurse element-wise via
    * `transform`, Struct gets per-field handling, else error. */
  private def nestedField(dtype: DataType, spec: Seq[(String, FieldValue)], base: Column): Column =
    dtype match {
      case ArrayType(inner, _) =>
        // E6/E7: list & fixed-array element transform. Polars' list.eval /
        // arr.eval with pl.element() == Spark transform(arr, x => ...).
        transform(base, x => nestedField(inner, spec, x))
      case st: StructType => structField(st, spec, base)
      case other => throw new IllegalArgumentException(
        s"Cannot recurse into field with type ${other.simpleString}. " +
          "Only Struct and Array types support nested operations.")
    }

  /** E8/E9: struct handling per mode. */
  private def structField(st: StructType, spec: Seq[(String, FieldValue)], base: Column): Column = {
    val names = st.fieldNames.toSet
    def fieldExpr(fname: String, fspec: FieldValue): Column = fspec match {
      case Keep       => base.getField(fname)
      case Derive(fn) => fn(base) // receives the original enclosing struct
      case Lit(c) => c // as-is; references resolve against the ORIGINAL input
      case Fn(fn) =>
        if (!names.contains(fname)) throw new IllegalArgumentException(
          s"Cannot apply function to non-existent field '$fname'. Use Lit to create a new field.")
        fn(base.getField(fname))
      case Nested(fs) =>
        if (!names.contains(fname)) throw new IllegalArgumentException(
          s"Cannot recurse into non-existent struct field '$fname'.")
        nestedField(st(fname).dataType, fs, base.getField(fname))
    }
    mode match {
      case SelectMode =>
        struct(spec.map { case (fname, fspec) => fieldExpr(fname, fspec).alias(fname) }: _*)
      case WithFieldsMode =>
        // withField parses unquoted dots as nested paths; quote so field
        // names containing the separator behave like SelectMode's literal
        // aliases
        spec.foldLeft(base) {
          case (acc, (_, Keep)) => acc // keep existing field unchanged
          case (acc, (fname, fspec)) =>
            acc.withField(ColName.quote(fname), fieldExpr(fname, fspec))
        }
    }
  }
}

object NestedExprs {
  /** E1: generate_nested_exprs (expressions.py:290-354). */
  def generate(fields: Seq[(String, FieldValue)], schema: StructType,
               mode: StructMode = SelectMode): Seq[Column] =
    new NestedExprBuilder(schema, mode).build(fields)

  /** E2: apply_nested_operations (expressions.py:358-396).
    * select=true projects to exactly the spec'd columns; otherwise the
    * spec'd columns are added/replaced and all others kept. */
  def apply(df: DataFrame, fields: Seq[(String, FieldValue)],
            mode: StructMode = SelectMode, select: Boolean = false): DataFrame = {
    val exprs = generate(fields, df.schema, mode)
    if (select) df.select(exprs: _*)
    else {
      val specNames = fields.map(_._1).toSet
      // preserve original column order; new columns appended in spec order
      val existing = df.schema.fieldNames.map { n =>
        if (specNames.contains(n)) exprs(fields.indexWhere(_._1 == n)) else ColName.topCol(n)
      }
      val added = fields.collect { case (n, _) if !df.schema.fieldNames.contains(n) =>
        exprs(fields.indexWhere(_._1 == n)) }
      df.select((existing ++ added): _*)
    }
  }
}
