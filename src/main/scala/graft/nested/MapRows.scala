package graft.nested

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Row-wise UDF surface — the port of the reference's `map_rows`
  * (nestedframe/core.py:2207-2545): base columns arrive as scalars, nested
  * fields as per-row sequences (the reference's zero-copy numpy views,
  * ext_array.py:1029-1046).
  *
  * The HOF element-aggregates in [[NestedOps]] (elementMean etc.) are the
  * PREFERRED path — they stay in codegen. `mapRows` is for genuinely
  * imperative per-row kernels (the reference's njit use case); it runs a
  * deserialized `Row => Seq[Any]` lambda, the Scala analog of the reference's
  * compiled kernels (JVM lambdas are already native — SURVEY.md §2.10).
  *
  * Scale: narrow map, no shuffle; input pruned to exactly the requested
  * columns before the lambda (so parquet reads only those leaves).
  */
object MapRows {

  /** Run `fn` over each row. `columns` may be base names or dotted
    * `nest.field` names; dotted fields are delivered to the lambda as
    * `Seq[...]` in declaration order. `fn` returns one value per
    * `outputSchema` field. */
  def mapRows(df: DataFrame, columns: Seq[String],
              outputSchema: StructType)(fn: Seq[Any] => Seq[Any]): DataFrame = {
    val exprs = columns.map { c =>
      NestedOps.resolveDotted(df, c) match {
        case (Some(nest), field) =>
          transform(col(nest), s => s.getField(field)).as(s"${nest}_$field")
        case (None, base) => col(base)
      }
    }
    val pruned = df.select(exprs: _*)
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outputSchema))
    val n = columns.length
    pruned.map { row =>
      val args = (0 until n).map { i =>
        row.get(i) match {
          case s: scala.collection.Seq[_] => s.toSeq
          case other                      => other
        }
      }
      Row.fromSeq(fn(args))
    }(enc)
  }

  /** map_rows + append: compute new columns and join them back positionally
    * onto the input (reference `append_columns`, core.py:2533-2542). Requires
    * a unique key column for the positional identity (pandas index). */
  def mapRowsAppend(df: DataFrame, keyCol: String, columns: Seq[String],
                    outputSchema: StructType)(fn: Seq[Any] => Seq[Any])
      : DataFrame = {
    val withKey = StructType(StructField(keyCol,
      df.schema(keyCol).dataType) +: outputSchema.fields)
    val computed = mapRows(df, keyCol +: columns, withKey) { args =>
      args.head +: fn(args.tail)
    }
    df.join(computed, Seq(keyCol), "left")
  }
}
