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

  private def bq(name: String): String = "`" + name.replace("`", "``") + "`"
  private def layerOf(dotted: String): (String, String) = {
    val Array(l, f) = dotted.split("\\.", 2); (l, f)
  }

  /** Run `fn` over each row. `columns` may be base names or dotted
    * `nest.field` names; dotted fields are delivered to the lambda as
    * `Seq[...]` in declaration order. `fn` returns one value per
    * `outputSchema` field.
    *
    * With `inferNesting=true`, output fields whose names are dotted
    * (`layer.field`, array-typed values) are zipped into new nested
    * (array<struct>) columns grouped by layer — the reference's
    * `infer_nesting` (core.py:2511-2531). */
  def mapRows(df: DataFrame, columns: Seq[String], outputSchema: StructType,
              inferNesting: Boolean = false)
             (fn: Seq[Any] => Seq[Any]): DataFrame = {
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
    val flat = pruned.map { row =>
      val args = (0 until n).map { i =>
        row.get(i) match {
          case s: scala.collection.Seq[_] => s.toSeq
          case other                      => other
        }
      }
      Row.fromSeq(fn(args))
    }(enc)
    if (inferNesting) packDotted(flat) else flat
  }

  /** `row_container='dict'` flavor of [[mapRows]]: the kernel receives a
    * name→value Map instead of a positional Seq (reference map_rows input
    * packaging, core.py:2207-2545). */
  def mapRowsDict(df: DataFrame, columns: Seq[String],
                  outputSchema: StructType, inferNesting: Boolean = false)
                 (fn: Map[String, Any] => Seq[Any]): DataFrame =
    mapRows(df, columns, outputSchema, inferNesting) { args =>
      fn(columns.zip(args).toMap)
    }

  /** Zip literally-dotted columns (`layer.field`, each array-typed) into one
    * `array<struct>` nested column per layer prefix; non-dotted columns pass
    * through. Narrow (arrays_zip), no shuffle. */
  def packDotted(df: DataFrame): DataFrame = {
    val dotted = df.columns.filter(_.contains("."))
    if (dotted.isEmpty) df
    else {
      val layers = dotted.map(c => layerOf(c)._1).distinct.toSeq
      val keep = df.columns.filterNot(dotted.contains).toSeq.map(c => col(bq(c)))
      val packs = layers.map { layer =>
        val fs = dotted.filter(c => layerOf(c)._1 == layer).toSeq
        arrays_zip(fs.map(c => col(bq(c)).as(layerOf(c)._2)): _*).as(layer)
      }
      df.select(keep ++ packs: _*)
    }
  }

  /** map_rows + append: compute new columns and join them back onto the input
    * by key (reference `append_columns`, core.py:2533-2542; the pandas index
    * becomes an explicit unique key column).
    *
    * Dotted output fields whose layer is an EXISTING nest of `df` are
    * appended as new element fields of that nest, aligned positionally
    * (element i of the returned Seq → element i of the cell — the flat-index
    * alignment; a short Seq null-pads). Other dotted outputs become new nests
    * when `inferNesting=true`, else stay literal dotted columns. */
  def mapRowsAppend(df: DataFrame, keyCol: String, columns: Seq[String],
                    outputSchema: StructType, inferNesting: Boolean = false)
                   (fn: Seq[Any] => Seq[Any]): DataFrame = {
    val withKey = StructType(StructField(keyCol,
      df.schema(keyCol).dataType) +: outputSchema.fields)
    val computed0 = mapRows(df, keyCol +: columns, withKey) { args =>
      args.head +: fn(args.tail)
    }
    val dotted = outputSchema.fields.map(_.name).filter(_.contains(".")).toSeq
    // literal-dotted names can't be addressed through col() after the join —
    // move them to flat temp names first
    def tmp(n: String) = "__mra_" + n.replace(".", "_")
    val computed = dotted.foldLeft(computed0)(
      (acc, c) => acc.withColumnRenamed(c, tmp(c)))
    val joined = df.join(computed, Seq(keyCol), "left")
    val existingNests = NestedOps.nestedColumns(df).toSet
    val (intoExisting, fresh) =
      dotted.partition(c => existingNests.contains(layerOf(c)._1))
    val appended = intoExisting.foldLeft(joined) { (acc, c) =>
      val (nest, sub) = layerOf(c)
      // strict = false: the documented contract here is "a short Seq
      // null-pads" — a kernel returning a short or null list for a row
      // null-fills that row's field instead of failing the job
      NestedOps.withNestedFieldFromList(acc, nest, sub, tmp(c),
        strict = false).drop(tmp(c))
    }
    if (inferNesting) {
      val layers = fresh.map(c => layerOf(c)._1).distinct
      layers.foldLeft(appended) { (acc, layer) =>
        val fs = fresh.filter(c => layerOf(c)._1 == layer)
        acc.withColumn(layer,
            arrays_zip(fs.map(c => col(tmp(c)).as(layerOf(c)._2)): _*))
          .drop(fs.map(tmp): _*)
      }
    } else fresh.foldLeft(appended)(
      (acc, c) => acc.withColumnRenamed(tmp(c), c))
  }
}
