package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst table-generating function (UDTF) — the reference's
  * `TableFunction<Row>` word splitter (`app/function/MyUDTF.java:14-22`)
  * as a real `Generator`, so SQL gets full `LATERAL VIEW split_words(x)`
  * parity with Flink's `LATERAL TABLE(splitFunction(x))`. (The
  * engine's hot paths use the codegen'd built-in split+explode; this
  * exists for the SQL-surface parity and as the Generator extension
  * template.) */
case class SplitWords(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(Seq(StructField("word", StringType)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else v.asInstanceOf[UTF8String].toString
      .split(" ").iterator.filter(_.nonEmpty)
      .map(w => InternalRow(UTF8String.fromString(w)))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SplitWords {
  /** Register `split_words` for SQL use in this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "split_words", exprs => {
        require(exprs.length == 1,
          s"split_words expects exactly 1 argument, got ${exprs.length}")
        SplitWords(exprs.head)
      }, "built-in")
}
