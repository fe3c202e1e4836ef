package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes
import org.apache.spark.sql.types.{AbstractDataType, StringType}

/** `AbstractDataType` is private[sql] in Spark 4, so an expression outside
  * this package cannot declare `inputTypes` directly; this trait carries the
  * one declaration graft's scalar string kernels need (strict StringType —
  * a non-string argument fails analysis with a clean DATATYPE_MISMATCH
  * instead of a codegen/eval crash).
  */
trait GraftStringUnaryInput extends ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
}

/** Same purpose for the vector kernels: strict array<float> x2. */
trait GraftFloatArrayBinaryInput extends ExpectsInputTypes {
  import org.apache.spark.sql.types.{ArrayType, FloatType}
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
}

/** And for the single-vector kernels (cell assignment): one array<float>. */
trait GraftFloatArrayUnaryInput extends ExpectsInputTypes {
  import org.apache.spark.sql.types.{ArrayType, FloatType}
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
}

/** And for the char-run splice kernel: (text, sorted positions). */
trait GraftStringLongArrayBinaryInput extends ExpectsInputTypes {
  import org.apache.spark.sql.types.{ArrayType, LongType}
  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, ArrayType(LongType))
}
