package org.apache.spark.sql.execution

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.vectorized.WritableColumnVector
import org.apache.spark.sql.types.StructType

/** Execution-package bridge: `RowToColumnConverter` is
  * `private[execution]` in the bundled Spark, so the one call graft
  * needs — appending an InternalRow into writable column vectors —
  * is re-exported from inside the package. The MoR columnar read path
  * uses it to rebuild the SURVIVING rows of a position-deleted batch
  * as fresh column vectors, the same converter Spark's own
  * RowToColumnarExec runs. No Spark behavior is modified. */
object GraftExecBridge {
  def rowToColumnConverter(schema: StructType)
      : (InternalRow, Array[WritableColumnVector]) => Unit = {
    val conv = new RowToColumnConverter(schema)
    (row, vecs) => conv.convert(row, vecs)
  }
}
