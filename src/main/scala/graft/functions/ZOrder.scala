package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys: interleave the bits of two
  * dimensions so that sorting / range-partitioning by the single z-key
  * co-locates rows that are close in BOTH dimensions — the standard
  * multi-dimensional data-layout trick (Delta/Iceberg OPTIMIZE ZORDER)
  * for making min/max row-group pruning effective on more than one
  * filter column at once.
  *
  * At 100 TB: `df.repartitionByRange(col(zkey)).sortWithinPartitions(
  * zkey)` before the parquet write gives every file a tight bounding box
  * in (x, y) space, so a scan filtered on either dimension (or both)
  * skips most row groups — without maintaining two copies of the data.
  *
  * The bit-spreading uses the classic mask-shift cascade (5 bitwise ops
  * per dimension, codegen-friendly, expressible in any engine) rather
  * than a per-bit loop. */
object ZOrder {

  /** Spread the low 16 bits of `x` so that bit i lands at position 2i. */
  def spread16(x: Column): Column = {
    val a = x.bitwiseAND(lit(65535L))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(16711935L))   // 0x00FF00FF
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(252645135L))  // 0x0F0F0F0F
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(858993459L))  // 0x33333333
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(1431655765L))         // 0x55555555
  }

  /** 32-bit Morton key of two 16-bit dimensions (x even bits, y odd). */
  def interleave16(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))
}
