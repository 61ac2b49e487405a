package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("ZValue interleaves bits correctly (hand-checked Morton codes)") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L), (7L, 5L))
      .toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"))).as[Long].collect().toList
    // morton(a even bits, b odd bits): (2,3) -> a=10 at even, b=11 at odd:
    // bits: b1 a1 b0 a0 = 1 1 1 0 = 14; (7,5) -> 0b100111? check: a=111,
    // b=101 -> b2 a2 b1 a1 b0 a0 = 1 1 0 1 1 1 = 0b110111 = 55
    assert(got == List(0L, 1L, 2L, 3L, 14L, 55L), s"got $got")
  }

  test("zorder clusters BOTH dimensions; single-column sort only its own") {
    // 64x64 grid, shuffled input
    val grid = (for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong))
    val df = scala.util.Random.shuffle(grid).toDF("x", "y").repartition(8).cache()
    df.count()
    val z = Layout.zorder(df, "x", "y", numFiles = 8).cache(); z.count()
    val xSorted = df.repartitionByRange(8, col("x")).sortWithinPartitions("x").cache(); xSorted.count()
    val block = 256 // 16 blocks over 4096 rows
    // filter: a 8-wide band in each dimension (1/8 of the domain)
    val zx = Layout.blockTouchFraction(z, "x", 16, 23, block)
    val zy = Layout.blockTouchFraction(z, "y", 16, 23, block)
    val sx = Layout.blockTouchFraction(xSorted, "x", 16, 23, block)
    val sy = Layout.blockTouchFraction(xSorted, "y", 16, 23, block)
    assert(sx <= 0.25, s"sanity: x-sort must prune x filters (touched $sx)")
    assert(sy >= 0.9, s"sanity: x-sort cannot prune y filters (touched $sy)")
    assert(zx <= 0.6 && zy <= 0.6,
      s"z-order must prune BOTH dims (x: $zx, y: $zy)")
    assert(zy < sy, "z-order must beat single-column sort on the other dim")
    df.unpersist(); z.unpersist(); xSorted.unpersist()
  }
}
