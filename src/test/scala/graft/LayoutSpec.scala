package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order layout: key bit-exactness and the files-touched locality
  * property the layout exists for (Layout scaladoc). */
class LayoutSpec extends SparkSpec {

  import spark.implicits._

  test("zValue interleaves bits exactly (a even positions, b odd)") {
    // a=5 (101), b=3 (011) at 3 bits:
    // pos0=a0=1 pos1=b0=1 pos2=a1=0 pos3=b1=1 pos4=a2=1 pos5=b2=0
    // → 011011₂ = 27
    val out = Seq((5L, 3L)).toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), bits = 3)).head.getLong(0)
    assert(out === 27L)
    // masking: bits above the width must not leak into the key
    val masked = Seq((5L + 8L, 3L + 16L)).toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), bits = 3)).head.getLong(0)
    assert(masked === 27L)
    // identity corners
    val zero = Seq((0L, 0L)).toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), bits = 16)).head.getLong(0)
    assert(zero === 0L)
    val ones = Seq((65535L, 0L)).toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), bits = 16)).head.getLong(0)
    assert(ones === 0x55555555L) // all even positions set
  }

  test("sqlZValue agrees with the column form on every 6-bit pair") {
    val d = spark.range(0, 4096)
      .selectExpr("id % 64 AS a", "id DIV 64 AS b")
    val both = d.select(
      Layout.zValue(col("a"), col("b"), bits = 6).as("zc"),
      expr(Layout.sqlZValue("a", "b", 6)).cast("long").as("zs"))
    assert(both.filter(col("zc") =!= col("zs")).count() === 0L)
  }

  test("z-order clustering shrinks the files a box scan touches") {
    // 64×64 grid written b-major (the "natural" arrival order): every
    // natural file spans all a values, so an a-box touches everything;
    // the z-ordered layout packs the box into a few tight rectangles.
    val grid = spark.range(0, 4096)
      .selectExpr("id", "id % 64 AS a", "id DIV 64 AS b")
    val base = java.nio.file.Files
      .createTempDirectory("graft_layout_").toString
    grid.repartitionByRange(16, col("id"))
      .write.mode("overwrite").parquet(s"$base/natural")
    Layout.zorderWrite(grid, col("a"), col("b"), s"$base/zorder",
      numFiles = 16, bits = 6)

    // layouts hold identical content
    val nat = spark.read.parquet(s"$base/natural")
    val zo = spark.read.parquet(s"$base/zorder")
    assert(zo.count() === 4096L &&
      nat.select("id").except(zo.select("id")).count() === 0L)

    // the adversarial predicate for a b-major layout is a strip on `a`:
    // every natural file holds full b-rows and so every a value
    val box = col("a") < 8
    val natFiles = Layout.filesTouched(nat, box)
    val zoFiles = Layout.filesTouched(zo, box)
    assert(natFiles === 16L, s"b-major layout must spread the strip; got $natFiles")
    assert(zoFiles * 4 <= natFiles,
      s"z-order must concentrate the strip: $zoFiles vs $natFiles files")
  }
}
