package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._
import scala.util.Random

/** ZOrder vs a driver-side reference interleave, the Column/SQL parity
  * both engines depend on, and the layout property the key exists for:
  * files cover compact regions of the plane in BOTH dimensions.
  */
class ZOrderSpec extends SparkSpecBase {

  private def refZ(x: Long, y: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    val (xm, ym) = (x & mask, y & mask)
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((xm >> i) & 1L) << (2 * i)) | (((ym >> i) & 1L) << (2 * i + 1))
    }
  }

  test("matches the reference interleave, including out-of-range masking") {
    import spark.implicits._
    val rnd = new Random(29L)
    val pts = Seq.fill(200)((rnd.nextLong(1L << 20), rnd.nextLong(1L << 20)))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zvalue(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == refZ(x, y, 16), s"($x, $y)")
    }
  }

  test("the Column form and the SQL form produce the identical key") {
    import spark.implicits._
    val rnd = new Random(31L)
    val pts = Seq.fill(100)((rnd.nextLong(1L << 18), rnd.nextLong(1L << 18)))
    val both = pts.toDF("x", "y").select(
      ZOrder.zvalue(col("x"), col("y")).as("zc"),
      expr(ZOrder.zvalueSql("x", "y")).as("zs"))
    assert(both.filter(col("zc") =!= col("zs")).isEmpty)
  }

  test("interleaving is a bijection on the masked domain") {
    import spark.implicits._
    val grid = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val n = grid.toDF("x", "y")
      .select(ZOrder.zvalue(col("x"), col("y"), bits = 6).as("z"))
      .distinct().count()
    assert(n == 64L * 64L)
  }

  test("layout files cover compact 2-D regions, not full-width stripes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("zorder-spec").toString
    // 128×128 grid into 16 files: ideal z-ranges are 32×32 Morton
    // blocks. A file whose z-range happens to cross a top-level
    // quadrant boundary legitimately spans the plane in one dimension
    // (the z-curve jumps across), and range-boundary sampling slop can
    // shift files across adjacent blocks — so assert the AGGREGATE
    // property: at least 12 of 16 files are compact (≤ 80 wide) in
    // BOTH dimensions. A 1-D sort (the layout this operator replaces)
    // produces full-width (128) stripes in the unsorted dimension in
    // EVERY file and can never pass.
    val grid = for (x <- 0L until 128L; y <- 0L until 128L) yield (x, y)
    ZOrder.layout(grid.toDF("x", "y"), col("x"), col("y"), numFiles = 16)
      .write.mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length == 16)
    val compact = files.count { f =>
      val r = spark.read.parquet(f)
        .agg(min("x"), max("x"), min("y"), max("y")).head()
      r.getLong(1) - r.getLong(0) + 1 <= 80 &&
        r.getLong(3) - r.getLong(2) + 1 <= 80
    }
    assert(compact >= 12, s"only $compact of ${files.length} files compact")
  }

  test("misuse fails fast") {
    intercept[IllegalArgumentException] { ZOrder.zvalue(lit(1), lit(1), 0) }
    intercept[IllegalArgumentException] { ZOrder.zvalue(lit(1), lit(1), 32) }
    intercept[IllegalArgumentException] { ZOrder.zvalueSql("x", "y", 40) }
    intercept[IllegalArgumentException] {
      import spark.implicits._
      ZOrder.layout(Seq((1L, 2L)).toDF("x", "y"),
        col("x"), col("y"), numFiles = 0)
    }
  }
}
