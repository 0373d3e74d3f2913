package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order layout: Morton interleave correctness, cell partition
  * invariants, and the data-skipping dominance the layout exists for.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits: x odd positions, y even") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 0L),
      (0L, 3L), (5L, 3L), (65535L, 65535L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 16).as("z"))
    // x=1,y=0 -> bit 1 set = 2; x=0,y=1 -> bit 0 set = 1; x=y=1 -> 3
    // x=3 -> bits 1,3 = 10; y=3 -> bits 0,2 = 5
    // x=5 (101b) -> z-bits 1,5 = 34; y=3 (011b) -> z-bits 0,2 = 5 -> 39
    // full 16-bit ones on both -> 2^32 - 1
    df.as[Long].collect() shouldBe Array(0L, 2L, 1L, 3L, 10L, 5L, 39L,
      (1L << 32) - 1)
  }

  test("zValue masks to the requested bit width") {
    val z = Seq((1L << 20, 0L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 16).as("z"))
    z.as[Long].head() shouldBe 0L // bit 20 is outside a 16-bit domain
  }

  test("normalize maps [min,max] onto [0, 2^bits) inclusively") {
    val df = Seq(0L, 1L, 499L, 500L, 999L).toDF("c")
      .select(Layout.normalize(col("c"), lit(0L), lit(999L), 10).as("nc"))
    val ncs = df.as[Long].collect()
    ncs.head shouldBe 0L
    ncs.last shouldBe 1022L // floor(999·1024/1000): the top bucket is
    // reached only when the domain has ≥ 2^bits values...
    all(ncs) should (be >= 0L and be <= 1023L)
    ncs.sorted shouldBe ncs // ...and the mapping is monotone
    // domain exactly 2^bits wide -> identity onto [0, 1023]
    Seq(0L, 1023L).toDF("c")
      .select(Layout.normalize(col("c"), lit(0L), lit(1023L), 10).as("nc"))
      .as[Long].collect() shouldBe Array(0L, 1023L)
  }

  test("cells partition the table: disjoint, counts sum to total") {
    val li = graft.Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val cells = Layout.zorderCellStats(li, "l_partkey", "l_suppkey",
      bits = 10, cellBits = 6)
    val rows = cells.collect()
    rows.map(_.getLong(1)).sum shouldBe li.count()
    rows.map(_.getLong(0)).distinct.length shouldBe rows.length
    all(rows.map(_.getLong(0))) should (be >= 0L and be < 64L)
  }

  test("written z-layout concentrates a box query into fewer files") {
    // the write-path claim made real: range-partition by zval +
    // sort-within vs the same pipeline keyed on the insertion key,
    // then see which FILES a box predicate's matches actually live in
    val li = graft.Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val stats = li.agg(
      min(col("l_partkey")).cast("long").as("__minx"),
      max(col("l_partkey")).cast("long").as("__maxx"),
      min(col("l_suppkey")).cast("long").as("__miny"),
      max(col("l_suppkey")).cast("long").as("__maxy"))
    val withZ = li.crossJoin(broadcast(stats))
      .withColumn("zval", Layout.zValue(
        Layout.normalize(col("l_partkey"), col("__minx"), col("__maxx"), 10),
        Layout.normalize(col("l_suppkey"), col("__miny"), col("__maxy"), 10),
        10))
      .select("l_orderkey", "l_partkey", "l_suppkey", "zval")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    try {
      withZ.repartitionByRange(8, col("zval"))
        .sortWithinPartitions("zval")
        .write.mode("overwrite").parquet(s"$dir/z")
      withZ.repartitionByRange(8, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite").parquet(s"$dir/nat")
      def filesTouched(path: String): Long =
        spark.read.parquet(path)
          .filter(col("l_partkey").between(10, 60) &&
            col("l_suppkey").between(2, 7))
          .select(input_file_name()).distinct().count()
      val (zf, nf) = (filesTouched(s"$dir/z"), filesTouched(s"$dir/nat"))
      // insertion-key layout scatters the box over (nearly) all files;
      // the z layout concentrates it — strictly fewer files hold
      // matches, which is what footer-level pruning monetizes
      zf should be < nf
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("prune comparison: z-layout dominates the single-key layout") {
    val li = graft.Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val r = Layout.pruneComparison(li, "l_partkey", "l_suppkey",
      "l_orderkey", 10L, 60L, 2L, 7L).head()
    val (total, zc, zr) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (nc, nr, matches) = (r.getLong(3), r.getLong(4), r.getLong(5))
    zc should be <= nc // Z prunes at least as well on a 2-d box
    zr should be >= matches // scanned rows always cover the answer
    nr should be >= matches
    zc should be <= total
    // and on this data it strictly prunes (the layout pays for itself)
    zc should be < total
  }
}
