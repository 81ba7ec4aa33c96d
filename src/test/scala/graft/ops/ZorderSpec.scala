// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.lake.MiniLake

/** Z-order clustering: the morton key interleaves correctly, and a
  * 2-D range query over a z-ordered lake physically opens fewer files
  * than over a leading-column-sorted one — the multi-dimensional
  * data-skipping claim, asserted on inputFiles, not assumed.
  */
class ZorderSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("zorderValue interleaves bits (known vectors)") {
    // z(x, y) places x's bits at even positions, y's at odd
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 0L))
      .toDF("x", "y")
      .select(Layout.zorderValue(col("x"), col("y")).as("z"))
    // z(3,5) = interleave(x=0b11, y=0b101) = 0b100111 = 39;
    // 16 one-bits spread to the even positions = 0x55555555
    assert(df.as[Long].collect().toSeq ===
      Seq(0L, 1L, 2L, 39L, 0x55555555L))
  }

  test("2-D range over z-ordered lake opens fewer files than linear sort") {
    val e = graft.Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "value")
    val numFiles = 64
    val ranges = Map("user_id" -> (40L, 59L), "event_id" -> (2000L, 3999L))

    val zdir = graft.Scratch.dir("zorder_z").toString + "/t"
    val zt = MiniLake(spark, zdir)
    zt.create(Layout.zorderWrite(e, ("user_id", "event_id"), numFiles))

    val ldir = graft.Scratch.dir("zorder_l").toString + "/t"
    val lt = MiniLake(spark, ldir)
    lt.create(e.repartitionByRange(numFiles, col("user_id"))
      .sortWithinPartitions("user_id"))

    val zRead = zt.snapshotForRanges(ranges)
    val lRead = lt.snapshotForRanges(ranges)
    val zFiles = zRead.inputFiles.length
    val lFiles = lRead.inputFiles.length

    // both layouts produce the same rows as the brute-force filter
    val expect = e.filter(col("user_id").between(40, 59) &&
      col("event_id").between(2000, 3999)).count()
    assert(zRead.count() === expect)
    assert(lRead.count() === expect)

    // the linear layout skips on user_id only; z-order skips on both
    // dimensions, so it must open strictly fewer files (and far fewer
    // than the table holds)
    assert(zFiles < lFiles, s"zorder=$zFiles linear=$lFiles")
    assert(zFiles < numFiles / 2, s"zorder=$zFiles of $numFiles")
  }
}
