// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class EventsOpsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("as-of join: every match is at-or-before and is the latest") {
    val rows = EventsOps.q49AsofJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.filter(r => !r.isNullAt(r.fieldIndex("last_purchase_ms")))
      .foreach { r =>
        assert(r.getAs[Long]("last_purchase_ms") <= r.getAs[Long]("ms"))
        assert(r.getAs[Long]("gap_ms") >= 0L)
      }
    // errors with no prior purchase yield nulls, not dropped rows
    val errorCount = graft.Tables.events(spark, sf)
      .filter("event_type = 'error'").count()
    assert(rows.length.toLong === errorCount)
  }

  test("approx distinct stays within the configured error of exact") {
    val rows = EventsOps.q50ApproxDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_users") > 0L)
      assert(r.getAs[Boolean]("approx_within_5pct"),
        s"${r.getAs[String]("event_type")} outside 5% HLL bound")
    }
  }
}
