// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.lake

import java.nio.file.Files

import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** In-commit-timestamp monotonicity (Delta ICT intent): commit
  * timestamps are clamped to predecessor + 1 ms at the writeEntry
  * funnel, so a writer whose wall clock jumped BACKWARD between
  * commits still records a non-decreasing sequence — the invariant
  * q295's forward/backward timestamp resolvers assume.
  */
class CommitTimestampSpec extends AnyFunSuite with BeforeAndAfterEach {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private var dir: String = _
  override def beforeEach(): Unit =
    dir = Files.createTempDirectory("ictlake").toString + "/t"
  override def afterEach(): Unit = {
    MiniLake.clockForTests = None
    MiniLake.deleteRecursively(dir)
  }

  private def kv(rows: (Long, String)*) = rows.toDF("key", "value")

  test("a backward-skewed clock still records strictly increasing " +
      "commit timestamps, and timestamp travel resolves by order") {
    // clock runs BACKWARD 10 s per commit
    val ticks = Iterator.iterate(1000000L)(_ - 10000L)
    MiniLake.clockForTests = Some(() => ticks.next())
    val t = MiniLake(spark, dir)
    t.create(kv(1L -> "a"))        // v0 at 1_000_000
    t.append(kv(2L -> "b"))        // clock says 990_000 → clamps
    t.append(kv(3L -> "c"))        // clock says 980_000 → clamps
    val ts = t.history.orderBy("version")
      .select("timestamp_ms").as[Long].collect().toSeq
    assert(ts.size === 3)
    assert(ts === ts.sorted, s"non-monotone: $ts")
    assert(ts.distinct.size === 3, s"collided: $ts")
    assert(ts.head === 1000000L)
    // order wins over the skewed clock: the clamp places each commit
    // 1 ms after its predecessor
    assert(ts === Seq(1000000L, 1000001L, 1000002L))
  }

  test("an honest forward clock is recorded untouched") {
    val ticks = Iterator.iterate(5000000L)(_ + 7000L)
    MiniLake.clockForTests = Some(() => ticks.next())
    val t = MiniLake(spark, dir)
    t.create(kv(1L -> "a"))
    t.append(kv(2L -> "b"))
    val ts = t.history.orderBy("version")
      .select("timestamp_ms").as[Long].collect().toSeq
    assert(ts === Seq(5000000L, 5007000L))
  }
}
