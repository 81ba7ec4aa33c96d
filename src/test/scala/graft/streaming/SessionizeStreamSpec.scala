// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ops.Relational

/** The stateful streaming sessionizer must agree with the batch
  * window-based sessionizer on bounded input.
  */
class SessionizeStreamSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def sessionSet(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_seq"),
        r.getAs[Long]("n_events"), r.getAs[Long]("start_ms"),
        r.getAs[Long]("end_ms"), r.getAs[Double]("session_value"))).toSet

  test("streaming sessions equal batch sessions") {
    assert(sessionSet(SessionizeStream.sessions(spark, sf)) ===
      sessionSet(Relational.q10Sessions(spark, sf)))
  }

  test("transformWithState sessions equal batch sessions") {
    assert(sessionSet(TwsSessionizeStream.sessions(spark, sf)) ===
      sessionSet(Relational.q10Sessions(spark, sf)))
  }
}
