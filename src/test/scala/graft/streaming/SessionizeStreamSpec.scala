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

  test("streaming sessions equal batch sessions") {
    val batch = Relational.q10Sessions(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_seq"),
        r.getAs[Long]("n_events"), r.getAs[Long]("start_ms"),
        r.getAs[Long]("end_ms"), r.getAs[Double]("session_value"))).toSet
    val stream = SessionizeStream.sessions(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_seq"),
        r.getAs[Long]("n_events"), r.getAs[Long]("start_ms"),
        r.getAs[Long]("end_ms"), r.getAs[Double]("session_value"))).toSet
    assert(stream === batch)
  }
}
