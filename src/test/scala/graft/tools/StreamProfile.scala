// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler: run one streaming gate with an in-JVM stack sampler,
  * aggregating the top frame of every RUNNABLE thread bucketed by
  * package — answers "which layer of the micro-batch machinery burns
  * the wall clock" (state store? offset log? planner? file source?).
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val qname = if (args.nonEmpty) args(0) else "q168_stream_outer_join"
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    // ad-hoc conf experiments: SPARK_GRAFT_CONF="k=v;k=v" (RunOne's seam)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val hits = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val it = Thread.getAllStackTraces.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getKey.getState == Thread.State.RUNNABLE &&
              e.getKey.getName != "stream-sampler") {
            val st = e.getValue
            if (st.nonEmpty) {
              // first frame in an interesting layer, else the top frame
              val own = st.find { f =>
                val c = f.getClassName
                c.startsWith("org.apache.spark.sql.execution.streaming") ||
                c.startsWith("org.apache.spark.sql.catalyst") ||
                c.startsWith("org.apache.spark.sql.execution") ||
                c.startsWith("graft.")
              }
              val key = own match {
                case Some(o) =>
                  o.getClassName.substring(
                    o.getClassName.lastIndexOf('.') + 1).take(40) + "." +
                    o.getMethodName + " <= " +
                    st.head.getClassName.substring(
                      st.head.getClassName.lastIndexOf('.') + 1).take(30) +
                    "." + st.head.getMethodName
                case None =>
                  "foreign: " + st.head.getClassName.take(60) + "." +
                    st.head.getMethodName
              }
              hits.merge(key, 1, (a, b) => a + b)
            }
          }
        }
        Thread.sleep(5)
      }
    }, "stream-sampler")
    sampler.setDaemon(true)

    val fn = graft.SparkEntry.queries(qname)
    fn(spark, "/root/testdata/sf0.1").count() // warm codegen
    sampler.start()
    val t0 = System.nanoTime()
    val n = fn(spark, "/root/testdata/sf0.1").count()
    val t1 = System.nanoTime()
    sampling = false
    println(f"[sprof] $qname: ${(t1 - t0) / 1e9}%.2f s rows=$n")
    import scala.jdk.CollectionConverters._
    hits.asScala.toSeq.sortBy(-_._2).take(30).foreach { case (k, c) =>
      println(f"[sprof] $c%5d  $k")
    }
    spark.stop()
  }
}
