// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler: replay q232's multi-writer commit lifecycle with an
  * in-JVM stack sampler, aggregating the deepest own-code frame of
  * every RUNNABLE thread — answers "which phase of the commit protocol
  * burns the wall clock" without external tooling.
  */
object CommitProfile232 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val hits = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val all = Thread.getAllStackTraces
        val it = all.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val t = e.getKey
          if (t.getState == Thread.State.RUNNABLE &&
              t.getName != "commit-sampler") {
            val st = e.getValue
            // deepest frame in our packages, else the top foreign frame
            val own = st.find(f => f.getClassName.startsWith("graft."))
            val top = st.headOption
            (own, top) match {
              case (Some(o), Some(tp)) =>
                val key = o.getClassName.substring(
                  o.getClassName.lastIndexOf('.') + 1) + "." +
                  o.getMethodName + ":" + o.getLineNumber + " <= " +
                  tp.getClassName.substring(
                    tp.getClassName.lastIndexOf('.') + 1) + "." +
                  tp.getMethodName
                hits.merge(key, 1, (a, b) => a + b)
              case _ => ()
            }
          }
        }
        Thread.sleep(5)
      }
    }, "commit-sampler")
    sampler.setDaemon(true)

    val base = graft.Scratch.dir("graft_ckpt_prof").toString
    val path = s"$base/ledger"
    val t = graft.lake.MiniLake.compact(spark, path)
    t.create(Seq((0L, 0L)).toDF("k", "cents"))
    val nWriters = 8
    val rowSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cents",
        org.apache.spark.sql.types.LongType, nullable = false)))
    def rowDf(k: Long) =
      spark.createDataFrame(java.util.List.of(
        org.apache.spark.sql.Row(k, k * 37L % 1000L)
          : org.apache.spark.sql.Row), rowSchema)
    def appendBlock(lo: Long, hi: Long): Unit = {
      val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]
      val threads = (0 until nWriters).map { w =>
        new Thread(() => {
          try {
            val mine = graft.lake.MiniLake.compact(spark, path)
            var k = lo + w
            while (k <= hi) {
              mine.appendConcurrent(rowDf(k))
              k += nWriters
            }
          } catch { case e: Throwable => failure.compareAndSet(null, e) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      if (failure.get() != null) throw failure.get()
    }
    val t0 = System.nanoTime()
    sampler.start()
    appendBlock(1L, 250L);   t.delete(col("k") % 10 === 3)
    appendBlock(251L, 500L); t.delete(col("k") % 10 === 3)
    t.compactFiles()
    appendBlock(501L, 750L); t.delete(col("k") % 10 === 3)
    appendBlock(751L, 980L); t.compactFiles()
    val fresh = graft.lake.MiniLake(spark, path)
    val n = fresh.snapshot().count()
    sampling = false
    val t1 = System.nanoTime()
    println(f"[profile232] lifecycle: ${(t1 - t0) / 1e9}%.2f s rows=$n")
    import scala.jdk.CollectionConverters._
    hits.asScala.toSeq.sortBy(-_._2).take(40).foreach { case (k, c) =>
      println(f"[profile232] $c%5d  $k")
    }
    spark.stop()
  }
}
