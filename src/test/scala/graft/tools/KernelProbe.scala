// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler (test scope): split the q220 derive-in-kernel cost
  * into feed (single-task deserialize of the projected lineitem) vs
  * kernel (pair fold + relaxation), so the slow half is measured, not
  * guessed. Run: test:runMain graft.tools.KernelProbe [sfDir]
  */
object KernelProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    for (_ <- 1 to 2) {
      time("feed-only (tuple3 iterate)") {
        li.as[(Long, Long, Long)].coalesce(1)
          .mapPartitions { it => var n = 0L; it.foreach(_ => n += 1)
            Iterator.single(n) }.collect()
      }
      time("feed-only (row iterate)") {
        li.coalesce(1)
          .queryExecution.toRdd.mapPartitions { it =>
            var n = 0L; it.foreach(_ => n += 1); Iterator.single(n) }
          .collect()
      }
      time("scan-parallel count") { li.count() }
      time("full ssspCoPurchase kernel (guard in-kernel)") {
        graft.ops.GraphLocal.ssspCoPurchase(spark, li, n => n % 97 == 0, 4)
          .foreach(_.count())
      }
    }
    spark.stop()
  }
}

/** Phase-split of the ssspCoPurchase kernel body on driver-collected
  * rows: byOrder fold vs pair fold vs relaxation.
  */
object KernelPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val rows = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .as[(Long, Long, Long)].collect()
    println(s"[phase] rows=${rows.length}")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    for (_ <- 1 to 3) {
      val byOrder = time("byOrder fold") {
        val m = new java.util.HashMap[java.lang.Long,
          scala.collection.mutable.ArrayBuffer[(Long, Long)]]()
        rows.foreach { case (ok, pk, cents) =>
          m.computeIfAbsent(ok,
            _ => scala.collection.mutable.ArrayBuffer.empty) += ((pk, cents))
        }
        m
      }
      val wmap = time("pair fold") {
        val wmap = new java.util.HashMap[java.lang.Long, java.lang.Long]()
        val oit = byOrder.values().iterator()
        var pairs = 0L
        while (oit.hasNext) {
          val rs = oit.next()
          var i = 0
          while (i < rs.length) {
            var j = i + 1
            while (j < rs.length) {
              val (pi, ci) = rs(i); val (pj, cj) = rs(j)
              if (pi != pj) {
                val key = if (pi < pj) (pi << 32) | pj else (pj << 32) | pi
                val w = ci + cj
                val prev = wmap.get(key)
                if (prev == null || w < prev.longValue()) wmap.put(key, w)
                pairs += 1
              }
              j += 1
            }
            i += 1
          }
        }
        println(s"[phase]   pairs=$pairs unique=${wmap.size()}")
        wmap
      }
      time("array unpack") {
        val m = wmap.size()
        val pairs = new Array[Long](2 * m); val ws = new Array[Long](m)
        val wit = wmap.entrySet().iterator(); var k = 0
        while (wit.hasNext) {
          val e = wit.next()
          pairs(2 * k) = e.getKey >>> 32; pairs(2 * k + 1) = e.getKey & 0xffffffffL
          ws(k) = e.getValue.longValue(); k += 1
        }
        (pairs, ws)
      }
    }
    spark.stop()
  }
}
