// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The byte-capped Bloom build behind q154's triangle closing-join
  * prune: the filter is a driver object shipped in every task binary,
  * so its size must be bounded even when the key count is not. Three
  * regimes: under the cap → optimal-fpp filter; over the cap but still
  * selective → cap-sized filter; far over the cap → no filter (callers
  * fall back to the exact unpruned join).
  */
class BloomExpressionsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("sizing math: optimal bits and cap-constrained fpp") {
    // 1% fpp costs ~9.6 bits/key
    val b = BloomExpressions.optimalBits(1000000L, 0.01)
    assert(b > 9000000L && b < 10000000L)
    // a filter AT the optimal size achieves ~the target fpp
    val p = BloomExpressions.achievableFpp(1000000L, b)
    assert(p > 0.005 && p < 0.02)
    // squeezing 10^8 keys into 16 MB passes more than half of misses
    assert(BloomExpressions.achievableFpp(
      100000000L, (16L << 20) * 8) > 0.5)
  }

  test("under the cap: builds at the target fpp, no false negatives") {
    val keys = (0L until 1000L by 2L).toDF("k")
    val bloom = BloomExpressions
      .boundedBloomFilter(keys, "k", 500L, maxBytes = 1 << 20)
      .getOrElse(fail("cap of 1 MB must admit 500 keys"))
    (0L until 1000L by 2L).foreach(k => assert(bloom.mightContainLong(k)))
    assert(bloom.bitSize() <= (1L << 20) * 8)
  }

  test("over the cap but selective: builds AT the cap") {
    // 5k keys at 1% want ~6 KB; cap at 2 KB → fpp ≈ e^-1.57 ≈ 0.21,
    // under the 0.25 default → build the cap-sized filter
    val keys = (0L until 5000L).toDF("k")
    val bloom = BloomExpressions
      .boundedBloomFilter(keys, "k", 5000L, maxBytes = 2048)
      .getOrElse(fail("a 2 KB cap on 5k keys is still selective"))
    assert(bloom.bitSize() <= 2048L * 8)
    (0L until 5000L).foreach(k => assert(bloom.mightContainLong(k)))
  }

  test("far over the cap: declines, and the fallback join is exact") {
    val keys = (0L until 5000L).toDF("k")
    // 5k keys into 64 bytes → fpp ≈ 1: worthless, so None
    assert(BloomExpressions
      .boundedBloomFilter(keys, "k", 5000L, maxBytes = 64).isEmpty)
    // the q154 caller shape: prune-if-Some, else plain join — equal
    // results either way on the same inputs
    val big = (0L until 2000L).toDF("bc")
    val small = (0L until 2000L by 7L).toDF("bc")
    def joined(cap: Long): Set[Long] = {
      val bf = BloomExpressions
        .boundedBloomFilter(small, "bc", 300L, maxBytes = cap)
      bf.fold(big)(b => big.filter(
          BloomExpressions.mightContainLong(col("bc"), b)))
        .join(small, "bc").as[Long].collect().toSet
    }
    assert(joined(1 << 20) === joined(1L))
  }
}
