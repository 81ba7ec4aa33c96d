// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Perceptual-hash near-dup banding (q276): the band width is a KNOB
  * with a sizing rule, not a pinned constant — these tests pin the
  * rule's breakpoints and prove 16-bit and 32-bit bands agree wherever
  * both pigeonhole radii cover the truth.
  */
class MultimodalSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("16-bit and 32-bit bands give identical exact-dup buckets and " +
      "near-dup answers on a constructed set both radii cover") {
    val fA = "0" * 64            // duplicated print (n = 2)
    val fB = "0" * 63 + "1"      // Hamming 1 from fA — last band differs,
                                 // every other band intact at BOTH widths
    val fC = "1" * 64            // far from everything: no shared band
    val groups = Seq((fA, 2L), (fB, 1L), (fC, 1L)).toDF("f", "n")
    for (w <- Seq(16, 32)) {
      val rows = Multimodal.mediaNearDupHistogram(groups, w)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
      assert(rows === Seq(
        (-1L, 1L, 0L),  // exact: C(2,2) = 1 pair inside fA's group
        (0L, 2L, 1L)),  // near: (fA, fB) counted n1·n2 = 2, Hamming 1
        s"width $w")
    }
  }

  test("a wider band prunes a pair outside its radius that the " +
      "narrower band still catches (the occupancy/recall trade)") {
    // fE differs from fA at bit 17 AND bit 64: every 32-bit band
    // differs (no candidate), but 16-bit band 1 (bits 1-16) is intact
    val fA = "0" * 64
    val fE = ("0" * 16) + "1" + ("0" * 46) + "1"
    val groups = Seq((fA, 1L), (fE, 1L)).toDF("f", "n")
    val at16 = Multimodal.mediaNearDupHistogram(groups, 16).collect()
    val at32 = Multimodal.mediaNearDupHistogram(groups, 32).collect()
    assert(at16.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq === Seq((0L, 1L, 2L)))
    assert(at32.isEmpty)
  }

  test("phashWidthBits: 16-bit up to 2^14 prints, 32-bit above — " +
      "candidates stay O(n), never band-space-filling") {
    assert(Multimodal.phashWidthBits(1L) === 16)
    assert(Multimodal.phashWidthBits(5000L) === 16)
    assert(Multimodal.phashWidthBits(1L << 14) === 16)
    assert(Multimodal.phashWidthBits((1L << 14) + 1) === 32)
    assert(Multimodal.phashWidthBits(100000000L) === 32)
  }

  test("band widths that break the pigeonhole refuse") {
    val groups = Seq(("0" * 64, 1L)).toDF("f", "n")
    intercept[IllegalArgumentException] {
      Multimodal.mediaNearDupHistogram(groups, 7)
    }
    intercept[IllegalArgumentException] {
      Multimodal.mediaNearDupHistogram(groups, 64) // one band: no radius
    }
  }
}
