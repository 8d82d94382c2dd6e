package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the pigeonhole guarantee behind d3's and m6's hamming
  * blocking: the k+1-block split is a property of BIT POSITIONS
  * alone, so it holds for ANY 64-bit hash with the locality property
  * (small perturbation ⇒ few flipped bits) — swapping m6's stub for
  * a real DCT pHash, or d3's word hash for another mixer, changes no
  * blocking machinery.
  */
class BlockingSpec extends AnyFunSuite {

  /** Mirrors the Spark-side `shiftright(h, off) & ((1<<w)-1)`. */
  private def blocksOf(h: Long, blocks: Seq[(Int, Int)]): Seq[Long] =
    blocks.map { case (off, w) => (h >> off) & ((1L << w) - 1) }

  private def sharesBlock(a: Long, b: Long, blocks: Seq[(Int, Int)]): Boolean =
    blocksOf(a, blocks).zip(blocksOf(b, blocks)).exists { case (x, y) => x == y }

  /** Deterministic 64-bit value stream (no Math.random — SplitMix64). */
  private def splitMix(seed: Long): Iterator[Long] = Iterator.iterate(seed) { s =>
    s + 0x9e3779b97f4a7c15L
  }.map { z0 =>
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def checkScheme(blocks: Seq[(Int, Int)], k: Int): Unit = {
    // the argument needs each of the 64 bits in exactly one block
    val covered = blocks.flatMap { case (off, w) => off until (off + w) }
    assert(covered.sorted == (0 until 64).toList,
      s"blocks must partition bits 0..63: $blocks")
    assert(blocks.size == k + 1, s"radius $k needs ${k + 1} blocks")
    // exhaustive worst case: k flips spread over k distinct blocks
    // (one bit each) still leaves a clean block
    val vals = splitMix(0x5eedL).take(200).toSeq
    for (base <- vals) {
      // all single and double flips, exhaustively
      for (i <- 0 until 64) {
        assert(sharesBlock(base, base ^ (1L << i), blocks))
        for (j <- (i + 1) until 64 if k >= 2)
          assert(sharesBlock(base, base ^ (1L << i) ^ (1L << j), blocks))
      }
    }
    // sampled flip sets of every size up to k, incl. the adversarial
    // placement with each flip in a different block (positions come
    // from one pre-materialized stream — Iterator.take consumption
    // order is not part of its contract)
    val stream = splitMix(0xadbeefL).take(vals.size * k * k).toIndexedSeq
    var si = 0
    for (base <- vals; size <- 3 to k) {
      val positions = stream.slice(si, si + size).map(r => ((r % 64) + 64) % 64).distinct
      si += size
      val flipped = positions.foldLeft(base)((h, p) => h ^ (1L << p.toInt))
      assert(sharesBlock(base, flipped, blocks),
        s"hamming ${positions.size} pair lost by $blocks")
      val oneEach = blocks.take(size).map { case (off, _) => off }
      val adversarial = oneEach.foldLeft(base)((h, p) => h ^ (1L << p))
      assert(sharesBlock(base, adversarial, blocks))
    }
  }

  test("m6: 5-block scheme guarantees candidate recall at hamming <= 4") {
    checkScheme(graft.operators.Media.m6Blocks, 4)
  }

  test("d3: 7-block scheme guarantees candidate recall at hamming <= 6") {
    checkScheme(graft.operators.Dedup.d3Blocks, 6)
  }

  test("4x16-bit blocking does NOT guarantee hamming 4 — why k+1 blocks") {
    // the round-5 scheme's gap: one flipped bit in each 16-bit chunk
    val four = Seq((0, 16), (16, 16), (32, 16), (48, 16))
    val base = 0L
    val miss = base ^ 1L ^ (1L << 16) ^ (1L << 32) ^ (1L << 48)
    assert(java.lang.Long.bitCount(base ^ miss) == 4)
    assert(!sharesBlock(base, miss, four))
  }
}
