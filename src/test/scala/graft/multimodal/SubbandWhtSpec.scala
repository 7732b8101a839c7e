package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The filterbank's two definitions must coincide: the fast radix-2
  * butterflies (what the codec runs) and the popcount-parity Hadamard
  * matrix (what the DuckDB oracle replays) — a divergence here would
  * silently desynchronize every mm_subband_features fact. */
class SubbandWhtSpec extends AnyFunSuite {

  test("fast WHT butterflies == popcount-parity matrix; WHT∘WHT = 32·id") {
    val xs = Array.tabulate(32)(j => ((j * 193 + 57) % 2001) - 1000)
    val f = Subband.wht(xs)
    for (b <- 0 until 32) {
      val direct = (0 until 32).map(j => xs(j) * Subband.walshSign(b, j)).sum
      assert(f(b) == direct, s"band $b diverges from the matrix definition")
    }
    val back = Subband.wht(f)
    for (j <- 0 until 32) assert(back(j) == 32 * xs(j))
  }
}
