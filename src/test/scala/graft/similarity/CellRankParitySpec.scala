package graft.similarity

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** The cell-ranking tie contracts, pinned across every consumer of the
  * ONE [[CellRank]] kernel: the driver batch probe ranks via
  * `CellRank.topCells`, the compiled [[ProbeCells]] expression evaluates
  * the same function, and [[NearestCell]] evaluates `CellRank.nearest` —
  * so parity is structural; this spec pins the CONTRACTS themselves on
  * the adversarial inputs (tied scores from duplicate/scaled centroids,
  * zero-norm centroids, NaN elements):
  *  - scores are always finite (NaN cosine normalizes to 0, the
  *    zero-norm convention) — a NaN would make the strict `>` sweep
  *    non-total and crash the pick loop;
  *  - topCells: score descending, ties toward the LOWER cell id, and no
  *    unpicked cell beats the last pick;
  *  - nearest: argmax with ties toward the HIGHER cell id;
  *  - the Literal-driven expression evals return bit-identical picks.
  */
class CellRankParitySpec extends graft.SparkSuite {

  test("driver ranking, ProbeCells and NearestCell agree on tied/duplicate/zero-norm/NaN centroids") {
    val rnd = new scala.util.Random(42)
    val dims = 8
    def rndVec() = Array.fill(dims)(rnd.nextInt(7).toFloat - 3f)
    for (_ <- 1 to 300) {
      val nCells = 1 + rnd.nextInt(12)
      val base = rndVec()
      val cents: Seq[Array[Float]] = (0 until nCells).map { _ =>
        rnd.nextInt(6) match {
          case 0 => Array.fill(dims)(0f) // zero-norm -> score 0
          case 1 => base.clone() // duplicate -> exact score tie
          case 2 => base.map(_ * (1 + rnd.nextInt(3))) // scaled dup -> cosine tie
          case 3 => val a = rndVec(); a(rnd.nextInt(dims)) = Float.NaN; a
          case _ => rndVec()
        }
      }
      val q =
        if (rnd.nextInt(8) == 0) { val a = base.clone(); a(0) = Float.NaN; a }
        else if (rnd.nextBoolean()) base.clone()
        else rndVec()
      val nProbe = 1 + rnd.nextInt(nCells + 2)

      val s = CellRank.scores(cents, q)
      assert(s.forall(v => !v.isNaN && !v.isInfinite), s.mkString(","))

      val top = CellRank.topCells(cents, q, nProbe)
      assert(top.length == math.min(nProbe, nCells))
      assert(top.distinct.length == top.length, "duplicate pick")
      var i = 1
      while (i < top.length) { // descending, ties toward the LOWER id
        val (a, b) = (top(i - 1), top(i))
        assert(s(a) > s(b) || (s(a) == s(b) && a < b), s"order at $i: $a vs $b")
        i += 1
      }
      val last = top.last
      (0 until nCells).filterNot(top.contains).foreach { u =>
        assert(s(u) < s(last) || (s(u) == s(last) && u > last),
          s"unpicked $u beats last pick $last")
      }

      val near = CellRank.nearest(cents, q) // argmax, ties to the HIGHER id
      (0 until nCells).foreach { c =>
        assert(s(c) < s(near) || (s(c) == s(near) && c <= near),
          s"cell $c beats nearest $near")
      }

      // the compiled expressions evaluate the same kernel on the same input
      val lit = Literal.create(q, ArrayType(FloatType))
      val pc = ProbeCells(lit, cents, nProbe).eval(null)
        .asInstanceOf[ArrayData].toIntArray()
      assert(pc.toSeq == top.toSeq, "ProbeCells drifted from topCells")
      assert(NearestCell(lit, cents).eval(null) == near,
        "NearestCell drifted from nearest")
    }
  }
}
