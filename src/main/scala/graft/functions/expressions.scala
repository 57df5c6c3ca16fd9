package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.graft.Shim
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot numeric/hash kernels of the
  * similarity / dedup operators. All of them implement `doGenCode` so they
  * stay inside whole-stage codegen — a Scala UDF here would box every array
  * element on a 100 TB scan; these compile to a tight Java loop over the
  * columnar `ArrayData` (SURVEY §2.10: the reference's extension points are
  * comparators/predicates; ours are Catalyst expressions, preference order
  * (b) of the build brief).
  */
object kernels {

  /** cosine(a, b) over array<float> — the scalar kernel of the ANN /
    * near-dup operators. Returns double; 0.0 for zero-norm inputs.
    */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val x = ctx.freshName("x"); val y = ctx.freshName("y")
        s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $x = (double) $a.getFloat($i); double $y = (double) $b.getFloat($i);
          $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        }
        ${ev.value} = ($na == 0.0 || $nb == 0.0)
          ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        """
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** dot(a, b) over array<float> → double. */
  case class DotF(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var dot = 0.0; var i = 0
      while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i); i += 1 }
      dot
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val dot = ctx.freshName("dot")
        s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0;
        for (int $i = 0; $i < $n; $i++) { $dot += ((double) $a.getFloat($i)) * $b.getFloat($i); }
        ${ev.value} = $dot;
        """
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** 64-bit SimHash of a token array. For each token t with 64-bit hash
    * h = XXH64(t): every bit position accumulates +1 if set else -1; the
    * sketch's bit b is 1 iff the accumulator is positive. Hamming distance
    * between sketches approximates (1 - cosine) of the token multisets —
    * the classic Charikar construction, done here in one codegen'd pass
    * (no explode, no shuffle per token).
    */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(in: Any): Any = {
      val arr = in.asInstanceOf[ArrayData]
      val acc = new Array[Int](64)
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val t = arr.getUTF8String(i)
        if (t != null) {
          val h = XXH64.hashUTF8String(t, 42L)
          var b = 0
          while (b < 64) { acc(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1); b += 1 }
        }
        i += 1
      }
      var out = 0L; var b = 0
      while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
      out
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
        val n = ctx.freshName("n"); val t = ctx.freshName("t")
        val h = ctx.freshName("h"); val b = ctx.freshName("b")
        val out = ctx.freshName("out")
        s"""
        int[] $acc = new int[64];
        int $n = $a.numElements();
        for (int $i = 0; $i < $n; $i++) {
          UTF8String $t = $a.getUTF8String($i);
          if ($t != null) {
            long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String($t, 42L);
            for (int $b = 0; $b < 64; $b++) {
              $acc[$b] += (((($h >>> $b) & 1L) == 1L) ? 1 : -1);
            }
          }
        }
        long $out = 0L;
        for (int $b = 0; $b < 64; $b++) { if ($acc[$b] > 0) $out |= (1L << $b); }
        ${ev.value} = $out;
        """
      })
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** MinHash signature of a shingle array: k minimums in ONE pass. Each
    * shingle is hashed once (XXH64) and the k per-seed hashes are derived
    * with a splitmix64 finalizer over (base + seed·γ) — the standard
    * "one strong hash + k cheap mixes" construction. A composed
    * `transform(sequence(0,k-1), seed -> array_min(transform(shingles, …)))`
    * re-evaluates the shingle expression k times per row (Catalyst inlines
    * collapsed projections), which benchmarked ~60× slower.
    */
  case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    private val GAMMA = 0x9e3779b97f4a7c15L

    override def nullSafeEval(in: Any): Any = {
      val arr = in.asInstanceOf[ArrayData]
      val out = Array.fill(k)(Long.MaxValue)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        if (s != null) {
          val base = XXH64.hashUTF8String(s, 42L)
          var j = 0
          while (j < k) {
            var z = base + (j + 1) * GAMMA
            z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
            z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
            z = z ^ (z >>> 31)
            if (z < out(j)) out(j) = z
            j += 1
          }
        }
        i += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val out = ctx.freshName("out"); val n = ctx.freshName("n")
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val s = ctx.freshName("s"); val base = ctx.freshName("base")
        val z = ctx.freshName("z")
        s"""
        long[] $out = new long[$k];
        java.util.Arrays.fill($out, Long.MAX_VALUE);
        int $n = $a.numElements();
        for (int $i = 0; $i < $n; $i++) {
          UTF8String $s = $a.getUTF8String($i);
          if ($s != null) {
            long $base = org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String($s, 42L);
            for (int $j = 0; $j < $k; $j++) {
              long $z = $base + ($j + 1) * ${GAMMA}L;
              $z = ($z ^ ($z >>> 30)) * 0xbf58476d1ce4e5b9L;
              $z = ($z ^ ($z >>> 27)) * 0x94d049bb133111ebL;
              $z = $z ^ ($z >>> 31);
              if ($z < $out[$j]) $out[$j] = $z;
            }
          }
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
        """
      })
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Fused text → MinHash signature: tokenize (whitespace, ASCII
    * lowercase), form `ngram`-token shingles, and take the k per-seed
    * minimums — in ONE pass over the UTF-8 bytes with zero intermediate
    * allocation (no token array, no shingle strings). Token and shingle
    * hashes are FNV-1a 64; per-seed values derive from the shingle hash
    * via a splitmix64 finalizer. This is the kernel a 100 TB text-dedup
    * scan actually wants: the unfused pipeline (split → filter →
    * transform → concat_ws → hash) allocates several objects per token
    * per row.
    *
    * Documents shorter than `ngram` tokens hash all their tokens as one
    * shingle; empty documents keep the all-MaxValue signature.
    */
  case class MinHashTextSig(child: Expression, ngram: Int, k: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    private val GAMMA = 0x9e3779b97f4a7c15L
    private val FNV_OFFSET = -3750763034362895579L // 14695981039346656037 unsigned
    private val FNV_PRIME = 1099511628211L

    override def nullSafeEval(in: Any): Any = {
      val s = in.asInstanceOf[UTF8String].getBytes
      val out = Array.fill(k)(Long.MaxValue)
      val ring = new Array[Long](ngram)
      var nTok = 0
      var i = 0
      def emit(h: Long): Unit = {
        var j = 0
        while (j < k) {
          var z = h + (j + 1) * GAMMA
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
          z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
          z = z ^ (z >>> 31)
          if (z < out(j)) out(j) = z
          j += 1
        }
      }
      def shingleHash(from: Int, len: Int): Long = {
        var h = FNV_OFFSET
        var j = 0
        while (j < len) {
          h = (h ^ ring((from + j) % ngram)) * FNV_PRIME
          j += 1
        }
        h
      }
      while (i < s.length) {
        while (i < s.length && (s(i) & 0xff) <= 32) i += 1
        if (i < s.length) {
          var th = FNV_OFFSET
          while (i < s.length && (s(i) & 0xff) > 32) {
            var b = s(i) & 0xff
            if (b >= 'A' && b <= 'Z') b |= 0x20
            th = (th ^ b) * FNV_PRIME
            i += 1
          }
          ring(nTok % ngram) = th
          nTok += 1
          if (nTok >= ngram) emit(shingleHash(nTok - ngram, ngram))
        }
      }
      if (nTok > 0 && nTok < ngram) emit(shingleHash(0, nTok))
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val s = ctx.freshName("s"); val out = ctx.freshName("out")
        val ring = ctx.freshName("ring"); val nTok = ctx.freshName("nTok")
        val i = ctx.freshName("i"); val th = ctx.freshName("th")
        val b = ctx.freshName("b"); val h = ctx.freshName("h")
        val j = ctx.freshName("j"); val z = ctx.freshName("z")
        val base = ctx.freshName("base"); val len = ctx.freshName("len")
        // emit-loop shared between full shingles and the short-doc tail
        def emitLoop(hVar: String) =
          s"""
          for (int $j = 0; $j < $k; $j++) {
            long $z = $hVar + ($j + 1) * ${GAMMA}L;
            $z = ($z ^ ($z >>> 30)) * 0xbf58476d1ce4e5b9L;
            $z = ($z ^ ($z >>> 27)) * 0x94d049bb133111ebL;
            $z = $z ^ ($z >>> 31);
            if ($z < $out[$j]) $out[$j] = $z;
          }"""
        def shingleLoop(fromExpr: String, lenExpr: String) =
          s"""
          long $h = ${FNV_OFFSET}L;
          { int $base = $fromExpr; int $len = $lenExpr;
            for (int $j = 0; $j < $len; $j++) {
              $h = ($h ^ $ring[($base + $j) % $ngram]) * ${FNV_PRIME}L;
            } }
          ${emitLoop(h)}"""
        s"""
        byte[] $s = $a.getBytes();
        long[] $out = new long[$k];
        java.util.Arrays.fill($out, Long.MAX_VALUE);
        long[] $ring = new long[$ngram];
        int $nTok = 0; int $i = 0;
        while ($i < $s.length) {
          while ($i < $s.length && ($s[$i] & 0xff) <= 32) $i++;
          if ($i < $s.length) {
            long $th = ${FNV_OFFSET}L;
            while ($i < $s.length && ($s[$i] & 0xff) > 32) {
              int $b = $s[$i] & 0xff;
              if ($b >= 65 && $b <= 90) $b |= 0x20;
              $th = ($th ^ $b) * ${FNV_PRIME}L;
              $i++;
            }
            $ring[$nTok % $ngram] = $th;
            $nTok++;
            if ($nTok >= $ngram) { ${shingleLoop(s"$nTok - $ngram", s"$ngram")} }
          }
        }
        if ($nTok > 0 && $nTok < $ngram) { ${shingleLoop("0", s"$nTok")} }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
        """
      })
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Distinct shingle-hash set of a text: same one-pass tokenizer and FNV
    * shingle hashing as [[MinHashTextSig]], but returns the SORTED DISTINCT
    * hash array — the exact-verification companion to the MinHash
    * estimate. Exactness is modulo 64-bit hash collisions (~2^-64 per
    * pair), the trade that buys never materializing shingle strings.
    */
  case class ShingleHashes(child: Expression, ngram: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    private val FNV_OFFSET = -3750763034362895579L
    private val FNV_PRIME = 1099511628211L

    override def nullSafeEval(in: Any): Any = {
      val s = in.asInstanceOf[UTF8String].getBytes
      val ring = new Array[Long](ngram)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
      var nTok = 0
      var i = 0
      def shingleHash(from: Int, len: Int): Long = {
        var h = FNV_OFFSET
        var j = 0
        while (j < len) { h = (h ^ ring((from + j) % ngram)) * FNV_PRIME; j += 1 }
        h
      }
      while (i < s.length) {
        while (i < s.length && (s(i) & 0xff) <= 32) i += 1
        if (i < s.length) {
          var th = FNV_OFFSET
          while (i < s.length && (s(i) & 0xff) > 32) {
            var b = s(i) & 0xff
            if (b >= 'A' && b <= 'Z') b |= 0x20
            th = (th ^ b) * FNV_PRIME
            i += 1
          }
          ring(nTok % ngram) = th
          nTok += 1
          if (nTok >= ngram) buf += shingleHash(nTok - ngram, ngram)
        }
      }
      if (nTok > 0 && nTok < ngram) buf += shingleHash(0, nTok)
      val arr = buf.toArray
      java.util.Arrays.sort(arr)
      var w = 0
      var r = 0
      while (r < arr.length) {
        if (w == 0 || arr(r) != arr(w - 1)) { arr(w) = arr(r); w += 1 }
        r += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(java.util.Arrays.copyOf(arr, w))
    }
    // interpreted eval only: this expression runs once per document in a
    // projection (not in a per-pair inner loop), so codegen matters less;
    // CodegenFallback keeps the surrounding stage compiled.
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val expr = ctx.addReferenceObj("shingleHashesExpr", this)
      nullSafeCodeGen(ctx, ev, a => {
        s"""
        ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
          ((org.apache.spark.sql.catalyst.expressions.UnaryExpression) $expr).nullSafeEval($a);
        """
      })
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Exact Jaccard of two SORTED distinct long arrays — one merge pass,
    * no set allocation (vs `array_intersect`/`array_union`, which build
    * hash sets per row pair).
    */
  case class JaccardSorted(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
      val n = a.numElements(); val m = b.numElements()
      if (n == 0 && m == 0) return 1.0
      var i = 0; var j = 0; var inter = 0
      while (i < n && j < m) {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { inter += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
      inter.toDouble / (n + m - inter)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val m = ctx.freshName("m")
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val inter = ctx.freshName("inter")
        val x = ctx.freshName("x"); val y = ctx.freshName("y")
        s"""
        int $n = $a.numElements(); int $m = $b.numElements();
        if ($n == 0 && $m == 0) { ${ev.value} = 1.0; } else {
          int $i = 0; int $j = 0; int $inter = 0;
          while ($i < $n && $j < $m) {
            long $x = $a.getLong($i); long $y = $b.getLong($j);
            if ($x == $y) { $inter++; $i++; $j++; }
            else if ($x < $y) $i++;
            else $j++;
          }
          ${ev.value} = ((double) $inter) / ($n + $m - $inter);
        }
        """
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** Fraction of positions where two equal-length long arrays agree — the
    * MinHash signature agreement rate (unbiased Jaccard estimator). A
    * zip_with+filter formulation evaluates two interpreted lambdas per
    * element; this is one fused loop inside whole-stage codegen.
    */
  case class SigMatchRate(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      if (n == 0) return 0.0
      var eq = 0; var i = 0
      while (i < n) { if (a.getLong(i) == b.getLong(i)) eq += 1; i += 1 }
      eq.toDouble / n
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val eq = ctx.freshName("eq")
        s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        int $eq = 0;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.getLong($i) == $b.getLong($i)) $eq++;
        }
        ${ev.value} = ($n == 0) ? 0.0 : ((double) $eq) / $n;
        """
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** LSH band keys of a MinHash signature: band b's key is the chained
    * XXH64 of its `rowsPerBand` signature values — pure long math, one
    * array out. (The composed string-concat + xxhash64 formulation spent
    * ~200 µs/row in interpreted higher-order functions.)
    */
  case class BandKeys(child: Expression, bands: Int, rowsPerBand: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def nullSafeEval(in: Any): Any = {
      val sig = in.asInstanceOf[ArrayData]
      val out = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var h = 0L
        var r = 0
        while (r < rowsPerBand) {
          val idx = b * rowsPerBand + r
          if (idx < sig.numElements()) h = XXH64.hashLong(sig.getLong(idx), h)
          r += 1
        }
        out(b) = h
        b += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val out = ctx.freshName("out"); val b = ctx.freshName("b")
        val r = ctx.freshName("r"); val h = ctx.freshName("h")
        val idx = ctx.freshName("idx")
        s"""
        long[] $out = new long[$bands];
        for (int $b = 0; $b < $bands; $b++) {
          long $h = 0L;
          for (int $r = 0; $r < $rowsPerBand; $r++) {
            int $idx = $b * $rowsPerBand + $r;
            if ($idx < $a.numElements()) {
              $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($a.getLong($idx), $h);
            }
          }
          $out[$b] = $h;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
        """
      })
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Document fingerprint: minimum of the Karp-Rabin rolling hashes of all
    * `w`-byte windows of the UTF-8 text (winnowing-style min-sampling, one
    * pass, O(len)). Equal fingerprints are a strong signal of shared
    * `w`-byte content — the cheap first pass of near-dup detection.
    */
  case class RollingMinHash(child: Expression, w: Int) extends UnaryExpression {
    override def dataType: DataType = LongType
    private val B = 1000000007L
    private def powB(k: Int): Long = {
      var r = 1L; var i = 0
      while (i < k) { r *= B; i += 1 }
      r
    }
    override def nullSafeEval(in: Any): Any = {
      val s = in.asInstanceOf[UTF8String].getBytes
      if (s.length < w) return XXH64.hashUnsafeBytes(s, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, s.length, 7L)
      val bw = powB(w - 1)
      var h = 0L; var i = 0
      while (i < w) { h = h * B + (s(i) & 0xff); i += 1 }
      var min = h
      while (i < s.length) {
        h = (h - (s(i - w) & 0xff) * bw) * B + (s(i) & 0xff)
        if (h < min) min = h
        i += 1
      }
      min
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val s = ctx.freshName("s"); val h = ctx.freshName("h")
        val i = ctx.freshName("i"); val min = ctx.freshName("min")
        val bw = ctx.freshName("bw")
        s"""
        byte[] $s = $a.getBytes();
        if ($s.length < $w) {
          ${ev.value} = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
            $s, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, $s.length, 7L);
        } else {
          long $bw = 1L;
          for (int $i = 0; $i < ${w - 1}; $i++) { $bw *= ${B}L; }
          long $h = 0L; int $i = 0;
          for (; $i < $w; $i++) { $h = $h * ${B}L + ($s[$i] & 0xff); }
          long $min = $h;
          for (; $i < $s.length; $i++) {
            $h = ($h - ($s[$i - $w] & 0xff) * $bw) * ${B}L + ($s[$i] & 0xff);
            if ($h < $min) $min = $h;
          }
          ${ev.value} = $min;
        }
        """
      })
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }
}

/** Column-level API over the kernels + composed helpers built purely from
  * `org.apache.spark.sql.functions` (everything stays codegen'd).
  */
object functions {
  import org.apache.spark.sql.functions._

  def cosine_sim(a: Column, b: Column): Column =
    Shim.col(kernels.CosineSim(Shim.expr(a), Shim.expr(b)))

  def dot_f(a: Column, b: Column): Column =
    Shim.col(kernels.DotF(Shim.expr(a), Shim.expr(b)))

  def simhash64(tokens: Column): Column =
    Shim.col(kernels.SimHash64(Shim.expr(tokens)))

  def doc_fingerprint(text: Column, window: Int = 16): Column =
    Shim.col(kernels.RollingMinHash(Shim.expr(text), window))

  /** Hamming distance between two 64-bit sketches. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** whitespace tokens, lowercased, empties dropped */
  def ws_tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** word n-gram shingles of a token array (n consecutive tokens joined).
    * Built as a chain of n-1 `zip_with`s over shifted slices — O(1) work
    * per gram. The per-gram `transform(sequence, i -> concat_ws(slice))`
    * formulation is ~7× slower at corpus scale: higher-order functions run
    * interpreted, and a slice per element pays allocation + copy per gram.
    */
  def shingles(tokens: Column, n: Int): Column = {
    val m = size(tokens) - (n - 1) // gram count when size >= n
    val joined = (1 until n).foldLeft(slice(tokens, lit(1), m)) { (acc, j) =>
      zip_with(acc, slice(tokens, lit(j + 1), m), (a, b) => concat(a, lit(" "), b))
    }
    when(size(tokens) < n, array(concat_ws(" ", tokens))).otherwise(joined)
  }

  /** MinHash signature: k independent minimums in one codegen'd pass
    * (see [[kernels.MinHashSig]]). One array column out, no shuffle.
    */
  def minhash_sig(shingleCol: Column, k: Int): Column =
    Shim.col(kernels.MinHashSig(Shim.expr(shingleCol), k))

  /** LSH band keys: split a MinHash signature into `bands` bands of
    * `rowsPerBand` values and hash each band — docs sharing any band key
    * are candidate near-duplicates. One codegen'd pass
    * (see [[kernels.BandKeys]]); pair with `posexplode` for (band, key).
    */
  def lsh_bands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    Shim.col(kernels.BandKeys(Shim.expr(sig), bands, rowsPerBand))

  /** agreement rate of two MinHash signatures (Jaccard estimate) */
  def sig_match_rate(a: Column, b: Column): Column =
    Shim.col(kernels.SigMatchRate(Shim.expr(a), Shim.expr(b)))

  /** fused tokenize → shingle → MinHash signature straight from text
    * (see [[kernels.MinHashTextSig]]) — the zero-allocation scan path
    */
  def minhash_text_sig(text: Column, ngram: Int, k: Int): Column =
    Shim.col(kernels.MinHashTextSig(Shim.expr(text), ngram, k))

  /** sorted distinct shingle-hash set (exact-verify companion) */
  def shingle_hashes(text: Column, ngram: Int): Column =
    Shim.col(kernels.ShingleHashes(Shim.expr(text), ngram))

  /** exact Jaccard of two sorted distinct long arrays */
  def jaccard_sorted(a: Column, b: Column): Column =
    Shim.col(kernels.JaccardSorted(Shim.expr(a), Shim.expr(b)))
}
