package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot paths the built-in function
  * library doesn't cover. Each generates a single static-method call inside
  * whole-stage codegen (no UDF boxing, no codegen fallback), with an
  * interpreted `nullSafeEval` for completeness.
  *
  * These back the SURVEY.md §7.4 extension operators (dedup, similarity,
  * fingerprinting) — per-row work on 100 TB lives or dies on staying inside
  * codegen.
  */

  /** 64-bit FNV-1a over UTF-8 bytes — the document rolling fingerprint.
    * Public-domain algorithm (Fowler–Noll–Vo).
    */
  object Fnv {
    final val Offset = 0xcbf29ce484222325L
    final val Prime = 0x100000001b3L
    def compute(s: UTF8String): Long = {
      val bytes = s.getBytes
      var h = Offset
      var i = 0
      while (i < bytes.length) {
        h ^= (bytes(i) & 0xffL)
        h *= Prime
        i += 1
      }
      h
    }
  }

  case class Fnv1a64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      Fnv.compute(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Fnv.compute($c)")
    override protected def withNewChildInternal(c: Expression): Fnv1a64 = copy(c)
  }

  /** Fast double→DECIMAL(p,2) for MONEY doubles (r15). Spark's
    * `cast(double AS decimal)` goes through `Double.toString` (Ryū) +
    * `BigDecimal` parse + `setScale` PER ROW — measured as the dominant
    * cost of the whole relational aggregate tail at gate scale (q1: a
    * cast-free twin of the same aggregate runs 0.25 s vs 1.0 s). This
    * expression builds the long-backed Decimal directly from
    * `Math.round(v·100)` — no string, no BigDecimal, stays in codegen.
    *
    * VALUE-IDENTICAL PRECONDITION (measured, spec-pinned): every money
    * column holds doubles within 1e-6·cents of a 2-decimal value (the
    * fixture maxes at 3.7e-9 across all tables incl. events.value, and
    * ScaleGen copies values). For such doubles the shortest-string
    * HALF_UP of the cast and `Math.round(v·100)` agree; the expression
    * is NOT a general replacement for doubles with ≥3 significant
    * decimals near a half-cent boundary. Overflow/NaN/Infinity return
    * NULL, matching the non-ANSI cast.
    */
  object Money {
    def cents2(v: Double, precision: Int): Decimal = {
      if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v))
        return null
      val cents = Math.round(v * 100.0)
      // overflow → null, the non-ANSI cast contract. precision ≤ 18 so
      // 10^precision fits in a Long; Math.round saturates at
      // Long.{Max,Min}Value which both fall outside every bound. Compare
      // both signs directly — abs(Long.MinValue) is negative.
      var bound = 1L
      var i = 0
      while (i < precision) { bound *= 10; i += 1 }
      if (cents >= bound || cents <= -bound) null
      else Decimal(cents, precision, 2)
    }
  }

  case class MoneyDec2(child: Expression, precision: Int)
      extends UnaryExpression {
    require(precision >= 3 && precision <= 18,
      "long-backed decimal only (precision 3..18)")
    override def dataType: DataType = DecimalType(precision, 2)
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any =
      Money.cents2(v.asInstanceOf[Double], precision)
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.functions.Money.cents2($c, $precision);
        if (${ev.value} == null) { ${ev.isNull} = true; }""")
    override protected def withNewChildInternal(c: Expression): MoneyDec2 =
      copy(child = c)
  }

  /** 64-bit SimHash over whitespace tokens: each token's FNV hash votes
    * ±1 per bit position; the sign vector packs into a Long. Near-duplicate
    * documents land within a small Hamming distance. (Charikar, STOC 2002 —
    * public algorithm.)
    */
  object SimHash {
    def compute(s: UTF8String): Long = {
      val acc = new Array[Int](64)
      // iterate tokens without materializing a String[]
      val str = s.toString
      var start = 0
      val n = str.length
      while (start < n) {
        while (start < n && str.charAt(start) == ' ') start += 1
        var end = start
        while (end < n && str.charAt(end) != ' ') end += 1
        if (end > start) {
          val h = Fnv.compute(UTF8String.fromString(str.substring(start, end)))
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
            b += 1
          }
        }
        start = end
      }
      var out = 0L
      var b = 0
      while (b < 64) {
        if (acc(b) > 0) out |= (1L << b)
        b += 1
      }
      out
    }
  }

  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      SimHash.compute(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.compute($c)")
    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
  }

  /** Dot product over two float arrays, accumulated in double in element
    * order (deterministic — matches a sequential SQL lambda fold, so it is
    * oracle-stable). A tight primitive loop: ~50× the HOF-chain
    * (zip_with+aggregate) equivalent, which allocates per element.
    */
  object Vec {
    def dot(a: ArrayData, b: ArrayData): Double = {
      val n = math.min(a.numElements(), b.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
        i += 1
      }
      acc
    }
    def norm(a: ArrayData): Double = math.sqrt(dot(a, a))
  }

  case class DotF(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      Vec.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.Vec.dot($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotF =
      copy(left = l, right = r)
  }

  /** Morton (Z-order) bit interleave — the multi-dimensional clustering
    * key (Morton 1966). Bit-spread via parallel-prefix masks: 3 shift/or
    * rounds per operand instead of 8 mask-shift-or terms per bit.
    */
  object Morton {
    /** Spread the low 8 bits of v to even positions 0,2,…,14. */
    def spread8(v: Long): Long = {
      var x = v & 0xffL
      x = (x | (x << 4)) & 0x0f0fL
      x = (x | (x << 2)) & 0x3333L
      x = (x | (x << 1)) & 0x5555L
      x
    }
    /** 16-bit z-key: x bits at odd positions, y bits at even. */
    def zkey8(x: Long, y: Long): Long = (spread8(x) << 1) | spread8(y)

    /** Inverse of [[spread8]]: gather even-position bits back to the
      * low 8. `(compact8(z >> 1), compact8(z))` inverts [[zkey8]] —
      * bijectivity is what makes the key a lossless clustering address.
      */
    def compact8(v: Long): Long = {
      var x = v & 0x5555L
      x = (x | (x >> 1)) & 0x3333L
      x = (x | (x >> 2)) & 0x0f0fL
      x = (x | (x >> 4)) & 0x00ffL
      x
    }
  }

  /** SQL `zorder_key(x, y)`. Inputs MUST already be bucketed to
    * [0, 256) — out-of-range values fail the query (both interpreted and
    * codegen paths) instead of being silently masked to a
    * plausible-but-wrong clustering key (a wrong key degrades file
    * skipping without any visible error, the worst failure mode for a
    * layout primitive).
    */
  case class ZOrderKey8(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes = GraftBridge.longLongInputTypes
    override def dataType: DataType = LongType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[Long]
      val y = b.asInstanceOf[Long]
      if (x < 0L || x > 255L || y < 0L || y > 255L)
        throw new IllegalArgumentException(ZOrderKey8.rangeError(x, y))
      Morton.zkey8(x, y)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        if ($a < 0L || $a > 255L || $b < 0L || $b > 255L) {
          throw new IllegalArgumentException(
            graft.functions.ZOrderKey8.rangeError($a, $b));
        }
        ${ev.value} = graft.functions.Morton.zkey8($a, $b);""")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): ZOrderKey8 =
      copy(left = l, right = r)
  }

  object ZOrderKey8 {
    /** Shared by the interpreted and generated paths. */
    def rangeError(x: Long, y: Long): String =
      s"zorder_key(x, y) requires inputs in [0, 256), got ($x, $y): " +
        "pre-bin each dimension to an 8-bit bucket (e.g. `col & 255` or " +
        "`least(floor(...), 255)`) before interleaving"
  }

// ---- Column-level API ----------------------------------------------------

object Expressions {

  def fnv1a64(c: Column): Column = GraftBridge.column(Fnv1a64(GraftBridge.expression(c)))

  /** Fast double→DECIMAL(p,2) for measured-2-decimal money doubles —
    * value-identical to `c.cast(s"decimal($p,2)")` on such inputs (see
    * [[MoneyDec2]]; precondition + identity spec-pinned in Round15Spec).
    */
  def moneyDec2(c: Column, precision: Int): Column =
    GraftBridge.column(MoneyDec2(GraftBridge.expression(c), precision))
  def simhash64(c: Column): Column = GraftBridge.column(SimHash64(GraftBridge.expression(c)))
  def dotF(a: Column, b: Column): Column =
    GraftBridge.column(DotF(GraftBridge.expression(a), GraftBridge.expression(b)))
  def zorderKey8(x: Column, y: Column): Column =
    GraftBridge.column(ZOrderKey8(GraftBridge.expression(x), GraftBridge.expression(y)))

  /** Cosine similarity between two float-array columns, double-accumulated
    * in element order (oracle-stable).
    */
  def cosineF(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    dotF(a, b) / (sqrt(dotF(a, a)) * sqrt(dotF(b, b)))
  }

  /** L2 norm of a float-array column — the per-ROW half of [[cosineF]],
    * for hoisting out of pair loops. [[cosineF]] evaluates THREE dot
    * products per pair, so a pair join recomputes each side's
    * `sqrt(dot(x,x))` once per PAIR: on e2's sf10 tile join that is
    * 2·2e10 redundant 64-dim dots. Computing `normF` once per row
    * before the join and scoring pairs with [[cosinePreF]] cuts the
    * per-pair work to one dot + one multiply + one divide.
    */
  def normF(c: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(dotF(c, c))
  }

  /** Cosine from precomputed norms. BIT-IDENTICAL to
    * `cosineF(a, b)` when `na = normF(a)` and `nb = normF(b)`: the
    * norms are the same doubles (same expression, just evaluated per
    * row instead of per pair) and the `na * nb` product and division
    * keep cosineF's operand order, so every IEEE intermediate is the
    * same value (pinned in Round13Spec; the ct2/e2/e5 oracle rows stay
    * hash-exact through the rewrite).
    */
  def cosinePreF(a: Column, na: Column, b: Column, nb: Column): Column =
    dotF(a, b) / (na * nb)

  def shingleHashes(c: Column, k: Int): Column =
    GraftBridge.column(ShingleHashes(GraftBridge.expression(c), k))
  def minhashSig(c: Column, k: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(c), k))
  def sortedIntersectSize(a: Column, b: Column): Column =
    GraftBridge.column(SortedIntersectSize(GraftBridge.expression(a), GraftBridge.expression(b)))
  def sortedContainsAny(a: Column, b: Column): Column =
    GraftBridge.column(SortedContainsAny(GraftBridge.expression(a), GraftBridge.expression(b)))
  def winnowFingerprints(c: Column, k: Int, w: Int): Column =
    GraftBridge.column(WinnowFingerprints(GraftBridge.expression(c), k, w))
  def gramArray(c: Column, k: Int): Column =
    GraftBridge.column(GramArray(GraftBridge.expression(c), k))
  def gramHashArray(c: Column, k: Int): Column =
    GraftBridge.column(GramHashArray(GraftBridge.expression(c), k))
}

/** All positional k-character grams of a string in ONE pass. The naive
  * relational form — `explode(sequence(...))` + `substring(text, pos, k)`
  * — is quadratic per document: UTF8String.substring re-scans from the
  * string head on every call to find the codepoint offset, so a 300-char
  * doc costs ~45 000 char steps instead of ~300. This expression computes
  * the codepoint byte-offset table once and slices each gram directly
  * (O(len·k) bytes per row, no re-scans). Semantics match
  * `substring(text, i, k)` for every i exactly (codepoint-counted, like
  * Spark's and DuckDB's substring), so oracle SQL can keep using the
  * naive form.
  */
object Grams {
  def all(s: UTF8String, k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = s.getBytes
    // codepoint start offsets (UTF-8: starts are bytes not matching 10xxxxxx)
    val starts = new Array[Int](s.numChars() + 1)
    var n = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(n) = i; n += 1 }
      i += 1
    }
    starts(n) = bytes.length
    if (n < k) return new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    var j = 0
    while (j <= n - k) {
      out(j) = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, starts(j), starts(j + k)))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Per-position gram hashes (see [[GramHashArray]]): FNV-1a over the
    * gram's byte range, splitmix-finalized for uniform high/low bits.
    */
  def hashAll(s: UTF8String, k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = s.getBytes
    val starts = new Array[Int](s.numChars() + 1)
    var n = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(n) = i; n += 1 }
      i += 1
    }
    starts(n) = bytes.length
    if (n < k) return new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.empty[Long])
    val out = new Array[Long](n - k + 1)
    var j = 0
    while (j <= n - k) {
      var h = 0xcbf29ce484222325L
      var p = starts(j)
      val end = starts(j + k)
      while (p < end) {
        h = (h ^ (bytes(p) & 0xffL)) * 0x100000001b3L
        p += 1
      }
      h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
      h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
      out(j) = h ^ (h >>> 31)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

case class GramArray(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Grams.all(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Grams.all($c, $k)")
  override protected def withNewChildInternal(c: Expression): GramArray =
    copy(child = c)
}

/** 64-bit hash of every positional k-gram, one pass, no string
  * materialization: positions line up 1:1 with [[GramArray]], but each
  * element is an 8-byte FNV-1a-then-splitmix hash of the gram's bytes
  * instead of a copied UTF8String. Downstream shuffles keyed on the gram
  * (cross-doc gram matching) carry 8 bytes instead of k characters plus
  * an object header, and the per-row allocation disappears entirely.
  * Two grams collide with ~2^-64 pair probability — at 10^9 distinct
  * grams the expected collision count is still < 10^-1 — and a collision
  * can only ADD a false duplicate span, never lose one.
  */
case class GramHashArray(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Grams.hashAll(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Grams.hashAll($c, $k)")
  override protected def withNewChildInternal(c: Expression): GramHashArray =
    copy(child = c)
}
/** Shared two-stream splitmix64 mixer (Steele et al., "Fast Splittable
  * Pseudorandom Number Generators"): one deterministic 64-bit stream per
  * (value, salt) pair. The single home for the constant set — media
  * fixture generation (Multimodal.MediaGen) and the scale-up corpus
  * generator (tools.ScaleGen) both key their determinism to it.
  */
object SplitMix {
  @inline def mix2(a: Long, b: Long): Long = {
    var z = a * 0x9e3779b97f4a7c15L + b * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

/** One-pass MinHash signature: k minima over splitmix64-mixed shingle
  * hashes. Replaces k separate `transform(array, xxhash64)` passes (k array
  * allocations per row) with a single O(n·k) loop and one output array.
  * splitmix64 finalizer: Steele et al., "Fast Splittable Pseudorandom
  * Number Generators" (public algorithm); wraps safely on the JVM.
  */
object MinHash {
  @inline private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  def signature(shingles: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val h = shingles.getLong(i)
      var j = 0
      while (j < k) {
        val v = mix(h + (j + 1) * 0x9e3779b97f4a7c15L)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }
}

case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    MinHash.signature(v.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash.signature($c, $k)")
  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** Intersection size of two SORTED long arrays by linear merge — no hash
  * set allocation (vs array_intersect). Inputs must be sorted + distinct
  * (sort_array(array_distinct(...)) upstream); union size follows as
  * |A| + |B| - |A∩B|.
  */
object SortedArr {
  /** True iff ANY element of `a` occurs in the SORTED long array `b` —
    * per-element binary search, O(|a|·log|b|). Built for the
    * frozen-eval-set membership probe where `b` is a corpus-scale-
    * bounded literal (tens of KB to a few MB) and `a` is one doc's
    * gram set: a merge walk ([[intersectSize]]) pays O(|b|) per ROW
    * regardless of |a|, while the search pays |a|·log|b| ≈ thousands
    * of comparisons per doc against a 100k-gram benchmark set.
    */
  def containsAny(a: ArrayData, b: ArrayData): Boolean = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    while (i < na) {
      val x = a.getLong(i)
      var lo = 0
      var hi = nb - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val y = b.getLong(mid)
        if (y == x) return true
        else if (y < x) lo = mid + 1
        else hi = mid - 1
      }
      i += 1
    }
    false
  }

  def intersectSize(a: ArrayData, b: ArrayData): Long = {
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    SortedArr.intersectSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SortedArr.intersectSize($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectSize =
    copy(left = l, right = r)
}

/** True iff any element of `left` occurs in the SORTED long array
  * `right` ([[SortedArr.containsAny]] — per-element binary search;
  * `left` needs no ordering). The membership probe for
  * frozen-benchmark decontamination (ct3 / the streaming gate).
  */
case class SortedContainsAny(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(a: Any, b: Any): Any =
    SortedArr.containsAny(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SortedArr.containsAny($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedContainsAny =
    copy(left = l, right = r)
}

/** One-pass character-shingle set: hashes every k-char substring (FNV-1a
  * over chars), then sorts + dedupes in place — replacing the
  * sequence→transform→substring→array_distinct→sort_array chain, which
  * allocates one UTF8String per shingle and three intermediate arrays per
  * row. Texts shorter than k yield the single hash of the whole text
  * (mirroring substring() semantics of the HOF version).
  */
object Shingle {
  def hashes(s: UTF8String, k: Int): ArrayData = {
    val str = s.toString
    val n = str.length
    val count = math.max(1, n - k + 1)
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      var h = Fnv.Offset
      var j = i
      val end = math.min(i + k, n)
      while (j < end) {
        val c = str.charAt(j)
        h ^= (c & 0xffL); h *= Fnv.Prime
        h ^= ((c >> 8) & 0xffL); h *= Fnv.Prime
        j += 1
      }
      out(i) = h
      i += 1
    }
    java.util.Arrays.sort(out)
    // compact distinct in place
    var w = 0
    var r = 0
    while (r < count) {
      if (w == 0 || out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out, w))
  }
}

case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Shingle.hashes(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Shingle.hashes($c, $k)")
  override protected def withNewChildInternal(c: Expression): ShingleHashes =
    copy(child = c)
}

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003;
  * the MOSS algorithm). Positional k-gram FNV-1a hashes → sliding window
  * of `w` hashes → the minimum of each window (rightmost on ties — robust
  * winnowing) → sorted distinct fingerprint set.
  *
  * Guarantee: any substring match of length ≥ w + k − 1 between two
  * documents shares at least one fingerprint; expected density is
  * 2/(w+1) of all k-grams — an order-of-magnitude cheaper dup signal than
  * the full shingle set at 100 TB, with a detection floor instead of
  * MinHash's probabilistic recall. Fingerprints are a subset of
  * [[Shingle.hashes]] output for the same k (identical hash loop), which
  * the wv1 invariant query checks.
  */
object Winnow {
  def fingerprints(s: UTF8String, k: Int, w: Int): ArrayData = {
    val str = s.toString
    val n = str.length
    val count = math.max(1, n - k + 1)
    val hs = new Array[Long](count)
    var i = 0
    while (i < count) {
      var h = Fnv.Offset
      var j = i
      val end = math.min(i + k, n)
      while (j < end) {
        val c = str.charAt(j)
        h ^= (c & 0xffL); h *= Fnv.Prime
        h ^= ((c >> 8) & 0xffL); h *= Fnv.Prime
        j += 1
      }
      hs(i) = h
      i += 1
    }
    val sel = new java.util.TreeSet[java.lang.Long]()
    if (count <= w) {
      // shorter than one window: the global min is the fingerprint
      var m = hs(0)
      var p = 1
      while (p < count) { if (hs(p) <= m) m = hs(p); p += 1 }
      sel.add(m)
    } else {
      // O(n) sliding-window minimum via a monotone index deque;
      // popping on >= keeps the RIGHTMOST minimal hash (robust winnowing)
      val dq = new java.util.ArrayDeque[Integer]()
      var p = 0
      while (p < count) {
        while (!dq.isEmpty && hs(dq.peekLast) >= hs(p)) dq.pollLast()
        dq.addLast(p)
        if (dq.peekFirst <= p - w) dq.pollFirst()
        if (p >= w - 1) sel.add(hs(dq.peekFirst))
        p += 1
      }
    }
    val out = new Array[Long](sel.size)
    var q = 0
    val it = sel.iterator()
    while (it.hasNext) { out(q) = it.next(); q += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Winnow.fingerprints(v.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Winnow.fingerprints($c, $k, $w)")
  override protected def withNewChildInternal(c: Expression): WinnowFingerprints =
    copy(child = c)
}
