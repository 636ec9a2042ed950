package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hash/vector-heavy operators.
  *
  * The SQL-composed versions (transform/sequence/aggregate higher-order
  * functions) are interpreted per-lambda-call by Spark and re-scan the
  * string for every substring(text, i, 1) — O(n^2) per document. These
  * kernels do one pass per row in tight JVM loops with semantics
  * IDENTICAL to the DuckDB oracle fragments (31-base polynomial over
  * codepoints mod 2^31-1, left-to-right double folds), so swapping
  * them in changes nothing the correctness gate can see — verified by
  * the unchanged oracle SQL still hash-matching.
  *
  * CodegenFallback is fine here: the per-row virtual call is noise
  * next to the per-row work, and the loop bodies are already JIT'd
  * scalar code.
  */
object TextKernels {
  val P = 2147483647L
  private val POW = Array(923521L, 29791L, 961L, 31L, 1L) // 31^4..31^0

  def codepoints(s: UTF8String): Array[Int] = {
    val str = s.toString
    val out = new Array[Int](str.codePointCount(0, str.length))
    var ci = 0; var i = 0
    while (ci < str.length) {
      val cp = str.codePointAt(ci)
      out(i) = cp; i += 1; ci += Character.charCount(cp)
    }
    out
  }

  /** All k=5 window hashes, positions 1..max(len-4, 1) — mirrors
    * transform(sequence(1, greatest(length-4, 1)), i -> poly(i)),
    * including the out-of-range ascii('')=0 behavior of the guard
    * window on very short strings.
    */
  def windowHashes(cps: Array[Int]): Array[Long] = {
    val n = math.max(cps.length - 4, 1)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = 0L
      var j = 0
      while (j < 5) {
        val cp = if (i + j < cps.length) cps(i + j).toLong else 0L
        h += cp * POW(j)
        j += 1
      }
      out(i) = h % P
      i += 1
    }
    out
  }

  /** Sorted distinct window hashes (array_distinct of the above; order
    * is irrelevant to every consumer — min/sum/set ops). */
  def distinctHashes(hs: Array[Long]): Array[Long] = {
    val sorted = hs.clone()
    java.util.Arrays.sort(sorted)
    var n = 0
    var i = 0
    while (i < sorted.length) {
      if (n == 0 || sorted(n - 1) != sorted(i)) { sorted(n) = sorted(i); n += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(sorted, n)
  }

  def minhashSig(hs: Array[Long], as: Array[Long], bs: Array[Long]): Array[Long] = {
    val k = as.length
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var j = 0
      while (j < k) {
        val v = (as(j) * h + bs(j)) % P
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    sig
  }

  // 62-bit mix constants: two independent affine hashes mod P widen the
  // 31-bit shingle hash to 62 usable bits (bits 62/63 stay 0)
  val MixA1 = 1103515245L; val MixB1 = 12345L
  val MixA2 = 69069L; val MixB2 = 98765L

  /** 64-bit (62 usable bits) SimHash over the distinct shingle hashes.
    * Each 31-bit shingle hash is widened to 62 bits via two affine
    * mixes mod P (lo | hi<<31), then the classic per-bit +1/-1 vote.
    * Wider hashes matter for the LSH chunking: 16-bit chunk keys give
    * 65536-way buckets per chunk vs the 256-way buckets a 32-bit hash
    * allows — at 100 TB the 8-bit buckets WOULD collapse into
    * mega-buckets and the candidate join would blow up quadratically.
    */
  def simhash64(distinct: Array[Long]): Long = {
    val votes = new Array[Int](62)
    var i = 0
    while (i < distinct.length) {
      val h = distinct(i)
      val m = ((MixA1 * h + MixB1) % P) + (((MixA2 * h + MixB2) % P) << 31)
      var b = 0
      while (b < 62) {
        votes(b) += (2 * (((m >>> b) & 1L).toInt) - 1)
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 62) {
      if (votes(b) > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }

  def simhash32(distinct: Array[Long]): Long = {
    val votes = new Array[Int](32)
    var i = 0
    while (i < distinct.length) {
      val h = distinct(i)
      var b = 0
      while (b < 32) {
        votes(b) += (2 * (((h >> b) & 1L).toInt) - 1)
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }

  /** Distinct word bigrams of lower(text) split on single spaces —
    * mirrors the split/element_at/concat SQL fragment (empty tokens
    * from runs of spaces included, just as both engines' split does).
    */
  def wordBigrams(s: UTF8String): Array[UTF8String] = {
    val toks = s.toString.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
    if (toks.length < 2) return Array.empty
    val all = new Array[UTF8String](toks.length - 1)
    var i = 0
    while (i < toks.length - 1) {
      all(i) = UTF8String.fromString(toks(i) + "_" + toks(i + 1))
      i += 1
    }
    // sorted distinct (binary order) — the ArrJaccard merge contract
    java.util.Arrays.sort(all, null)
    var n = 0
    i = 0
    while (i < all.length) {
      if (n == 0 || !all(n - 1).equals(all(i))) { all(n) = all(i); n += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(all, n)
  }

  /** Left-to-right double fold of elementwise float products — equals
    * aggregate(zip_with(...), 0.0, +) bit-for-bit. */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** Hyperplane sign bucket: bit j set iff
    * sum_i e[i] * (2*(((1103515245*((o+j)*D+i)+12345) >> 16) & 1) - 1) > 0
    * with i 1-based as in the SQL fragment. `offset` selects a
    * DISJOINT slice of the shared hyperplane stream — table t of an
    * OR-construction uses offset = t * planes, so its planes are the
    * global indices [t*p, (t+1)*p) and no two tables share a plane. */
  def planeBucket(e: ArrayData, planes: Int, offset: Int = 0): Long = {
    val n = e.numElements()
    var bucket = 0L
    var j = 0
    while (j < planes) {
      var acc = 0.0
      var i = 1
      while (i <= n) {
        val sign = 2L * ((1103515245L * ((offset + j) * n + i) + 12345L) >> 16 & 1L) - 1L
        acc += e.getFloat(i - 1).toDouble * sign
        i += 1
      }
      if (acc > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }
}

/** Membership probe of a STRING column against a serialized
  * spark-sketch bloom filter shipped with the plan (the broadcast-
  * bloom prefilter pattern Spark's own runtime row-group filters
  * use). Deserialized once per executor thread (transient lazy), the
  * per-row cost is k hash probes — no join, no shuffle. UTF-8 bytes
  * probe via mightContainBinary, matching how
  * DataFrameStatFunctions.bloomFilter inserts string values.
  * CodegenFallback is fine: one virtual call around Murmur3 probes. */
case class BloomContainsStr(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val bloom =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes))
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
  override protected def withNewChildInternal(c: Expression): BloomContainsStr =
    copy(child = c)
}

case class ShingleSet(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(TextKernels.distinctHashes(
      TextKernels.windowHashes(TextKernels.codepoints(v.asInstanceOf[UTF8String]))))
  override protected def withNewChildInternal(c: Expression): ShingleSet = copy(c)
}

case class MinHashSig(child: Expression, as: Seq[Long], bs: Seq[Long])
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val aArr = as.toArray
  @transient private lazy val bArr = bs.toArray
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(TextKernels.minhashSig(
      TextKernels.windowHashes(TextKernels.codepoints(v.asInstanceOf[UTF8String])),
      aArr, bArr))
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

case class SimHash32(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    TextKernels.simhash32(TextKernels.distinctHashes(
      TextKernels.windowHashes(TextKernels.codepoints(v.asInstanceOf[UTF8String]))))
  override protected def withNewChildInternal(c: Expression): SimHash32 = copy(c)
}

/** Content-defined chunk END positions (1-based, final end = length):
  * a boundary falls after position i (W <= i <= len-1) when the
  * position-weighted window hash Σ_{k=1..W} cp[i-W+k]·k is divisible
  * by `divisor`. Bit-identical to the nested-lambda SQL fold the
  * DuckDB oracle runs (Multimodal.cdcWinHash) — the kernel exists
  * because evaluating that fold through interpreted HOF lambdas costs
  * O(len·W) allocations per row (17s at sf0.1 vs ~0.3s here). */
case class CdcBoundaries(child: Expression, window: Int, divisor: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    val cps = TextKernels.codepoints(v.asInstanceOf[UTF8String])
    val n = cps.length
    val out = scala.collection.mutable.ArrayBuilder.make[Long]
    var i = window // 1-based window end
    while (i <= n - 1) {
      var h = 0L
      var k = 1
      while (k <= window) { h += cps(i - window + k - 1).toLong * k; k += 1 }
      if (h % divisor == 0) out += i.toLong
      i += 1
    }
    out += n.toLong
    new GenericArrayData(out.result())
  }
  override protected def withNewChildInternal(c: Expression): CdcBoundaries =
    copy(child = c)
}

case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    TextKernels.simhash64(TextKernels.distinctHashes(
      TextKernels.windowHashes(TextKernels.codepoints(v.asInstanceOf[UTF8String]))))
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

object BigramHash {
  /** Poly hash of one bigram string, identical to the DuckDB fold
    * list_reduce(codepoints, (acc, c) -> (acc*31 + c) % P) — note the
    * reduce-no-init semantics: the first codepoint IS the seed. */
  def hash(s: String): Long = {
    var acc = -1L
    var ci = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      acc = if (acc < 0) cp.toLong else (acc * 31L + cp) % TextKernels.P
      ci += Character.charCount(cp)
    }
    acc
  }
}

/** Sorted distinct poly-hashes of the word bigrams of lower(text) —
  * the compact (8-byte) form of WordBigrams for large-scale pairwise
  * Jaccard. Dedup happens AFTER hashing (collisions merge) exactly as
  * the oracle's list_distinct(list_transform(bigrams, hash)) does, so
  * both engines agree even on colliding inputs.
  */
case class WordBigramHashes(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT).split(" ", -1)
    if (toks.length < 2) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](toks.length - 1)
    var i = 0
    while (i < toks.length - 1) {
      hs(i) = BigramHash.hash(toks(i) + "_" + toks(i + 1))
      i += 1
    }
    new GenericArrayData(TextKernels.distinctHashes(hs))
  }
  override protected def withNewChildInternal(c: Expression): WordBigramHashes = copy(c)
}

case class WordBigrams(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      TextKernels.wordBigrams(v.asInstanceOf[UTF8String]).asInstanceOf[Array[Any]])
  override protected def withNewChildInternal(c: Expression): WordBigrams = copy(c)
}

/** Sorted distinct rolling word n-gram hashes: tokens of lower(text)
  * split on single spaces, each token poly-hashed (BigramHash's
  * reduce-no-init 31-base fold over codepoints), then a Rabin-Karp
  * style fold over each n-token window: acc = (acc*131 + th) % P with
  * th(i) as the seed. Versus hashing the joined gram STRING, this
  * does O(tokens) char work + O(tokens*n) long arithmetic per doc —
  * no per-gram string construction at all. The oracle computes the
  * identical arithmetic (list_reduce over the token-hash slice), so
  * hash collisions merge the same grams on both engines.
  */
object WordGramRolling {
  /** The ONE implementation of positional rolling word n-gram hashes
    * (token poly-hash, then the 131-base Rabin-Karp window fold mod
    * P), shared by the distinct (d08) and positional (d14) kernels so
    * the gram arithmetic cannot drift between them — both oracles
    * replay exactly this. */
  def hashes(v: UTF8String, n: Int): Array[Long] = {
    val toks = v.toString.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
    if (toks.length < n) return Array.emptyLongArray
    val th = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) { th(i) = BigramHash.hash(toks(i)); i += 1 }
    val out = new Array[Long](toks.length - n + 1)
    i = 0
    while (i < out.length) {
      var acc = th(i)
      var j = 1
      while (j < n) { acc = (acc * 131 + th(i + j)) % TextKernels.P; j += 1 }
      out(i) = acc
      i += 1
    }
    out
  }
}

case class WordGramHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(TextKernels.distinctHashes(
      WordGramRolling.hashes(v.asInstanceOf[UTF8String], n)))
  override protected def withNewChildInternal(c: Expression): WordGramHashes = copy(child = c)
}

/** POSITIONAL rolling word n-gram hashes: [[WordGramHashes]]'s exact
  * arithmetic (one shared kernel — [[WordGramRolling]]) but emitted IN
  * TOKEN ORDER with no distinct — index i of the output array is the
  * gram starting at token i, which is what span-level duplicate
  * detection needs (a duplicated REGION is a run of consecutive
  * positions whose grams match, so positions are the payload, not
  * just membership). `posexplode` over this array yields the
  * (doc, pos, gram) posting list directly.
  */
case class WordGramPosHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(WordGramRolling.hashes(v.asInstanceOf[UTF8String], n))
  override protected def withNewChildInternal(c: Expression): WordGramPosHashes = copy(child = c)
}

/** Jaccard set-similarity |A∩B| / |A∪B| of two arrays.
  *
  * Fast path: when both inputs are STRICTLY ascending (sorted,
  * duplicate-free — what ShingleSet / WordBigrams / WordBigramHashes
  * emit) a linear two-pointer merge counts the intersection with no
  * hashing and no boxing. The sortedness is VERIFIED with a cheap O(n)
  * scan, not assumed: this function is public SQL surface
  * (graft_arr_jaccard) and an unsorted or duplicate-bearing input
  * silently undercounts under the merge. Inputs that fail the scan
  * take a HashSet path that first dedups both sides, so the result is
  * true set-Jaccard for ANY input. Equals
  * size(array_intersect)/size(array_union) (and the DuckDB
  * list_intersect/list_distinct-concat fragment).
  */
case class ArrJaccard(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType

  private def strictlyAscLong(x: ArrayData, n: Int): Boolean = {
    var i = 1
    while (i < n) { if (x.getLong(i - 1) >= x.getLong(i)) return false; i += 1 }
    true
  }
  private def strictlyAscString(x: ArrayData, n: Int): Boolean = {
    var i = 1
    while (i < n) {
      if (x.getUTF8String(i - 1).compareTo(x.getUTF8String(i)) >= 0) return false
      i += 1
    }
    true
  }
  /** General path: set-Jaccard over the DISTINCT elements of each side. */
  private def setJaccard(x: ArrayData, y: ArrayData, elemType: DataType): Double = {
    val sa = new java.util.HashSet[Any](x.numElements() * 2)
    val sb = new java.util.HashSet[Any](y.numElements() * 2)
    var k = 0
    while (k < x.numElements()) { sa.add(x.get(k, elemType)); k += 1 }
    k = 0
    var inter = 0
    while (k < y.numElements()) {
      val e = y.get(k, elemType)
      if (sb.add(e) && sa.contains(e)) inter += 1
      k += 1
    }
    val denom = sa.size + sb.size - inter
    if (denom == 0) 0.0 else inter.toDouble / denom
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val elemType = left.dataType.asInstanceOf[ArrayType].elementType
    val na = x.numElements(); val nb = y.numElements()
    var inter = 0
    var i = 0; var j = 0
    elemType match {
      case LongType if strictlyAscLong(x, na) && strictlyAscLong(y, nb) =>
        while (i < na && j < nb) {
          val xi = x.getLong(i); val yj = y.getLong(j)
          if (xi == yj) { inter += 1; i += 1; j += 1 }
          else if (xi < yj) i += 1
          else j += 1
        }
      case StringType if strictlyAscString(x, na) && strictlyAscString(y, nb) =>
        while (i < na && j < nb) {
          val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
          if (c == 0) { inter += 1; i += 1; j += 1 }
          else if (c < 0) i += 1
          else j += 1
        }
      case _ =>
        return setJaccard(x, y, elemType)
    }
    // two empty sets: 0/0 would be NaN, and Spark sorts/filters NaN as
    // larger-than-everything; define it as 0.0 (the DuckDB fragment
    // yields NULL there — both sides then drop the pair at any >= tau)
    val denom = na + nb - inter
    if (denom == 0) 0.0 else inter.toDouble / denom
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrJaccard =
    copy(left = l, right = r)
}

/** Dot product of two float vectors, accumulated in double.
  *
  * Unlike the other kernels this one implements doGenCode rather than
  * CodegenFallback: it sits inside the ANN hot paths (s01/s02/s03,
  * d05) where it composes with filters/windows in the same stage, so
  * keeping it codegen-able preserves the WholeStageCodegen span
  * around it (a CodegenFallback child forces the whole stage to
  * interpreted mode in Spark). The generated loop is the same
  * left-to-right double fold as [[TextKernels.dotF]] and the DuckDB
  * list_reduce fragment — bit-identical results.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // the kernel reads getFloat: an array<double> input would not fail,
  // it would silently fold GARBAGE (4 bytes of each 8-byte double) —
  // found live when a spec fed synthetic Array[Double] vectors. Fail
  // at ANALYSIS instead.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def isF(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (isF(left.dataType) && isF(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects array<float> operands, got ${left.dataType} and ${right.dataType}")
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** Hyperplane sign bucket. Codegen'd like [[VecDot]] (it sits in the
  * same scan-side projections — s02's bucketing, d05's blocking — and
  * does planes x dims arithmetic per row, the most work of any kernel
  * here); the generated loops are the integer-for-integer image of
  * [[TextKernels.planeBucket]], including the Int-arithmetic
  * `j * n + i` inside the PRNG so the two paths cannot diverge. */
case class PlaneBucket(child: Expression, planes: Int, offset: Int = 0)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  // same getFloat contract as [[VecDot]]: reject non-float arrays at
  // analysis rather than bucketing garbage
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"plane_bucket expects array<float>, got $other")
    }
  override protected def nullSafeEval(v: Any): Any =
    TextKernels.planeBucket(v.asInstanceOf[ArrayData], planes, offset)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = $v.numElements();
         |long $bucket = 0L;
         |for (int $j = 0; $j < $planes; $j++) {
         |  double $acc = 0.0;
         |  for (int $i = 1; $i <= $n; $i++) {
         |    long sign = 2L * ((1103515245L * (($offset + $j) * $n + $i) + 12345L) >> 16 & 1L) - 1L;
         |    $acc += ((double) $v.getFloat($i - 1)) * (double) sign;
         |  }
         |  if ($acc > 0) $bucket |= (1L << $j);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): PlaneBucket = copy(child = c)
}

/** Column-level API + SQL registration for the native expressions. */
object GraftFunctions {
  private def c(e: Expression): Column = ColumnShim.column(e)
  private def x(col: Column): Expression = ColumnShim.expression(col)

  def shingle_set(col: Column): Column = c(ShingleSet(x(col)))
  def minhash_sig(col: Column, as: Seq[Long], bs: Seq[Long]): Column =
    c(MinHashSig(x(col), as, bs))
  def simhash32(col: Column): Column = c(SimHash32(x(col)))
  def simhash64(col: Column): Column = c(SimHash64(x(col)))
  def cdc_boundaries(col: Column, window: Int, divisor: Int): Column =
    c(CdcBoundaries(x(col), window, divisor))
  def word_bigrams(col: Column): Column = c(WordBigrams(x(col)))
  def word_bigram_hashes(col: Column): Column = c(WordBigramHashes(x(col)))
  def word_gram_hashes(col: Column, n: Int): Column = c(WordGramHashes(x(col), n))
  def word_gram_pos_hashes(col: Column, n: Int): Column = c(WordGramPosHashes(x(col), n))
  def vec_dot(a: Column, b: Column): Column = c(VecDot(x(a), x(b)))
  def arr_jaccard(a: Column, b: Column): Column = c(ArrJaccard(x(a), x(b)))
  def vec_norm(a: Column): Column = {
    val e = x(a)
    c(org.apache.spark.sql.catalyst.expressions.Sqrt(VecDot(e, e)))
  }
  def plane_bucket(a: Column, planes: Int, offset: Int = 0): Column =
    c(PlaneBucket(x(a), planes, offset))
  def bloom_contains(a: Column, bloomBytes: Array[Byte]): Column =
    c(BloomContainsStr(x(a), bloomBytes))

  /** Register SQL names (graft_shingle_set etc.) on a session so pure
    * SQL users get the same kernels. */
  def registerAll(spark: org.apache.spark.sql.SparkSession,
                  minhashA: Seq[Long], minhashB: Seq[Long]): Unit = {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction("graft_shingle_set", es => ShingleSet(es.head), "built-in")
    r.createOrReplaceTempFunction("graft_minhash_sig", es => MinHashSig(es.head, minhashA, minhashB), "built-in")
    r.createOrReplaceTempFunction("graft_simhash32", es => SimHash32(es.head), "built-in")
    r.createOrReplaceTempFunction("graft_simhash64", es => SimHash64(es.head), "built-in")
    r.createOrReplaceTempFunction("graft_word_bigrams", es => WordBigrams(es.head), "built-in")
    r.createOrReplaceTempFunction("graft_vec_dot", es => VecDot(es(0), es(1)), "built-in")
    r.createOrReplaceTempFunction("graft_arr_jaccard", es => ArrJaccard(es(0), es(1)), "built-in")
    r.createOrReplaceTempFunction("graft_plane_bucket",
      es => PlaneBucket(es.head, graft.operators.Similarity.NumPlanes), "built-in")
  }
}
