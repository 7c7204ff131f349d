package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graft.ColumnBridge

/** Native Catalyst expressions for the hot kernels of the LLM-pipeline
  * operators. Why these exist (measured, see SCALING.md): the
  * composed higher-order-function forms (`transform`/`aggregate`
  * lambdas) are evaluated interpreted, re-evaluating their argument
  * expression trees per element — the tokenize→shingle chain becomes
  * O(tokens²) regex work per document and the 64-dim dot product
  * allocates intermediate arrays per pair. Each expression here is one
  * fused JVM pass with zero intermediate allocation.
  *
  * Semantics are bit-identical to the composed forms (and therefore to
  * the DuckDB oracles): same md5-derived 60-bit hash family
  * ([[TextOps.hash64]]), same left-to-right double accumulation.
  *
  * [[VecDot]] implements `doGenCode` (it sits inside whole-stage
  * codegen of the pairwise joins); the string kernels are
  * [[CodegenFallback]] — their cost is the md5/regex work itself, one
  * virtual call per row is noise.
  */
object NativeKernels {

  /** Analysis-time type guards (AbstractDataType is private[sql], so
    * ImplicitCastInputTypes is unavailable outside Spark's packages;
    * construction sites cast explicitly instead). */
  private[graft] def expectString(e: Expression, fn: String): TypeCheckResult =
    e.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$fn expects STRING, got ${t.simpleString}")
    }
  private[graft] def expectStringArray(e: Expression, fn: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$fn expects ARRAY<STRING>, got ${t.simpleString}")
    }

  /** Fold-left double dot product over two numeric array columns.
    * Null if either side is null; ragged inputs truncate to the
    * shorter length (min-length semantics, matching the composed
    * `zip_with` form — callers that need equal lengths enforce it
    * upstream). Element types are restricted at analysis time to the
    * four the eval/codegen getters implement. */
  case class VecDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    private def supported(t: DataType): Boolean = t match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
      case _ => false
    }
    override def checkInputDataTypes(): TypeCheckResult =
      if (supported(left.dataType) && supported(right.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"vec_dot needs two ARRAY<FLOAT|DOUBLE|INT|BIGINT> columns, " +
          s"got ${left.dataType.simpleString} / ${right.dataType.simpleString}")

    private def elemType(e: Expression): NumericType =
      e.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      val lt = elemType(left); val rt = elemType(right)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = lt match {
          case FloatType => a.getFloat(i).toDouble
          case DoubleType => a.getDouble(i)
          case IntegerType => a.getInt(i).toDouble
          case LongType => a.getLong(i).toDouble
          case _ => 0.0
        }
        val y = rt match {
          case FloatType => b.getFloat(i).toDouble
          case DoubleType => b.getDouble(i)
          case IntegerType => b.getInt(i).toDouble
          case LongType => b.getLong(i).toDouble
          case _ => 0.0
        }
        acc += x * y
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      def getter(t: NumericType, arr: String, i: String): String = t match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case DoubleType => s"$arr.getDouble($i)"
        case IntegerType => s"(double) $arr.getInt($i)"
        case LongType => s"(double) $arr.getLong($i)"
        case _ => s"0.0"
      }
      val lt = elemType(left); val rt = elemType(right)
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += ${getter(lt, a, i)} * ${getter(rt, b, i)};
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): VecDot =
      copy(left = newLeft, right = newRight)
  }

  /** Fixed-point signed dot product: Σ a_i · ⌊b_i·scale + 0.5⌋ as
    * LONG. `a` is an integer (weight/sign) array, `b` a float/double
    * array; each b_i is quantized to `scale`-ths via the exact IEEE
    * sequence float→double (exact) → ·scale (one rounding) → +0.5
    * (one rounding) → floor (exact) — every step a single IEEE 754
    * operation any engine reproduces bit-identically, so the LONG
    * result is engine-portable where a float dot product + decimal
    * `round(x, 4)` is not (HALF_UP vs scaled rounding split near-tie
    * values; see the t32 note in Relational10). Null if either side
    * is null; ragged inputs truncate to the shorter length like
    * [[VecDot]]. */
  case class VecDotQ(left: Expression, right: Expression, scale: Int)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    private def intArray(t: DataType): Boolean = t match {
      case ArrayType(IntegerType | LongType, _) => true
      case _ => false
    }
    private def fpArray(t: DataType): Boolean = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    override def checkInputDataTypes(): TypeCheckResult =
      if (intArray(left.dataType) && fpArray(right.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"vec_dot_q needs ARRAY<INT|BIGINT> weights and ARRAY<FLOAT|DOUBLE> " +
          s"values, got ${left.dataType.simpleString} / ${right.dataType.simpleString}")

    private def elemType(e: Expression): NumericType =
      e.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      val lt = elemType(left); val rt = elemType(right)
      val sc = scale.toDouble
      var acc = 0L
      var i = 0
      while (i < n) {
        val w = lt match {
          case IntegerType => a.getInt(i).toLong
          case _ => a.getLong(i)
        }
        val x = rt match {
          case FloatType => b.getFloat(i).toDouble
          case _ => b.getDouble(i)
        }
        acc += w * math.floor(x * sc + 0.5).toLong
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val wGet = elemType(left) match {
        case IntegerType => (arr: String, i: String) => s"(long) $arr.getInt($i)"
        case _ => (arr: String, i: String) => s"$arr.getLong($i)"
      }
      val xGet = elemType(right) match {
        case FloatType => (arr: String, i: String) => s"(double) $arr.getFloat($i)"
        case _ => (arr: String, i: String) => s"$arr.getDouble($i)"
      }
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |long $acc = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += ${wGet(a, i)} *
           |    (long) java.lang.Math.floor(${xGet(b, i)} * ${scale}.0d + 0.5d);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): VecDotQ =
      copy(left = newLeft, right = newRight)
  }

  /** Fold-left squared L2 distance over two LONG arrays: Σ (aᵢ−bᵢ)²
    * as LONG — the integer-Lloyd / ADC routing distance of the
    * trained-quantizer family (Relational13), previously composed as
    * `aggregate(zip_with(a, b, (x,y) => (x−y)·(x−y)), 0, +)` — an
    * interpreted per-element lambda chain on the hottest training
    * loop (optimization guide §4: prefer codegen expressions in the
    * hot path). Long arithmetic is exact, so the fused loop is
    * bit-identical to the HOF form and the DuckDB oracles. Inputs are
    * equal-length by construction (Q20-quantized slices); min-length
    * truncation matches [[VecDot]]. */
  case class VecSqDistL(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    private def longArray(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    override def checkInputDataTypes(): TypeCheckResult =
      if (longArray(left.dataType) && longArray(right.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"vec_sqdist_l needs two ARRAY<BIGINT> columns, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var acc = 0L
      var i = 0
      while (i < n) {
        val d = a.getLong(i) - b.getLong(i)
        acc += d * d
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val d = ctx.freshName("d")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |long $acc = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  long $d = $a.getLong($i) - $b.getLong($i);
           |  $acc += $d * $d;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): VecSqDistL =
      copy(left = newLeft, right = newRight)
  }

  /** Fold-left squared L2 distance over two FLOAT/DOUBLE arrays as
    * DOUBLE: Σ (aᵢ−bᵢ)² with each element cast to double first and
    * accumulated left to right — bit-identical to the composed
    * `aggregate(zip_with(...))` form (one IEEE subtract, one multiply,
    * one add per element, in index order) and to the DuckDB
    * list-comprehension oracles. The exact-rerank and kmeans-family
    * hot distance. */
  case class VecSqDist(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    private def fpArray(t: DataType): Boolean = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    override def checkInputDataTypes(): TypeCheckResult =
      if (fpArray(left.dataType) && fpArray(right.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"vec_sqdist needs two ARRAY<FLOAT|DOUBLE> columns, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

    private def elemType(e: Expression): NumericType =
      e.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      val lt = elemType(left); val rt = elemType(right)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = lt match {
          case FloatType => a.getFloat(i).toDouble
          case _ => a.getDouble(i)
        }
        val y = rt match {
          case FloatType => b.getFloat(i).toDouble
          case _ => b.getDouble(i)
        }
        val d = x - y
        acc += d * d
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      def getter(t: NumericType, arr: String, i: String): String = t match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case _ => s"$arr.getDouble($i)"
      }
      val lt = elemType(left); val rt = elemType(right)
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val d = ctx.freshName("d")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $d = ${getter(lt, a, i)} - ${getter(rt, b, i)};
           |  $acc += $d * $d;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): VecSqDist =
      copy(left = newLeft, right = newRight)
  }

  /** Shared md5 → 60-bit-long kernel (= TextOps.hash64 semantics:
    * first 15 hex chars of the md5 digest parsed base-16). */
  @inline private def md5Hash64(md: java.security.MessageDigest,
      bytes: Array[Byte]): Long = {
    val d = md.digest(bytes)
    // first 15 hex chars = 7 full bytes + high nibble of byte 7
    var acc = 0L
    var i = 0
    while (i < 7) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    (acc << 4) | ((d(7) >> 4) & 0xfL)
  }

  private def normTokens(s: String): Array[String] = {
    // Locale.ROOT: locale-sensitive toLowerCase (tr_TR dotless-i)
    // would break bit-equality with Spark's lower() and the oracles
    val t = s.toLowerCase(java.util.Locale.ROOT).trim.split("\\s+")
    if (t.length == 1 && t(0).isEmpty) Array.empty else t
  }

  /** Normalized whitespace tokens (TextOps.tokens, fused). */
  case class Tokens(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      NativeKernels.expectString(child, prettyName)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      new GenericArrayData(normTokens(v.toString)
        .map(t => UTF8String.fromString(t).asInstanceOf[Any]))
    override protected def withNewChildInternal(c: Expression): Tokens = copy(c)
  }

  /** Distinct word n-gram shingles (TextOps.shingles, fused: one
    * normalize + split + slide pass; first-occurrence order). */
  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      NativeKernels.expectString(child, prettyName)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(v: Any): Any = {
      val toks = normTokens(v.toString)
      val out = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i + n <= toks.length) {
        val sb = new java.lang.StringBuilder(toks(i))
        var k = 1
        while (k < n) { sb.append(' ').append(toks(i + k)); k += 1 }
        out.add(sb.toString)
        i += 1
      }
      val arr = new Array[Any](out.size)
      val it = out.iterator()
      var j = 0
      while (it.hasNext) { arr(j) = UTF8String.fromString(it.next()); j += 1 }
      new GenericArrayData(arr)
    }
    override protected def withNewChildInternal(c: Expression): WordShingles =
      copy(child = c)
  }

  /** MinHash signature over a string-array column: element i =
    * min over values of hash64(concat(i, ":", value)) — one pass,
    * identical to min(TextOps.hash64Seeded(i, _)) per seed. */
  case class MinHashSignature(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      NativeKernels.expectStringArray(child, prettyName)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val md = java.security.MessageDigest.getInstance("MD5")
      val sig = Array.fill(k)(Long.MaxValue)
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val s = arr.getUTF8String(i).toString
        var seed = 0
        while (seed < k) {
          val h = md5Hash64(md, (seed + ":" + s).getBytes("UTF-8"))
          if (h < sig(seed)) sig(seed) = h
          seed += 1
        }
        i += 1
      }
      new GenericArrayData(sig.map(_.asInstanceOf[Any]))
    }
    override protected def withNewChildInternal(c: Expression): MinHashSignature =
      copy(child = c)
  }

  /** SimHash over a string-array column: per-bit vote of the token
    * hash64s, bit j set iff the vote is positive — identical to the
    * 32-aggregate composed form, one pass. */
  case class SimHash(child: Expression, bits: Int)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      NativeKernels.expectStringArray(child, prettyName)
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val md = java.security.MessageDigest.getInstance("MD5")
      val votes = new Array[Int](bits)
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val h = md5Hash64(md, arr.getUTF8String(i).toString.getBytes("UTF-8"))
        var j = 0
        while (j < bits) {
          if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
        i += 1
      }
      var out = 0L
      var j = 0
      while (j < bits) { if (votes(j) > 0) out |= (1L << j); j += 1 }
      out
    }
    override protected def withNewChildInternal(c: Expression): SimHash =
      copy(child = c)
  }

  /** 60-bit md5 hash of a string column (TextOps.hash64, fused). */
  case class Hash64(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      NativeKernels.expectString(child, prettyName)
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md5Hash64(md, v.asInstanceOf[UTF8String].getBytes)
    }
    override protected def withNewChildInternal(c: Expression): Hash64 = copy(c)
  }

  /** Winnowing fingerprints (Schleimer et al. 2003, the MOSS
    * algorithm): hash every word k-gram IN POSITION ORDER (non-
    * distinct — winnowing needs the sequence), slide a w-hash window,
    * select each window's minimum, return the DISTINCT minima sorted
    * ascending (the canonical value-set form; tie-position rules only
    * matter for positional attribution, which this operator does not
    * emit). Documents sharing a token run of ≥ w+k-1 words share at
    * least one fingerprint — the detection guarantee exact-substring
    * matchers build on. Shorter-than-w hash sequences collapse to one
    * whole-sequence window; docs with fewer than k tokens emit an
    * empty array. One fused pass: tokenize, one md5 per gram, one
    * O(m·w) min sweep (m·w is small; a deque would be O(m)). */
  case class WinnowedFingerprints(child: Expression, k: Int, w: Int)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      NativeKernels.expectString(child, prettyName)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any = {
      val toks = normTokens(v.toString)
      val m = toks.length - k + 1
      if (m <= 0) return new GenericArrayData(new Array[Any](0))
      val md = java.security.MessageDigest.getInstance("MD5")
      val g = new Array[Long](m)
      var i = 0
      while (i < m) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
        g(i) = md5Hash64(md, sb.toString.getBytes("UTF-8"))
        i += 1
      }
      val nw = math.max(m - w + 1, 1)
      val sel = new java.util.TreeSet[java.lang.Long]()
      var j = 0
      while (j < nw) {
        var mn = g(j)
        var t = j + 1
        val end = math.min(j + w, m)
        while (t < end) { if (g(t) < mn) mn = g(t); t += 1 }
        sel.add(mn)
        j += 1
      }
      val out = new Array[Any](sel.size)
      val it = sel.iterator()
      var p = 0
      while (it.hasNext) { out(p) = it.next().longValue(); p += 1 }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): WinnowedFingerprints =
      copy(child = c)
  }

  /** Positional word n-gram hash sequence: element i = hash64 of the
    * n-gram starting at token i, NON-distinct, in position order — so
    * `posexplode` recovers (start-token-index, gram-hash) pairs. The
    * positional counterpart of [[WordShingles]] (which dedups, losing
    * positions) and the front half of [[WinnowedFingerprints]] without
    * the window-min selection; exact-substring span dedup (d17, after
    * Lee et al. 2021 §4.1's "deduplicate exact substrings" at n-gram
    * granularity) needs the positions to merge hit runs into spans.
    * Documents with fewer than n tokens emit an empty array. */
  case class GramHashSeq(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      NativeKernels.expectString(child, prettyName)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any = {
      val toks = normTokens(v.toString)
      val m = toks.length - n + 1
      if (m <= 0) return new GenericArrayData(new Array[Any](0))
      val md = java.security.MessageDigest.getInstance("MD5")
      val out = new Array[Any](m)
      var i = 0
      while (i < m) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
        out(i) = md5Hash64(md, sb.toString.getBytes("UTF-8"))
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): GramHashSeq =
      copy(child = c)
  }

  /** Generator: all ordered pairs (i < j) of an array column's
    * elements, as rows (a_id, b_id) of the element type. The native
    * form of the LSH bucket pair expansion — the composed nested
    * `transform(slice(...))` HOF evaluates interpreted with per-element
    * lambda dispatch and allocates the full pair array per row before
    * explode; this streams pairs straight out of one pass. Pair order
    * (and thus a<b for sorted input) matches the composed form. */
  case class PairExpand(child: Expression)
      extends UnaryExpression with Generator with CodegenFallback {
    private def elemType: DataType = child.dataType match {
      case ArrayType(t, _) => t
      case _ => NullType
    }
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case _: ArrayType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"pair_expand expects ARRAY, got ${t.simpleString}")
    }
    override def elementSchema: StructType = StructType(Seq(
      StructField("a_id", elemType, nullable = true),
      StructField("b_id", elemType, nullable = true)))
    override def eval(input: InternalRow): IterableOnce[InternalRow] = {
      val v = child.eval(input)
      if (v == null) return Iterator.empty
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val t = elemType
      if (n < 2) return Iterator.empty
      val elems = new Array[Any](n)
      var i = 0
      while (i < n) { elems(i) = arr.get(i, t); i += 1 }
      new Iterator[InternalRow] {
        private var a = 0
        private var b = 1
        override def hasNext: Boolean = a < n - 1
        override def next(): InternalRow = {
          val r = InternalRow(elems(a), elems(b))
          b += 1
          if (b >= n) { a += 1; b = a + 1 }
          r
        }
      }
    }
    override protected def withNewChildInternal(c: Expression): PairExpand =
      copy(child = c)
  }

  // ---- Column wrappers ----------------------------------------------
  private def ex(c: Column) = ColumnBridge.toExpression(c)
  private def col(e: Expression): Column = ColumnBridge.toColumn(e)
  /** Spark's own codegen'd bloom-probe predicate over a pre-built
    * serialized `org.apache.spark.util.sketch.BloomFilter` (the
    * expression InjectRuntimeFilter pairs with `bloom_filter_agg`;
    * the filter deserializes ONCE lazily, then probes per row inside
    * whole-stage codegen). This replaces the typed
    * `.filter(r => bloom.mightContainLong(r.getAs[Long](...)))` form,
    * which forced a per-row `createexternalrow` deserialization and
    * blocked scan-level column pruning + filter pushdown (VERDICT r3). */
  def bloom_might_contain(bloomBytes: Array[Byte], value: Column): Column =
    col(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType), ex(value.cast("long"))))
  def vec_dot(a: Column, b: Column): Column = col(VecDot(ex(a), ex(b)))
  def vec_dot_q(weights: Column, values: Column, scale: Int): Column =
    col(VecDotQ(ex(weights), ex(values), scale))
  def vec_sqdist_l(a: Column, b: Column): Column =
    col(VecSqDistL(ex(a), ex(b)))
  def vec_sqdist(a: Column, b: Column): Column =
    col(VecSqDist(ex(a), ex(b)))
  def word_tokens(c: Column): Column = col(Tokens(ex(c.cast("string"))))
  def word_shingles(c: Column, n: Int): Column =
    col(WordShingles(ex(c.cast("string")), n))
  def minhash_signature(c: Column, k: Int): Column =
    col(MinHashSignature(ex(c), k))
  def simhash(c: Column, bits: Int): Column = col(SimHash(ex(c), bits))
  def hash64_native(c: Column): Column = col(Hash64(ex(c.cast("string"))))
  def pair_expand(c: Column): Column = col(PairExpand(ex(c)))
  def winnowed_fingerprints(c: Column, k: Int, w: Int): Column =
    col(WinnowedFingerprints(ex(c.cast("string")), k, w))
  def gram_hash_seq(c: Column, n: Int): Column =
    col(GramHashSeq(ex(c.cast("string")), n))
}
