package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word-shingle hashing for the text-dedup hot path: normalize →
  * tokenize → k-word shingles → 64-bit hashes, in ONE JIT-compiled pass
  * with no intermediate string arrays. The Column-DSL formulation
  * (split + transform/sequence + concat_ws + array_distinct + per-element
  * xxhash64) allocates several arrays per row and evaluates interpreted
  * lambdas — this kernel replaced it after it dominated the sf0.1 dedup
  * benchmarks (SURVEY.md §7.5 escalation path).
  *
  * Hash identity differs from the DSL form (shingle bytes are hashed
  * directly); all consumers treat shingle hashes as opaque set elements,
  * so only determinism matters — fixed seed, no per-run state.
  */
object ShingleKernel {

  /** 64-bit FNV-1a over the token bytes of one shingle window; cheap,
    * stable, and good enough dispersion for set semantics + LSH banding.
    * A space byte separates tokens (matches "a b c" shingle strings).
    */
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  def wordShingleHashes(s: UTF8String, k: Int, distinct: Boolean): ArrayData = {
    // normalize + tokenize: lowercase (ROOT locale — a tr_TR executor
    // would otherwise hash "I" differently, breaking cross-machine
    // determinism), split on whitespace runs
    val str = s.toString.toLowerCase(java.util.Locale.ROOT)
    val n = str.length
    // collect token [start,end) offsets without allocating substrings
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0
    while (i < n) {
      while (i < n && Character.isWhitespace(str.charAt(i))) i += 1
      if (i < n) {
        starts.add(i)
        while (i < n && !Character.isWhitespace(str.charAt(i))) i += 1
        ends.add(i)
      }
    }
    val nTok = starts.size()
    if (nTok == 0) return new GenericArrayData(Array.empty[Long])
    val nSh = math.max(nTok - k, 0) + 1
    val out = new Array[Long](nSh)
    var w = 0
    while (w < nSh) {
      var h = FnvOffset
      var t = w
      val tEnd = math.min(w + k, nTok)
      while (t < tEnd) {
        if (t > w) { h ^= ' '.toLong; h *= FnvPrime }
        var c = starts.get(t)
        val e = ends.get(t)
        while (c < e) { h ^= str.charAt(c).toLong; h *= FnvPrime; c += 1 }
        t += 1
      }
      out(w) = h
      w += 1
    }
    if (!distinct) new GenericArrayData(out)
    else {
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      var j = 0
      while (j < nSh) { seen.add(out(j)); j += 1 }
      val arr = new Array[Long](seen.size())
      val it = seen.iterator()
      var m = 0
      while (it.hasNext) { arr(m) = it.next(); m += 1 }
      new GenericArrayData(arr)
    }
  }

  def shingleHashes(text: Column, k: Int, distinct: Boolean = true): Column =
    ColumnBridge.column(
      WordShingleHashes(ColumnBridge.expression(text), k, distinct))
}

/** array<long> of (optionally distinct) k-word shingle hashes of a
  * normalized string. Codegen emits a single static kernel call, so the
  * surrounding pipeline stays in whole-stage codegen.
  */
case class WordShingleHashes(child: Expression, k: Int, distinct: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"input must be string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ShingleKernel.wordShingleHashes(input.asInstanceOf[UTF8String], k, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleKernel.wordShingleHashes($c, $k, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

/** Native position-tagged del-1 signature hashing for the fuzzy-join
  * blocking hot path (graft.operators.Joins.joinFuzzy): for a string of
  * length L, emit L+1 64-bit hashes — the string itself (tag 0) and each
  * single-character deletion tagged with its 1-based position — in one
  * JIT-compiled pass with no intermediate strings. Equivalent by
  * construction to Joins.del1Signatures folded through a hash (that
  * Column-DSL form is the readable spec; it allocates L+1 strings per
  * row and evaluates interpreted transform lambdas). Two EQUAL-LENGTH
  * strings within edit distance 1 always share an element; hashes are
  * opaque join keys, so only determinism matters (FNV-1a, fixed seed,
  * no per-run state) and a collision can only merge two posting lists —
  * extra verified-then-discarded candidates, never a lost pair.
  *
  * "Character" means UNICODE CODE POINT, matching the semantics of
  * Spark's substring/length (which the DSL spec is built from) and of
  * the levenshtein verification the candidates feed: an earlier
  * UTF-16-code-unit version silently MISSED pairs whose single
  * code-point substitution changes both units of a surrogate pair
  * (edit distance 2 in code units, 1 in code points — e.g. two
  * distinct non-BMP emoji), diverging from the DSL blocking and
  * losing true-pair recall on non-BMP corpora. Pinned by the non-BMP
  * cases in FuzzyGroupsSpec's kernel-vs-DSL equivalence test.
  */
object Del1Kernel {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  def del1Hashes(s: UTF8String): ArrayData = {
    val str = s.toString
    // decode once to code points; ASCII fast path is the common case
    // (cp values equal char values, so ASCII hashes are unchanged from
    // the code-unit version)
    val units = str.length
    var n = 0
    var i = 0
    while (i < units) { n += 1; i += Character.charCount(str.codePointAt(i)) }
    val cps = new Array[Int](n)
    i = 0; var ci = 0
    while (i < units) {
      val cp = str.codePointAt(i)
      cps(ci) = cp; ci += 1; i += Character.charCount(cp)
    }
    val out = new Array[Long](n + 1)
    // tag 0: the full string
    var h = FnvOffset
    h ^= 0L; h *= FnvPrime
    var j = 0
    while (j < n) { h ^= cps(j).toLong; h *= FnvPrime; j += 1 }
    out(0) = h
    // tag d (1-based): the string minus its d-th code point
    var d = 1
    while (d <= n) {
      h = FnvOffset
      h ^= d.toLong; h *= FnvPrime
      j = 0
      while (j < n) {
        if (j != d - 1) { h ^= cps(j).toLong; h *= FnvPrime }
        j += 1
      }
      out(d) = h
      d += 1
    }
    new GenericArrayData(out)
  }

  def del1SignatureHashes(text: Column): Column =
    ColumnBridge.column(Del1SignatureHashes(ColumnBridge.expression(text)))
}

/** array<long> of position-tagged del-1 signature hashes; codegen emits
  * one static kernel call so the blocking stage stays in whole-stage
  * codegen.
  */
case class Del1SignatureHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"input must be string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Del1Kernel.del1Hashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Del1Kernel.del1Hashes($c);")

  override protected def withNewChildInternal(newChild: Expression): Del1SignatureHashes =
    copy(child = newChild)
}
