package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Generator, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions (SURVEY.md §7: the only places the built-in
  * surface genuinely runs out).
  *
  * `ArrayDotProduct` is the ANN hot inner loop as a natively codegen'd
  * binary expression: a tight primitive `double` loop over the two
  * ArrayData buffers — no lambda-function call per element like the
  * `aggregate(zip_with(...))` formulation, no boxing, stays inside
  * whole-stage codegen.
  *
  * `Combinations` is a Generator producing all size-k subsets of an array
  * (reference F9: Scala's `combinations(n)` used for A-priori candidate
  * generation `SON.scala:87` and per-component pair enumeration
  * `Community.scala:33`). Lateral-view shape, so itemset enumeration is a
  * first-class relational operator instead of a typed closure.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckSuccess
      case _ => TypeCheckFailure("array_dot(array<double>, array<double>)")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}Acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}Acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Dot product directly over two array<float> columns, accumulating in
  * double — numerically identical to casting both arrays to array<double>
  * first (each float widens exactly), but without materializing the two
  * cast arrays per row. Planted by [[graft.functions.FloatDotRewrite]]. */
case class FloatArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_array_dot"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckSuccess
      case _ => TypeCheckFailure("float_array_dot(array<float>, array<float>)")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}Acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}Acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** |A ∩ B| for two SORTED array<bigint> columns: a two-pointer merge scan —
  * no hash table, no result-array allocation, unlike
  * size(array_intersect(a, b)). The workhorse of pairwise set-similarity
  * (Jaccard) where millions of candidate pairs each intersect two
  * ~100-element sorted shingle sets. Inputs MUST be sorted ascending
  * (produce them with sort_array); duplicates count once per matching
  * occurrence pair, so deduplicate inputs first (array_distinct). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckSuccess
      case _ => TypeCheckFailure("sorted_intersect_count(array<bigint>, array<bigint>)")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    val n = x.numElements(); val m = y.numElements()
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $i = 0, $j = 0, $n = $a.numElements(), $m = $b.numElements();
         |int ${ev.value}Cnt = 0;
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { ${ev.value}Cnt++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = ${ev.value}Cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Deterministic ±1 random-hyperplane matrices for sign-LSH, generated
  * driver-side ONCE and shipped into [[HyperplaneSignBuckets]] as a plain
  * `double[]` — the round-1 formulation recomputed every entry per ROW via
  * interpreted `transform/aggregate/zip_with` lambdas (nTables × nBits ×
  * dim hash calls per vector; 44 s of the 133 s sf0.1 bench).
  *
  * Entry derivation is the PORTABLE hash (the q41/q43 discipline): sign of
  * component i of plane (t, b) = low bit of [[Md5Quad64]] over the ASCII
  * key `"hp:t:b:i"` → `(h & 1) * 2 - 1`. Another engine can rebuild the
  * whole matrix from its own md5 (DuckDB:
  * `(md5_number_lower('hp:'||t||':'||b||':'||i) & 1) * 2 - 1`), which is
  * what turns the sign-LSH BUCKETS — and so q47's candidate set and full
  * result — into a DuckDB-replayable equality oracle. The matrix is a few
  * KB computed once per query; derivation cost is irrelevant, only
  * replayability matters. (Before round 9 the entries came from xxhash64
  * and the LSH faces were spec-only.) */
object Hyperplanes {
  def signMatrix(nTables: Int, nBits: Int, dim: Int): Array[Double] = {
    val out = new Array[Double](nTables * nBits * dim)
    var t = 0
    while (t < nTables) {
      var b = 0
      while (b < nBits) {
        var i = 0
        while (i < dim) {
          val h = Md5Quad64.hash(
            s"hp:$t:$b:$i".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
          out((t * nBits + b) * dim + i) = ((h & 1L) * 2L - 1L).toDouble
          i += 1
        }
        b += 1
      }
      t += 1
    }
    out
  }
}

/** `sign_buckets(v, planes, nBits)`: all `nTables` sign-LSH bucket ids of a
  * vector in one tight codegen'd loop. `planes` is the flat
  * [[Hyperplanes.signMatrix]] (length nTables·nBits·dim, foldable literal —
  * extracted to a constant `double[]` at registration, embedded via
  * `addReferenceObj` at codegen); output is array<bigint> of length
  * nTables where bit b of entry t is `sign(v · plane_{t,b}) > 0`.
  * nTables·nBits·dim multiply-adds per row — ~1.5k flops at the default
  * 6×4×64 — versus the same count of per-element interpreted xxhash64
  * lambda dispatches before. */
case class HyperplaneSignBuckets(child: Expression, planes: Array[Double], nBits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_buckets"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(DoubleType, _) if nBits >= 1 && nBits <= 63 &&
        planes.nonEmpty && planes.length % nBits == 0 => TypeCheckSuccess
      case _ => TypeCheckFailure(
        "sign_buckets(array<double>, planes array<double> literal, nBits literal in [1,63])")
    }
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val dim = v.numElements()
    require(dim > 0 && planes.length % (nBits * dim) == 0,
      s"plane matrix (${planes.length}) does not tile nBits=$nBits x dim=$dim")
    val nTables = planes.length / (nBits * dim)
    val out = new Array[Long](nTables)
    var p = 0
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var b = 0
      while (b < nBits) {
        var s = 0.0
        var i = 0
        while (i < dim) { s += v.getDouble(i) * planes(p); p += 1; i += 1 }
        if (s > 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val dim = ctx.freshName("dim"); val nT = ctx.freshName("nT")
      val out = ctx.freshName("out"); val p = ctx.freshName("p")
      val t = ctx.freshName("t"); val b = ctx.freshName("b"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val bucket = ctx.freshName("bucket")
      s"""
         |int $dim = $a.numElements();
         |if ($dim == 0 || $planesRef.length % ($nBits * $dim) != 0) {
         |  throw new IllegalArgumentException("sign_buckets: plane matrix does not tile");
         |}
         |int $nT = $planesRef.length / ($nBits * $dim);
         |long[] $out = new long[$nT];
         |int $p = 0;
         |for (int $t = 0; $t < $nT; $t++) {
         |  long $bucket = 0L;
         |  for (int $b = 0; $b < $nBits; $b++) {
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) { $s += $a.getDouble($i) * $planesRef[$p++]; }
         |    if ($s > 0) $bucket |= (1L << $b);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignBuckets =
    copy(child = newChild)
}

/** `minhash_sigs(sh, numHashes)`: the full MinHash signature of a (hashed)
  * shingle set in one tight codegen'd loop — sig[i] = min over shingles h
  * of xxhash64(h, i) at Spark's default seed 42, exactly the fold the
  * `transform(sequence(...), i -> aggregate(sh, MaxValue, least(...)))`
  * formulation computes (bit-identity spec-asserted), but ~numHashes × |sh|
  * hash calls in generated Java instead of that many interpreted lambda
  * dispatches. The outer xxhash64(h, i) is split: the h-part
  * (hashLong(h, 42)) is computed once per shingle and reused as the seed
  * for all numHashes hashInt(i, ·) calls — Spark's multi-child XxHash64
  * chains children exactly this way. Empty input ⇒ all-MaxValue signature,
  * matching aggregate's zero value. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(LongType, _) if numHashes >= 1 => TypeCheckSuccess
      case _ => TypeCheckFailure("minhash_sigs(array<bigint>, numHashes literal >= 1)")
    }
  }

  override def nullSafeEval(a: Any): Any = {
    val sh = a.asInstanceOf[ArrayData]
    val out = Array.fill(numHashes)(Long.MaxValue)
    val n = sh.numElements()
    var k = 0
    while (k < n) {
      val seed = XXH64.hashLong(sh.getLong(k), 42L)
      var i = 0
      while (i < numHashes) {
        val v = XXH64.hashInt(i, seed)
        if (v < out(i)) out(i) = v
        i += 1
      }
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val out = ctx.freshName("out"); val n = ctx.freshName("n")
      val k = ctx.freshName("k"); val i = ctx.freshName("i")
      val seed = ctx.freshName("seed"); val v = ctx.freshName("v")
      s"""
         |long[] $out = new long[$numHashes];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |int $n = $a.numElements();
         |for (int $k = 0; $k < $n; $k++) {
         |  long $seed = $xxh.hashLong($a.getLong($k), 42L);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $v = $xxh.hashInt($i, $seed);
         |    if ($v < $out[$i]) $out[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** `minhash_sigs_portable(hs, numHashes)`: MinHash signature over PORTABLE
  * arithmetic permutations of md5-quadword base hashes — the cross-engine
  * twin of [[MinHashSignature]]. Permutation i maps base hash h (read
  * UNSIGNED) to `h · (2i+1) + i · 0x9E3779B97F4A7C15 (mod 2^64)` — an
  * odd-multiplier affine map, a bijection of Z_2^64 per permutation — and
  * the signature takes the UNSIGNED minimum per permutation. Every step
  * is plain integer arithmetic another engine can replay exactly: Java's
  * wrapping `long` ops ARE mod-2^64, and DuckDB reproduces them as
  * `(hugeint(h) · (2i+1) + i · 11400714819323198485) % 2^64` with
  * `min` over the [0, 2^64) range (= unsigned order), which is what turns
  * the q41 signature matrix from a spec-only face into a DuckDB equality
  * oracle (the q43/md5_quad64 move applied to MinHash). Empty input ⇒
  * all-ones signature (unsigned max, the fold identity). */
case class PortableMinHash(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs_portable"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(LongType, _) if numHashes >= 1 => TypeCheckSuccess
      case _ => TypeCheckFailure("minhash_sigs_portable(array<bigint>, numHashes literal >= 1)")
    }
  }

  override def nullSafeEval(a: Any): Any = {
    val hs = a.asInstanceOf[ArrayData]
    val out = Array.fill(numHashes)(-1L) // unsigned max
    val n = hs.numElements()
    var k = 0
    while (k < n) {
      val h = hs.getLong(k)
      var i = 0
      while (i < numHashes) {
        val v = h * (2L * i + 1L) + i * PortableMinHash.Golden
        if (java.lang.Long.compareUnsigned(v, out(i)) < 0) out(i) = v
        i += 1
      }
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out"); val n = ctx.freshName("n")
      val k = ctx.freshName("k"); val i = ctx.freshName("i")
      val h = ctx.freshName("h"); val v = ctx.freshName("v")
      s"""
         |long[] $out = new long[$numHashes];
         |java.util.Arrays.fill($out, -1L);
         |int $n = $a.numElements();
         |for (int $k = 0; $k < $n; $k++) {
         |  long $h = $a.getLong($k);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $v = $h * (2L * $i + 1L) + $i * ${PortableMinHash.Golden}L;
         |    if (Long.compareUnsigned($v, $out[$i]) < 0) $out[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PortableMinHash =
    copy(child = newChild)
}

object PortableMinHash {
  /** 0x9E3779B97F4A7C15 (the 64-bit golden-ratio constant) as a signed
    * long; unsigned value 11400714819323198485 — the per-permutation
    * additive step in the affine map (see class doc). */
  val Golden: Long = 0x9E3779B97F4A7C15L
}

/** `simhash64(th)`: 64-bit SimHash fingerprint from pre-hashed tokens —
  * per bit j, count +1/−1 by bit j of each token hash, set bit j of the
  * output when the counter is positive. Bit-identical to the nested
  * `aggregate(...zip_with...)` SQL formulation (integer arithmetic
  * throughout), but one |th|·64 loop of generated Java instead of 64
  * interpreted array allocations per document. */
/** Low quadword of md5 read little-endian from digest bytes 9–16 — equal
  * bit-for-bit to DuckDB's `md5_number_lower` as two's-complement, the
  * engine's PORTABLE cross-engine string hash (q43/q44/q53 oracles, the
  * sampled-betweenness source key). One digest + 8 byte reads per value;
  * the expression exists because the Column-level formulation (md5 → hex
  * string → 8 substrings → 2 base-16 convs → shift/or) paid a full string
  * round-trip per hash — measured as most of a 95 s fingerprint build over
  * a 150M-token corpus. Digests come from a thread-local MessageDigest
  * (getInstance per row is the other classic cost). */
case class Md5Quad64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_quad64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case BinaryType => TypeCheckSuccess
      case _ => TypeCheckFailure("md5_quad64(binary)")
    }
  }

  override def nullSafeEval(b: Any): Any =
    Md5Quad64.hash(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Quad64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Quad64 =
    copy(child = newChild)
}

object Md5Quad64 {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Little-endian long over digest bytes 8..15 (0-indexed): byte 8 is
    * least significant, byte 15 most — `md5_number_lower`'s layout. */
  def hash(bytes: Array[Byte]): Long = {
    val m = md.get()
    m.reset()
    val d = m.digest(bytes)
    var x = 0L
    var i = 15
    while (i >= 8) { x = (x << 8) | (d(i) & 0xffL); i -= 1 }
    x
  }
}

/** `portable_gram_hashes(tokens, k)`: [[Md5Quad64]] of every word k-gram of
  * a token array, in WINDOW-POSITION order with duplicates kept — the
  * portable-hash twin of [[ShingleHashes]] for the faces whose DuckDB
  * oracles recompute gram hashes from the raw text (q41 minhash matrix,
  * q53 winnowing fingerprints). Replaces a `transform(sequence(...),
  * i -> md5_quad64(concat_ws(" ", slice(tokens, i, k))))` tree that built
  * each gram STRING through interpreted lambda dispatch (the dominant cost
  * of the portable-oracle flip: q41 went 0.04 → 0.62 s when it adopted it).
  * Gram text is byte-identical to `concat_ws(" ", slice(...))` — tokens
  * joined by a single 0x20 — so the hash values are unchanged; only the
  * construction is a single codegen'd pass reusing one byte buffer. Window
  * rule matches the HOF form's clamps exactly: positions 0..max(n-k, 0),
  * final windows truncated at the array end, and an EMPTY token array
  * still yields the one hash of the empty string (DuckDB:
  * `range(1, greatest(len(w)-k+2, 2))` over `array_to_string(w[i:i+k-1])`). */
case class PortableGramHashes(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"portable_gram_hashes: k >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "portable_gram_hashes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckSuccess
      case _ => TypeCheckFailure("portable_gram_hashes(array<string>, k literal)")
    }
  }

  override def nullSafeEval(a: Any): Any =
    PortableGramHashes.compute(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      |${ev.value} = graft.functions.PortableGramHashes.compute($a, $k);
    """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): PortableGramHashes =
    copy(child = newChild)
}

object PortableGramHashes {
  /** Static kernel shared by the interpreted and generated paths. */
  def compute(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    // materialize token bytes once (each token is reused by up to k windows)
    val tb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { tb(i) = tokens.getUTF8String(i).getBytes; i += 1 }
    val nWin = math.max(n - k, 0) + 1
    val out = new Array[Long](nWin)
    val buf = new java.io.ByteArrayOutputStream(64)
    i = 0
    while (i < nWin) {
      buf.reset()
      val end = math.min(i + k, n)
      var j = i
      while (j < end) {
        if (j > i) buf.write(' ')
        buf.write(tb(j), 0, tb(j).length)
        j += 1
      }
      out(i) = Md5Quad64.hash(buf.toByteArray)
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckSuccess
      case _ => TypeCheckFailure("simhash64(array<bigint>)")
    }
  }

  override def nullSafeEval(a: Any): Any = {
    val th = a.asInstanceOf[ArrayData]
    val cnt = new Array[Int](64)
    val n = th.numElements()
    var k = 0
    while (k < n) {
      val h = th.getLong(k)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) cnt(j) += 1 else cnt(j) -= 1
        j += 1
      }
      k += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) { if (cnt(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cnt = ctx.freshName("cnt"); val n = ctx.freshName("n")
      val k = ctx.freshName("k"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val fp = ctx.freshName("fp")
      s"""
         |int[] $cnt = new int[64];
         |int $n = $a.numElements();
         |for (int $k = 0; $k < $n; $k++) {
         |  long $h = $a.getLong($k);
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ((($h >>> $j) & 1L) == 1L) $cnt[$j]++; else $cnt[$j]--;
         |  }
         |}
         |long $fp = 0L;
         |for (int $j = 0; $j < 64; $j++) { if ($cnt[$j] > 0) $fp |= (1L << $j); }
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** All size-k combinations of an array<bigint>, emitted in the canonical
  * order of the (sorted) input — one row per combination. */
case class Combinations(child: Expression, kExpr: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def elementSchema: StructType =
    StructType(StructField("combo", ArrayType(LongType, containsNull = false)) :: Nil)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(LongType, _) if kExpr.foldable && kExpr.dataType == IntegerType =>
        TypeCheckSuccess
      case _ => TypeCheckFailure("combinations(array<bigint>, k literal int)")
    }
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val k = kExpr.eval(input).asInstanceOf[Int]
    val items = arr.toLongArray()
    if (k <= 0 || k > items.length) return Iterator.empty
    items.toSeq.combinations(k).map(c =>
      InternalRow(new GenericArrayData(c.toArray)))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Combinations =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

/** `oph_sig(sh, k)`: ONE-PERMUTATION MinHash signature — the scale
  * replacement for k independent hash passes. The shingle set is binned by
  * `floorMod(h, k)` and each bin keeps its minimum, so the whole signature
  * costs ONE pass over the shingles (vs `minhash_sigs`' k × |sh| fold —
  * 128× fewer hash-mixes per document at the default width). Empty bins
  * are densified by borrowing the next non-empty bin's value circularly to
  * the right (Shrivastava & Li's basic densification — slightly correlated
  * for adjacent empty bins, which the exact-Jaccard verification stage
  * absorbs: banding recall is the only thing at stake). Two documents
  * agree on bin j iff their bin-minimum shingle matches — the standard
  * OPH collision estimator, band-compatible with the dense signature. */
case class OphSignature(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "oph_sig"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(LongType, _) if k >= 2 => TypeCheckSuccess
      case _ => TypeCheckFailure("oph_sig(array<bigint>, k literal >= 2)")
    }
  }

  override def nullSafeEval(a: Any): Any = {
    val sh = a.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < sh.numElements()) {
      val h = sh.getLong(i)
      val bin = java.lang.Math.floorMod(h, k.toLong).toInt
      if (h < mins(bin)) mins(bin) = h
      i += 1
    }
    var j = 0
    while (j < k) {
      if (mins(j) == Long.MaxValue) {
        var d = 1
        while (d < k && mins((j + d) % k) == Long.MaxValue) d += 1
        if (d < k) mins(j) = mins((j + d) % k)
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mins = ctx.freshName("mins"); val i = ctx.freshName("i")
      val h = ctx.freshName("h"); val bin = ctx.freshName("bin")
      val j = ctx.freshName("j"); val d = ctx.freshName("d")
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  long $h = $a.getLong($i);
         |  int $bin = (int) java.lang.Math.floorMod($h, (long) $k);
         |  if ($h < $mins[$bin]) $mins[$bin] = $h;
         |}
         |for (int $j = 0; $j < $k; $j++) {
         |  if ($mins[$j] == Long.MAX_VALUE) {
         |    int $d = 1;
         |    while ($d < $k && $mins[($j + $d) % $k] == Long.MAX_VALUE) $d++;
         |    if ($d < $k) $mins[$j] = $mins[($j + $d) % $k];
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): OphSignature =
    copy(child = newChild)
}

/** `nearest_cells(v, norm, cents, nprobe)`: the `nprobe` nearest coarse-
  * quantizer cells of a vector, ordered by (cosine desc, cell asc) — the
  * IVF assignment (`nprobe = 1`) and probe-list shapes as ONE codegen pass
  * over the scan. `cents` is the flat driver-trained unit-centroid matrix
  * (nCells × dim, cell c component i at `c·dim + i`). Replaces the
  * explode-×-nCells + `row_number` window formulation, whose per-row cost
  * was nCells WIDE rows (vector + norm duplicated per candidate cell)
  * through a full window shuffle — this is nCells fused dot products and
  * zero extra rows. Bit-parity with the window form (SimilaritySpec): the
  * per-cell score is the same left-to-right `Σ v[i]·c[i]` as
  * [[ArrayDotProduct]] divided by `norm` (centroids are unit length, and
  * `norm * 1.0 == norm` exactly in IEEE), selection keeps strictly-greater
  * scores ahead and earlier cells on ties, and NaN scores (zero-norm
  * vectors) rank FIRST — Spark's descending NaN rule — so the oracled
  * pinned-quantizer faces replay identically. */
case class NearestCells(left: Expression, right: Expression,
    cents: Array[Double], nprobe: Int) extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType)
        if nprobe >= 1 && cents.nonEmpty => TypeCheckSuccess
      case _ => TypeCheckFailure(
        "nearest_cells(array<double>, double, cents array<double> literal, nprobe literal >= 1)")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val norm = b.asInstanceOf[Double]
    val dim = v.numElements()
    require(dim > 0 && cents.length % dim == 0,
      s"nearest_cells: cents (${cents.length}) do not tile dim=$dim")
    val nCells = cents.length / dim
    val take = math.min(nprobe, nCells)
    val bestS = new Array[Double](take)
    val bestC = new Array[Long](take)
    var filled = 0
    var c = 0
    while (c < nCells) {
      var d = 0.0; var i = 0
      val base = c * dim
      while (i < dim) { d += v.getDouble(i) * cents(base + i); i += 1 }
      val s = d / norm
      // Spark's descending total order: NaN greatest, ties keep lower cell
      var pos = filled
      while (pos > 0 &&
          ((java.lang.Double.isNaN(s) && !java.lang.Double.isNaN(bestS(pos - 1)))
            || s > bestS(pos - 1))) pos -= 1
      if (pos < take) {
        var j = math.min(filled, take - 1)
        while (j > pos) { bestS(j) = bestS(j - 1); bestC(j) = bestC(j - 1); j -= 1 }
        bestS(pos) = s; bestC(pos) = c
        if (filled < take) filled += 1
      }
      c += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(bestC, filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ctRef = ctx.addReferenceObj("cents", cents, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dim = ctx.freshName("dim"); val nCells = ctx.freshName("nCells")
      val take = ctx.freshName("take"); val bestS = ctx.freshName("bestS")
      val bestC = ctx.freshName("bestC"); val filled = ctx.freshName("filled")
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val base = ctx.freshName("base"); val pos = ctx.freshName("pos")
      val j = ctx.freshName("j")
      // the insertion-rank comparison is a flat if-chain: janino mis-parses
      // the natural `while (p > 0 && ((isNaN(s) && !isNaN(prev)) || s > prev))`
      // header as a cast ("Expression ... is not a type"), which silently
      // dropped EVERY nearest_cells call-site out of whole-stage codegen
      // (one failed compile + interpreted fallback per task)
      val prev = ctx.freshName("prev"); val beats = ctx.freshName("beats")
      s"""
         |int $dim = $a.numElements();
         |if ($dim == 0 || $ctRef.length % $dim != 0) {
         |  throw new IllegalArgumentException("nearest_cells: cents do not tile");
         |}
         |int $nCells = $ctRef.length / $dim;
         |int $take = java.lang.Math.min($nprobe, $nCells);
         |double[] $bestS = new double[$take];
         |long[] $bestC = new long[$take];
         |int $filled = 0;
         |for (int $c = 0; $c < $nCells; $c++) {
         |  double $d = 0.0;
         |  int $base = $c * $dim;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $d += $a.getDouble($i) * $ctRef[$base + $i];
         |  }
         |  double $s = $d / $b;
         |  int $pos = $filled;
         |  while ($pos > 0) {
         |    double $prev = $bestS[$pos - 1];
         |    boolean $beats = $s > $prev;
         |    if (!$beats && java.lang.Double.isNaN($s)
         |        && !java.lang.Double.isNaN($prev)) $beats = true;
         |    if (!$beats) break;
         |    $pos--;
         |  }
         |  if ($pos < $take) {
         |    for (int $j = java.lang.Math.min($filled, $take - 1); $j > $pos; $j--) {
         |      $bestS[$j] = $bestS[$j - 1]; $bestC[$j] = $bestC[$j - 1];
         |    }
         |    $bestS[$pos] = $s; $bestC[$pos] = $c;
         |    if ($filled < $take) $filled++;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($bestC, $filled));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCells =
    copy(left = newLeft, right = newRight)
}

/** `pq_encode(v, codebooks, m, k)`: product-quantization encoding — split
  * the dim-length vector into `m` contiguous subvectors and emit, per
  * subspace, the index (0..k-1) of the L2-nearest codeword. `codebooks` is
  * the flat driver-trained matrix (length k·dim; codeword (mm, c) component
  * i at `((mm·k + c)·subdim) + i`, subdim = dim/m). One codegen'd pass:
  * m·k·subdim = k·dim multiply-adds per row. Output array<bigint> length m
  * — at m=8 the 512-byte vector becomes 8 codes, the compression that
  * makes a 100 TB corpus ADC-scannable from memory. */
case class PqEncode(child: Expression, codebooks: Array[Double], m: Int, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(DoubleType, _) if m >= 1 && k >= 2 &&
        codebooks.nonEmpty && codebooks.length % (m * k) == 0 => TypeCheckSuccess
      case _ => TypeCheckFailure(
        "pq_encode(array<double>, codebooks array<double> literal, m literal, k literal)")
    }
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val dim = v.numElements()
    require(dim % m == 0 && codebooks.length == k * dim,
      s"pq_encode: codebooks (${codebooks.length}) do not tile m=$m k=$k dim=$dim")
    val subdim = dim / m
    val out = new Array[Long](m)
    var mm = 0
    while (mm < m) {
      var best = 0L; var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        var d = 0.0; var i = 0
        val base = (mm * k + c) * subdim
        while (i < subdim) {
          val diff = v.getDouble(mm * subdim + i) - codebooks(base + i)
          d += diff * diff; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(mm) = best
      mm += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val dim = ctx.freshName("dim"); val subdim = ctx.freshName("subdim")
      val out = ctx.freshName("out"); val mm = ctx.freshName("mm")
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val d = ctx.freshName("d"); val diff = ctx.freshName("diff")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val base = ctx.freshName("base")
      s"""
         |int $dim = $a.numElements();
         |if ($dim % $m != 0 || $cbRef.length != $k * $dim) {
         |  throw new IllegalArgumentException("pq_encode: codebooks do not tile");
         |}
         |int $subdim = $dim / $m;
         |long[] $out = new long[$m];
         |for (int $mm = 0; $mm < $m; $mm++) {
         |  long $best = 0L; double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $d = 0.0;
         |    int $base = ($mm * $k + $c) * $subdim;
         |    for (int $i = 0; $i < $subdim; $i++) {
         |      double $diff = $a.getDouble($mm * $subdim + $i) - $cbRef[$base + $i];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $out[$mm] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `pq_adc(qv, codes, codebooks, m, k)`: asymmetric-distance dot product —
  * the query stays exact (array<double>), the corpus row is its PQ codes,
  * and the score is Σ over subspaces of qv_mm · codeword(mm, codes[mm]):
  * the inner product against the row's RECONSTRUCTION, computed without
  * ever materializing it. dim multiply-adds per (query, row) pair — the
  * same flop count as an exact dot, but against an 8-code row instead of a
  * 512-byte vector (in a production layout the per-query lookup table
  * makes it m adds; the fused form keeps the expression stateless). */
case class PqAdc(left: Expression, right: Expression,
    codebooks: Array[Double], m: Int, k: Int) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(LongType, _))
        if codebooks.length % (m * k) == 0 => TypeCheckSuccess
      case _ => TypeCheckFailure(
        "pq_adc(array<double>, array<bigint>, codebooks literal, m literal, k literal)")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val qv = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val dim = qv.numElements()
    require(dim % m == 0 && codes.numElements() == m && codebooks.length == k * dim,
      s"pq_adc: shapes do not tile (dim=$dim m=$m k=$k)")
    val subdim = dim / m
    var s = 0.0
    var mm = 0
    while (mm < m) {
      val base = (mm * k + codes.getLong(mm).toInt) * subdim
      var i = 0
      while (i < subdim) { s += qv.getDouble(mm * subdim + i) * codebooks(base + i); i += 1 }
      mm += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dim = ctx.freshName("dim"); val subdim = ctx.freshName("subdim")
      val s = ctx.freshName("s"); val mm = ctx.freshName("mm")
      val i = ctx.freshName("i"); val base = ctx.freshName("base")
      s"""
         |int $dim = $a.numElements();
         |if ($dim % $m != 0 || $b.numElements() != $m || $cbRef.length != $k * $dim) {
         |  throw new IllegalArgumentException("pq_adc: shapes do not tile");
         |}
         |int $subdim = $dim / $m;
         |double $s = 0.0;
         |for (int $mm = 0; $mm < $m; $mm++) {
         |  int $base = ($mm * $k + (int) $b.getLong($mm)) * $subdim;
         |  for (int $i = 0; $i < $subdim; $i++) {
         |    $s += $a.getDouble($mm * $subdim + $i) * $cbRef[$base + $i];
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

/** `cms_estimate(sketch, value)`: probe a serialized Count-Min sketch
  * (built by `cms_agg`, Spark's own `CountMinSketchAgg`) for a value's
  * estimated count. The sketch arrives as a driver-built binary literal
  * (same shipping shape as [[PqEncode]]'s codebooks and `bloom_contains`'s
  * filter), deserialized ONCE per task and probed through a codegen'd
  * call — the read side of the sketch→shortlist→exact-verify heavy-hitter
  * pattern (Relational.cmsHeavyHitters): CMS never underestimates, so
  * `estimate >= T` keeps every true heavy hitter and drops ~all light
  * keys BEFORE the aggregation shuffle. */
case class CmsEstimate(child: Expression, sketchBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case LongType | IntegerType => TypeCheckSuccess
      case _ => TypeCheckFailure("cms_estimate(bigint | int)")
    }
  }

  @transient private lazy val sketch =
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchBytes))

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case LongType => sketch.estimateCount(v.asInstanceOf[Long])
    case _ => sketch.estimateCount(v.asInstanceOf[Int].toLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val skRef = ctx.addReferenceObj("cmsSketch", sketch,
      classOf[org.apache.spark.util.sketch.CountMinSketch].getName)
    defineCodeGen(ctx, ev, c =>
      s"$skRef.estimateCount(java.lang.Long.valueOf((long) $c))")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
}

/** `cdc_chunks(tokenHashes, mask, minLen, maxLen)`: content-defined
  * chunking over a token-hash stream — the Rabin/FastCDC boundary rule
  * lifted to token granularity. A chunk CLOSES after token t when the
  * chunk holds ≥ `minLen` tokens and `(hash(t) & mask) == 0` (expected
  * chunk length ≈ minLen + mask), or unconditionally at `maxLen`; the
  * remainder closes at end-of-document. Returns one 64-bit hash per chunk
  * (an xxhash64 fold of the member hashes), so downstream dedup joins move
  * 8-byte keys, never text. The point of CDC over fixed-size chunking
  * ([[graft.operators.TextOps.chunkDocs]]): boundaries are decided by
  * CONTENT, so inserting a sentence shifts only the chunk it lands in —
  * every later boundary re-synchronizes and those chunk hashes still match
  * their pre-edit twins (shift-robustness asserted in TextOpsSpec).
  * Single forward pass, codegen'd; the interpreted eval is the
  * bit-identical witness. */
case class CdcChunks(child: Expression, mask: Long, minLen: Int, maxLen: Int)
    extends UnaryExpression {

  require(minLen >= 1 && maxLen >= minLen,
    s"cdc_chunks: need 1 <= minLen <= maxLen, got ($minLen, $maxLen)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckSuccess
      case _ => TypeCheckFailure("cdc_chunks(array<bigint>, ...)")
    }
  }

  override def nullSafeEval(a: Any): Any = {
    val th = a.asInstanceOf[ArrayData]
    val n = th.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var fold = 42L
    var len = 0
    var k = 0
    while (k < n) {
      val h = th.getLong(k)
      fold = XXH64.hashLong(h, fold)
      len += 1
      if ((len >= minLen && (h & mask) == 0L) || len == maxLen) {
        out += fold; fold = 42L; len = 0
      }
      k += 1
    }
    if (len > 0) out += fold
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val m = ctx.freshName("m"); val fold = ctx.freshName("fold")
      val len = ctx.freshName("len"); val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$n / $minLen + 1];
         |int $m = 0;
         |long $fold = 42L;
         |int $len = 0;
         |for (int $k = 0; $k < $n; $k++) {
         |  long $h = $a.getLong($k);
         |  $fold = $xxh.hashLong($h, $fold);
         |  $len++;
         |  if (($len >= $minLen && ($h & ${mask}L) == 0L) || $len == $maxLen) {
         |    $out[$m++] = $fold; $fold = 42L; $len = 0;
         |  }
         |}
         |if ($len > 0) $out[$m++] = $fold;
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($out, $m));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

/** `cdc_boundaries(tokenHashes, mask, minLen, maxLen)`: the SAME
  * content-defined boundary scan as [[CdcChunks]], returning the 1-based
  * END positions of every chunk (the final partial chunk's end included)
  * instead of fold hashes. The position set is a pure function of the
  * boundary rule — no xxhash64 chain — so when the token-hash stream is
  * the portable [[Md5Quad64]], another engine can replay the scan exactly
  * (DuckDB: a recursive CTE stepping one token per iteration carrying the
  * run length) and reconstruct the identical chunks from the raw token
  * text. This is what flips the q8i CDC face from spec-only to a full
  * equality oracle: chunk identity becomes a hash OF THE CHUNK'S TEXT
  * (replayable) keyed by boundaries both engines agree on, rather than an
  * engine-private fold. Boundary semantics are bit-identical to
  * [[CdcChunks]] (TextOpsSpec asserts the two scans agree on every
  * boundary). */
case class CdcBoundaries(child: Expression, mask: Long, minLen: Int, maxLen: Int)
    extends UnaryExpression {

  require(minLen >= 1 && maxLen >= minLen,
    s"cdc_boundaries: need 1 <= minLen <= maxLen, got ($minLen, $maxLen)")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckSuccess
      case _ => TypeCheckFailure("cdc_boundaries(array<bigint>, ...)")
    }
  }

  override def nullSafeEval(a: Any): Any = {
    val th = a.asInstanceOf[ArrayData]
    val n = th.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var len = 0
    var k = 0
    while (k < n) {
      val h = th.getLong(k)
      len += 1
      if ((len >= minLen && (h & mask) == 0L) || len == maxLen) {
        out += (k + 1); len = 0
      }
      k += 1
    }
    if (len > 0) out += n
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val m = ctx.freshName("m"); val len = ctx.freshName("len")
      val k = ctx.freshName("k"); val h = ctx.freshName("h")
      s"""
         |int $n = $a.numElements();
         |int[] $out = new int[$n / $minLen + 1];
         |int $m = 0;
         |int $len = 0;
         |for (int $k = 0; $k < $n; $k++) {
         |  long $h = $a.getLong($k);
         |  $len++;
         |  if (($len >= $minLen && ($h & ${mask}L) == 0L) || $len == $maxLen) {
         |    $out[$m++] = $k + 1; $len = 0;
         |  }
         |}
         |if ($len > 0) $out[$m++] = $n;
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($out, $m));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}

/** `edit1_dist(a, b)`: Levenshtein distance CAPPED at 1 — returns 0, 1, or
  * -1 (meaning "> 1"), the exact contract of Spark's
  * `levenshtein(a, b, 1)`. The built-in runs a banded dynamic program with
  * per-call working arrays (~4.5 µs/pair — the whole cost of the fuzzy
  * join's verify stage over ~1M candidates); distance ≤ 1 needs none of
  * that: equal strings → 0; equal length → exactly one mismatched
  * position; length diff 1 → the shorter equals the longer minus one
  * character (two-pointer with a single gap skip). O(len) comparisons,
  * no allocation beyond the char extraction. */
case class EditDistanceLe1(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "edit1_dist"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckSuccess
      case _ => TypeCheckFailure("edit1_dist(string, string)")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    EditDistanceLe1.dist(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.EditDistanceLe1.dist($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EditDistanceLe1 =
    copy(left = newLeft, right = newRight)
}

object EditDistanceLe1 {
  /** Static kernel shared by the interpreted and generated paths. */
  def dist(ua: org.apache.spark.unsafe.types.UTF8String,
      ub: org.apache.spark.unsafe.types.UTF8String): Int = {
    if (ua.equals(ub)) return 0
    val s = ua.toString; val t = ub.toString
    val la = s.length; val lb = t.length
    val d = la - lb
    if (d > 1 || d < -1) return -1
    if (d == 0) {
      var i = 0; var mism = 0
      while (i < la) {
        if (s.charAt(i) != t.charAt(i)) { mism += 1; if (mism > 1) return -1 }
        i += 1
      }
      // not equal as UTF8Strings but chars all equal cannot happen; mism>=1
      1
    } else {
      val sh = if (d < 0) s else t // shorter
      val lo = if (d < 0) t else s // longer
      var i = 0
      while (i < sh.length && sh.charAt(i) == lo.charAt(i)) i += 1
      var j = i
      while (j < sh.length && sh.charAt(j) == lo.charAt(j + 1)) j += 1
      if (j == sh.length) 1 else -1
    }
  }
}

/** `shingle_hashes(tokens, k)`: SORTED DISTINCT 64-bit hashes of the word
  * k-shingles of a token array, in one pass — the base relation of the
  * whole dedup family (MinHash, OPH, LSH banding, exact Jaccard). Replaces
  * a `sort_array(array_distinct(transform(sequence(...),
  * i -> xxhash64(concat_ws(" ", slice(tokens, i, k))))))` tree whose
  * per-window lambda dispatch + string building dominated the shingle
  * build. Each token is hashed ONCE from its UTF-8 bytes, each window is
  * an xxhash64 chain over its k token hashes (no concatenated strings —
  * and the chain is unambiguous where `concat_ws` aliases "a b"+"c" with
  * "a"+"b c"), then sort + dedupe in place. Window rule matches the HOF
  * form exactly: positions 0..max(n-k, 0), the final windows clamped to
  * the array end — a doc shorter than k yields its single partial
  * shingle. Downstream only needs injectivity (Jaccard over distinct
  * sets) and sortedness (two-pointer `sorted_intersect_count`); the
  * DuckDB q45 oracle recomputes Jaccard on RAW string 3-grams, so the
  * hash swap stays pinned cross-engine. */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"shingle_hashes: k >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckSuccess
      case _ => TypeCheckFailure("shingle_hashes(array<string>, k literal)")
    }
  }

  override def nullSafeEval(a: Any): Any =
    ShingleHashes.compute(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      |${ev.value} = graft.functions.ShingleHashes.compute($a, $k);
    """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  /** Static kernel shared by the interpreted and generated paths. */
  def compute(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    // hash every token once from its UTF-8 bytes
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      th(i) = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
      i += 1
    }
    val nWin = math.max(n - k, 0) + 1
    val w = new Array[Long](nWin)
    i = 0
    while (i < nWin) {
      val end = math.min(i + k, n)
      var f = 42L
      var j = i
      while (j < end) { f = XXH64.hashLong(th(j), f); j += 1 }
      w(i) = f
      i += 1
    }
    java.util.Arrays.sort(w)
    // in-place dedupe of the sorted run
    var m = 1
    i = 1
    while (i < nWin) {
      if (w(i) != w(m - 1)) { w(m) = w(i); m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(w, m))
  }
}

/** `band_hashes(sig, bands)`: one 64-bit key per LSH band — band j is an
  * xxhash64 fold of signature rows [j·r, (j+1)·r), r = len/bands. Replaces
  * the `transform(sequence(...), j -> xxhash64(concat_ws(",",
  * transform(slice(sig, ...), cast-to-string))))` tree that built a comma
  * string per band through interpreted lambdas (bands × r string casts +
  * a concat per row). Any injective key of the band's row values yields
  * identical banding behavior — two signatures share a band key iff their
  * r rows match (modulo 64-bit collisions, which only ADD candidates and
  * are removed by the exact-Jaccard verify). */
case class BandHashes(child: Expression, bands: Int)
    extends UnaryExpression {

  require(bands >= 1, s"band_hashes: bands >= 1, got $bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_hashes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckSuccess
      case _ => TypeCheckFailure("band_hashes(array<bigint>, bands literal)")
    }
  }

  override def nullSafeEval(a: Any): Any = {
    val sig = a.asInstanceOf[ArrayData]
    val n = sig.numElements()
    val r = math.max(n / bands, 1)
    val out = new Array[Long](bands)
    var j = 0
    while (j < bands) {
      var f = 42L
      var i = j * r
      val end = math.min(i + r, n)
      while (i < end) { f = XXH64.hashLong(sig.getLong(i), f); i += 1 }
      out(j) = f
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n"); val r = ctx.freshName("r")
      val out = ctx.freshName("out"); val j = ctx.freshName("j")
      val f = ctx.freshName("f"); val i = ctx.freshName("i")
      val end = ctx.freshName("end")
      s"""
         |int $n = $a.numElements();
         |int $r = java.lang.Math.max($n / $bands, 1);
         |long[] $out = new long[$bands];
         |for (int $j = 0; $j < $bands; $j++) {
         |  long $f = 42L;
         |  int $end = java.lang.Math.min($j * $r + $r, $n);
         |  for (int $i = $j * $r; $i < $end; $i++) {
         |    $f = $xxh.hashLong($a.getLong($i), $f);
         |  }
         |  $out[$j] = $f;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BandHashes =
    copy(child = newChild)
}
