package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Character-n-gram language identification — the Cavnar–Trenkle
  * "out-of-place" rank-profile method (the classic n-gram langid
  * heuristic), kept integer-exact so the DuckDB oracle replays it
  * bit for bit:
  *
  *  - a LANGUAGE PROFILE is the top-`k` character trigrams of the
  *    labeled corpus slice, ranked by (count desc, gram asc);
  *  - a DOCUMENT PROFILE is its own top-`docK` trigrams, same ranking;
  *  - the distance from a document to a language is the sum over the
  *    document's profile grams of |doc rank − lang rank|, with grams
  *    absent from the language profile costing the fixed `penalty`;
  *  - predicted language = argmin distance, ties broken by language
  *    name; documents too short to produce a trigram predict "und".
  *
  * Text is canonicalized through [[TextOps.normalizeText]] first, so
  * grams range over `[a-z0-9 ]` ASCII and rank tie-breaks compare the
  * same bytes in both engines.
  *
  * Scale design (100 TB): the gram explode shuffles (id, gram) pairs —
  * gram-stream linear, fixed-width keys, the same shape as the n-gram
  * family. Language profiles are BOUNDED BY CONSTRUCTION (langs × k
  * rows) and broadcast; the per-document window partitions by doc id
  * (never global); the distance join fans each document's ≤ docK
  * profile rows across the handful of candidate languages — linear in
  * corpus size, no all-pairs anywhere.
  */
object LangId {

  /** Trigram array of a normalized string (empty when shorter than n) —
    * the equality baseline for the fused key walk below: each `substr(i,
    * n)` rescans the string from its head, so building every window this
    * way is O(L²) per document (measured as half the langid cost at the
    * scale rungs). The hot paths walk [[trigramKeys]] instead.
    */
  def charGrams(s: Column, n: Int = 3): Column =
    when(length(s) >= n,
      transform(sequence(lit(1), length(s) - (n - 1)), i => s.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))

  /** One 21-bit key per trigram window of a NORMALIZED (`[a-z0-9 ]`)
    * string, one byte walk per document: `(b0 << 14) | (b1 << 7) | b2`.
    * Key order == lexicographic gram order for the 7-bit alphabet, so
    * rank sorts can compare ints. Loud failure on a non-ASCII byte —
    * that is a caller passing UN-normalized text.
    */
  def trigramKeys(s: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      TrigramKeysExpr(org.apache.spark.sql.graftbridge.Bridge.expression(s)))

  /** Decode a [[trigramKeys]] key back to its gram string (bounded
    * post-aggregation rows only).
    */
  private val decodeKey = udf { (key: Int) =>
    new String(Array(((key >> 14) & 0x7f).toChar, ((key >> 7) & 0x7f).toChar,
      (key & 0x7f).toChar))
  }

  /** Language rank profiles from the labeled slice of `docs`:
    * (lang, g, rl) with rl in [1, k]. Null-language rows are excluded
    * (they are what [[predict]] is for).
    *
    * Scale shape: the corpus-wide pass explodes 21-bit trigram KEYS
    * (one fused walk per document), and the (lang, key) count collapses
    * map-side into at most langs × |alphabet|³ ≈ 50k combiner cells per
    * partition — the shuffle is bounded regardless of corpus size. Gram
    * strings are decoded only on the ≤ langs × k surviving rows.
    */
  def profiles(docs: DataFrame, textCol: String, langCol: String,
      k: Int = 300): DataFrame = {
    require(k > 0, s"profile size $k must be positive")
    docs.filter(col(langCol).isNotNull)
      .select(col(langCol).as("lang"),
        explode(trigramKeys(TextOps.normalizeText(col(textCol)))).as("__key"))
      .groupBy("lang", "__key").agg(count(lit(1)).as("__c"))
      // key asc == gram asc for the normalized alphabet
      .withColumn("rl", row_number().over(
        Window.partitionBy("lang").orderBy(col("__c").desc, col("__key"))))
      .where(col("rl") <= k)
      .select(col("lang"), decodeKey(col("__key")).as("g"), col("rl"))
  }

  /** Predict a language per document against `profiles` (the output of
    * [[profiles]]: trigrams over the normalized `[a-z0-9 ]` alphabet).
    * Returns `docs` plus a `predicted_lang` column ("und" for documents
    * with no trigram).
    *
    * The profile table is a MODEL — bounded at langs × k rows by
    * construction — so it is collected and shipped in the scoring
    * closure, and the entire prediction runs MAP-SIDE in one pass per
    * document: gram counting, top-`docK` selection and the per-language
    * rank-distance fold happen inside a single UDF over the normalized
    * text, with no gram explode, no corpus-wide shuffle and no windows.
    * (The first formulation shuffled every (doc, gram) pair through two
    * row_number windows and a 3-way fan-out join: ~1 ms/doc — 519 s for
    * the sf10 rung vs ~8 s for this shape, same answers. The sort trap
    * chapter of BENCH_NOTES gains a sibling: per-document rank logic
    * belongs in a fold, not a window, whenever the model side is
    * broadcastable.)
    *
    * Determinism contract (what the DuckDB oracle replays): doc ranks
    * order by (count desc, gram asc); both sorts here compare a single
    * long key `(-count << 21) | gramKey`, where `gramKey` packs the
    * three 7-bit ASCII bytes — for the normalized alphabet, gramKey
    * order IS lexicographic gram order. Absent grams cost `penalty`;
    * argmin ties break by language name ascending.
    */
  def predict(docs: DataFrame, idCol: String, textCol: String,
      profiles: DataFrame, docK: Int = 50, penalty: Int = 300): DataFrame = {
    require(docK > 0 && penalty > 0, "docK and penalty must be positive")
    // bounded driver collect: langs × k (the model, not the corpus)
    val prof = profiles.select("lang", "g", "rl").collect()
    require(prof.length <= 2000000,
      s"profile table has ${prof.length} rows — not a langs x k model")
    val langs = prof.map(_.getString(0)).distinct.sorted
    val langIdx = langs.zipWithIndex.toMap
    def gramKey(g: String): Int = {
      require(g.length == 3 && g.forall(_ < 0x80),
        s"profile gram '$g' is not a 3-char ASCII trigram")
      (g.charAt(0) << 14) | (g.charAt(1) << 7) | g.charAt(2)
    }
    // gramKey -> per-language profile rank (0 = absent)
    val ranks = new java.util.HashMap[Integer, Array[Int]]()
    prof.foreach { r =>
      val key = Integer.valueOf(gramKey(r.getString(1)))
      var a = ranks.get(key)
      if (a == null) { a = new Array[Int](langs.length); ranks.put(key, a) }
      a(langIdx(r.getString(0))) = r.getInt(2)
    }
    val nLangs = langs.length
    val scoreUdf = udf { (norm: String) =>
      if (norm == null || norm.length < 3 || nLangs == 0) null
      else {
        val L = norm.length
        // one 21-bit key per trigram window (ASCII by the normalize
        // contract), sorted so equal grams are adjacent
        val keys = new Array[Long](L - 2)
        var i = 0
        while (i < L - 2) {
          keys(i) = (norm.charAt(i) << 14) | (norm.charAt(i + 1) << 7) |
            norm.charAt(i + 2)
          i += 1
        }
        java.util.Arrays.sort(keys)
        // run-length -> one long per DISTINCT gram: (-count << 21) | key;
        // ascending sort = count desc, gram asc (the rank order)
        val sortKeys = new Array[Long](keys.length)
        var nDistinct = 0
        i = 0
        while (i < keys.length) {
          var j = i
          while (j < keys.length && keys(j) == keys(i)) j += 1
          sortKeys(nDistinct) = (-(j - i).toLong << 21) | keys(i)
          nDistinct += 1
          i = j
        }
        java.util.Arrays.sort(sortKeys, 0, nDistinct)
        val dist = new Array[Long](nLangs)
        var rd = 1
        val top = math.min(docK, nDistinct)
        while (rd <= top) {
          val key = (sortKeys(rd - 1) & 0x1fffffL).toInt
          val rls = ranks.get(Integer.valueOf(key))
          var l = 0
          while (l < nLangs) {
            val rl = if (rls == null) 0 else rls(l)
            dist(l) += (if (rl > 0) math.abs(rd - rl).toLong else penalty.toLong)
            l += 1
          }
          rd += 1
        }
        var bestL = 0
        var l = 1
        while (l < nLangs) {
          if (dist(l) < dist(bestL)) bestL = l
          l += 1
        }
        langs(bestL)
      }
    }
    docs.withColumn("predicted_lang",
      coalesce(scoreUdf(TextOps.normalizeText(col(textCol))), lit("und")))
  }
}

/** Codegen'd fused trigram-key walk (see [[LangId.trigramKeys]]):
  * array<int> of 21-bit window keys; empty for null/short input.
  */
case class TrigramKeysExpr(child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
  import org.apache.spark.sql.catalyst.expressions.codegen.Block._
  import org.apache.spark.sql.types._

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string child, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    TrigramKeysExpr.walk(
      child.eval(input).asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.operators.TrigramKeysExpr.walk(${c.isNull} ? null : ${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): TrigramKeysExpr =
    copy(child = newChild)
  override def prettyName: String = "trigram_keys"
}

object TrigramKeysExpr {
  private val Empty =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Int](0))

  /** Kernel (called from generated code). */
  def walk(s: org.apache.spark.unsafe.types.UTF8String):
      org.apache.spark.sql.catalyst.util.ArrayData = {
    if (s == null) return Empty
    val b = s.getBytes
    if (b.length < 3) return Empty
    val out = new Array[Int](b.length - 2)
    var i = 0
    while (i <= b.length - 3) {
      if (b(i) < 0 || b(i + 1) < 0 || b(i + 2) < 0)
        throw new IllegalArgumentException(
          "trigram_keys: non-ASCII byte — normalize the text first")
      out(i) = (b(i) << 14) | (b(i + 1) << 7) | b(i + 2)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
