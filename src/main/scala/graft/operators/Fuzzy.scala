package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate string matching via symmetric-delete blocking (the SymSpell
  * scheme): two strings within Damerau–Levenshtein distance k share at
  * least one member of their delete-≤k neighborhoods, so an equi-join on
  * neighborhood keys finds every candidate pair without a cross join. A
  * final `levenshtein` verification (with Spark's threshold early-exit)
  * removes the false positives the blocking admits.
  *
  * Scale shape: a string of length L contributes L+1 keys at k=1 (and
  * O(L²) at k=2), all generated map-side by codegen'd `transform`/
  * `substr` expressions — no UDF, no driver state. The join shuffles
  * keys + strings only, linear in total corpus text, and the verify
  * filter runs distributed after the equi-join. Compare the O(n²)
  * cross-join a naive fuzzy match would need.
  *
  * The reference has no fuzzy matching (its joins are hash equi-joins,
  * query/aql_processor.go); this extends the join family for
  * training-data canonicalization (spell-variant vocab merging, noisy
  * entity linking).
  */
object Fuzzy {

  /** Delete-1 neighborhood of `s`, including `s` itself: the string plus
    * every variant with exactly one character removed. Pure codegen.
    */
  private[operators] def deleteKeys1(s: Column): Column =
    array_union(
      array(s),
      transform(sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s)))))

  /** Delete-≤k neighborhood (k ∈ {1, 2}). k=2 applies the delete-1 step
    * to every delete-1 variant and dedupes — O(L²) keys per string, the
    * documented cost of radius-2 blocking.
    */
  private[operators] def deleteKeys(s: Column, k: Int): Column = k match {
    case 1 => deleteKeys1(s)
    case 2 =>
      array_distinct(flatten(transform(deleteKeys1(s), v => deleteKeys1(v))))
    case other =>
      throw new IllegalArgumentException(
        s"symmetric-delete blocking supports maxDist 1 or 2, got $other")
  }

  /** All (left, right) string pairs with levenshtein distance ≤ maxDist.
    *
    * Inputs are DISTINCT string sets (callers dedupe first — matching is
    * a property of the string value, and deduping keeps the neighborhood
    * explosion proportional to vocabulary size, not corpus size). Output
    * columns: `leftCol`, `rightCol`, `dist`.
    *
    * Soundness: for Levenshtein distance ≤ 1 the delete-1 neighborhoods
    * of the two strings always intersect (equal → the string itself;
    * substitution at i → both drop position i; insert/delete → the longer
    * side drops the extra char). Inductively delete-≤k covers distance
    * ≤ k. The verify step keeps exactly the true pairs.
    */
  def fuzzyJoin(left: DataFrame, leftCol: String,
                right: DataFrame, rightCol: String,
                maxDist: Int = 1): DataFrame = {
    val lk = left.select(col(leftCol))
      .withColumn("_k", explode(deleteKeys(col(leftCol), maxDist)))
    val rk = right.select(col(rightCol))
      .withColumn("_k", explode(deleteKeys(col(rightCol), maxDist)))
    lk.join(rk, "_k")
      .select(col(leftCol), col(rightCol))
      .distinct()
      .withColumn("dist",
        levenshtein(col(leftCol), col(rightCol), maxDist))
      // the threshold form returns -1 when the distance exceeds maxDist
      .where(col("dist") >= 0 && col("dist") <= maxDist)
  }

  /** Canonicalization: cluster a vocabulary by fuzzy equality (distance
    * ≤ maxDist edges → connected components) and map every string to its
    * cluster's lexicographically-smallest member. Returns (`strCol`,
    * `canonical`). Composes [[fuzzyJoin]] with the large-star/small-star
    * [[Dedup.connectedComponents]], so it inherits that operator's
    * bounded-rounds convergence at scale.
    */
  def canonicalize(vocab: DataFrame, strCol: String,
                   maxDist: Int = 1): DataFrame = {
    val strs = vocab.select(col(strCol)).distinct()
    // stable integral ids for CC: dense ranks are overkill; a 64-bit hash
    // of the string is id enough (collision → two clusters merge, the
    // same failure class minhash banding accepts; acceptable for canon).
    val ids = strs.withColumn("_sid", xxhash64(col(strCol)))
    val pairs = fuzzyJoin(strs, strCol,
      strs.withColumnRenamed(strCol, "_r"), "_r", maxDist)
      .where(col(strCol) < col("_r"))
    val edges = pairs
      .select(xxhash64(col(strCol)).as("_src"), xxhash64(col("_r")).as("_dst"))
    val comps = Dedup.connectedComponents(edges, "_src", "_dst")
    ids.join(comps, ids("_sid") === comps("id"), "left")
      .select(col(strCol),
        coalesce(col("component"), col("_sid")).as("_comp"))
      .groupBy(col("_comp"))
      .agg(collect_list(col(strCol)).as("_members"))
      .select(explode(col("_members")).as(strCol),
        array_min(col("_members")).as("canonical"))
  }
}
