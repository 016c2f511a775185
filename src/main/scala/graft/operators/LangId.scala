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

  /** Trigram array of a normalized string (empty when shorter than n). */
  def charGrams(s: Column, n: Int = 3): Column =
    when(length(s) >= n,
      transform(sequence(lit(1), length(s) - (n - 1)), i => s.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))

  /** Language rank profiles from the labeled slice of `docs`:
    * (lang, g, rl) with rl in [1, k]. Null-language rows are excluded
    * (they are what [[predict]] is for).
    */
  def profiles(docs: DataFrame, textCol: String, langCol: String,
      k: Int = 300): DataFrame = {
    require(k > 0, s"profile size $k must be positive")
    docs.filter(col(langCol).isNotNull)
      .select(col(langCol).as("lang"),
        explode(charGrams(TextOps.normalizeText(col(textCol)))).as("g"))
      .groupBy("lang", "g").agg(count(lit(1)).as("__c"))
      .withColumn("rl", row_number().over(
        Window.partitionBy("lang").orderBy(col("__c").desc, col("g"))))
      .where(col("rl") <= k)
      .select("lang", "g", "rl")
  }

  /** Predict a language per document against `profiles` (the output of
    * [[profiles]], or any (lang, g, rl) frame). Returns `docs` plus a
    * `predicted_lang` column ("und" for documents with no trigram).
    */
  def predict(docs: DataFrame, idCol: String, textCol: String,
      profiles: DataFrame, docK: Int = 50, penalty: Int = 300): DataFrame = {
    require(docK > 0 && penalty > 0, "docK and penalty must be positive")
    val dp = docs
      .select(col(idCol).as("__id"),
        explode(charGrams(TextOps.normalizeText(col(textCol)))).as("g"))
      .groupBy("__id", "g").agg(count(lit(1)).as("__c"))
      .withColumn("rd", row_number().over(
        Window.partitionBy("__id").orderBy(col("__c").desc, col("g"))))
      .where(col("rd") <= docK)
      .select("__id", "g", "rd")
    // candidate languages and their profiles are bounded (langs × k) —
    // broadcast both sides of the fan-out
    val langs = profiles.select(col("lang").as("__cand")).distinct()
    val dist = dp
      .join(broadcast(langs))
      .join(broadcast(profiles.select(col("lang").as("__cand"),
        col("g"), col("rl"))), Seq("__cand", "g"), "left")
      .groupBy("__id", "__cand")
      .agg(sum(coalesce(abs(col("rd") - col("rl")), lit(penalty)))
        .as("__d"))
    val best = dist
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__id").orderBy(col("__d"), col("__cand"))))
      .where(col("__rn") === 1)
      .select(col("__id"), col("__cand").as("predicted_lang"))
    docs.join(best, docs(idCol) === best("__id"), "left")
      .withColumn("predicted_lang", coalesce(col("predicted_lang"), lit("und")))
      .drop("__id")
  }
}
