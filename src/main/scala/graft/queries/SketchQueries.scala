package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.Sketches
import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Gate queries for the mergeable-sketch family ([[graft.functions.Sketches]]):
  * KMV set algebra, Bloom membership, Count-Min point frequency.
  *
  * Every sketch hashes through the md5 hex prefix, so the DuckDB oracle
  * rebuilds the SKETCH CONTENTS exactly (`q_shuffle_shards` precedent) —
  * these gates pin the estimator arithmetic, not just a tolerance flag:
  * false positives and hash collisions are part of the checked answer.
  */
object SketchQueries {

  val defs: Seq[QueryDef] = Seq(

    // --- KMV: cross-lang bigram overlap. Per-lang bigram vocab (~890 at
    // sf0.01) exceeds k=128, so the sketch genuinely subsamples; the
    // union-sketch kth value, the shared-hash count and the jaccard
    // estimate are exact integer/pow2 arithmetic in both engines.
    QueryDef("q_sketch_kmv",
      """WITH toks AS (SELECT lang, string_split_regex(trim(text), '\s+') AS tk
        |              FROM documents),
        |g AS (SELECT lang, unnest(list_transform(range(1, len(tk)),
        |        i -> array_to_string(tk[i:i+1], ' '))) AS g2
        |      FROM toks WHERE len(tk) >= 2),
        |h AS (SELECT DISTINCT lang,
        |        CAST(('0x' || substring(md5(g2), 1, 15)) AS BIGINT) AS hv FROM g),
        |sk AS (SELECT lang, hv FROM (
        |         SELECT lang, hv,
        |           row_number() OVER (PARTITION BY lang ORDER BY hv) AS rn
        |         FROM h) WHERE rn <= 128),
        |pairs AS (SELECT a.lang AS lang_a, b.lang AS lang_b
        |          FROM (SELECT DISTINCT lang FROM sk) a
        |          JOIN (SELECT DISTINCT lang FROM sk) b ON a.lang < b.lang),
        |u AS (SELECT lang_a, lang_b, hv,
        |        row_number() OVER (PARTITION BY lang_a, lang_b ORDER BY hv) AS rn
        |      FROM (SELECT DISTINCT p.lang_a, p.lang_b, s.hv
        |            FROM pairs p JOIN sk s
        |              ON s.lang = p.lang_a OR s.lang = p.lang_b)),
        |uk AS (SELECT lang_a, lang_b, MAX(hv) AS kth, COUNT(*) AS usize
        |       FROM u WHERE rn <= 128 GROUP BY 1, 2),
        |sh AS (SELECT p.lang_a, p.lang_b, COUNT(*) AS shared
        |       FROM pairs p
        |       JOIN sk sa ON sa.lang = p.lang_a
        |       JOIN sk sb ON sb.lang = p.lang_b AND sb.hv = sa.hv
        |       JOIN uk ON uk.lang_a = p.lang_a AND uk.lang_b = p.lang_b
        |             AND sa.hv <= uk.kth
        |       GROUP BY 1, 2)
        |SELECT uk.lang_a, uk.lang_b, CAST(uk.kth AS BIGINT) AS kth,
        |  CAST(COALESCE(sh.shared, 0) AS BIGINT) AS shared,
        |  CAST(uk.usize AS BIGINT) AS usize,
        |  ROUND(COALESCE(sh.shared, 0) * 1.0 / uk.usize, 4) AS jacc_est
        |FROM uk LEFT JOIN sh ON sh.lang_a = uk.lang_a AND sh.lang_b = uk.lang_b
        |ORDER BY uk.lang_a, uk.lang_b""".stripMargin) { (s, d) =>
      val k = 128
      val grams = Tables.documents(s, d)
        .select(col("lang"), TextOps.tokens(col("text")).as("tk"))
        .select(col("lang"), explode(TextOps.shingles(col("tk"), 2)).as("g"))
      val sk = grams.groupBy("lang").agg(Sketches.kmv(col("g"), k).as("sk"))
      val a = sk.select(col("lang").as("lang_a"), col("sk").as("ska"))
      val b = sk.select(col("lang").as("lang_b"), col("sk").as("skb"))
      a.join(b, col("lang_a") < col("lang_b"))
        .select(col("lang_a"), col("lang_b"),
          Sketches.kmvCombine(col("ska"), col("skb"), k).as("c"))
        .select(col("lang_a"), col("lang_b"),
          col("c.kth").as("kth"),
          col("c.shared").cast("long").as("shared"),
          col("c.usize").cast("long").as("usize"),
          round(col("c.shared").cast("double") / col("c.usize"), 4).as("jacc_est"))
        .orderBy("lang_a", "lang_b")
    },

    // --- Bloom: benchmark bigrams (every 97th doc) → fixed 8192-bit
    // filter, probed per gram instance. Deterministic false positives
    // included: the oracle replays each of the 3 bit positions.
    QueryDef("q_sketch_bloom",
      """WITH toks AS (SELECT doc_id, lang,
        |                string_split_regex(trim(text), '\s+') AS tk
        |              FROM documents),
        |g AS (SELECT doc_id, lang, i AS gi, array_to_string(tk[i:i+1], ' ') AS g2
        |      FROM toks, UNNEST(range(1, len(tk))) AS t(i)
        |      WHERE len(tk) >= 2),
        |bench AS (SELECT DISTINCT g2 FROM g WHERE doc_id % 97 = 0),
        |seeds AS (SELECT unnest([0, 1, 2]) AS seed),
        |pos AS (SELECT DISTINCT seed,
        |          CAST(('0x' || substring(md5(seed || ':' || g2), 1, 15)) AS BIGINT)
        |            % 8192 AS p
        |        FROM bench, seeds),
        |pg AS (SELECT doc_id, gi, seed,
        |         CAST(('0x' || substring(md5(seed || ':' || g2), 1, 15)) AS BIGINT)
        |           % 8192 AS p
        |       FROM g, seeds),
        |hits AS (SELECT doc_id, gi, COUNT(*) AS ms
        |         FROM pg JOIN pos ON pos.seed = pg.seed AND pos.p = pg.p
        |         GROUP BY 1, 2),
        |inst AS (SELECT g.doc_id, g.lang,
        |           CASE WHEN COALESCE(h.ms, 0) = 3 THEN 1 ELSE 0 END AS hit
        |         FROM g LEFT JOIN hits h ON h.doc_id = g.doc_id AND h.gi = g.gi),
        |perdoc AS (SELECT doc_id, lang, SUM(hit) AS f FROM inst GROUP BY 1, 2)
        |SELECT lang,
        |  CAST(SUM(CASE WHEN f > 0 THEN 1 ELSE 0 END) AS BIGINT) AS flagged_docs,
        |  CAST(SUM(f) AS BIGINT) AS flagged_grams
        |FROM perdoc GROUP BY lang ORDER BY lang NULLS FIRST""".stripMargin) { (s, d) =>
      val m = 8192; val k = 3
      val docs = Tables.documents(s, d)
      val grams = docs
        .select(col("doc_id"), col("lang"), TextOps.tokens(col("text")).as("tk"))
        .select(col("doc_id"), col("lang"), explode(TextOps.shingles(col("tk"), 2)).as("g"))
      val bf = grams.where(col("doc_id") % 97 === 0)
        .select(col("g")).distinct()
        .agg(Sketches.bloom(col("g"), m, k).as("bf"))
      // probe each DISTINCT gram once (vocabulary-proportional md5 cost,
      // not token-proportional), broadcast the verdicts back onto the
      // gram stream
      val verdicts = grams.select("g").distinct()
        .crossJoin(broadcast(bf))
        .select(col("g"),
          when(Sketches.bloomMightContain(col("bf"), col("g"), m, k), 1L)
            .otherwise(0L).as("hit"))
      val perDoc = grams.join(broadcast(verdicts), Seq("g"))
        .groupBy("doc_id", "lang").agg(sum("hit").as("f"))
      perDoc.groupBy("lang")
        .agg(sum(when(col("f") > 0, 1L).otherwise(0L)).cast("long").as("flagged_docs"),
          sum("f").cast("long").as("flagged_grams"))
        .orderBy("lang")
    },

    // --- Count-Min: corpus token frequencies probed for a fixed word
    // list. Estimate = min over 4 rows of 1024 buckets; the oracle builds
    // the identical counter matrix, so est (collisions and all) and the
    // never-undercount flag are exact.
    QueryDef("q_sketch_cms",
      """WITH toks AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
        |              FROM documents),
        |seeds AS (SELECT unnest([0, 1, 2, 3]) AS seed),
        |cells AS (SELECT seed,
        |            CAST(('0x' || substring(md5(seed || ':' || tok), 1, 15)) AS BIGINT)
        |              % 1024 AS b,
        |            COUNT(*) AS c
        |          FROM toks, seeds GROUP BY 1, 2),
        |probes AS (SELECT unnest(['batch', 'key', 'scan', 'table', 'zzmissing']) AS word),
        |est AS (SELECT word, MIN(c) AS est FROM (
        |          SELECT p.word, s.seed, COALESCE(cells.c, 0) AS c
        |          FROM probes p CROSS JOIN seeds s
        |          LEFT JOIN cells ON cells.seed = s.seed AND cells.b =
        |            CAST(('0x' || substring(md5(s.seed || ':' || p.word), 1, 15)) AS BIGINT)
        |              % 1024)
        |        GROUP BY 1),
        |truth AS (SELECT p.word, COUNT(t.tok) AS cnt
        |          FROM probes p LEFT JOIN toks t ON t.tok = p.word GROUP BY 1)
        |SELECT e.word, CAST(e.est AS BIGINT) AS est, CAST(tr.cnt AS BIGINT) AS cnt,
        |  e.est >= tr.cnt AS never_undercounts
        |FROM est e JOIN truth tr ON tr.word = e.word
        |ORDER BY e.word""".stripMargin) { (s, d) =>
      import s.implicits._
      val w = 1024; val depth = 4
      val toks = Tables.documents(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("tok"))
      val sk = toks.agg(Sketches.cms(col("tok"), w, depth).as("sk"))
      val probes = Seq("batch", "key", "scan", "table", "zzmissing").toDF("word")
      val truth = probes.join(
          toks.groupBy("tok").agg(count(lit(1)).as("cnt")),
          col("word") === col("tok"), "left")
        .select(col("word"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      truth.crossJoin(broadcast(sk))
        .select(col("word"),
          Sketches.cmsEstimate(col("sk"), col("word"), w, depth).as("est"),
          col("cnt"))
        .withColumn("never_undercounts", col("est") >= col("cnt"))
        .orderBy("word")
    }
  )
}
