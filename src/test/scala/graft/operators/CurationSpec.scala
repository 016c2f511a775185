package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sfDir)

  test("duplicate-ngram fraction flags looped text, not normal text") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat sat on the mat beside the old door"), // normal
      (2L, "ab cd ab cd ab cd ab cd ab cd"),              // pure loop
      (3L, "one two")                                     // single bigram
    ).toDF("doc_id", "text")
    val rows = df.select(col("doc_id"), Curation.ngramStats(TextOps.tokens(col("text")), 2).as("st"))
      .select(col("doc_id"), col("st.total").as("t"), col("st.dist").as("d"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(rows(2L)._1 == 9 && rows(2L)._2 == 2)  // 9 bigrams, 2 distinct
    assert(rows(3L) == ((1, 1)))
    val (t1, d1) = rows(1L)
    assert((t1 - d1) * 10 <= t1, "normal text must not trip the filter")
    assert((rows(2L)._1 - rows(2L)._2) * 10 > rows(2L)._1, "loop must trip it")
  }

  test("boilerplate removal: threshold is per-source document frequency") {
    import spark.implicits._
    // source A: 4 docs; line "NAV" in 2 of them (2 >= 4*0.5 → boilerplate,
    // removed — including BOTH its occurrences in doc 1), line "rare" in 1
    // (kept). Source B: 2 docs; "NAV" appears in only 1 (1 < 2*0.5 is
    // false — 1 >= 1 → removed there too at exactly the boundary), while
    // "only b" in 1 of 2 docs is also exactly at the 0.5 boundary.
    val df = Seq(
      (1L, "A", "NAV\nbody one\nNAV"),
      (2L, "A", "NAV\nbody two"),
      (3L, "A", "body three\nrare"),
      (4L, "A", "body four"),
      (5L, "B", "NAV\nbeta"),
      (6L, "B", "beta two")
    ).toDF("doc_id", "src", "text")
    val out = Curation.removeBoilerplate(df, "doc_id", "text", "src", 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text"), r.getAs[Long]("n_removed"))).toMap
    assert(out(1L) == (("body one", 2L)), "both occurrences of a boilerplate line go")
    assert(out(2L) == (("body two", 1L)))
    assert(out(3L)._1.contains("rare"), "sub-threshold line is kept")
    assert(out(4L) == (("body four", 0L)))
    // boundary: docFreq == nDocs * 0.5 counts as boilerplate (>=)
    assert(out(5L)._1 == "", "1 of 2 docs is exactly the 0.5 boundary — removed")
    assert(out(5L)._2 == 2L)
    assert(out(6L) == (("", 1L)))
  }

  test("boilerplate sets are isolated per source") {
    import spark.implicits._
    // "PROMO" saturates source A but appears once among many B docs: it
    // must be stripped from A and preserved in B.
    val a = (1 to 4).map(i => (i.toLong, "A", s"PROMO\ncontent a$i"))
    val b = (11 to 20).map(i => (i.toLong, "B", if (i == 11) "PROMO\ncontent b" else s"content b$i"))
    val out = Curation.removeBoilerplate((a ++ b).toDF("doc_id", "src", "text"),
        "doc_id", "text", "src", 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(a.forall { case (id, _, _) => !out(id).contains("PROMO") })
    assert(out(11L).contains("PROMO"), "line must survive in the source where it is rare")
  }

  test("chunking reassembles to the original token stream") {
    val chunks = Curation.chunkTokens(docs.where(col("doc_id") < 30),
      "doc_id", "text", 7)
    // per-doc invariants: chunk indexes are contiguous from 0, every chunk
    // but the last is full, and rejoining the chunk texts restores the
    // whitespace-normalized document
    val bad = chunks
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"),
        max("chunk_idx").as("max_idx"),
        sum(when(col("n_tokens") === 7, 1).otherwise(0)).as("full"))
      .where(col("max_idx") =!= col("n") - 1 ||
        col("full") < col("n") - 1)
      .count()
    assert(bad == 0)
    val rejoined = chunks
      .groupBy("doc_id")
      .agg(concat_ws(" ", array_compact(sort_array(
        collect_list(struct(col("chunk_idx"), col("chunk_text"))))
        .getField("chunk_text"))).as("rejoined"))
    val orig = docs.where(col("doc_id") < 30)
      .select(col("doc_id"), array_join(TextOps.tokens(col("text")), " ").as("norm"))
    val mismatches = rejoined.join(orig, "doc_id")
      // empty chunks ("" from empty docs) are dropped by concat_ws either way
      .where(col("rejoined") =!= col("norm"))
      .count()
    assert(mismatches == 0)
  }

  test("chunk sizes: full chunks then a remainder") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text") // 10 toks
    val rows = Curation.chunkTokens(df, "doc_id", "text", 4)
      .orderBy("chunk_idx")
      .select("chunk_idx", "n_tokens", "chunk_text")
      .collect()
    assert(rows.map(_.getInt(1)).toSeq == Seq(4, 4, 2))
    assert(rows(2).getString(2) == "i j")
  }

  test("overlapping chunks: stride windows, clipped tail, minimal cover") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e f g h i j"), (2L, "x y")).toDF("doc_id", "text")
    val rows = Curation.chunkTokensOverlap(df, "doc_id", "text",
        chunkSize = 4, stride = 2)
      .orderBy("doc_id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    // doc 1: n=10, size=4, stride=2 -> 1 + ceil(6/2) = 4 chunks
    val doc1 = rows.filter(_._1 == 1L)
    assert(doc1.map(_._4).toSeq ==
      Seq("a b c d", "c d e f", "e f g h", "g h i j"), doc1.mkString(", "))
    // short doc: single clipped chunk
    assert(rows.filter(_._1 == 2L).map(_._4).toSeq == Seq("x y"))
    // every consecutive pair overlaps by size - stride = 2 tokens
    doc1.sliding(2).foreach { case Array(a, b) =>
      assert(a._4.split(" ").takeRight(2).toSeq == b._4.split(" ").take(2).toSeq)
    }
  }

  test("overlapping chunks tail window is clipped, not padded") {
    import spark.implicits._
    // n=8, size=4, stride=3 -> 1 + ceil(4/3) = 3 chunks at starts 0,3,6;
    // the last covers only 2 tokens and must come back clipped
    val df = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val rows = Curation.chunkTokensOverlap(df, "doc_id", "text", 4, 3)
      .orderBy("chunk_idx").collect().map(r => (r.getInt(2), r.getString(3)))
    assert(rows.toSeq == Seq((4, "a b c d"), (4, "d e f g"), (2, "g h")))
  }

  test("redaction removes every PII match and piiCount counts them") {
    import spark.implicits._
    val df = Seq(
      "mail a@b.com and c.d+x@e.org or call +1-555-123-4567",
      "no pii here at all",
      "1-222-333-4444 bare phone").toDF("text")
    val out = df.select(
      Curation.redactPii(col("text")).as("red"),
      Curation.piiCount(col("text")).as("n"),
      Curation.piiCount(Curation.redactPii(col("text"))).as("n_after"))
      .collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(3, 0, 1))
    assert(out.forall(_.getInt(2) == 0), "redacted text must have zero PII")
    assert(out(0).getString(0).contains("<EMAIL>") &&
      out(0).getString(0).contains("<PHONE>"))
  }

  test("decontamination finds the benchmark docs themselves plus overlaps") {
    val bench = docs.where(col("doc_id") < 5)
    val hit = Curation.contaminatedIds(docs, bench, "doc_id", "text", 3)
    val hitIds = hit.collect().map(_.getLong(0)).toSet
    // every benchmark doc with >= 3 tokens shares all its grams with itself
    val expectedSelf = bench
      .where(size(TextOps.tokens(col("text"))) >= 3)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(expectedSelf.subsetOf(hitIds))
    // and a doc disjoint from the benchmark vocabulary is never flagged
    import spark.implicits._
    val clean = Seq((999999L, "zzq wwk vvx uun ttm")).toDF("doc_id", "text")
    val flagged = Curation.contaminatedIds(
      docs.select("doc_id", "text").unionByName(clean), bench, "doc_id", "text", 3)
      .where(col("doc_id") === 999999L).count()
    assert(flagged == 0)
  }

  test("contaminationScore counts distinct-gram overlap exactly") {
    import spark.implicits._
    val bench = Seq((100L, "a b c d")).toDF("doc_id", "text")
    val corpus = Seq(
      // grams: "a b c","b c d" — both in bench → 2/2 shared
      (1L, "a b c d"),
      // grams: "a b c","b c x","c x y" — 1/3 shared
      (2L, "a b c x y"),
      // no overlap at all → 0/3
      (3L, "p q r s t"),
      // shorter than n → absent from the output
      (4L, "a b")).toDF("doc_id", "text")
    val out = Curation.contaminationScore(corpus, bench, "doc_id", "text",
        n = 3, flagDenom = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(out(1L) == ((2L, 2L, 1)), out.toString)   // 2/2 >= 1/2 → flagged
    assert(out(2L) == ((3L, 1L, 0)), out.toString)   // 1/3 <  1/2 → kept
    assert(out(3L) == ((3L, 0L, 0)), out.toString)
    assert(!out.contains(4L), "docs below the gram length have no score")
  }

  test("trimContaminated cuts only the overlapping windows and rebuilds") {
    import spark.implicits._
    val bench = Seq((100L, "x y z")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a b c x y z d e f"),   // one hit at start=3 → tokens 3,4,5 cut
      (2L, "p q r s t"),           // clean → text UNCHANGED (not re-joined)
      (3L, "x y z"),               // fully covered → empties
      (4L, "a b")).toDF("doc_id", "text") // shorter than n → untouched
    val out = Curation.trimContaminated(corpus, bench, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "a b c d e f", out.toString)
    assert(out(2L) == "p q r s t")
    assert(out(3L) == "")
    assert(out(4L) == "a b")
    assert(out.size == 4, "every input row must come back")
  }

  test("trimContaminated: leading non-space whitespace does not shift the cut window") {
    import spark.implicits._
    val bench = Seq((100L, "x y z")).toDF("doc_id", "text")
    // SQL trim strips only spaces, so the leading tab yields an empty
    // first token: the hit sits at start=1 and the rebuild must index
    // against the SAME tokenization (a Java-trim rebuild would cut y z d)
    val corpus = Seq((1L, "\tx y z d")).toDF("doc_id", "text")
    val out = Curation.trimContaminated(corpus, bench, "doc_id", "text", n = 3)
      .head.getString(1)
    assert(out == " d", s"got '$out'")
  }

  test("trimContaminated: overlapping hit windows union, partial overlaps cut wide") {
    import spark.implicits._
    val bench = Seq((100L, "x y z w")).toDF("doc_id", "text") // grams: "x y z","y z w"
    // hits at starts 1 and 2 → covered tokens 1..4 union
    val corpus = Seq((1L, "a x y z w b")).toDF("doc_id", "text")
    val out = Curation.trimContaminated(corpus, bench, "doc_id", "text", n = 3)
      .head.getString(1)
    assert(out == "a b", s"got '$out'")
  }

  test("tokenHistogram buckets integer-exactly and sums token mass") {
    import spark.implicits._
    val df = Seq(
      ("s1", "a b c"),            // 3 tokens → bucket 0
      ("s1", "a b c d e"),        // 5 tokens → bucket 1
      ("s2", "a b c d e f g h")   // 8 tokens → bucket 2
    ).toDF("source", "text")
    val out = Curation.tokenHistogram(df, "source", "text", bucketWidth = 4)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(("s1", 0L)) == ((1L, 3L)), out.toString)
    assert(out(("s1", 1L)) == ((1L, 5L)), out.toString)
    assert(out(("s2", 2L)) == ((1L, 8L)), out.toString)
  }

  test("contaminationScore counts DISTINCT grams (repeats don't inflate)") {
    import spark.implicits._
    val bench = Seq((100L, "x y z")).toDF("doc_id", "text")
    // "x y z" appears twice but is ONE distinct gram of the doc
    val corpus = Seq((1L, "x y z w x y z")).toDF("doc_id", "text")
    val out = Curation.contaminationScore(corpus, bench, "doc_id", "text",
      n = 3, flagDenom = 20).collect()
    assert(out.length == 1)
    // distinct grams: "x y z","y z w","z w x","w x y" → 4 total, 1 shared
    assert(out(0).getLong(1) == 4L && out(0).getLong(2) == 1L)
  }

  test("htmlToText strips blocks/tags/comments and decodes entities ONCE") {
    import spark.implicits._
    val in = "<html><head><style>p{color:red}</style>" +
      "<script>var x=\"<div>\";</script></head><body><!-- note -->" +
      "<p>Hello &amp;lt; world</p>" +
      "<div>A&nbsp;B &quot;q&#39;s&quot; &gt;ok</div></body></html>"
    val got = Seq(Tuple1(in)).toDF("h")
      .select(Curation.htmlToText(org.apache.spark.sql.functions.col("h")))
      .head().getString(0)
    // "&amp;lt;" decodes to the LITERAL "&lt;" (no double decode)
    assert(got == "Hello &lt; world A B \"q's\" >ok", s"'$got'")
  }

  test("urlSignals parses hosts, domains, depth, params; urlFilter blocks") {
    import spark.implicits._
    val urls = Seq(
      "https://www.example.com/a/b/c?x=1&y=2",
      "https://docs.site.org:8443/path/",
      "https://10.0.0.7",
      "http://one.two.three.co/?q=a",
      "http://spam.bad.xyz/post")
    val df = urls.map(Tuple1(_)).toDF("url")
      .withColumn("s", Curation.urlSignals(org.apache.spark.sql.functions.col("url")))
    val got = df.select("url", "s.host", "s.domain", "s.tld", "s.path_depth",
        "s.n_params", "s.is_ip")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getString(3), r.getInt(4),
          r.getInt(5), r.getBoolean(6))).toMap
    assert(got(urls(0)) == (("www.example.com", "example.com", "com", 3, 2, false)))
    assert(got(urls(1)) == (("docs.site.org", "site.org", "org", 1, 0, false)))
    assert(got(urls(2)) == (("10.0.0.7", "10.0.0.7", "", 0, 0, true)))
    assert(got(urls(3)) == (("one.two.three.co", "three.co", "co", 0, 1, false)))
    val kept = Curation.urlFilter(urls.map(Tuple1(_)).toDF("url"), "url",
        blockedDomains = Seq("site.org"), blockedTlds = Seq("xyz"))
      .select("url").collect().map(_.getString(0)).toSet
    assert(kept == Set(urls(0), urls(2), urls(3)), kept.toString)
  }

  test("extractLinks pulls hrefs in order; linkGraph keeps absolute " +
      "cross-domain edges only") {
    import spark.implicits._
    val html = """<a href="https://a.news.org/x">n</a>""" +
      """ <A HREF='http://blog.net/y?q=1'>b</A>""" +
      """ <a href="/relative/path">r</a> <a href="#frag">f</a>""" +
      """ <a href='mailto:x@y.z'>m</a>""" +
      """ <a href="https://www.site.com/self">s</a>"""
    val links = Seq(Tuple1(html)).toDF("h")
      .select(Curation.extractLinks(org.apache.spark.sql.functions.col("h")))
      .head().getSeq[String](0)
    assert(links == Seq("https://a.news.org/x", "http://blog.net/y?q=1",
      "/relative/path", "mailto:x@y.z", "https://www.site.com/self"),
      links.toString)
    val edges = Curation.linkGraph(
        Seq(("https://www.site.com/p", html),
          ("https://www.site.com/q", html)).toDF("url", "html"),
        "url", "html")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // relative/fragment/mailto dropped, self-loop (site.com) dropped,
    // two pages' duplicate edges collapse to one pair each
    assert(edges == Set(("site.com", "news.org"), ("site.com", "blog.net")),
      edges.toString)
  }

  test("extractAnchors pairs each href with its text; anchorStats aggregates " +
      "cross-domain only") {
    import spark.implicits._
    val html =
      """<p><a href="https://news.org/a">Breaking  News</a>
        |<A HREF='http://blog.net/b'> Post </a>
        |<a class="x" href="https://news.org/c">breaking  news</a>
        |<a href="https://www.site.com/self">Self Nav</a>
        |<a href="/rel">Rel</a>
        |<a href="https://deep.org/d"><b>nested</b></a></p>""".stripMargin
    val pairs = Seq(("https://www.site.com/p", html)).toDF("url", "html")
      .select(explode(Curation.extractAnchors(col("html"))).as("a"))
      .select("a.href", "a.anchor")
      .as[(String, String)].collect().toSeq
    // extraction keeps document order and the raw (untrimmed) text; the
    // nested-markup anchor truncates at the first '<' → empty
    assert(pairs == Seq(
      ("https://news.org/a", "Breaking  News"),
      ("http://blog.net/b", " Post "),
      ("https://news.org/c", "breaking  news"),
      ("https://www.site.com/self", "Self Nav"),
      ("/rel", "Rel"),
      ("https://deep.org/d", "")), pairs.toString)
    val got = Curation.anchorStats(
        Seq(("https://www.site.com/p", html)).toDF("url", "html"),
        "url", "html")
      .as[(String, String, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    // lower(trim) folds the two news anchors together; self-domain nav,
    // relative link and the empty nested anchor all drop
    assert(got == Map(
      ("news.org", "breaking  news") -> 2L,
      ("blog.net", "post") -> 1L), got.toString)
  }

  test("canonicalUrl folds spellings of one resource; keeps real distinctions") {
    import spark.implicits._
    val urls = Seq(
      "http://site1.com/page9",
      "HTTPS://SITE1.COM/page9",
      "http://www.site1.com:80/page9",
      "http://site1.com/page9/",
      "http://site1.com/page9/index.html",
      "http://site1.com/page9?utm_source=news&fbclid=zz",
      "http://site1.com/page9?b=2&a=1",      // real params: distinct
      "https://site1.com/page9?a=1&b=2#s",   // ...but order/fragment fold
      "http://site1.com:8080/page9",         // NON-default port: distinct
      "http://site1.com/page9x")             // different path: distinct
    val got = urls.toDF("url")
      .select(Curation.canonicalUrl(col("url")).as("cu"))
      .collect().map(_.getString(0))
    assert(got.take(6).toSet == Set("site1.com/page9"), got.mkString("\n"))
    assert(got(6) == "site1.com/page9?a=1&b=2" && got(7) == got(6), got(7))
    assert(got(8) == "site1.com:8080/page9")
    assert(got(9) == "site1.com/page9x")
  }

  test("c4LineFilter: line rules rewrite, doc rules veto") {
    import spark.implicits._
    val docs = Seq(
      // three good lines + one unpunctuated + one short -> kept, rewritten
      (1L, "alpha beta gamma delta epsilon zeta.\nten nine eight seven six.\n" +
        "one two three four five!\nno terminal punct here at all\nshort line."),
      // javascript line drops -> only two survive -> too_few_lines
      (2L, "alpha beta gamma delta epsilon.\nthe JavaScript framework loads fast.\n" +
        "one two three four five."),
      // brace vetoes the whole doc even with good lines
      (3L, "alpha beta gamma delta epsilon.\none two three four five.\n" +
        "six seven eight nine ten.\nfunction() {"),
      // lorem ipsum vetoes
      (4L, "lorem ipsum dolor sit amet.\none two three four five.\n" +
        "six seven eight nine ten.\neleven twelve thirteen fourteen fifteen.")
    ).toDF("doc_id", "text")
    val out = Curation.c4LineFilter(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(3), r.getString(4))).toMap
    assert(out(1L)._3 == "kept" && out(1L)._1 == 5 && out(1L)._2 == 3, s"$out")
    assert(out(1L)._4 ==
      "alpha beta gamma delta epsilon zeta.\nten nine eight seven six.\n" +
        "one two three four five!", s"${out(1L)}")
    assert(out(2L)._3 == "too_few_lines" && out(2L)._2 == 2, s"$out")
    assert(out(3L)._3 == "brace" && out(3L)._4 == null, s"$out")
    assert(out(4L)._3 == "lorem_ipsum", s"$out")
  }
}
