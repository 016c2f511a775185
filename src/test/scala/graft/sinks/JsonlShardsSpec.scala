package graft.sinks

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JsonlShardsSpec extends SparkSpec {
  import spark.implicits._

  test("round-trips rows exactly, including escaping-hostile text") {
    val dir = Files.createTempDirectory("jsonl_rt").toString
    val rows = Seq(
      (1L, "plain text", "en"),
      (2L, "line\nbreak and \"quotes\" and a tab\there", "en"),
      (3L, "unicode: café — 中文", "zh"),
      (4L, "backslash \\ and brace { } and null-ish", "en"))
    val df = rows.toDF("doc_id", "text", "lang")
    JsonlShards.write(df, "doc_id", dir, shards = 2)
    val back = spark.read.json(s"$dir/part-*.jsonl.gz")
      .select("doc_id", "text", "lang")
      .as[(Long, String, String)].collect().toSet
    assert(back == rows.toSet,
      s"read-back diverged: $back vs ${rows.toSet}")
  }

  test("shards ascend with the id column; manifest counts match the files") {
    val dir = Files.createTempDirectory("jsonl_ord").toString
    val df = (0L until 1000L).map(i => (i, s"doc $i body")).toDF("doc_id", "text")
    val manifest = JsonlShards.write(df, "doc_id", dir, shards = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(manifest.map(_._1).toSeq == manifest.map(_._1).sorted.toSeq)
    assert(manifest.map(_._2).sum == 1000L)
    // per-file id ranges must not interleave across ascending shard names
    val ranges = manifest.map { case (name, _, _) =>
      val ids = spark.read.json(s"$dir/$name").select("doc_id")
        .as[Long].collect()
      (name, ids.min, ids.max)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((na, _, maxA), (nb, minB, _)) =>
        assert(maxA < minB, s"shard ranges interleave: $na($maxA) vs $nb($minB)")
      case _ =>
    }
    // manifest byte counts = uncompressed payload of each file
    manifest.foreach { case (name, _, bytes) =>
      val in = new java.util.zip.GZIPInputStream(
        new java.io.FileInputStream(s"$dir/$name"))
      var n = 0L; val buf = new Array[Byte](8192)
      var r = in.read(buf)
      while (r > 0) { n += r; r = in.read(buf) }
      in.close()
      assert(n == bytes, s"$name: manifest says $bytes, file holds $n")
    }
    // _manifest.json exists and lists every shard
    val m = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/_manifest.json")), "UTF-8")
    manifest.foreach { case (name, _, _) => assert(m.contains(name)) }
    assert(!new java.io.File(dir).listFiles().exists(_.getName.endsWith(".tmp")),
      "no torn temp files may remain")
  }

  test("deterministic: two writes of the same corpus produce identical manifests") {
    val df = (0L until 500L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val d1 = Files.createTempDirectory("jsonl_a").toString
    val d2 = Files.createTempDirectory("jsonl_b").toString
    val m1 = JsonlShards.write(df, "doc_id", d1, shards = 3).collect().toSeq
    val m2 = JsonlShards.write(df, "doc_id", d2, shards = 3).collect().toSeq
    assert(m1.map(_.toString) == m2.map(_.toString), s"$m1 vs $m2")
  }

  test("re-running write() into a non-empty directory overwrites committed " +
      "shards instead of failing forever (task-retry semantics)") {
    val dir = Files.createTempDirectory("jsonl_rerun").toString
    val df = (0L until 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val m1 = JsonlShards.write(df, "doc_id", dir, shards = 2)
      .as[(String, Long, Long)].collect().toSeq
    // second write over the same committed files — the old rename-only
    // commit returned false here and the task failed every retry
    val m2 = JsonlShards.write(df, "doc_id", dir, shards = 2)
      .as[(String, Long, Long)].collect().toSeq
    assert(m1 == m2, s"$m1 vs $m2")
    val back = spark.read.json(s"$dir/part-*.jsonl.gz").count()
    assert(back == 100L)
    // no stray attempt tmp files survive a successful commit
    val leftovers = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.endsWith(".tmp"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
  }

  test("a re-run with CHANGED data replaces stale shards; a zombie from a " +
      "superseded run can never replace the new run's shard") {
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("jsonl_zombie").toString
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

    // run 1 commits; run 2 (changed data) must overwrite — the current
    // run is allowed through the replace gate
    JsonlShards.write((0L until 50L).map(i => (i, s"old $i")).toDF("doc_id", "text"),
      "doc_id", dir, shards = 1)
    JsonlShards.write((0L until 80L).map(i => (i, s"new longer text $i"))
      .toDF("doc_id", "text"), "doc_id", dir, shards = 1)
    assert(spark.read.json(s"$dir/part-*.jsonl.gz").count() == 80L,
      "a changed-data re-run must replace the stale shard")
    val committedLen = fs.getFileStatus(new Path(dir, "part-00000.jsonl.gz")).getLen

    // zombie: an attempt still holding run 1's id (the dir was re-stamped
    // by run 2) tries to commit a different-length stale tmp over the
    // committed shard — the gate must refuse and leave the shard intact.
    // Before the run-id gate this path DELETED the new shard and renamed
    // the stale bytes in (the advice-flagged inversion of rename-first).
    val staleTmp = new Path(dir, ".part-00000.jsonl.gz.a99.tmp")
    val out = fs.create(staleTmp, true)
    out.write(Array.fill[Byte](123)('z')); out.close()
    val e = intercept[IllegalArgumentException] {
      ShardIo.commit(fs, staleTmp, new Path(dir, "part-00000.jsonl.gz"),
        runId = "superseded-run-id")
    }
    assert(e.getMessage.contains("zombie"), e.getMessage)
    assert(fs.getFileStatus(new Path(dir, "part-00000.jsonl.gz")).getLen
      == committedLen, "the zombie must not have touched the committed shard")
    assert(spark.read.json(s"$dir/part-*.jsonl.gz").count() == 80L)
  }
}
