package graft.sinks

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrainingShardsSpec extends SparkSpec {

  private def corpus(n: Int, maxTok: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val len = 1 + (i * 7) % 9
      (i.toLong, (0 until len).map(j => (i * 31 + j * 13) % maxTok))
    }.toDF("doc_id", "tokens")
  }

  test("round trip: write then read preserves order, ids and values (u16)") {
    val dir = Files.createTempDirectory("shards16").toString + "/out"
    val df = corpus(200, 50000)
    val stats = TrainingShards.write(df, "doc_id", "tokens", dir, vocabSize = 50000, shards = 4)
    val st = stats.collect()
    assert(st.length == 4)
    assert(st.map(_.getAs[Long]("n_seqs")).sum == 200L)
    assert(st.forall(_.getAs[Int]("dtype_bytes") == 2))
    // bin files really are 2 bytes per token
    st.foreach { r =>
      val name = r.getAs[String]("shard")
      val len = Files.size(Paths.get(dir, s"$name.bin"))
      assert(len == 2L * r.getAs[Long]("n_tokens"), s"$name bin size")
    }
    val back = TrainingShards.read(spark, dir)
      .orderBy("shard", "seq_idx").collect()
    val expected = df.orderBy("doc_id").collect()
    assert(back.length == expected.length)
    back.zip(expected).foreach { case (b, e) =>
      assert(b.getSeq[Int](2) == e.getSeq[Int](1),
        s"seq ${b.getLong(1)} of ${b.getString(0)}")
    }
  }

  test("wide vocab uses i32 and survives ids past 65535") {
    val dir = Files.createTempDirectory("shards32").toString + "/out"
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0, 70000, 123456)),
      (2L, Seq(99999, 1))).toDF("doc_id", "tokens")
    val st = TrainingShards.write(df, "doc_id", "tokens", dir,
      vocabSize = 200000, shards = 1).collect()
    assert(st.head.getAs[Int]("dtype_bytes") == 4)
    val back = TrainingShards.read(spark, dir).orderBy("seq_idx")
      .select("tokens").collect().map(_.getSeq[Int](0))
    assert(back.toSeq == Seq(Seq(0, 70000, 123456), Seq(99999, 1)))
  }

  test("token at or past vocabSize fails loudly, not truncated") {
    val dir = Files.createTempDirectory("shardsbad").toString + "/out"
    import spark.implicits._
    val df = Seq((1L, Seq(1, 65536))).toDF("doc_id", "tokens")
    val e = intercept[org.apache.spark.SparkException] {
      TrainingShards.write(df, "doc_id", "tokens", dir, vocabSize = 65536, shards = 1)
    }
    assert(e.getMessage.contains("outside") ||
      (e.getCause != null && e.getCause.getMessage.contains("outside")))
  }

  test("read refuses a directory without a manifest") {
    val dir = Files.createTempDirectory("shardsnone").toString
    val e = intercept[IllegalArgumentException] {
      TrainingShards.read(spark, dir)
    }
    assert(e.getMessage.contains("_manifest"))
  }

  test("deterministic: two writes of the same frame are byte-identical") {
    val d1 = Files.createTempDirectory("shardsa").toString + "/out"
    val d2 = Files.createTempDirectory("shardsb").toString + "/out"
    val df = corpus(60, 1000).repartition(7) // scramble input partitioning
    TrainingShards.write(df, "doc_id", "tokens", d1, vocabSize = 1000, shards = 3)
    TrainingShards.write(df, "doc_id", "tokens", d2, vocabSize = 1000, shards = 3)
    (0 until 3).foreach { i =>
      val n = f"part-$i%05d"
      Seq(".bin", ".idx").foreach { ext =>
        val a = Files.readAllBytes(Paths.get(d1, n + ext))
        val b = Files.readAllBytes(Paths.get(d2, n + ext))
        assert(java.util.Arrays.equals(a, b), s"$n$ext differs")
      }
    }
  }

  test("empty sequences are representable (length 0, no bytes)") {
    val dir = Files.createTempDirectory("shardsempty").toString + "/out"
    import spark.implicits._
    val df = Seq((1L, Seq.empty[Int]), (2L, Seq(5))).toDF("doc_id", "tokens")
    TrainingShards.write(df, "doc_id", "tokens", dir, vocabSize = 10, shards = 1)
    val back = TrainingShards.read(spark, dir).orderBy("seq_idx")
      .select("tokens").collect().map(_.getSeq[Int](0))
    assert(back.toSeq == Seq(Seq.empty[Int], Seq(5)))
  }
}
