package graft.sinks

import java.io.BufferedOutputStream
import java.util.zip.GZIPOutputStream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gzip-JSONL shard sink — the interchange deliverable every downstream
  * training or labeling stack consumes (one JSON object per line,
  * size-bounded compressed shards). The row→JSON encoding happens in
  * CATALYST (`to_json(struct(*))`, codegen'd, Spark's canonical escaping)
  * BEFORE the shard write, so tasks only stream pre-encoded lines; a
  * `spark.read.json` over the output round-trips the rows exactly.
  *
  * [[TrainingShards]]' discipline throughout: deterministic shard
  * assignment and order via range partitioning on the id column (same
  * corpus → same shards across runs), one shard file per partition
  * written map-side with no driver involvement, fixed-size buffers
  * (never a shard in memory), dot-temp + rename per shard (readers never
  * see a torn file), and a `_manifest.json` written LAST whose presence
  * certifies every shard it lists — with per-shard row and uncompressed
  * byte counts, the completeness check a consumer runs without
  * decompressing anything.
  *
  * At 100 TB this is tens of thousands of ~uniform gzip members, each an
  * independent unit of work for the consumer — exactly the Common Crawl
  * / open-dataset distribution shape.
  */
object JsonlShards {

  /** Write every column of `df` as gzip JSONL shards under `outDir`.
    *
    * @param idCol  integral column giving the deterministic global order
    *               (shard files ascend with it)
    * @param shards shard count (range partitions of idCol); 0 = the
    *               session's shuffle-partition count
    * @return per-shard (shard, rows, bytes) DataFrame — `bytes` counts
    *         the uncompressed JSONL payload, the manifest's content
    */
  def write(df: DataFrame, idCol: String, outDir: String,
      shards: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts =
      if (shards > 0) shards
      else spark.sessionState.conf.numShufflePartitions
    val root = new Path(outDir)
    val rootFs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    rootFs.mkdirs(root)
    val ordered = df
      .select(col(idCol).cast("long").as("__id"),
        to_json(struct(df.columns.map(col): _*)).as("__line"))
      .repartitionByRange(parts, col("__id"))
      .sortWithinPartitions("__id")
    val dirStr = root.toString
    // stamp the output dir as owned by THIS run before any task commits:
    // the zombie-attempt replace gate in ShardIo.commit
    val runId = ShardIo.stampRun(rootFs, root)
    // the SESSION's Hadoop conf must reach the executors (object-store
    // credentials/endpoints live there, not in `new Configuration()`)
    val confBc = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val stats = ordered.queryExecution.toRdd.mapPartitionsWithIndex { (idx, iter) =>
      val fs = new Path(dirStr).getFileSystem(confBc.value.value)
      val name = f"part-$idx%05d.jsonl.gz"
      val tmp = ShardIo.attemptTmp(dirStr, name)
      val out = new GZIPOutputStream(
        new BufferedOutputStream(fs.create(tmp, true), 1 << 16))
      var rows = 0L
      var bytes = 0L
      while (iter.hasNext) {
        val r = iter.next()
        val line = r.getUTF8String(1).getBytes
        out.write(line); out.write('\n')
        rows += 1; bytes += line.length + 1
      }
      out.close()
      ShardIo.commit(fs, tmp, new Path(dirStr, name), runId)
      Iterator((name, rows, bytes))
    }.collect() // O(#shards) tuples — the manifest, not the data
    val manifest = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render {
        import org.json4s.JsonDSL._
        ("format" -> "graft-jsonl-shards-v1") ~
          ("compression" -> "gzip") ~
          ("shards" -> stats.sortBy(_._1).toList.map { case (n, r, b) =>
            ("name" -> n) ~ ("rows" -> r) ~ ("bytes" -> b)
          })
      })
    val mTmp = new Path(root, "._manifest.json.tmp")
    val mOut = rootFs.create(mTmp, true)
    mOut.write(manifest.getBytes("UTF-8")); mOut.close()
    rootFs.delete(new Path(root, "_manifest.json"), false)
    require(rootFs.rename(mTmp, new Path(root, "_manifest.json")),
      "manifest rename failed")
    import spark.implicits._
    stats.toSeq.sortBy(_._1).toDF("shard", "rows", "bytes")
  }
}
