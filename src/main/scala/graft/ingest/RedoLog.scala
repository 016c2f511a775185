package graft.ingest

/** The upsert redo-log contract [[graft.api.GraftServer]] journals HTTP
  * ingest through — the reference supports BOTH backends behind one
  * interface (/root/reference/redolog/redo_log_manager.go: a file-backed
  * manager, file_redolog_manager.go, and a Kafka-backed one, kafka.go,
  * selected per table by config). [[UpsertJournal]] is the file backend;
  * [[KafkaRedoLog]] is the Kafka-shaped one.
  *
  * Semantics every backend must honor:
  *  - `append` is durable BEFORE the batch is applied to the overlay
  *    (write-ahead), and atomic per record — replay never yields a
  *    partial batch;
  *  - `replay(table)` returns every batch appended since the last
  *    `truncate(table)`, in append order;
  *  - `truncate(table)` marks everything replayed-so-far as archived —
  *    a later `replay` returns nothing for those records;
  *  - `size(table)` is the un-truncated byte volume (the size-triggered
  *    early-drain bound reads it).
  */
trait RedoLog {
  def append(table: String, kind: Byte, payload: Array[Byte]): Unit
  def replay(table: String): Seq[(Byte, Array[Byte])]
  def truncate(table: String): Unit
  def size(table: String): Long
  /** Tables with un-truncated records (construction-time replay set). */
  def tables: Seq[String]
  def close(): Unit
}

/** One table's redo TOPIC — the minimal Kafka wire surface the
  * Kafka-backed redo log needs (the connector jar is absent in this
  * environment, so the transport is injected; a deployment binds these
  * five calls to a `KafkaProducer.send` / `KafkaConsumer.seek+poll` /
  * consumer-group `commitSync` against topic `<namespace>-<table>`, the
  * reference's topic convention in redolog/kafka.go):
  *  - messages are offset-addressed and atomic (a torn append cannot
  *    exist — the broker either has the record or does not, which is why
  *    [[KafkaRedoLog]] needs none of [[UpsertJournal]]'s frame magic);
  *  - `committed` / `commit` are the consumer-group offset — durable on
  *    the BROKERS, so it survives the loss of the machine that wrote it.
  */
trait RedoTopic {
  /** Produce one record; returns its offset. */
  def append(value: Array[Byte]): Long
  /** All records with offset >= `from`, in offset order. */
  def readFrom(from: Long): Seq[(Long, Array[Byte])]
  /** The next offset a produce would get (end of topic). */
  def endOffset: Long
  /** The consumer-group committed offset (0 = never committed). */
  def committed: Long
  /** Commit the consumer-group offset. */
  def commit(offset: Long): Unit
}

/** Kafka-backed redo log: the write-ahead record of `/data/{table}`
  * batches lives in a per-table topic instead of a local file, so a
  * slice member's WAL SURVIVES MACHINE LOSS — a replacement member on a
  * fresh host replays the topic from the committed offset and serves the
  * overlay the dead member held (the file journal dies with its host;
  * this is the reference's exact reason for redolog/kafka.go).
  *
  * Truncation is an OFFSET COMMIT, not a delete: after a drain archives
  * the overlay, the consumer-group offset advances to the end of the
  * topic (the reference checkpoints the replayed kafka offset in its
  * metastore the same way; brokers age the records out by retention).
  * `size` is the byte volume past the committed offset, so the
  * size-triggered early-drain bound works unchanged.
  *
  * @param topicFor binds a table to its topic (a real deployment returns
  *   a producer/consumer pair on `<namespace>-<table>`; caching is the
  *   binder's concern — this class calls it once per table)
  * @param candidateTables the tables that MAY have a topic (catalog +
  *   schema-store names): a fresh replacement host has no local
  *   directory to enumerate, so the replay set comes from the metastore
  *   and is filtered to topics with un-committed records
  */
final class KafkaRedoLog(topicFor: String => RedoTopic,
    candidateTables: () => Seq[String]) extends RedoLog {

  private val topics = scala.collection.concurrent.TrieMap.empty[String, RedoTopic]
  private def topic(table: String): RedoTopic =
    topics.getOrElseUpdate(table, topicFor(table))

  /** Un-truncated byte volume per table, MAINTAINED rather than re-read:
    * `size` is on the ingest hot path (the size-triggered drain bound
    * checks it after every `/data/{table}` batch), and deriving it from
    * `readFrom(committed)` would fetch and materialize the entire
    * un-truncated topic from the brokers per request — O(backlog) broker
    * reads per small batch, O(backlog²) traffic over a fill cycle, where
    * the file backend's `size` is one stat. Seeded once per table from
    * the backlog (the same read recovery's `replay` performs anyway),
    * then append adds and truncate resets. Per-table appends are serial
    * under the server's table lock, so seed-then-add cannot double-count
    * a concurrent append.
    *
    * SINGLE-WRITER CONTRACT (same as the file journal's): exactly one
    * live member owns a table's topic. The counter mirrors the topic
    * only for THIS instance's appends/truncates — a second writer on
    * the same topic (e.g. a network-partitioned member its replacement
    * was started over) diverges it: the partitioned member's counter
    * ignores the replacement's offset commit (a spurious rotation at
    * worst) and the replacement never sees the partitioned member's
    * appends (an under-enforced bound). Fence ownership OUTSIDE the log
    * (the slice assignment already names one owner per table); `replay`
    * re-seeds from broker truth, so recovery always starts exact.
    */
  private val unTruncatedBytes =
    scala.collection.concurrent.TrieMap.empty[String, java.util.concurrent.atomic.AtomicLong]
  private def counter(table: String): java.util.concurrent.atomic.AtomicLong =
    unTruncatedBytes.getOrElseUpdate(table, {
      val t = topic(table)
      new java.util.concurrent.atomic.AtomicLong(
        t.readFrom(t.committed).map(_._2.length.toLong).sum)
    })

  /** Record value layout: `[kind:byte][payload]` — Kafka's own record
    * framing replaces the file journal's magic/length/torn-tail logic.
    */
  def append(table: String, kind: Byte, payload: Array[Byte]): Unit = {
    val value = new Array[Byte](payload.length + 1)
    value(0) = kind
    System.arraycopy(payload, 0, value, 1, payload.length)
    val c = counter(table) // seed from the pre-append backlog first
    topic(table).append(value)
    c.addAndGet(value.length.toLong)
  }

  def replay(table: String): Seq[(Byte, Array[Byte])] = {
    val t = topic(table)
    // the transport contract says offset order, but defend against what a
    // real consumer can hand back anyway: a multi-partition poll
    // interleaves, and a broker redelivery duplicates — SORT by offset
    // (apply order must be produce order or a replayed PK update regresses
    // to an older version) and DEDUP by offset (the same record applied
    // twice is harmless for PK upserts but not for every payload kind;
    // exactly-once replay should not lean on downstream idempotence)
    val records = t.readFrom(t.committed).sortBy(_._1).distinctBy(_._1)
    // gap check: the WAL's offsets must cover [committed, endOffset)
    // CONTIGUOUSLY. A hole means the brokers LOST un-replayed records —
    // a compacted redo topic (redo topics must be delete-retention,
    // non-transactional: compaction keeps latest-per-key, a WAL needs
    // every record; transactional producers leave control-record gaps)
    // or retention that aged out records before this replay. That is
    // unrecoverable data loss and must fail LOUDLY, never serve short.
    val committed = t.committed
    val end = t.endOffset
    val expected = end - committed
    if (records.length.toLong != expected ||
        records.headOption.exists(_._1 != committed) ||
        records.lastOption.exists(_._1 != end - 1))
      throw new IllegalStateException(
        s"redo topic for table $table lost records: committed=$committed " +
          s"end=$end but replay returned ${records.length} record(s) " +
          s"[${records.headOption.map(_._1).getOrElse(-1L)}..." +
          s"${records.lastOption.map(_._1).getOrElse(-1L)}] — a compacted " +
          "or retention-aged redo topic is unrecoverable data loss; " +
          "redo topics must be delete-retention with retention > drain interval")
    // replay reads the whole backlog anyway — re-seed the counter from
    // broker truth, so a recovery after any counter/broker divergence
    // (see the single-writer contract on `unTruncatedBytes`) starts exact
    unTruncatedBytes.put(table,
      new java.util.concurrent.atomic.AtomicLong(
        records.map(_._2.length.toLong).sum))
    records.map { case (_, value) =>
      (value(0), java.util.Arrays.copyOfRange(value, 1, value.length))
    }
  }

  def truncate(table: String): Unit = {
    val t = topic(table)
    t.commit(t.endOffset)
    counter(table).set(0L)
  }

  def size(table: String): Long = counter(table).get

  def tables: Seq[String] =
    candidateTables().distinct.sorted.filter { t =>
      val tp = topic(t)
      tp.endOffset > tp.committed
    }

  def close(): Unit = { topics.clear(); unTruncatedBytes.clear() }
}
