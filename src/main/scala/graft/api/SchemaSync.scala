package graft.api

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Cross-instance schema propagation — the Spark-deployment analogue of
  * the reference's controller tier. The reference keeps authoritative
  * schemas in a controller and has every datanode poll and apply them
  * (/root/reference/controller/, schema fetch jobs in
  * cluster/metastore — ≈6k LoC of membership + push machinery); here the
  * authority is ONE VERSIONED FILE on the deployment's shared storage:
  *
  *   - every schema mutation on an instance publishes the store's full
  *     snapshot (tables + enum dictionaries) to `<dir>/schemas.json`,
  *     version-bumped and atomically renamed into place;
  *   - every instance polls the file and applies snapshots with a newer
  *     version than the last one it saw.
  *
  * Mutations should route through one instance at a time (the reference
  * makes the same assumption — the controller is the single schema
  * writer); concurrent writers resolve last-writer-wins at the file
  * rename. Enum dictionaries are part of the snapshot, so dictionary
  * ids stay consistent across instances — the invariant the binary
  * upsert wire depends on.
  */
final class SchemaSync(store: SchemaStore, dir: String,
    pollMillis: Long = 2000) extends AutoCloseable {

  private val file: Path = Paths.get(dir, "schemas.json")
  /** Convergence is gated on file CONTENT, not version ordering: two
    * concurrent publishers can both write version N+1 and the rename
    * loser would otherwise ignore the winner's (equal-versioned) file
    * forever, leaving the instances diverged. Hashing the bytes makes
    * every instance converge to whatever is on storage — true
    * last-writer-wins, losing mutations only in the concurrent-writer
    * case the single-writer deployment contract already excludes.
    */
  @volatile private var lastAppliedHash: String = ""
  @volatile private var running = false
  private var poller: Option[Thread] = None

  Files.createDirectories(Paths.get(dir))

  private def hashOf(bytes: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("MD5").digest(bytes))

  /** Publish the store's current snapshot, version-bumped past whatever
    * is currently on storage (the version is observability metadata; the
    * poller keys on content).
    */
  def publish(): Unit = synchronized {
    val onDisk = readFile().map(_._1).getOrElse(-1L)
    val version = onDisk + 1
    val (tables, enums) = store.snapshot
    val body = JObject(
      "version" -> JInt(version),
      "tables" -> JArray(tables.map(SchemaStore.renderTable).toList),
      "enums" -> JArray(enums.toList.sortBy(e => (e._1._1, e._1._2)).map {
        case ((table, column), cases) => JObject(
          "table" -> JString(table), "column" -> JString(column),
          "cases" -> JArray(cases.map(JString(_)).toList)): JValue
      }))
    val bytes = JsonMethods.compact(JsonMethods.render(body))
      .getBytes(StandardCharsets.UTF_8)
    val tmp = file.resolveSibling(
      s"schemas.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, bytes)
    Files.move(tmp, file, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // our own publish is by definition applied locally
    lastAppliedHash = hashOf(bytes)
  }

  /** Apply the shared snapshot if its content differs from the last one
    * applied. Returns true when something was applied.
    */
  def pull(): Boolean = synchronized {
    if (!Files.exists(file)) return false
    val bytes =
      try Files.readAllBytes(file)
      catch { case _: Throwable => return false }
    val h = hashOf(bytes)
    if (h == lastAppliedHash) return false
    parseSnapshot(bytes) match {
      case Some((_, tables, enums)) =>
        store.applySnapshot(tables, enums)
        lastAppliedHash = h
        true
      case None => false
    }
  }

  private def readFile(): Option[(Long, Seq[AqlTableSchema], Map[(String, String), Vector[String]])] = {
    if (!Files.exists(file)) return None
    try parseSnapshot(Files.readAllBytes(file))
    catch { case _: Throwable => None }
  }

  private def parseSnapshot(bytes: Array[Byte])
      : Option[(Long, Seq[AqlTableSchema], Map[(String, String), Vector[String]])] = {
    try {
      val j = JsonMethods.parse(new String(bytes, StandardCharsets.UTF_8))
      val version = j \ "version" match {
        case JInt(v) => v.toLong
        case _ => return None
      }
      val tables = (j \ "tables") match {
        case JArray(ts) => ts.map(t =>
          SchemaStore.parseTable(JsonMethods.compact(JsonMethods.render(t)))
            .copy(version = t \ "version" match {
              case JInt(v) => v.toInt
              case _ => 0
            }))
        case _ => Nil
      }
      val enums = (j \ "enums") match {
        case JArray(es) => es.map { e =>
          val cases = e \ "cases" match {
            case JArray(cs) => cs.collect { case JString(s) => s }.toVector
            case _ => Vector.empty
          }
          ((e \ "table", e \ "column") match {
            case (JString(t), JString(c)) => (t, c)
            case _ => return None
          }) -> cases
        }.toMap
        case _ => Map.empty[(String, String), Vector[String]]
      }
      Some((version, tables, enums))
    } catch {
      // a half-visible file cannot occur (atomic rename); a corrupt one
      // must not kill the poller — skip and retry next tick
      case _: Throwable => None
    }
  }

  def start(): Unit = {
    running = true
    val t = new Thread(() => {
      while (running) {
        try pull()
        catch { case _: Throwable => () }
        try Thread.sleep(pollMillis)
        catch { case _: InterruptedException => () }
      }
    }, s"schema-sync-$dir")
    t.setDaemon(true)
    t.start()
    poller = Some(t)
  }

  override def close(): Unit = {
    running = false
    poller.foreach(_.interrupt())
  }
}
