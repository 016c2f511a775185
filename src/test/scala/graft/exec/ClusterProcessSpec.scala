package graft.exec

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths}

import graft.{SparkSpec, Tables}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Multi-PROCESS cluster integration: forks real JVMs — `ServerMain`
  * slice members, `BrokerMain`, `RebalanceMain` (one-shot AND watch
  * mode) — on localhost ports and drives the soak op mix over real HTTP,
  * including `kill -9` of a member MID-DRAIN (process death, not object
  * teardown) and a restart that must replay the journal to exactly-once.
  *
  * This is the boundary the in-process [[ClusterSoakSpec]] cannot cross:
  * JVM-death torn state, real port binding/registration races, two
  * processes contending on shared-archive filesystem locks, and the
  * fence/marker protocol exercised by genuinely separate processes. The
  * reference ships the analogous harness as integration tests over real
  * datanode+broker processes (/root/reference/integration/).
  *
  * Fixture is sf0.001 (smallest) — each member is a full SparkSession
  * JVM; the point is the process topology, not data volume.
  */
class ClusterProcessSpec extends SparkSpec {

  // ---------- process harness ------------------------------------------------

  private val javaBin = System.getProperty("java.home") + "/bin/java"
  private val testClasspath = System.getProperty("java.class.path")

  /** Spark 4.x on JDK 17 module flags — same list as build.sbt (normally
    * injected by spark-submit / the sbt fork; a bare `java` fork needs
    * them explicitly, exactly like a production `java -cp` deployment).
    */
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  /** Fork `mainClass` as a separate JVM. Classpath rides the CLASSPATH
    * env var (arg-length safe); stdout+stderr tee to a log file for
    * post-mortem. CWD is the repo root so the shared testdata fixture
    * paths resolve identically to the test JVM's.
    */
  private def fork(mainClass: String, env: Map[String, String],
      logFile: Path, xmx: String = "2g"): Process = {
    val cmd = (Seq(javaBin, s"-Xmx$xmx", "-Dspark.ui.enabled=false") ++
      addOpens ++ Seq(mainClass))
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(new java.io.File(System.getProperty("user.dir")))
    pb.redirectErrorStream(true)
    pb.redirectOutput(logFile.toFile)
    val e = pb.environment()
    e.put("CLASSPATH", testClasspath)
    env.foreach { case (k, v) => e.put(k, v) }
    pb.start()
  }

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val http = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(5)).build()

  private def post(url: String, body: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(URI.create(url))
      .timeout(java.time.Duration.ofSeconds(120))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def get(url: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(URI.create(url))
      .timeout(java.time.Duration.ofSeconds(30)).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def waitHealthy(port: Int, what: String, log: Path,
      timeoutSec: Int = 240): Unit = {
    val deadline = System.nanoTime() + timeoutSec * 1000000000L
    while (System.nanoTime() < deadline) {
      try {
        if (get(s"http://localhost:$port/health").statusCode() == 200) return
      } catch { case _: Exception => () }
      Thread.sleep(300)
    }
    fail(s"$what on port $port never became healthy; log tail:\n${tail(log)}")
  }

  private def tail(log: Path, lines: Int = 40): String =
    if (Files.exists(log))
      scala.jdk.CollectionConverters.ListHasAsScala(
        Files.readAllLines(log)).asScala.takeRight(lines).mkString("\n")
    else "(no log)"

  // ---------- cluster model --------------------------------------------------

  /** One forked slice member and everything needed to restart it. */
  private final case class Member(slice: String, var port: Int,
      var proc: Process, env: Map[String, String], logDir: String) {
    def log: Path = Paths.get(logDir, s"$slice-$port.log")
    def base: String = s"http://localhost:$port"
  }

  private final class Cluster(val shared: String, val topo: String,
      val members: String, val localRoot: String, val logDir: String) {
    var slices: Map[String, Member] = Map.empty
    var brokerPort: Int = 0
    var brokerProc: Process = _
    var extra = List.empty[Process] // watchers etc.

    def memberEnv(slice: String, port: Int): Map[String, String] = Map(
      "SPARK_GRAFT_SF_DIR" -> sfDir,
      "SPARK_GRAFT_PORT" -> port.toString,
      "SPARK_GRAFT_CPUS" -> "2",
      "SPARK_GRAFT_SLICE" -> slice,
      "SPARK_GRAFT_LOCAL_STORE" -> s"$localRoot/$slice",
      "SPARK_GRAFT_TOPOLOGY_DIR" -> topo,
      "SPARK_GRAFT_SHARED_ARCHIVE" -> shared,
      "SPARK_GRAFT_MEMBERS_DIR" -> members,
      "SPARK_GRAFT_ARCHIVE_ROOT" -> s"$localRoot/$slice-archive-root",
      "SPARK_GRAFT_TICK_SECONDS" -> "2")

    def startMember(slice: String): Member = {
      val port = freePort()
      val env = memberEnv(slice, port)
      val m = Member(slice, port, null, env, logDir)
      m.proc = fork("graft.ServerMain", env, m.log)
      slices += slice -> m
      m
    }

    /** Restart after a kill: same durable state, NEW port (no TIME_WAIT
      * bind races) — the production replace-a-member flow.
      */
    def restart(slice: String): Member = {
      val m = slices(slice)
      m.port = freePort()
      m.proc = fork("graft.ServerMain", memberEnv(slice, m.port), m.log)
      m
    }

    def startBroker(): Unit = {
      brokerPort = freePort()
      brokerProc = fork("graft.BrokerMain", Map(
        "SPARK_GRAFT_MEMBERS_DIR" -> members,
        "SPARK_GRAFT_TOPOLOGY_DIR" -> topo,
        "SPARK_GRAFT_BROKER_PORT" -> brokerPort.toString),
        Paths.get(logDir, "broker.log"), xmx = "512m")
    }

    def killAll(): Unit = {
      (slices.values.map(_.proc) ++ Option(brokerProc) ++ extra)
        .filter(_ != null).foreach(_.destroyForcibly())
      (slices.values.map(_.proc) ++ Option(brokerProc) ++ extra)
        .filter(_ != null).foreach(_.waitFor())
    }

    def logs: String = slices.values.map(m =>
      s"---- ${m.slice} ----\n${tail(m.log)}").mkString("\n") +
      s"\n---- broker ----\n${tail(Paths.get(logDir, "broker.log"))}"
  }

  /** Shared-fixture prep + initial 2-member assignment; returns a cluster
    * with nothing forked yet.
    */
  private def prepCluster(tag: String, processRebalance: Boolean): Cluster = {
    Tables.eventsArchived(spark, sfDir) // build the day-partitioned fixture once
    val c = new Cluster(shared = tmp(s"$tag-shared"), topo = tmp(s"$tag-topo"),
      members = tmp(s"$tag-members"), localRoot = tmp(s"$tag-local"),
      logDir = tmp(s"$tag-logs"))
    SliceBootstrap.copySlice(spark, Tables.eventsArchivePath(sfDir), c.shared)
    Files.createDirectories(Paths.get(c.localRoot, "a"))
    Files.createDirectories(Paths.get(c.localRoot, "b"))
    if (processRebalance) {
      // the operator flow: a one-shot RebalanceMain process computes and
      // publishes the initial placement
      val log = Paths.get(c.logDir, "rebalance-initial.log")
      val p = fork("graft.RebalanceMain", Map(
        "SPARK_GRAFT_SHARED_ARCHIVE" -> c.shared,
        "SPARK_GRAFT_TOPOLOGY_DIR" -> c.topo,
        "SPARK_GRAFT_SLICE_DIRS" -> s"a=${c.localRoot}/a,b=${c.localRoot}/b",
        "SPARK_GRAFT_CPUS" -> "2"), log)
      assert(p.waitFor() == 0, s"initial RebalanceMain failed:\n${tail(log)}")
    } else {
      SliceRebalance.rebalance(spark, c.shared,
        Map("a" -> s"${c.localRoot}/a", "b" -> s"${c.localRoot}/b"), c.topo)
    }
    assert(SliceRebalance.read(c.topo).exists(_.owners.keySet == Set("a", "b")))
    c
  }

  // ---------- query + model helpers -----------------------------------------

  private def evQuery(measure: String): String =
    s"""{"table": "events",
        "measures": [{"alias": "value", "sqlExpression": "$measure"}],
        "dimensions": [{"alias": "et", "sqlExpression": "event_type"}],
        "timeFilter": {"from": "1704067200", "to": "1900000000"},
        "now": 1900000000}"""

  private def leafSum(v: JValue): Double = v match {
    case JObject(fields) => fields.map { case (_, c) => leafSum(c) }.sum
    case JDouble(d) => d
    case JInt(i) => i.toDouble
    case JLong(l) => l.toDouble
    case JDecimal(d) => d.toDouble
    case JNull => 0.0
    case other => fail(s"unexpected leaf $other")
  }

  /** One measure through the broker; retries while the tier is settling
    * (member registrations, post-restart fail-over) but NEVER retries an
    * ANSWERED query — a wrong answer fails immediately.
    */
  private def brokerMeasure(c: Cluster, measure: String,
      settleSec: Int = 60): Double = {
    val deadline = System.nanoTime() + settleSec * 1000000000L
    var last = "(no attempt)"
    while (System.nanoTime() < deadline) {
      try {
        val r = post(s"http://localhost:${c.brokerPort}/query/aql",
          s"""{"queries": [${evQuery(measure)}]}""")
        if (r.statusCode() == 200)
          return leafSum((JsonMethods.parse(r.body()) \ "results")(0))
        last = s"${r.statusCode()}: ${r.body().take(300)}"
      } catch { case e: Exception => last = e.toString }
      Thread.sleep(500)
    }
    fail(s"broker never answered $measure; last: $last\n${c.logs}")
  }

  private def assertCounts(c: Cluster, hint: String,
      expCount: Double, expSum: Double): Unit = {
    val cnt = brokerMeasure(c, "count(*)")
    assert(cnt == expCount, s"$hint: count $cnt != $expCount\n${c.logs}")
    val s = brokerMeasure(c, "sum(value)")
    assert(math.abs(s - expSum) <= 1e-6 * math.max(1.0, math.abs(expSum)),
      s"$hint: sum $s != $expSum\n${c.logs}")
  }

  private def ingestRows(base: String,
      rows: Seq[(Long, String, Double)]): Unit = {
    val body = rows.map { case (id, ts, v) =>
      s"""{"event_id": $id, "ts": "$ts", "user_id": ${id % 97},
          "event_type": "it_et", "value": $v, "props": "{}"}"""
    }.mkString("[", ",", "]")
    val r = post(s"$base/data/events", body)
    assert(r.statusCode() == 200, s"ingest failed: ${r.body()}")
    assert(r.body().contains(s""""rowsInserted":${rows.size}"""), r.body())
  }

  /** Kick a drain and `kill -9` the member mid-flight. Returns once the
    * process is dead. The drain may or may not have committed — both are
    * legal torn states the restart must resolve to exactly-once.
    */
  private def killMidDrain(m: Member, delayMs: Long): Unit = {
    val t = new Thread(() => {
      try post(s"${m.base}/dbg/trigger/events/backfill", "")
      catch { case _: Exception => () } // connection torn by the kill: expected
    })
    t.setDaemon(true)
    t.start()
    Thread.sleep(delayMs)
    m.proc.destroyForcibly()
    m.proc.waitFor()
  }

  // ---------- the deterministic drill ----------------------------------------

  test("process cluster drill: rebalance, ingest, drain, routed PK update, " +
    "kill -9 mid-drain, journal replay, watch-mode grow — exactly-once throughout") {
    val c = prepCluster("cpd", processRebalance = true)
    try {
      // archived victim for the PK-update op, picked BEFORE any mutation
      val a0 = SliceRebalance.read(c.topo).get
      val bDay = a0.owners("b").last
      import org.apache.spark.sql.functions.{col, date_format}
      val victim = spark.read.parquet(c.shared)
        .where(col(graft.ingest.Archiver.DayCol) === bDay)
        .select(col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
          col("value")).first()
      val (vid, vts, vOld) =
        (victim.getLong(0), victim.getString(1), victim.getDouble(2))

      val ma = c.startMember("a")
      val mb = c.startMember("b")
      c.startBroker()
      waitHealthy(ma.port, "member a", ma.log)
      waitHealthy(mb.port, "member b", mb.log)
      waitHealthy(c.brokerPort, "broker", Paths.get(c.logDir, "broker.log"))

      val c0 = brokerMeasure(c, "count(*)", settleSec = 120)
      val s0 = brokerMeasure(c, "sum(value)")
      assert(c0 > 0)
      var expCount = c0
      var expSum = s0

      // ---- fresh-day ingest at its extended owner, visible pre-drain ------
      val day1 = "2030-01-01"
      val owner1 = c.slices(SliceRebalance.extendedOwner(a0, day1).get)
      ingestRows(owner1.base, (1 to 3).map(i =>
        (910000000L + i, s"$day1 10:0$i:00", 7.0)))
      expCount += 3; expSum += 21.0
      assertCounts(c, "after fresh-day ingest", expCount, expSum)

      // ---- manual drain trigger: fresh day promotes to the shared archive -
      val tr = post(s"${owner1.base}/dbg/trigger/events/backfill", "")
      assert(tr.statusCode() == 200, tr.body())
      assert(SliceBootstrap.localDays(spark, c.shared).contains(day1),
        "drain must land the fresh day in the shared archive")
      assertCounts(c, "after drain", expCount, expSum)

      // ---- PK update POSTed at the NON-owner: ownership routing ----------
      val nonOwner = c.slices(if (a0.owners("a").contains(bDay)) "b" else "a")
      val upd = post(s"${nonOwner.base}/data/events",
        s"""[{"event_id": $vid, "ts": "$vts", "user_id": 1,
              "event_type": "routed_et", "value": ${vOld + 1000.0},
              "props": "{}"}]""")
      assert(upd.statusCode() == 200 && upd.body().contains("\"rowsInserted\":1"),
        upd.body())
      expSum += 1000.0 // update, not insert: count unchanged
      assertCounts(c, "after routed PK update", expCount, expSum)

      // ---- kill -9 MID-DRAIN, then restart: journal replay to exactly-once
      val day2 = "2030-01-02"
      val a1 = SliceRebalance.read(c.topo).get
      val victimSlice = SliceRebalance.extendedOwner(a1, day2).get
      val vm = c.slices(victimSlice)

      // binary-wire table on the victim: UpsertClient batch must ALSO
      // survive the kill via binary journal replay
      assert(post(s"${vm.base}/schema/tables", """{
        "name": "wire_rides", "isFactTable": true,
        "columns": [
          {"name": "request_at", "type": "Uint32"},
          {"name": "ride_id", "type": "Int64"},
          {"name": "fare", "type": "Float32"}
        ],
        "primaryKeyColumns": [1]
      }""").statusCode() == 200)
      val wire = new graft.api.UpsertClient(vm.base)
      assert(wire.insert("wire_rides", Seq("request_at", "ride_id", "fare"),
        (1 to 4).map(i => Seq[Any](1706572800L + i, i.toLong, 2.5f))) == 4L)

      ingestRows(vm.base, (1 to 5).map(i =>
        (920000000L + i, s"$day2 11:0$i:00", 3.0)))
      expCount += 5; expSum += 15.0

      killMidDrain(vm, delayMs = 700)
      val vm2 = c.restart(victimSlice)
      waitHealthy(vm2.port, s"restarted $victimSlice", vm2.log)
      assertCounts(c, "after kill -9 mid-drain + restart", expCount, expSum)

      // the binary-wire batch replayed from the journal too
      val wq = post(s"${vm2.base}/query/aql", """{"queries": [{
        "table": "wire_rides",
        "measures": [{"alias": "value", "sqlExpression": "sum(fare)"}],
        "timeFilter": {"from": "1706400000"}, "now": 1706659200}]}""")
      assert(wq.statusCode() == 200, wq.body())
      assert(leafSum((JsonMethods.parse(wq.body()) \ "results")(0)) == 10.0,
        s"binary journal replay lost rows: ${wq.body()}")

      // ---- watch-mode grow: the watcher process sees member c join -------
      c.extra ::= fork("graft.RebalanceMain", Map(
        "SPARK_GRAFT_SHARED_ARCHIVE" -> c.shared,
        "SPARK_GRAFT_TOPOLOGY_DIR" -> c.topo,
        "SPARK_GRAFT_MEMBERS_DIR" -> c.members,
        "SPARK_GRAFT_LOCAL_ROOT" -> c.localRoot,
        "SPARK_GRAFT_WATCH_SECONDS" -> "1",
        "SPARK_GRAFT_STABLE_TICKS" -> "2",
        "SPARK_GRAFT_CPUS" -> "2"),
        Paths.get(c.logDir, "rebalance-watch.log"))
      Files.createDirectories(Paths.get(c.localRoot, "c"))
      val mc = c.startMember("c")
      waitHealthy(mc.port, "member c", mc.log)

      val deadline = System.nanoTime() + 180L * 1000000000L
      while (!SliceRebalance.read(c.topo).exists(_.owners.contains("c")) &&
          System.nanoTime() < deadline) {
        // COUNT must be exact at EVERY instant of the copy->publish->drop
        // move — this poll is itself the assertion. (The sum is asserted
        // to CONVERGE below: a PK update into an archived day the grow
        // moves away serves its pre-update value for <= one handoff tick,
        // by documented design — never twice, never zero times.)
        val cnt = brokerMeasure(c, "count(*)")
        assert(cnt == expCount,
          s"during watch-mode grow: count $cnt != $expCount\n${c.logs}")
        Thread.sleep(1000)
      }
      val grown = SliceRebalance.read(c.topo).get
      assert(grown.owners.contains("c"),
        s"watcher never granted c days:\n${tail(Paths.get(c.logDir, "rebalance-watch.log"))}")
      assert(grown.owners("c").nonEmpty)
      // count exact immediately; the moved update's value lands within the
      // handoff window (scheduler tick 2s + drain) — poll to convergence,
      // count re-asserted exact at every sample along the way
      val convergeBy = System.nanoTime() + 60L * 1000000000L
      var sumNow = brokerMeasure(c, "sum(value)")
      while (math.abs(sumNow - expSum) > 1e-6 * math.abs(expSum) &&
          System.nanoTime() < convergeBy) {
        val cnt = brokerMeasure(c, "count(*)")
        assert(cnt == expCount,
          s"post-grow handoff: count $cnt != $expCount\n${c.logs}")
        Thread.sleep(1000)
        sumNow = brokerMeasure(c, "sum(value)")
      }
      assertCounts(c, "after watch-mode grow to 3 members (handoff settled)",
        expCount, expSum)
    } finally c.killAll()
  }

  // ---------- seeded process soak --------------------------------------------

  /** Random op interleavings over the forked tier: ingest / routed PK
    * update / drain / kill-9-restart (sometimes mid-drain), exactly-once
    * asserted through the broker after every op. The in-process
    * ClusterSoakSpec runs the same mix 100× faster; these seeds exist to
    * cross the process boundary.
    */
  Seq(11L, 23L, 47L).foreach { seed =>
    test(s"process soak (seed $seed): random ops over forked members, exactly-once") {
      val rng = new scala.util.Random(seed)
      val c = prepCluster(s"cps$seed", processRebalance = false)
      try {
        val ma = c.startMember("a")
        val mb = c.startMember("b")
        c.startBroker()
        waitHealthy(ma.port, "member a", ma.log)
        waitHealthy(mb.port, "member b", mb.log)
        waitHealthy(c.brokerPort, "broker", Paths.get(c.logDir, "broker.log"))

        val c0 = brokerMeasure(c, "count(*)", settleSec = 120)
        val s0 = brokerMeasure(c, "sum(value)")
        var expCount = c0
        var expSum = s0
        // id -> (ts, value) of rows this soak ingested (PK-update pool)
        val mine = scala.collection.mutable.Map.empty[Long, (String, Double)]
        var nextId = 930000000L + seed * 1000000L
        val assign = SliceRebalance.read(c.topo).get
        val restartRound = 1 + rng.nextInt(5)

        for (round <- 0 until 6) {
          val op = if (round == restartRound) 3 else rng.nextInt(3)
          op match {
            case 0 => // fresh-day ingest at the day's extended owner
              val day = f"2030-02-${1 + rng.nextInt(25)}%02d"
              val owner = c.slices(SliceRebalance.extendedOwner(assign, day).get)
              val k = 1 + rng.nextInt(4)
              val rows = (1 to k).map { i =>
                nextId += 1
                val v = (1 + rng.nextInt(9)).toDouble
                val ts = f"$day 0$i:00:00"
                mine(nextId) = (ts, v)
                (nextId, ts, v)
              }
              ingestRows(owner.base, rows)
              expCount += k; expSum += rows.map(_._3).sum
            case 1 if mine.nonEmpty => // PK update at a RANDOM member (routed)
              val (id, (ts, old)) =
                mine.toSeq(rng.nextInt(mine.size))
              val nv = old + 100.0
              val at = c.slices(if (rng.nextBoolean()) "a" else "b")
              val r = post(s"${at.base}/data/events",
                s"""[{"event_id": $id, "ts": "$ts", "user_id": 1,
                      "event_type": "it_et", "value": $nv, "props": "{}"}]""")
              assert(r.statusCode() == 200 &&
                r.body().contains("\"rowsInserted\":1"), r.body())
              mine(id) = (ts, nv)
              expSum += 100.0
            case 1 | 2 => // drain at a random member (synchronous trigger)
              val at = c.slices(if (rng.nextBoolean()) "a" else "b")
              val r = post(s"${at.base}/dbg/trigger/events/backfill", "")
              assert(r.statusCode() == 200, r.body())
            case 3 => // kill -9 (mid-drain half the time) + restart
              val slice = if (rng.nextBoolean()) "a" else "b"
              val m = c.slices(slice)
              if (rng.nextBoolean()) killMidDrain(m, 300 + rng.nextInt(1200))
              else { m.proc.destroyForcibly(); m.proc.waitFor() }
              val m2 = c.restart(slice)
              waitHealthy(m2.port, s"restarted $slice", m2.log)
          }
          assertCounts(c, s"seed $seed round $round (op $op)", expCount, expSum)
        }
      } finally c.killAll()
    }
  }
}
