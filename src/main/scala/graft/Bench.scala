package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Contention stamp: host load average before/after plus this
    // process's CPU-time-vs-wall ratio. A contended host poisons a
    // whole run in a way min-of-2 can't defend against (both attempts
    // slow); these fields let a reader see it from the artifact alone —
    // load_1m far above `cpus`, or proc_cpu_sec/wall_sec collapsing
    // well below the run's usual parallelism, means the numbers measure
    // the neighbor's noise, not the plans.
    def loadAvg(): String =
      try new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
        .trim.split(" ").take(3).mkString("[", ",", "]")
      catch { case _: Exception => "null" }
    def load1m(): Double =
      try new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
        .trim.split(" ").head.toDouble
      catch { case _: Exception => -1.0 }
    def procCpuSec(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean =>
          os.getProcessCpuTime / 1e9
        case _ => -1.0
      }
    // ---- contention defense, part 1: the pre-board gate ----
    // A board started on a loaded host measures the neighbor's noise
    // (it cost a judge re-run in rounds 9 AND 12). Refusing outright
    // would leave the round with no artifact at all, so the gate is a
    // bounded settle: wait up to 2 minutes for the 1-minute load to
    // drop under the gate, then proceed and SAY so — the verdict is
    // stamped into the headline either way.
    val loadGate = 0.15 * cpus.toDouble
    var settleWaits = 0
    while (load1m() > loadGate && settleWaits < 4) {
      System.err.println(f"[bench] host contended before the board " +
        f"(load_1m ${load1m()}%.2f > gate $loadGate%.2f) — waiting 30 s " +
        f"for it to settle (${settleWaits + 1}/4)")
      Thread.sleep(30000)
      settleWaits += 1
    }
    var maxLoad = load1m()
    val loadBefore = loadAvg()
    val cpu0 = procCpuSec()
    val wall0 = System.nanoTime()
    // Prior round's per-query best times (the committed BENCH_SPREAD
    // .json, written by the previous round's board run): the reference
    // this run's numbers are sanity-checked against. Best-effort — a
    // missing/garbled file just disables the outlier re-attempts.
    val prior: Map[String, Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("BENCH_SPREAD.json")), "UTF-8")
        // core-count guard: the spread file stamps the cpu count it ran
        // with; a prior measured at a DIFFERENT core count (the driver
        // also runs an 8-core scaling board, which overwrites the file)
        // is not a valid >3x-outlier reference — skip the re-attempt
        // logic rather than chase phantom outliers against it
        val priorCpus = """"cpus"\s*:\s*(\d+)""".r
          .findFirstMatchIn(txt).map(_.group(1))
        if (priorCpus.exists(_ != cpus)) {
          System.err.println(s"[bench] BENCH_SPREAD.json prior was " +
            s"measured at cpus=${priorCpus.get} (this run: $cpus) — " +
            "outlier re-attempts disabled for this board")
          throw new java.io.IOException("prior cpus mismatch")
        }
        // whitespace-tolerant: the file is normally this class's own
        // compact output, but any JSON-aware tool that rewrites it
        // (pretty-printers, jq) adds spaces after colons
        val entry = """"(q_[A-Za-z0-9_]+)"\s*:\s*\[([^\]]*)\]""".r
        entry.findAllMatchIn(txt).map { m =>
          val best = m.group(2).split(",").toSeq
            .flatMap(_.trim.toDoubleOption).filter(_ > 0)
          m.group(1) -> (if (best.isEmpty) -1.0 else best.min)
        }.toMap.filter(_._2 > 0)
      } catch { case _: Exception => Map.empty }
    // Warm the session (codegen, parquet footer reader, shuffle machinery)
    // so the first measured query doesn't absorb one-time JVM startup.
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // Sorted by name so per-query times are comparable across rounds
    // (HashMap iteration reorders whenever a key is added, and each
    // query's time absorbs the JIT/page-cache state its predecessors
    // left behind). Caches are cleared between queries for the same
    // reason: a query must not be timed against another query's
    // persisted intermediates.
    //
    // Each query runs TWICE and reports the MIN: a single pass is at
    // the mercy of whatever else the host is doing — one contention
    // window in a shared sandbox once turned a 1 s query into an 18 s
    // phantom regression. Min-of-2 measures the plan, not the
    // neighbor's noise; back-to-back runs should agree within ~1.5x.
    // Do NOT "optimize" attempt 2 away for prior-confirming attempt-1
    // times (tried in round 14): attempt 1 is the COLD run — it pays
    // the query's codegen, JIT, and page-cache warmup — so shipping it
    // inflated the whole headline ~50% (157.7 s vs 103.4 s on a quiet
    // host) while saving no comparability: min-of-2 is the warm
    // measurement, not just the contention defense.
    // A failed attempt must NOT report its time-to-failure as a bench
    // time (min-of-2 would let a fast crash masquerade as a great
    // number): any thrown attempt poisons the query's HEADLINE to the
    // -1.0 sentinel, which round-over-round comparisons treat as
    // "broken", not "fast". The spread file keeps each attempt's real
    // duration with only the failed attempt marked -1.0, so a partial
    // failure still records which attempt died and what the surviving
    // one cost — the noise-vs-regression signal the file exists for.
    val qmap = SparkEntry.queries
    def attempt(name: String): (Boolean, Double) = {
      val t0 = System.nanoTime()
      val ok = try { qmap(name)(spark, sfDir).count(); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
      }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      (ok, dt)
    }
    val names = qmap.keys.toSeq.sorted
    val attemptLog = scala.collection.mutable.LinkedHashMap(
      names.map(n => n -> (1 to 2).map(_ => attempt(n)).toVector): _*)
    maxLoad = math.max(maxLoad, load1m())
    // ---- contention defense, part 2: third-attempt outlier re-runs ----
    // min-of-2 is too thin when BOTH attempts land in one contention
    // window (round 12: 32.8 s and 24.1 s for a 2 s query — min()
    // still shipped an 11x phantom). Any query whose best attempt is
    // > 3x its prior-round best gets ONE more attempt after the board
    // (the window has usually passed by then); on a genuinely quiet
    // host with a real regression the third attempt just confirms it.
    // The 0.15 s floor keeps sub-100 ms queries from tripping on timer
    // noise.
    // The failure sentinel applies to the two MANDATORY attempts (a
    // fast crash must not masquerade as a great number). A third
    // contention re-attempt that itself fails must NOT flip a
    // twice-successful query to -1 — the defense would then be strictly
    // worse than not re-running; its failure just means the re-attempt
    // didn't help, and the surviving attempts' min stands.
    def best(ts: Seq[(Boolean, Double)]): Double =
      if (!ts.take(2).forall(_._1)) -1.0
      else ts.filter(_._1).map(_._2).min
    def outlier(n: String): Boolean = {
      val b = best(attemptLog(n))
      b > 0 && prior.get(n).exists(p => b > 3.0 * math.max(p, 0.15))
    }
    val reattempted = names.filter(outlier)
    reattempted.foreach { n =>
      System.err.println(s"[bench] $n best ${best(attemptLog(n))} s is >3x " +
        s"its prior-round ${prior(n)} s — third attempt")
      attemptLog(n) = attemptLog(n) :+ attempt(n)
    }
    maxLoad = math.max(maxLoad, load1m())
    // Locale.ROOT: the f-interpolator honors the JVM default locale, and
    // a comma decimal separator (e.g. de_DE) would emit invalid JSON.
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // All attempt times go to BENCH_SPREAD.json so a reader can separate
    // host-contention noise (attempts disagree >1.5x) from a real plan
    // regression (all attempts slow) without burning a re-run — the
    // min-only headline cannot distinguish the two across rounds. The
    // write is cwd-relative and best-effort: a missing/read-only
    // directory must not crash the run AFTER every query already ran and
    // eat the headline line.
    val spread = attemptLog.map { case (k, ts) =>
      s"\"" + k + "\":[" +
        ts.map { case (ok, dt) => if (ok) r3(dt) else "-1.0" }.mkString(",") +
        "]"
    }.mkString("{", ",", "}")
    // Build/serve split for the shared memoized builds (graph family
    // etc.): a one-time build lands in whichever query touches it first,
    // so that query's attempt 1 reads as a walk regression unless the
    // build is its own line item. `memo_builds` is the measured wall
    // time of every shared build (QueryPack.buildSeconds); `build_split`
    // derives per-query serve (best of attempts 2+, which never pay a
    // memo build) vs first-touch overhead for the graph-family lines.
    val memoBuilds = {
      import scala.jdk.CollectionConverters._
      graft.queries.QueryPack.buildSeconds.asScala.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + r3(v) }
        .mkString("{", ",", "}")
    }
    val graphFamily = attemptLog.keys.filter(n =>
      n.startsWith("q_graph_") || n == "q_autotune_graph_beam" ||
        n == "q_knn_graph_lsh" || n == "q_knn_graph_nnd" ||
        n == "q_mutual_knn_clusters_lsh")
    val buildSplit = graphFamily.flatMap { n =>
      val ts = attemptLog(n)
      val serveAttempts = ts.drop(1).filter(_._1).map(_._2)
      if (ts.head._1 && serveAttempts.nonEmpty) {
        val serve = serveAttempts.min
        Some("\"" + n + "\":{\"build_s\":" +
          r3(math.max(0.0, ts.head._2 - serve)) +
          ",\"serve_s\":" + r3(serve) + "}")
      } else None
    }.mkString("{", ",", "}")
    val loadAfter = loadAvg()
    val cpuSec = r3(procCpuSec() - cpu0)
    val wallSec = r3((System.nanoTime() - wall0) / 1e9)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_SPREAD.json"),
      (s"""{"sf":"$sfDir","cpus":$cpus,"load_before":$loadBefore,""" +
        s""""load_after":$loadAfter,"load_gate":${r3(loadGate)},""" +
        s""""settle_waits":$settleWaits,"proc_cpu_sec":$cpuSec,""" +
        s""""wall_sec":$wallSec,""" +
        s""""reattempted":${reattempted.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
        s""""memo_builds":$memoBuilds,"build_split":$buildSplit,""" +
        s""""attempts":$spread}""").getBytes("UTF-8"))
    catch { case e: java.io.IOException =>
      System.err.println(s"[bench] BENCH_SPREAD.json write failed: ${e.getMessage}")
    }
    val results = attemptLog.toSeq.map { case (name, ts) => name -> best(ts) }
    // ---- contention defense, part 3: the verdict in the artifact ----
    // contended = the host load crossed the gate at some sample AND a
    // query still finished >3x its prior-round best after the third
    // attempt. A clean re-attempt pass (outliers recovered) reads
    // contended=false — the artifact defended itself; a quiet-host
    // outlier also reads false — that's a real regression, not noise.
    val stillOut = results.filter { case (n, b) =>
      b > 0 && prior.get(n).exists(p => b > 3.0 * math.max(p, 0.15))
    }.map(_._1)
    val contended = maxLoad > loadGate && stillOut.nonEmpty
    if (stillOut.nonEmpty)
      System.err.println(s"[bench] still >3x prior after re-attempts " +
        s"(${if (contended) "contended host" else "load was quiet — investigate as a regression"}): " +
        stillOut.mkString(", "))
    // Headline stays ONE line STRICTLY under 1900 chars: the round
    // harness keeps only the final 2000 chars of stdout, and a longer
    // line gets its HEAD truncated — which ate round 9's metric/value
    // fields and left the driver's parse at null. At 150+ queries even
    // 1-second precision overflows (~2600 chars), so the inline map
    // carries only the SLOWEST queries that fit the budget (the
    // informative ones — the fast tail is noise at any precision) and
    // `queries_omitted` counts the rest; every query's full-ms attempt
    // times are in BENCH_SPREAD.json regardless. The total is always
    // over ALL queries.
    // Sentinels (-1.0, failed queries) are excluded from the total but
    // always included inline — a broken query must stay visible.
    val total = results.map(_._2).filter(_ >= 0).sum
    val sfName = java.nio.file.Paths.get(sfDir).getFileName.toString
    val failed = results.filter(_._2 < 0)
    val byCost = failed ++ results.filter(_._2 >= 0).sortBy(-_._2)
    val budget = 1500 // chars for the queries map
    val entries = scala.collection.mutable.ListBuffer.empty[String]
    var used = 2
    var omitted = 0
    byCost.foreach { case (k, v) =>
      val e = "\"" + k + "\":" + r3(v)
      if (used + e.length + 1 <= budget) { entries += e; used += e.length + 1 }
      else omitted += 1
    }
    val qs = entries.mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,""" +
        s""""queries_omitted":$omitted,"contended":$contended,""" +
        s""""reattempted":${reattempted.size},"load_1m_max":${r3(maxLoad)},""" +
        s""""sf":"$sfName"}"""
    if (line.length > 1900)
      System.err.println(s"[bench] headline ${line.length} chars — over the 2000-char stdout window")
    println(line)
    spark.stop()
  }
}
