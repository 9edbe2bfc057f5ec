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
    def procCpuSec(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean =>
          os.getProcessCpuTime / 1e9
        case _ => -1.0
      }
    val loadBefore = loadAvg()
    val cpu0 = procCpuSec()
    val wall0 = System.nanoTime()
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
    // A failed attempt must NOT report its time-to-failure as a bench
    // time (min-of-2 would let a fast crash masquerade as a great
    // number): any thrown attempt poisons the query's HEADLINE to the
    // -1.0 sentinel, which round-over-round comparisons treat as
    // "broken", not "fast". The spread file keeps each attempt's real
    // duration with only the failed attempt marked -1.0, so a partial
    // failure still records which attempt died and what the surviving
    // one cost — the noise-vs-regression signal the file exists for.
    val attempts = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        (ok, dt)
      }
    }
    // Locale.ROOT: the f-interpolator honors the JVM default locale, and
    // a comma decimal separator (e.g. de_DE) would emit invalid JSON.
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // Both attempt times go to BENCH_SPREAD.json so a reader can separate
    // host-contention noise (attempts disagree >1.5x) from a real plan
    // regression (both attempts slow) without burning a re-run — the
    // min-only headline cannot distinguish the two across rounds. The
    // write is cwd-relative and best-effort: a missing/read-only
    // directory must not crash the run AFTER every query already ran and
    // eat the headline line.
    val spread = attempts.map { case (k, ts) =>
      s"\"" + k + "\":[" +
        ts.map { case (ok, dt) => if (ok) r3(dt) else "-1.0" }.mkString(",") +
        "]"
    }.mkString("{", ",", "}")
    val loadAfter = loadAvg()
    val cpuSec = r3(procCpuSec() - cpu0)
    val wallSec = r3((System.nanoTime() - wall0) / 1e9)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_SPREAD.json"),
      (s"""{"sf":"$sfDir","cpus":$cpus,"load_before":$loadBefore,""" +
        s""""load_after":$loadAfter,"proc_cpu_sec":$cpuSec,""" +
        s""""wall_sec":$wallSec,"attempts":$spread}""").getBytes("UTF-8"))
    catch { case e: java.io.IOException =>
      System.err.println(s"[bench] BENCH_SPREAD.json write failed: ${e.getMessage}")
    }
    val results = attempts.map { case (name, ts) =>
      name -> (if (ts.forall(_._1)) ts.map(_._2).min else -1.0)
    }
    // Headline stays ONE line STRICTLY under 1900 chars: the round
    // harness keeps only the final 2000 chars of stdout, and a longer
    // line gets its HEAD truncated — which ate round 9's metric/value
    // fields and left the driver's parse at null. At 121 queries even
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
    val budget = 1600 // chars for the queries map
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
        s""""queries_omitted":$omitted,"sf":"$sfName"}"""
    if (line.length > 1900)
      System.err.println(s"[bench] headline ${line.length} chars — over the 2000-char stdout window")
    println(line)
    spark.stop()
  }
}
