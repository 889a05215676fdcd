ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "swifterspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The driver certifies performance by JSON-parsing the LAST line of a
// small stdout tail scrape of `sbt "runMain graft.Bench"`. sbt's default
// LoggedOutput wraps the forked JVM's stdout as "[info] ..." and appends
// a "[success] Total time: ..." trailer, so the scrape's final line was
// never a JSON object (BENCH_r13..r17 all parsed:null despite healthy
// runs). StdoutOutput passes the fork's stdout through verbatim and
// showSuccess drops the trailer, so the bench's compact JSON is the
// literal last stdout line.
outputStrategy := Some(OutputStrategy.StdoutOutput)
showSuccess := false
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED")) ++ Seq(
  // sun.management: Bench reads HotspotRuntimeMBean.getTotalSafepointTime
  // (reflectively, try-guarded) to attribute bench stalls to JVM pauses
  "--add-opens", "java.management/sun.management=ALL-UNNAMED")
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g, Xms == Xmx, transparent huge pages: this environment is a
  // microVM (kernel *-fc-*) whose guest memory is faulted in lazily by
  // the host, and first-touch page faults are pathologically slow
  // (~37 MB/s measured). In the r8/r9 benches that made ANY
  // allocation-heavy stage (per-row BigDecimal, imageio, interpreted HOF
  // boxing) nondeterministically 10-100× slower: eden churn → young GCs
  // touching fresh G1 regions → multi-second kernel fault storms
  // (measured: a 1 GB evacuation took 11.8 s wall, User=26 s SYS=238 s).
  // Mitigation measured on this host (2 GB heap init):
  //   4 KB faults 54.8 s | +AlwaysPreTouch+THP 11.8 s | THP, no pretouch 2.9 s
  // so: madvise-THP makes every heap fault 2 MB-granular (512× fewer host
  // round-trips) without AlwaysPreTouch's minutes-long startup; Xms == Xmx
  // stops G1 from uncommitting (and later re-faulting) idle regions.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  "-XX:+UseTransparentHugePages",
  // Fewer GC workers + a relaxed pause target: every GC pause costs
  // handshake/TLB-flush VM exits that are ~100× pricier in this microVM
  // than on bare metal, scaling with worker count × pause frequency.
  // Measured on a 24 GB allocation-churn microbench (16 GB heap): default
  // 28 workers + 200 ms target under concurrent load = 1481 s wall
  // (sys 1553 s!); 8 workers + 1 s target = 66-114 s. On a sane host
  // these flags are neutral; here they are the difference between a
  // usable bench and noise.
  "-XX:ParallelGCThreads=8",
  "-XX:MaxGCPauseMillis=1000",
  // GC + safepoint log for the bench forks: adjudicates whether a stall
  // is a JVM/kernel pause or genuine query work. Rotated, tiny.
  "-Xlog:gc*,safepoint=info:file=/tmp/graft_gc_%p.log:time,uptime:filecount=2,filesize=20m",
)
