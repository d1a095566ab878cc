ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "phageclouds_graphdatabasespark"
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
// Forked run output passes straight through instead of being re-logged
// with "[info] " prefixes: the driver parses the ONE bench JSON line
// from stdout, and the prefix broke that parse in rounds 1-3.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ... and sbt's own "[success] Total time: ..." banner must not land
// AFTER that JSON line: the driver tail-parses stdout, and the banner
// made it read "parsed": null in r16-r18 even once Bench printed the
// JSON last (BENCH_r18.json tail shows exactly this). Suppressing the
// banner at the build level fixes every sbt-mediated invocation — the
// program's own last stdout line is now the process's last stdout line.
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, not by another task —
// exclude it from the unused-key lint so batch output stays clean
Global / excludeLintKeys += showSuccess
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
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // JDK17 G1's GCLocker-starved allocation path retries only
  // GCLockerRetryAllocationCount (=2) times before throwing OOM — the
  // measured §4.13 failure mode for humongous allocations under a
  // pinned multi-GB cache ("Retried waiting for GCLocker too often" in
  // r18's 150k CC+coreness session; intermittent — the same session
  // ran green in r19). Raising the bound turns a lost race into
  // bounded extra waiting and costs nothing when no race occurs.
  "-XX:+UnlockDiagnosticVMOptions", "-XX:GCLockerRetryAllocationCount=64",
) ++
  // GC A/B knob for bench-variance hunts (e.g. SPARK_GRAFT_GC=Parallel/G1/Z)
  sys.env.get("SPARK_GRAFT_GC").map(g => s"-XX:+Use${g}GC").toSeq ++
  sys.env.get("SPARK_GRAFT_GC_LOG").map(f => s"-Xlog:gc:$f").toSeq ++
  // arbitrary extra JVM flags for measured harness A/Bs (e.g. the
  // GCLocker retry-count repro — SURVEY §4.13 r18 note)
  sys.env.get("SPARK_GRAFT_JVM_EXTRA").toSeq
    .flatMap(_.split(' ').filter(_.nonEmpty))
