ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "peskasmalawidatapipelinespark"
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
// Pass forked-run output through verbatim: sbt's default LoggedOutput
// prefixes every stdout line with "[info] " (and stderr with "[error] "),
// which breaks any consumer expecting a bare JSON line on stdout (the
// bench harness greps for a line starting with '{').
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // -Xms pinned to -Xmx: G1 cannot uncommit heap below Xms, which
  // removes the uncommit-then-retouch amplifier behind the r12-r14
  // bench anomalies (docs/REUSE_TWIN_ATTRIBUTION.md finding 3: a
  // calibration System.gc() let G1 return gigabytes to the OS and the
  // next sample re-zeroed them at this host's pathological first-touch
  // rate). Committed pages are not touched pages, so startup stays
  // instant (measured 0.09 s at 8g) — first-touch cost is paid once
  // per page instead of once per uncommit cycle.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // 32m G1 regions: at the default 8g heap G1 picks 4m regions, making
  // every allocation over 2m HUMONGOUS — and the dedup kernels' growing
  // collection buffers (PrimitiveVector doublings hit 4m+ arrays while
  // localCheckpoint blocks unroll) allocate exactly that class. After a
  // couple of scale sections' churn the region map fragments and a
  // humongous allocation fails with free heap to spare (observed twice:
  // winnow@sf100 OOM'd at stage 136 in a JVM that had run sf1+sf30, and
  // ran clean in a fresh JVM — the GCLocker retry storm on 524290-word
  // allocations is the fingerprint). 32m regions put the 16m humongous
  // threshold above every buffer-doubling class the suite produces.
  "-XX:G1HeapRegionSize=32m",
)
