ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sparkdataengineeringspark"
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
// Forked run output must reach stdout RAW: the default LoggedOutput
// strategy prefixes every line with "[info] ", which breaks any consumer
// that json-parses the benchmark/verify single-line outputs.
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  "-Duser.timezone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // pre-touch the whole heap at JVM start (untimed) instead of paying
  // the hypervisor's slow fresh-page backing (~0.33 GiB/s measured,
  // BASELINE.md) inside measured queries as the heap grows — the
  // recording legs always passed this via SPARK_GRAFT_JVM_EXTRA; the
  // driver's own runs get the same stability by default now. An
  // explicit -Xms in SPARK_GRAFT_JVM_EXTRA still wins (appended later).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+AlwaysPreTouch",
) ++
  // extra JVM flags for forked runs (opt-in): the sandbox hypervisor
  // backs FRESH anonymous pages ~30x slower than it serves touched ones
  // (measured 0.33 vs 10.5 GiB/s), so a heap growing from default -Xms
  // toward a large -Xmx faults pages mid-measurement — 3 s young GCs,
  // 15x stream drains. Benchmark legs pass
  // SPARK_GRAFT_JVM_EXTRA="-Xms48g -XX:+AlwaysPreTouch" to pay the
  // page-backing cost ONCE at JVM startup, outside measured queries.
  sys.env.get("SPARK_GRAFT_JVM_EXTRA").toSeq
    .flatMap(_.split("\\s+").filter(_.nonEmpty))
