ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dataobservabilityinstallerspark"
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
// The driver parses the bench's one-line JSON from stdout with a
// line-oriented json.loads. sbt's default forked-run logger prefixes
// every line with "[info] ", which defeated that parse in every round
// (BENCH_r10..r14 all have parsed: null). StdoutOutput passes the
// forked JVM's stdout through unprefixed.
run / outputStrategy := Some(StdoutOutput)
// Control-plane fixtures double as classpath resources: ControlPlane's
// path resolution falls back to the classpath when neither the cwd nor
// GRAFT_REPO_ROOT holds fixtures/ (a harness launched from an arbitrary
// working directory must not fail EventQueries' object init, and a
// hardcoded absolute checkout path silently read the WRONG fixtures on
// any other machine — r10 advice).
Compile / unmanagedResourceDirectories += baseDirectory.value / "fixtures"
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
)
scalacOptions ++= Seq("-deprecation")
