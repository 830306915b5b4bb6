ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "timeseriesclassificationusingknnwithdtwunderbigdataschemaspark"
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
// The bench/verify artifacts are parsed from the process stdout TAIL:
// pass the forked JVM's output through raw (no "[info] " line prefixes)
// and drop sbt's trailing "[success] Total time" line so the LAST stdout
// line is exactly the bench's timings JSON (BENCH_r06 lost its timings
// to decorated/trailing output around the driver's 2000-char window).
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, which the unused-key
// lint cannot see
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
  "-Dfile.encoding=UTF-8",
)
// The container locale is POSIX, which makes the JVM's native path
// encoding (sun.jnu.encoding) ASCII: any non-ASCII local FILE PATH —
// e.g. a unicode hive partition value, event_type=uni日本/ — fails the
// write task with InvalidPathException. The property is fixed natively
// at VM startup from the LOCALE (a -D override does not reach
// UnixPath's encoder), so set the environment for forked JVMs instead.
// A production cluster runs UTF-8 locales; this pins the sandbox to
// match so path-bearing unicode is actually exercisable in tests.
Test / envVars += "LC_ALL" -> "C.utf8"
run / envVars += "LC_ALL" -> "C.utf8"
// local-cluster mode (the specfaults rehearsal) spawns executor JVMs
// through the SPARK_HOME launcher, whose getScalaVersion() probes
// source-build directories ("Cannot find any build directories") unless
// the env pins it — /opt/spark is a dist layout, not a source checkout.
Test / envVars += "SPARK_SCALA_VERSION" -> "2.13"
run / envVars += "SPARK_SCALA_VERSION" -> "2.13"
