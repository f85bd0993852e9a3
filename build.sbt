ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "backtest_crewdatalakespark"
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
// Pass the forked run's stdout through UNWRAPPED instead of re-logging each
// line with an "[info] " prefix: the bench/verify drivers parse stdout lines
// as JSON, and the prefix made every emitted line unparseable (eight rounds
// of BENCH artifacts with rc=0 but parsed=null).
run / outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
runMain / outputStrategy := Some(StdoutOutput)
Compile / runMain / outputStrategy := Some(StdoutOutput)
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
  // default 16g (r16): local-mode driver+executors share one heap; an A/B
  // on the heavy bench subset measured the 8g default costing ~3-8% GC drag
  // (q139 3.81->3.52, q72 3.57->3.24 at 24g, calib-flat). Parameterized —
  // CI/driver hosts with less RAM set SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
