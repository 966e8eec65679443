ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "xenoeyespark"
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
// No "[success] Total time: ..." epilogue on BENCH-shaped invocations:
// the driver captures sbt's stdout and parses the LAST line as the
// bench's one-line JSON contract — sbt's epilogue printed after the
// program exits has shadowed that line in every round so far
// (BENCH_r01..r21 all carry "parsed": null with the JSON visibly
// intact one line above the epilogue). Scoped to SPARK_GRAFT_SF_DIR
// being set (the bench contract's env) so plain `sbt compile` /
// `sbt test` keep their epilogue — in case any wrapper greps for it
// rather than using exit codes. "All tests passed." / error lines
// print either way.
Global / showSuccess := !sys.env.contains("SPARK_GRAFT_SF_DIR")
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
