ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mongohadoopspark"
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
// Round-gate hook for the Python surface: packages the connector jar and
// runs tools/pyspark_smoke.py against sf0.001, failing the task (and any
// gate that invokes it) on a smoke failure. One command: `sbt pysparkSmoke`.
lazy val pysparkSmoke = taskKey[Unit]("Package the jar and run tools/pyspark_smoke.py")
pysparkSmoke := {
  val _ = (Compile / packageBin).value
  val repo = baseDirectory.value
  val exit = scala.sys.process.Process(
    Seq("python3", (repo / "tools" / "pyspark_smoke.py").getAbsolutePath),
    repo).!
  if (exit != 0) sys.error(s"pyspark_smoke.py failed with exit $exit")
}

javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] runs 32 concurrent tasks in ONE JVM: an 8g heap GC-thrashes
  // under cached frames + 32 shuffle buffers (observed 10x timing swings);
  // the box has 128 GiB
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // 51 queries' worth of whole-stage-codegen classes overflow the default
  // 240 MB JIT code cache mid-run; once full the compiler shuts off and
  // every later query runs interpreted (~3x slower, observed as a
  // progressive slowdown across the bench). Headroom + flushing keeps the
  // JIT alive for the whole run.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
)
