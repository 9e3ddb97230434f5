ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tmdataloaderspark"
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
// The suite outgrew the driver's verify window (465 tests / 64 suites,
// ~36 min wall in ONE forked JVM at r14/r15 — VERIFY_r15.json tests_ok
// read false on a truncated-but-green tail). Suites share no mutable
// state (every spec writes to its own createTempDirectory; sessions are
// per-JVM local[2] singletons), so run each suite in its own forked JVM
// with a bounded number in flight. 6 concurrent local[2] JVMs x 3g heap
// fits the 32-cpu / 128 GiB sandbox with the bench-grade headroom.
Test / testGrouping := {
  val opts = ForkOptions().withRunJVMOptions(
    (Test / javaOptions).value.toVector
      .filterNot(_.startsWith("-Xmx")) :+ "-Xmx3g")
  (Test / definedTests).value.map { t =>
    Tests.Group(t.name, Seq(t), Tests.SubProcess(opts))
  }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 6),
  Tags.limitAll(12),
)
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
  // ~100 queries in one JVM generate thousands of whole-stage-codegen
  // classes; the default ~240m code cache fills mid-suite, the JIT stops
  // compiling, and late queries run 1.5-2x slower (measured: the
  // alphabetically-last dedup family at suite end vs in isolation)
  "-XX:ReservedCodeCacheSize=512m",
)
