ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ecommercefulletlprocessspark"
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
// Machine-readable `runMain graft.Bench` output (VERDICT r7 #3): forked
// run stdout passes through RAW (no `[info] ` logger prefix) and the
// trailing `[success] Total time ...` banner is suppressed, so the
// bench's compact JSON is the LITERAL last stdout line of
// `sbt "runMain graft.Bench"` — parseable by a tail scrape. The raw
// JSON is also always written to SPARK_GRAFT_OUT (default
// /tmp/bench.json) by Bench itself.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
ThisBuild / showSuccess := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
// LocalClusterSpec gets its OWN forked JVM: it stops/starts SparkContexts
// (a local reference session, then local-cluster with real executor
// processes), which cannot coexist with the suite-wide shared session.
// SPARK_SCALA_VERSION short-circuits the launcher's build-directory probe
// when the standalone Worker spawns executor JVMs from $SPARK_HOME.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  val base = ForkOptions()
    .withRunJVMOptions(opts)
    .withEnvVars(Map("SPARK_SCALA_VERSION" -> "2.13"))
  val (lc, rest) = tests.partition(_.name.endsWith("LocalClusterSpec"))
  Seq(
    Tests.Group("local-cluster", lc, Tests.SubProcess(base)),
    Tests.Group("main", rest, Tests.SubProcess(base)),
  ).filter(_.tests.nonEmpty)
}
