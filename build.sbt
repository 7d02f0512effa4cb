ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kafkajournalspark"
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// `sbt test` wall time: one forked JVM ran all 42 suites SEQUENTIALLY —
// ~8 min of test bodies under ~37 min of per-suite SparkSession/fixture
// setup and teardown — and the round-16 driver run was killed mid-suite
// on exactly that wall. Suites are independent (each builds its own
// local[4] session and temp dirs), so they now run in PARALLEL forked
// JVMs: the four long-running lifecycle suites get a JVM each and the
// rest round-robin across four more. 8 concurrent JVMs × local[4] = the
// 32-core box; 4g heap each (the old single JVM ran everything in 8g).
// Nothing is skipped or shrunk — same tests, same fixtures, wall ≈ the
// heaviest group instead of the sum.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
    .filterNot(_.startsWith("-Xmx")) :+ "-Xmx4g"
  def fork = Tests.SubProcess(ForkOptions().withRunJVMOptions(opts))
  val heavy = Set(
    "graft.ReplicatorSpec",
    "graft.StoreInterleavingSpec",
    "graft.PipelineDeploymentSpec",
    "graft.DeploymentSpec",
  )
  val (big, small) = tests.partition(t => heavy(t.name))
  val nLight = 4
  val lightGroups = small
    .sortBy(_.name)
    .zipWithIndex
    .groupBy(_._2 % nLight)
    .toSeq
    .sortBy(_._1)
    .map { case (i, ts) =>
      new Tests.Group(s"light-$i", ts.map(_._1), fork)
    }
  val bigGroups =
    big.map(t => new Tests.Group(t.name, Seq(t), fork))
  bigGroups ++ lightGroups
}
// limitAll keeps a global task-concurrency bound in place (the default
// restrictions are REPLACED by this assignment, and forked groups above
// 1 require replacing them); 16 is far above anything the build runs
// concurrently besides the 8 test JVMs.
Global / concurrentRestrictions := Seq(
  Tags.limitAll(16),
  Tags.limit(Tags.ForkedTestGroup, 8),
)
