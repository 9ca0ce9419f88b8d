ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "memgraphspark"
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
// per-test durations in the log (-oD) so a slow suite is attributable
// from the driver's captured tail alone
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
// Default forked-JVM heap: min(24g, physical/4) — see the -Xmx comment.
val defaultHeapGb: String = {
  val physGb =
    try scala.io.Source.fromFile("/proc/meminfo").getLines()
      .find(_.startsWith("MemTotal"))
      .map(_.filter(_.isDigit).toLong / (1024L * 1024L)).getOrElse(0L)
    catch { case _: Throwable => 0L }
  if (physGb <= 0) "8g" else math.max(4L, math.min(24L, physGb / 4)) + "g"
}
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
  // local[N] runs driver+executors in ONE JVM: the heap is the whole
  // cluster's memory. 8g starved the 350-query sweep once the LDBC/
  // stress/pokec loader caches joined the TPCH ones — unified memory
  // evicted/spilled every shared persist and the whole bench ran 1.5-2×
  // slow (r17 A/B: bfs_allshortest 20s in-sweep vs 3.3s isolated).
  // Default = min(24g, physical/4) — 24g ≈ 19% of the 128 GiB bench box,
  // while a smaller dev/CI machine gets a heap it can actually back
  // (r17 ADVICE: a flat 24g overcommits 16-32 GiB hosts). Override via
  // SPARK_DRIVER_MEM.
  "-Xmx" + sys.env.getOrElse("SPARK_DRIVER_MEM", defaultHeapGb),
) ++
  // local A/B harness: GRAFT_JAVA_OPTS="-Dspark.graft.x=y" passes spark
  // conf toggles into the forked run/test JVMs
  sys.env.get("GRAFT_JAVA_OPTS").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))
