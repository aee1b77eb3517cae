ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kafkastreamfaustdeprecatedspark"
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
// local[32] = 32 executor threads in ONE heap; 8g (250 MB/thread)
// GC-thrashes the self-join queries (measured 177s -> 55s bench total
// at 48g on the 128 GiB box). Default to ~40% of physical RAM, capped
// at 48g, so smaller dev machines still fork; override with
// SPARK_DRIVER_MEM=<size>.
val defaultHeap: String = sys.env.get("SPARK_DRIVER_MEM").getOrElse {
  val memGb =
    try {
      val kb = scala.io.Source.fromFile("/proc/meminfo").getLines()
        .collectFirst { case l if l.startsWith("MemTotal:") =>
          l.split("\\s+")(1).toLong }
      kb.map(_ / (1024 * 1024)).getOrElse(8L)
    } catch { case _: Throwable => 8L }
  s"${math.max(2L, math.min(48L, memGb * 2 / 5))}g"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$defaultHeap",
  // 60+ whole-stage-codegen queries in one JVM overflow the default
  // 240m JIT code cache; once full the compiler disables itself and
  // later queries run interpreted (measured 10-30x slowdowns at sf1)
  "-XX:ReservedCodeCacheSize=512m",
)
