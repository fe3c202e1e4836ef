ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "adsfulltextspark"
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
// SPARK_DRIVER_MEM accepts "<int>g/G/m/M" (default unit: g); normalized to
// MB so -Xmx/-Xms/-Xmn stay consistent and the young gen can never be 0
val driverMemMb: Int = {
  val raw = sys.env.getOrElse("SPARK_DRIVER_MEM", "24g").trim
  val m = "^(\\d+)\\s*([gGmM]?)$".r
  val mb = raw match {
    case m(n, u) if u.equalsIgnoreCase("m") => n.toInt
    case m(n, _) => n.toInt * 1024
    case _ => sys.error(s"SPARK_DRIVER_MEM must be like '24g' or '24576m', got '$raw'")
  }
  // below 512 MB the fixed young gen (-Xmn, min 256 MB) would meet or exceed
  // -Xmx and the JVM refuses to start ("Too small heap for new size")
  if (mb < 512) sys.error(s"SPARK_DRIVER_MEM must be >= 512m (got '$raw')")
  mb
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${driverMemMb}m",
  // Throughput GC for the allocation-heavy extraction kernel: G1's default
  // adaptive heap (grow/shrink + uncommit) spent up to half of task time in
  // GC stalls and kernel-side heap commit churn at 32 threads; ParallelGC
  // with a fixed pre-touched heap and a large young gen measured 2.5-8x the
  // 32-thread kernel throughput and restores 8->32 scaling to the hardware
  // ceiling (CoreScaleProbe: 73k -> 583k docs/s at 32 threads).
  s"-Xms${driverMemMb}m",
  "-XX:+UseParallelGC",
  // young gen = half the heap (parse garbage is short-lived), min 256 MB,
  // capped 128 MB below the heap so -Xmn can never reach -Xmx
  s"-Xmn${math.min(driverMemMb - 128, math.max(256, driverMemMb / 2))}m",
  "-XX:+AlwaysPreTouch",
  // Spark's generated classes fill the default 240m code cache, after which
  // the JIT stops compiling and hot kernel code (regex lambdas) runs
  // interpreted — observed as a 10x kernel slowdown inside Spark JVMs only
  "-XX:ReservedCodeCacheSize=1g",
)
