ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pravegaflinkaiflowspark"
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
// Forked run output goes straight to stdout, NOT through sbt's logger:
// the bench/verify drivers parse the emitted JSON line, and the logger's
// "[info] " prefix breaks that (round-2 BENCH parsed: null).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // local[32] with shuffle-heavy dedup/ANN queries wants headroom: the
  // container has 128 GiB; 16g keeps GC pressure off the bench numbers.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // headroom for the thousands of generated classes a 113-key
  // interleaved bench session JIT-compiles (the retained codegen cache
  // keeps their compiled stubs live); the JDK 17 default is 240 MB.
  // (A measured late-session image-decode degradation initially blamed
  // on code-cache exhaustion turned out to be ImageIO's disk-backed
  // stream cache — fixed at ImageCodec.setUseCache(false).)
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODE_CACHE", "512m")}",
)
