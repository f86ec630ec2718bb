ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tubularspark"
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
// raw stdout for forked runs: the bench/verify drivers parse the JSON
// line this process prints; sbt's default LoggedOutput would prefix it
// with "[info] "
run / outputStrategy := Some(StdoutOutput)
// Suites share one SparkSession; Spark's active-session state is
// thread-local, so run suites sequentially in the forked JVM.
Test / parallelExecution := false
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
  // 16g default: long bench runs (decode feature jobs allocate pixel
  // arrays per image) need old-gen headroom so late sections aren't
  // GC-taxed relative to hand runs; the box has 128 GiB
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // pre-size the heap: under hypervisor CPU steal (observed 2x global
  // slowdowns on this sandbox) incremental heap growth adds full-GC
  // pauses exactly when the box is already slow; -Xms=-Xmx removes
  // that failure mode from one-shot driver runs
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // Spark's per-query Janino codegen churns thousands of classes; with
  // the default 240m code cache + few C2 threads, hot loops get stuck
  // behind a saturated compile queue (observed: identical stages 5x
  // slower on repeat). Bigger cache + more compiler threads fix it.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:CICompilerCount=8",
)
