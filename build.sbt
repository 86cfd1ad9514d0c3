ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "polarsnexpressospark"
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
// Pass the forked process's stdout/stderr straight through instead of
// routing them via sbt's logger: the logger prefixes every line with
// "[info] "/"[error] ", which has kept the driver from parsing
// Bench.scala's one-line JSON summary (BENCH_r03..r07 all rc=0 but
// parsed:null). With StdoutOutput the summary prints as a clean
// `{...}` line.
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
// -Xms is NOT pinned by default: a pinned 16 GiB parent plus a pinned
// 16 GiB bench re-run child exceeded the loaded round-4 sandbox and the
// OOM killer took the parent mid-capture (BENCH_r04.json exit 137). An
// unpinned heap commits only what it touches and G1 uncommits after a
// full GC, so parent + forked child fit. SPARK_GRAFT_XMS=16g restores
// pinning for variance studies.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
) ++ sys.env.get("SPARK_GRAFT_XMS").map(x => s"-Xms$x").toSeq
