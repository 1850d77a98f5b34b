ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pyshaclspark"
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
  // Shuffle writer selection (r8, guide §2.2/§9): below this reducer
  // count Spark's bypass-merge writer opens one file PER REDUCER per map
  // task — at the core-scaled 128 shuffle partitions that is 128 files
  // per map task, measured as a consistent ~4x tax on every exchange over
  // small-to-mid map outputs (0.8 s -> 0.2 s for a 260k-row groupBy,
  // tools/CkptScanProbe). The sort-based writer (one file per map task,
  // what every >200-reducer production shuffle uses anyway) takes over
  // sooner; override via SPARK_SHUFFLE_BYPASS_MAX for deployments whose
  // reducer counts and disks favor the bypass path.
  s"-Dspark.shuffle.sort.bypassMergeThreshold=${sys.env.getOrElse("SPARK_SHUFFLE_BYPASS_MAX", "64")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
