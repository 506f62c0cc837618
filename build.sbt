ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sds2020_web_table_annotationspark"
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
  // 8g measured fastest for this workload: a 48g heap made the same 50k-file
  // pipeline run 4.7x SLOWER (GC behavior at large heaps + 32 threads).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
scalacOptions += "-Wunused:imports"
// experiment passthrough: SPARK_GRAFT_GC=UseParallelGC etc.
javaOptions ++= sys.env.get("SPARK_GRAFT_GC").map(g => s"-XX:+$g").toSeq
// scaling-protocol fairness: confine GC to the measured core count
// (an unpinned GC borrows the box's idle cores at low N, inflating the
// baseline — cluster executors' GC scales with their own cores instead)
javaOptions ++= sys.env.get("SPARK_GRAFT_GC_THREADS").toSeq.flatMap(n =>
  Seq(s"-XX:ParallelGCThreads=$n", s"-XX:ConcGCThreads=${math.max(1, n.toInt / 4)}"))
