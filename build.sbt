ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pspcz_analyzerspark"
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
  // local[32] means 32 concurrent tasks sharing ONE driver heap; 8g on
  // this 128 GiB box made the heavy shuffle queries (q60/q62 family) GC-
  // thrash in one-shot bench runs (recorded 15.7 s vs ~5 s steady-state).
  // 48g leaves the OS plenty and keeps full-rate task concurrency out of
  // collection pauses.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // Pin the heap (Xms = Xmx) and commit it up front: this guest's kernel
  // commits anonymous pages at only ~300 MB/s (measured r19: 71% system
  // CPU while the growing heap faulted in), so without Xms every
  // System.gc() between bench windows let G1 uncommit regions and the
  // NEXT window paid the re-commit as wall-clock (floor-probe repeats
  // read 22-99 s against a 7-9 s band with gc/jit/janino all ≈ 0 — pure
  // kernel page-fault time). With Xms+AlwaysPreTouch the same probe
  // converges to 7.1-8.7 s from repeat 2 on. Same practice as pinning
  // executor heaps on a production cluster; measured A/B in
  // OPTIMIZATION_r19.md.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  "-XX:+AlwaysPreTouch",
  // madvise-THP for the heap (the box runs THP=madvise): 2 MiB pages cut
  // TLB pressure for the 48 GiB heap; with it the same q192 probe's
  // in-band floor dropped 7.07 -> 6.08 s and the 8-repeat band tightened
  // to 6.1-11.1 s (A/B in OPTIMIZATION_r19.md).
  "-XX:+UseTransparentHugePages",
  // The full query catalog generates several whole-stage-codegen classes
  // per query per pass; the JDK's default 240 MB code cache fills mid-
  // run and CodeCacheFlushing then evicts hot methods, so later queries
  // recompile continuously (measured: pass-2 q60 24.8 s vs pass-1 9.5 s
  // with 11 s of in-window JIT). One gigabyte held the 83-query catalog;
  // at 111 queries pass 1 overflows it again — silent CodeCacheFlushing
  // churn, measured round 10 by A/B at identical code: cold total 287.8 s
  // at 1g vs 142.1 s at 2g (q60 cold 57.1 -> 9.0). Env-keyed so the
  // hypothesis stays testable without editing the build; evidence in
  // PERFORMANCE.md round 10.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODE_CACHE", "2g")}",
  // env-keyed extra flags so JIT/deopt hypotheses stay A/B-testable
  // without editing the build (the SPARK_CODE_CACHE pattern)
  // filter(_.nonEmpty): an empty or whitespace-only value would split to
  // Array("") and pass an empty-string JVM argument the forked JVM
  // refuses to launch with
) ++ sys.env.get("SPARK_EXTRA_JVM_OPTS").toSeq
  .flatMap(_.trim.split("\\s+").toSeq).filter(_.nonEmpty)
