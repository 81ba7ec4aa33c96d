ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dataseedlingspark"
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
// Lint discipline standing in for the reference's pre-commit
// (flake8/black/mypy are Python-side; scalafmt's sbt plugin cannot
// resolve offline, so linting rides the compiler).
scalacOptions ++= Seq("-deprecation", "-feature", "-unchecked",
  "-Xlint:inaccessible,infer-any,missing-interpolator,nullary-unit")
// Mirror of the reference's PR gate (.github/workflows/pr_checks.yml:
// 24-48 — lint, tests, artifacts) as one offline command. Formatting
// (.scalafmt.conf) needs the network-resolved scalafmt CLI, so inside
// this container the lint leg is the compiler's -Xlint set; CI with
// network prepends `scalafmt --check .`.
addCommandAlias("check", ";compile;Test/compile;test;package")
// License-header gate — the analogue of the reference's
// .github/linters/check_headers_exist.sh (pr_checks.yml:24-48): every
// tracked source file must open with a copyright/SPDX header.
lazy val licenseHeaderCheck =
  taskKey[Unit]("fail on source files missing a license header")
licenseHeaderCheck := {
  val srcs = ((baseDirectory.value / "src") ** "*.scala").get ++
    ((baseDirectory.value / "scripts") ** "*.py").get
  val bad = srcs.filterNot(f =>
    IO.readLines(f).take(3).exists(_.contains("SPDX-License-Identifier")))
  if (bad.nonEmpty)
    sys.error(bad.mkString("missing license header:\n  ", "\n  ", ""))
}
// End-of-file discipline — the analogue of the reference pre-commit's
// end-of-file-fixer: every source file ends with exactly one newline.
lazy val eofCheck =
  taskKey[Unit]("fail on source files not ending in one newline")
eofCheck := {
  val srcs = ((baseDirectory.value / "src") ** "*.scala").get ++
    ((baseDirectory.value / "scripts") ** "*.py").get
  val bad = srcs.filter { f =>
    val bytes = IO.readBytes(f)
    bytes.isEmpty || bytes.last != '\n' ||
      (bytes.length >= 2 && bytes(bytes.length - 2) == '\n')
  }
  if (bad.nonEmpty)
    sys.error(bad.mkString("bad end-of-file:\n  ", "\n  ", ""))
}
addCommandAlias("ciCheck", ";licenseHeaderCheck;eofCheck;check")
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
  // Whole-stage codegen emits one or more classes per query stage; a
  // session running the full query suite compiles thousands of them and
  // the JDK default 240m code cache starts flushing JIT'd methods,
  // which shows up as multi-second per-query regressions late in a run.
  "-XX:ReservedCodeCacheSize=1g",
)
