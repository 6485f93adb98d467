package graft

/** Build/runtime identification — the analogue of the reference's
  * shadow_rs build module (lib.rs:1-9, `shadow!(build)`), which bakes
  * version metadata into the binary for ops to interrogate. graft's
  * equivalent: static library coordinates plus the runtime-resolved
  * Spark/Scala/JVM versions, surfaced through `GET /config` next to
  * the retention options (the reference exposes its build info the
  * same way — through the serving process, not a side file). */
object BuildInfo {
  val name = "graft"
  val version = "0.5.0" // round-numbered; bumped per driver round
  def sparkVersion: String = org.apache.spark.SPARK_VERSION
  def scalaVersion: String = scala.util.Properties.versionNumberString
  def javaVersion: String = System.getProperty("java.version", "unknown")
}
