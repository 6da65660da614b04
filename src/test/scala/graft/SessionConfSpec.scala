package graft

/** Pins the semantics- and pathology-critical session conf that every
  * entry point inherits through Sessions.builder — a silent conf loss
  * here reverts a measured engine fix without failing any oracle.
  */
class SessionConfSpec extends SparkSpec {

  test("artifact isolation stays OFF (codegen classload RPC pathology, r16)") {
    // Spark 4's per-session artifact classloader routes janino codegen
    // class probes through a blocking Netty file-download RPC; a bench
    // sweep jstack showed executor threads pinned there with the whole
    // JVM ~2.5× slow (BASELINE.md r16). This engine registers no session
    // artifacts — the flag must stay off.
    assert(spark.conf.get("spark.sql.artifact.isolation.enabled") === "false")
  }

  test("semantics conf: UTC, AQE, nanosAsLong, graft extensions") {
    assert(spark.conf.get("spark.sql.session.timeZone") === "UTC")
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") === "true")
    assert(spark.conf.get("spark.sql.extensions")
      .contains("graft.expr.GraftExtensions"))
  }
}
