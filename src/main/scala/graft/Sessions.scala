package graft

import org.apache.spark.sql.SparkSession

/** One place to construct the engine's SparkSession so every entry point
  * (Verify, Bench, CLI, tests) runs with identical semantics-affecting conf.
  *
  * Scale posture: shuffle partitions default to the local core count here
  * (local[32] single-JVM); on a real cluster the same builder is used with
  * AQE coalescing enabled, which right-sizes post-shuffle partitions at
  * runtime, so the static number only seeds the initial plan.
  */
object Sessions {

  /** Shuffle/spill local directory: the fastest local storage available
    * (standard ops practice — shuffle write/commit is metadata-heavy and
    * the guide's §2.1 notes local disk can be the tighter limit). On this
    * box /tmp is disk-backed ext4 whose create+commit under 32-way task
    * concurrency sampled at ~8 ms/open (FileOutputStream.open0 +
    * IndexShuffleBlockResolver commit were the dominant frames of the
    * whole post-shuffle tail after the r18 scan widening); tmpfs creates
    * are 23× faster single-threaded and lock-free-er concurrent. Env
    * SPARK_GRAFT_LOCAL_DIR overrides; unset + no /dev/shm → Spark's
    * default (java.io.tmpdir). A real cluster sets spark.local.dir to
    * NVMe/ramdisk the same way.
    */
  private def localDir: Option[String] =
    sys.env.get("SPARK_GRAFT_LOCAL_DIR").filter(_.nonEmpty).orElse {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) Some("/dev/shm/graft-spark-local")
      else None
    }

  def builder(appName: String, cpus: String): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // native engine expressions (float_vec_dot, …)
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      // events.parquet carries ns timestamps; read them as raw longs
      // session-wide (Tables.events does the µs truncation). Set once here,
      // never mutated mid-session (ADVICE r01).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // the SQL-listener plan description is generated EAGERLY for every
      // action even with the UI off, and the default "formatted" mode
      // (ExplainUtils.generateOperatorIDs) re-walks shared subtrees per
      // PATH — on iterative queries whose persisted layers nest
      // InMemoryRelations (BPE rounds, dangling PageRank) that walk is
      // exponential and was measured dominating entire actions. "simple"
      // skips operator-ID generation; explain("formatted") on demand is
      // unaffected.
      .config("spark.sql.ui.explainMode", "simple")
      // belt-and-braces bound on any plan string the session does render
      .config("spark.sql.maxPlanStringLength", "100000")
      // Spark 4 session-artifact isolation wraps every executor task
      // classloader in an RPC-fetching loader (replClassURI = spark://…)
      // even when a session never adds an artifact. Janino codegen
      // compilation probes HUNDREDS of candidate class names per
      // generated class; every miss then walks
      // ExecutorClassLoader.findClassLocally → a blocking Netty
      // file-download RPC → ClassNotFound. jstack'd during a degraded
      // r16 bench sweep: executor threads pinned in
      // NettyRpcEnv$FileDownloadChannel.read under janino findIClass,
      // whole-JVM ~2.5× slowdown with an idle box and clean cpu probes
      // (BASELINE.md r16). This engine registers no session artifacts —
      // disable the isolation so codegen class resolution stays
      // in-process.
      .config("spark.sql.artifact.isolation.enabled", "false")
    localDir.fold(b)(d => b.config("spark.local.dir", d))
  }

  def local(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = builder(appName, cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
