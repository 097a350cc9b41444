package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Tuned for the dev harness (local[32], 128 GiB) but every knob is the one
  * you would also set on a 1000-executor cluster: AQE on (runtime shuffle
  * coalescing + skew-join splitting), small shuffle partition count locally
  * (cluster: ~2-3x total cores), broadcast threshold sized so dimension
  * tables (region/nation/supplier/part) broadcast while facts never do.
  */
object GraftSession {

  /** Resident-driver periodic-GC interval (see the builder comment below).
    * Centralized here (r12 advice): the env override is validated against
    * Spark's own duration parser and falls back to the 90s default on a
    * blank or unparseable value instead of failing session construction
    * with an opaque Spark error; Bench.scala uses the same helper.
    */
  def periodicGcInterval(): String = {
    val default = "90s"
    sys.env.get("SPARK_GRAFT_PERIODIC_GC").map(_.trim).filter(_.nonEmpty) match {
      case Some(v) =>
        try { org.apache.spark.network.util.JavaUtils.timeStringAsSec(v); v }
        catch { case _: Throwable =>
          System.err.println(
            s"[graft] SPARK_GRAFT_PERIODIC_GC='$v' unparseable; using $default")
          default
        }
      case None => default
    }
  }

  def builder(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      .config("spark.sql.parquet.filterPushdown", "true")
      // constraint propagation infers isnotnull(joinKey) filters; when the
      // join key is an expensive derived column (min/max over hashed
      // shingle arrays) the inferred filter inlines and re-evaluates the
      // whole derivation scan-side — measured at 8s of a 23s bench. Our
      // join keys are never null by construction.
      .config("spark.sql.constraintPropagation.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS) which Spark rejects by
      // default; read as Long and normalize in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // resident-driver hygiene (r12, guide §5): without periodic driver
      // GC the ContextCleaner never reaps dead localCheckpoint blocks —
      // a long-lived session accumulates every past query's lineage
      // blocks in the storage pool (see Bench.scala for the measured
      // in-sweep degradation this caused). 90s keeps steady state.
      .config("spark.cleaner.periodicGC.interval", periodicGcInterval())
      .config("spark.ui.enabled", "false")

  def getOrCreate(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
