package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the engine.
  *
  * Defaults are tuned for the driver harness (`local[32]`, 128 GiB, single
  * JVM) but every knob is the one you would also set on a 1000-executor
  * cluster: UTC session time zone (oracle parity), AQE on (runtime shuffle
  * coalescing + skew-join splitting), shuffle partitions sized to the
  * parallelism at hand rather than the 200 default.
  */
object GraftSession {

  def builder(appName: String = "graft", cores: Int = defaultCores): SparkSession.Builder =
    SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.session.timeZone", "UTC")
      // native functions in the SQL registry + the UPDATE/MERGE DML bridge
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // pandas/DuckDB-parity semantics: null on malformed cast, not error
      .config("spark.sql.ansi.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS) which Spark rejects by
      // default; read as long and convert in Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.sql.warehouse.dir",
        s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft-warehouse")

  def defaultCores: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)

  /** Get-or-create with the engine defaults; safe to call when the driver
    * harness already owns the session (existing session wins in Spark).
    */
  def get(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
