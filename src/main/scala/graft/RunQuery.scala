package graft
import org.apache.spark.sql.SparkSession

/** Single-query runner for scale gating: execute one SparkEntry query
  * at any sf dir and show its rows (contract-boolean queries print
  * their one row of gates) — `runMain graft.RunQuery <name> [sfDir]`.
  * The round discipline gates every NEW query at sf0.001/0.01/0.1;
  * Verify covers the first two, this covers the third without paying
  * a full Verify dump at bench scale. */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, sfDir)
    val n = df.count()
    println(f"[runquery] $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.1fs sf=$sfDir")
    df.show(20, truncate = false)
    spark.stop()
  }
}
