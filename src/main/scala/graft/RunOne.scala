package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: run ONE catalog query against a testdata SF dir, dump its
  * result as a single parquet file, and print its oracle SQL between
  * SQL_START/SQL_END markers — so a new query's DuckDB comparison can be
  * iterated locally in seconds instead of through a full Verify pass
  * (111+ queries) per attempt.
  *
  * Usage: runMain graft.RunOne <queryName> <sfDir> <outDir>
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0); val sfDir = args(1); val out = args(2)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(out)
    println("SQL_START"); println(SparkEntry.oracleSql(name)); println("SQL_END")
    // stdout may not be UTF-8 under sbt (non-ASCII SQL literals mangle
    // to '?'); the file copy is authoritative — Files.writeString is
    // UTF-8, same as Verify's oracle_sql.json
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out.sql"), SparkEntry.oracleSql(name))
    spark.stop()
  }
}
