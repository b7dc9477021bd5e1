package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}

/** Reader for psp.cz UNL dumps (reference `data/parser.py:12-86`, S3/S4):
  * pipe-delimited, windows-1250, headerless, NO quoting (stray quote chars
  * are literal data), trailing pipe yields a phantom last column (dropped),
  * ragged lines tolerated, every field read as string then
  * whitespace-trimmed and cast (bad cast becomes null — the reference's
  * `strict=False`).
  *
  * All quirks are covered by built-in CSV options — no custom FileFormat
  * needed (SURVEY section 7.3); multi-file periods (`hl{year}h*.unl`) are a
  * glob path, Spark unions by position for free.
  */
object UnlReader {

  /** Read one UNL file/glob with the target schema. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    // Spark 4 restricts CSV charsets to a short allowlist by default;
    // windows-1250 needs the JVM-charset escape hatch
    spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    val rawSchema = StructType(
      schema.fields.map(f => f.copy(dataType = StringType)) :+
        StructField("__phantom", StringType))
    val raw = spark.read
      .schema(rawSchema)
      .option("delimiter", "|")
      .option("header", "false")
      .option("encoding", "windows-1250")
      // empty quote string disables CSV quoting entirely
      .option("quote", "")
      .option("mode", "PERMISSIVE")
      .csv(path)
      .drop("__phantom")
    // trim + cast with null-on-failure (try_cast, matching strict=False)
    raw.select(schema.fields.toSeq.map { f =>
      if (f.dataType == StringType) col(f.name)
      else tryCastCol(trim(col(f.name)), f.dataType).as(f.name)
    }: _*)
  }

  private def tryCastCol(c: Column, t: DataType): Column = c.try_cast(t.sql)
}
