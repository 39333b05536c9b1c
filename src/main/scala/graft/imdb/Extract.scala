package graft.imdb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Extract phase — the Spark form of the reference's stage + COPY INTO
  * (/root/reference/etl_imdb_db.sql:56-82).
  *
  * Option mapping (SURVEY.md §2.1 S4/S5):
  *  - SKIP_HEADER=1                      → header=true
  *  - FIELD_OPTIONALLY_ENCLOSED_BY='"'   → quote="\"" (Spark default)
  *  - literal "NULL" strings in the data → nullValue="NULL" (PERMISSIVE);
  *    this replaces the reference's ON_ERROR='CONTINUE' row-dropping on
  *    names.csv — see SURVEY.md §1.4(2) for why this is the documented,
  *    join-neutral policy (set dropMalformed=true to emulate Snowflake's
  *    row skipping instead).
  */
object Extract {

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              dropMalformed: Boolean = false): DataFrame = {
    val base = spark.read
      .schema(schema)
      .option("header", "true")
      .option("quote", "\"")
      .option("nullValue", "NULL")
      .option("dateFormat", "yyyy-MM-dd")
    (if (dropMalformed) base.option("mode", "DROPMALFORMED") else base)
      .csv(path)
  }

  /** All six staging tables from a base directory (the "stage"). */
  def readAll(spark: SparkSession, baseDir: String,
              dropMalformed: Boolean = false): Map[String, DataFrame] =
    Schemas.files.map { case (table, (schema, file)) =>
      table -> readCsv(spark, s"$baseDir/$file", schema, dropMalformed)
    }
}
