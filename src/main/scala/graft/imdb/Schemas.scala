package graft.imdb

import org.apache.spark.sql.types._

/** Explicit staging schemas — mirrors the typed DDL of the reference
  * (/root/reference/etl_imdb_db.sql:8-53). No schema inference: at 100 TB
  * an inference pass is a full extra scan, and the reference declares
  * types explicitly too. Primary keys are metadata only (asserted in
  * tests), exactly like Snowflake treats them.
  */
object Schemas {

  /** etl_imdb_db.sql:8-18 */
  val movies: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("title", StringType),
    StructField("year", IntegerType),
    StructField("date_published", DateType),
    StructField("duration", IntegerType),
    StructField("country", StringType),
    StructField("worlwide_gross_income", StringType), // sic — reference typo
    StructField("languages", StringType),
    StructField("production_company", StringType)))

  /** etl_imdb_db.sql:20-24 */
  val genres: StructType = StructType(Seq(
    StructField("movie_id", StringType, nullable = false),
    StructField("genre", StringType, nullable = false)))

  /** etl_imdb_db.sql:26-32 */
  val names: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType),
    StructField("height", IntegerType),
    StructField("date_of_birth", DateType),
    StructField("known_for_movies", StringType)))

  /** etl_imdb_db.sql:34-40 — avg_rating DECIMAL(3,1) preserved. */
  val ratings: StructType = StructType(Seq(
    StructField("movie_id", StringType, nullable = false),
    StructField("avg_rating", DecimalType(3, 1)),
    StructField("total_votes", IntegerType),
    StructField("median_rating", IntegerType)))

  /** etl_imdb_db.sql:42-46 */
  val directorMapping: StructType = StructType(Seq(
    StructField("movie_id", StringType, nullable = false),
    StructField("name_id", StringType, nullable = false)))

  /** etl_imdb_db.sql:48-53 */
  val roleMapping: StructType = StructType(Seq(
    StructField("movie_id", StringType, nullable = false),
    StructField("name_id", StringType, nullable = false),
    StructField("category", StringType)))

  /** csv file name per table (ganre.csv sic — reference file name). */
  val files: Map[String, (StructType, String)] = Map(
    "movies_staging" -> (movies, "movie.csv"),
    "genres_staging" -> (genres, "ganre.csv"),
    "name_staging" -> (names, "names.csv"),
    "ratings_staging" -> (ratings, "ratings.csv"),
    "director_mapping_staging" -> (directorMapping, "director_mapping.csv"),
    "role_mapping_staging" -> (roleMapping, "role_mapping.csv"))
}
