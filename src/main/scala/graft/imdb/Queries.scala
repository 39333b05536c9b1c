package graft.imdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.syntax._

/** The six dashboard queries (/root/reference/dashboard_visualizations.sql),
  * as programmatic builders over the star schema. The same six SELECTs are
  * also legal Spark SQL verbatim — Pipeline.registerViews + spark.sql(...)
  * is the second entry path (SURVEY.md §7.1).
  *
  * Graf 3/4's ORDER BY/row_number have no tiebreaker in the reference —
  * preserved here (tests compare tie-tolerantly per SURVEY.md §1.4(5)).
  */
object Queries {

  /** Graf 1 (dashboard_visualizations.sql:1-9): USA vs India in 2019. */
  def graf1(dimMovies: DataFrame): DataFrame =
    dimMovies
      .filter($"country".isin("USA", "India") && $"year" === 2019)
      .groupBy($"country")
      .agg(count($"movie_id").as("number_of_movies"))
      .orderBy($"number_of_movies".desc)

  /** Graf 2 (:12-22): avg duration per genre. */
  def graf2(dimGenres: DataFrame, factMovies: DataFrame): DataFrame =
    dimGenres
      .join(factMovies, dimGenres("genre_id") === factMovies("genre_id"))
      .groupBy($"genre_name".as("genre"))
      .agg(round(avg($"duration"), 2).as("avg_duration"))
      .orderBy($"avg_duration".desc)

  /** Graf 3 (:23-34): top-10 "directors" by movie count (really: people
    * known for movies — quirk §1.4(1) preserved through fact_movies). */
  def graf3(factMovies: DataFrame, dimPeople: DataFrame): DataFrame =
    factMovies
      .join(dimPeople, factMovies("director_id") === dimPeople("person_id"))
      .groupBy($"name".as("director_name"))
      .agg(count($"movie_id").as("movie_count"))
      .orderBy($"movie_count".desc)
      .limit(10)

  /** Graf 4 (:36-70): top-3 directors within top-3 genres (rating > 6).
    * Reads ratings_staging — must run before teardown (SURVEY.md §3.3). */
  def graf4(factMovies: DataFrame, dimPeople: DataFrame, dimGenres: DataFrame,
            ratingsStaging: DataFrame): DataFrame = {
    // factMovies is itself built from ratingsStaging, so re-joining the raw
    // staging table is a lineage self-join: alias its columns first to keep
    // attribute resolution unambiguous (reference SQL uses r.avg_rating).
    val r = ratingsStaging.select(
      col("movie_id").as("r_movie_id"), col("avg_rating").as("r_avg_rating"))
    val fmG = factMovies
      .join(dimGenres, factMovies("genre_id") === dimGenres("genre_id"))
      .join(r, factMovies("movie_id") === $"r_movie_id")
      .filter($"r_avg_rating" > 6)
    val top3Genre = fmG
      .groupBy($"genre_name")
      .agg(count(factMovies("movie_id")).as("movie_count"))
      .orderBy($"movie_count".desc)
      .limit(3)
      .select($"genre_name".as("top_genre"))
    val w = Window.partitionBy($"genre_name")
      .orderBy($"movie_count".desc)
    fmG
      .join(dimPeople, factMovies("director_id") === dimPeople("person_id"))
      .join(broadcast(top3Genre), $"genre_name" === $"top_genre", "left_semi")
      .groupBy($"name", $"genre_name")
      .agg(count(factMovies("movie_id")).as("movie_count"))
      .withColumn("director_rank", row_number().over(w))
      .filter($"director_rank" <= 3)
      .select($"name".as("director_name"), $"movie_count")
  }

  /** Graf 5 (:71-84): most role appearances; dim_people grain fan-out
    * preserved (§1.4(7)). */
  def graf5(roleMappingStaging: DataFrame, dimPeople: DataFrame): DataFrame =
    roleMappingStaging
      .filter($"category".isin("actor", "actress"))
      .join(dimPeople, roleMappingStaging("name_id") === dimPeople("person_id"))
      .groupBy($"name".as("actor_name"))
      .agg(count(lit(1)).as("total_roles"))
      .orderBy($"total_roles".desc)
      .limit(10)

  /** Graf 6 (:85-95): movie count by country (raw multi-valued strings —
    * never exploded, §1.4(3)). */
  def graf6(dimMovies: DataFrame): DataFrame =
    dimMovies
      .groupBy($"country")
      .agg(count($"movie_id").as("movie_count"))
      .orderBy($"movie_count".desc)
      .limit(10)

  // ---- deterministic twins (oracle hashing only) ------------------------
  // The reference's LIMIT/rank cuts have no tiebreaker (SURVEY.md §1.4(5)),
  // so their row SETS are tie-nondeterministic. These twins add a stable
  // secondary sort key so the DuckDB oracle can hash-compare; the
  // unsuffixed builders above stay byte-faithful to the reference.

  /** graf3 with (movie_count desc, name asc) deterministic cut. */
  def graf3Det(factMovies: DataFrame, dimPeople: DataFrame): DataFrame =
    factMovies
      .join(dimPeople, factMovies("director_id") === dimPeople("person_id"))
      .groupBy($"name".as("director_name"))
      .agg(count($"movie_id").as("movie_count"))
      .orderBy($"movie_count".desc, $"director_name".asc)
      .limit(10)

  /** graf4 with deterministic CTE cut + rank tiebreaks. */
  def graf4Det(factMovies: DataFrame, dimPeople: DataFrame, dimGenres: DataFrame,
               ratingsStaging: DataFrame): DataFrame = {
    val r = ratingsStaging.select(
      col("movie_id").as("r_movie_id"), col("avg_rating").as("r_avg_rating"))
    val fmG = factMovies
      .join(dimGenres, factMovies("genre_id") === dimGenres("genre_id"))
      .join(r, factMovies("movie_id") === $"r_movie_id")
      .filter($"r_avg_rating" > 6)
    val top3Genre = fmG
      .groupBy($"genre_name")
      .agg(count(factMovies("movie_id")).as("movie_count"))
      .orderBy($"movie_count".desc, $"genre_name".asc)
      .limit(3)
      .select($"genre_name".as("top_genre"))
    val w = Window.partitionBy($"genre_name")
      .orderBy($"movie_count".desc, $"name".asc)
    fmG
      .join(dimPeople, factMovies("director_id") === dimPeople("person_id"))
      .join(broadcast(top3Genre), $"genre_name" === $"top_genre", "left_semi")
      .groupBy($"name", $"genre_name")
      .agg(count(factMovies("movie_id")).as("movie_count"))
      .withColumn("director_rank", row_number().over(w))
      .filter($"director_rank" <= 3)
      .select($"name".as("director_name"), $"movie_count")
  }

  /** graf5 with (total_roles desc, actor_name asc) deterministic cut. */
  def graf5Det(roleMappingStaging: DataFrame, dimPeople: DataFrame): DataFrame =
    roleMappingStaging
      .filter($"category".isin("actor", "actress"))
      .join(dimPeople, roleMappingStaging("name_id") === dimPeople("person_id"))
      .groupBy($"name".as("actor_name"))
      .agg(count(lit(1)).as("total_roles"))
      .orderBy($"total_roles".desc, $"actor_name".asc)
      .limit(10)

  /** graf6 with (movie_count desc, country asc) deterministic cut. */
  def graf6Det(dimMovies: DataFrame): DataFrame =
    dimMovies
      .groupBy($"country")
      .agg(count($"movie_id").as("movie_count"))
      .orderBy($"movie_count".desc, $"country".asc)
      .limit(10)
}
