package graft.imdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.syntax._

/** Transform phase — the four CTAS star-schema builders
  * (/root/reference/etl_imdb_db.sql:90-141), quirks preserved per
  * SURVEY.md §1.4. Each is a pure DataFrame→DataFrame function;
  * dependency order (dims before fact) is the Pipeline's job.
  *
  * Scale notes: every builder ends in distinct() (the reference's
  * SELECT DISTINCT ×4) — a hash aggregate over all projected columns,
  * partial map-side + one exchange. The joins here are dim-sized on one
  * side in any realistic star schema, so AQE turns them into broadcast
  * hash joins; nothing below forces a sort-merge.
  */
object Transform {

  /** etl_imdb_db.sql:90-100 — rename id→movie_id, drop the gross column. */
  def dimMovies(movies: DataFrame): DataFrame =
    movies.select(
      $"id".as("movie_id"), $"title", $"year", $"date_published",
      $"duration", $"country", $"languages", $"production_company")
      .distinct()

  /** etl_imdb_db.sql:103-113 — names ⟕ role_mapping ⟕ director_mapping.
    * Grain = person × role-category × directed-movie (person_id NOT
    * unique — preserved, SURVEY.md §1.4(7)). */
  def dimPeople(names: DataFrame, roles: DataFrame, directors: DataFrame): DataFrame =
    names
      .join(roles, names("id") === roles("name_id"), "left")
      .join(directors, names("id") === directors("name_id"), "left")
      .select(
        names("id").as("person_id"),
        $"name",
        roles("category").as("role"),
        $"known_for_movies",
        $"date_of_birth",
        directors("movie_id").as("directed_movie_id"))
      .distinct()

  /** etl_imdb_db.sql:120-124 — degenerate dimension: genre_id == genre_name. */
  def dimGenres(genres: DataFrame): DataFrame =
    genres.select($"genre".as("genre_id"), $"genre".as("genre_name")).distinct()

  /** etl_imdb_db.sql:129-141 — movies ⟕ ratings ⟕ genres ⟕ dim_genres ⟕
    * dim_people. Quirks preserved exactly:
    *  - director_id comes from dp.known_for_movies = m.id (NOT
    *    director_mapping) — SURVEY.md §1.4(1);
    *  - the dim_genres join is a genre→itself no-op kept for its
    *    LEFT-join null pattern — §1.4(6). */
  def factMovies(movies: DataFrame, ratings: DataFrame, genres: DataFrame,
                 dimGenres: DataFrame, dimPeople: DataFrame): DataFrame =
    movies
      .join(ratings, movies("id") === ratings("movie_id"), "left")
      .join(genres, movies("id") === genres("movie_id"), "left")
      .join(dimGenres, genres("genre") === dimGenres("genre_name"), "left")
      .join(dimPeople, dimPeople("known_for_movies") === movies("id"), "left")
      .select(
        movies("id").as("movie_id"),
        dimGenres("genre_id"),
        dimPeople("person_id").as("director_id"),
        ratings("total_votes"),
        ratings("avg_rating"),
        movies("duration"))
      .distinct()
}
