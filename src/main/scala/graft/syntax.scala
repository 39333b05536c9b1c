package graft

import org.apache.spark.sql.ColumnName

/** `$"col"` interpolator without needing a SparkSession's implicits in
  * scope (mirrors org.apache.spark.sql.SQLImplicits#StringToColumn). */
object syntax {
  implicit class ColInterp(private val sc: StringContext) extends AnyVal {
    def $(args: Any*): ColumnName = new ColumnName(sc.s(args: _*))
  }
}
