package graft.operators

import org.apache.spark.sql.DataFrame

/** Column-name comparison honoring the session's resolver semantics
  * (`spark.sql.caseSensitive`, default false). Operator-level column
  * checks must accept any name Spark would resolve and reject any name
  * Spark would see as colliding — an exact-string check does neither
  * under the default case-insensitive resolution. */
private[operators] object Names {
  def matcher(df: DataFrame): (String, String) => Boolean = {
    val cs = df.sparkSession.conf.get("spark.sql.caseSensitive", "false").toBoolean
    if (cs) (a, b) => a == b
    else (a, b) => a.equalsIgnoreCase(b)
  }
}
