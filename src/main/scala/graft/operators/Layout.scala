package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-layout operators (K6): the engine-side equivalent of the
  * reference's Qdrant payload keyword indexes on topic_id/url
  * (embedded_articles.py:203-212). Clustering rows by key and sorting
  * within partitions gives parquet min/max row-group skipping on that
  * key — the scan-side index a shared-nothing engine actually uses.
  */
object Layout {

  /** Cluster by `keyCol` into `n` partitions, sorted within partitions
    * by (key, sortCols…). Every key lands in exactly one partition.
    */
  def byKey(df: DataFrame, keyCol: String, n: Int,
            sortCols: String*): DataFrame =
    df.repartition(n, col(keyCol))
      .sortWithinPartitions((keyCol +: sortCols).map(col): _*)
}
