package graft.ext

/** Completion markers with FINGERPRINT CONTENT — the shared discipline
  * of every persisted tier (IVF-PQ codes, near-dup bands, BPE models):
  * the marker is written strictly AFTER the tier's artifacts, and its
  * content pins the parameters/codec that produced them, so
  *  - a crash mid-write reads as "no tier" (marker absent), and
  *  - a parameter or codec re-cut reads as "no tier" (content
  *    mismatch — including the empty content of pre-fingerprint
  *    markers), never as a stale tier serving keys cut the old way.
  * Tier roots are keyed by CORPUS identity (file mtime+length), which
  * cannot see how the artifacts were computed; the fingerprint is the
  * missing half of that key. */
object Markers {

  private def fs(spark: org.apache.spark.sql.SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** True iff the marker exists AND carries exactly `fingerprint`. */
  def matches(spark: org.apache.spark.sql.SparkSession, markerPath: String,
              fingerprint: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(markerPath)
    val f = fs(spark, markerPath)
    f.exists(p) && {
      val in = f.open(p)
      val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      content == fingerprint
    }
  }

  /** Write (replace) the marker with `fingerprint` as content. Call
    * strictly AFTER every tier artifact is on disk. */
  def write(spark: org.apache.spark.sql.SparkSession, markerPath: String,
            fingerprint: String): Unit = {
    val out = fs(spark, markerPath)
      .create(new org.apache.hadoop.fs.Path(markerPath), true)
    out.write(fingerprint.getBytes("UTF-8"))
    out.close()
  }

  /** Delete the marker (the first step of any rewrite). */
  def delete(spark: org.apache.spark.sql.SparkSession, markerPath: String): Unit = {
    fs(spark, markerPath)
      .delete(new org.apache.hadoop.fs.Path(markerPath), false)
    ()
  }
}
