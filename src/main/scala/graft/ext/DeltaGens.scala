package graft.ext

/** THE delta-generation lifecycle core, shared by every persisted tier
  * (round-14 consolidation of three near-verbatim copies — IVF/graph
  * in [[Similarity]], the near-dup band tier in [[Dedup]], the BM25
  * posting tier in [[Lex]]): numbered `gen=N` directories under a
  * tier-local delta root, each made visible ONLY by a per-generation
  * completion marker written strictly LAST. The crash-window semantics
  * every tier's correctness rests on live HERE, once:
  *
  *  - a marker-less generation (crashed writer) is INVISIBLE to
  *    [[completed]] — readers serve the last completed state;
  *  - its slot is RECLAIMED: [[next]] numbers from the last COMPLETED
  *    generation, so the successor's overwrite replaces the debris;
  *  - generation numbering is monotone within a tier lifetime, so
  *    latest-wins merge rules (the IVF/graph per-id supersede) can key
  *    on the generation index.
  *
  * A fix to this discipline lands in every tier at once — the reason
  * this is one object, not three private copies. */
private[ext] object DeltaGens {

  def genPath(deltaRoot: String, gen: Int): String = s"$deltaRoot/gen=$gen"

  private def fsOf(spark: org.apache.spark.sql.SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Completed generation numbers under `deltaRoot`, ascending —
    * a generation counts iff its `marker` file exists. */
  def completed(spark: org.apache.spark.sql.SparkSession, deltaRoot: String,
                marker: String): Seq[Int] = {
    val fs = fsOf(spark, deltaRoot)
    val root = new org.apache.hadoop.fs.Path(deltaRoot)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap(s => s.getPath.getName.stripPrefix("gen=").toIntOption)
      .filter(g => fs.exists(new org.apache.hadoop.fs.Path(
        s"${genPath(deltaRoot, g)}/$marker")))
      .sorted
  }

  /** The next generation number: one past the last COMPLETED one —
    * crashed (marker-less) slots above it are overwritten, which is the
    * reclaim semantics. */
  def next(spark: org.apache.spark.sql.SparkSession, deltaRoot: String,
           marker: String): Int =
    completed(spark, deltaRoot, marker).lastOption.getOrElse(0) + 1

  /** Make a generation visible — its marker, written strictly LAST. */
  def markComplete(spark: org.apache.spark.sql.SparkSession, genPath: String,
                   marker: String): Unit = {
    fsOf(spark, genPath)
      .create(new org.apache.hadoop.fs.Path(s"$genPath/$marker"), true)
      .close()
  }

  /** Drop the whole delta root (replay idempotence / post-compaction). */
  def drop(spark: org.apache.spark.sql.SparkSession, deltaRoot: String): Unit = {
    fsOf(spark, deltaRoot)
      .delete(new org.apache.hadoop.fs.Path(deltaRoot), true)
    ()
  }

  /** The gens/ratio auto-compaction policy, shared verbatim by the
    * band, posting, IVF and graph tiers: fire at `maxGens` completed
    * generations, or when the delta/base size ratio (computed LAZILY —
    * an infinite `maxRatio` can never fire, so the per-generation
    * count jobs are skipped entirely) reaches `maxRatio`.
    *
    * INTENDED semantics of `maxRatio = ∞` (round-15 ADVICE note): the
    * ratio arm is OFF — only the gens bar can fire. This deliberately
    * differs from the three pre-consolidation copies in one edge case:
    * an EMPTY base with live generations used to fire the ratio arm
    * (their `nBase == 0 ||` short-circuit ran before the ratio
    * compare) even at infinite `maxRatio`. The replay harnesses that
    * pass ∞ do so precisely to pin EXACTLY-ONCE gens-bar firing, so
    * "∞ = gens-bar only" is the contract, not an accident; callers
    * that want empty-base urgency encode it in their lazy ratio
    * (all four tiers return Double.MaxValue there), which fires at
    * every FINITE `maxRatio`. */
  def shouldCompact(gens: Seq[Int], maxGens: Int, maxRatio: Double)
                   (ratio: => Double): Boolean =
    gens.nonEmpty && (gens.sizeIs >= maxGens ||
      (!maxRatio.isInfinity && ratio >= maxRatio))
}
