package graft.streaming

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.SparkSession

/** The CURRENT-VERSION pointer for versioned artifact roots — the
  * contract [[EmbeddingIndexer.rebuildIfDue]] /
  * [[TokenizerRefresher.retrainIfDue]] rebuilds were missing: they
  * write `v<batch>` siblings and "the caller re-points", but a
  * convention nothing records means a restart can silently serve stale
  * artifacts. Here the pointer is a FILE under the root
  * (`.current_version`, holding the version name), so which version
  * serves is persisted state any process can resolve, not a variable
  * in whoever launched the rebuild.
  *
  * Swap protocol: the new pointer body is written to a dot-prefixed
  * temp file and renamed over `.current_version` via
  * [[org.apache.hadoop.fs.FileContext]] `Rename.OVERWRITE` — an atomic
  * metadata operation on HDFS (and a plain rename on local/posix), so
  * a reader sees either the old pointer or the new one, never a
  * partial body and never a missing file mid-swap. A rebuild that
  * dies BEFORE repointing leaves the pointer (and therefore serving)
  * on the old version — the blue/green property; old version dirs are
  * never touched, so in-flight readers of the previous version keep
  * working until their next [[currentDir]] resolution.
  *
  * Scale stance: the pointer is metadata-sized and read once per
  * serving-session bootstrap — never on the per-query or per-batch
  * path. */
object ArtifactVersions {

  private val PointerName = ".current_version"

  /** Atomically record `version` (a child name under `root`, e.g.
    * "v7") as current. Call AFTER the version's artifacts are fully
    * written — the pointer is the commit point. */
  def repoint(session: SparkSession, root: String, version: String): Unit = {
    require(version.nonEmpty && !version.contains("\n") && !version.contains("/"),
      s"version '$version' must be a non-empty child name (no '/', no newline)")
    val conf = session.sessionState.newHadoopConf()
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    fs.mkdirs(rootPath)
    val tmp = fs.makeQualified(new Path(rootPath, s"$PointerName.tmp"))
    val ptr = fs.makeQualified(new Path(rootPath, PointerName))
    val out = fs.create(tmp, true)
    try out.write(version.getBytes("UTF-8")) finally out.close()
    // FileSystem.rename refuses an existing destination; FileContext's
    // OVERWRITE rename is the atomic replace this swap needs
    FileContext.getFileContext(ptr.toUri, conf)
      .rename(tmp, ptr, Options.Rename.OVERWRITE)
  }

  /** The recorded current version name, or None when nothing has ever
    * been repointed (cold start: serve whatever convention the caller
    * has — e.g. the root itself). */
  def current(session: SparkSession, root: String): Option[String] = {
    val conf = session.sessionState.newHadoopConf()
    val ptr = new Path(new Path(root), PointerName)
    val fs = ptr.getFileSystem(conf)
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      val body =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      if (body.isEmpty) None else Some(body)
    }
  }

  /** The read face serving resolves through: `root/<current>`, or
    * None before the first repoint. */
  def currentDir(session: SparkSession, root: String): Option[String] =
    current(session, root).map(v => s"$root/$v")

  /** All VERSION children under `root` (`v<batch>` dirs /
    * `v<batch>.json` files), oldest first by batch id. Cold-start
    * artifacts living directly under the root (`weights`,
    * `coarse_centroids`, …) are NOT versions and never list — so
    * [[prune]] can never mistake the cold-start layout for history. */
  def versions(session: SparkSession, root: String): Seq[String] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(session.sessionState.newHadoopConf())
    if (!fs.exists(rootPath)) Nil
    else fs.listStatus(rootPath).map(_.getPath.getName).toSeq
      .filter(_.matches("^v\\d+(\\..+)?$"))
      .sortBy(batchOf)
  }

  private def batchOf(version: String): Long =
    "^v(\\d+)".r.findFirstMatchIn(version).map(_.group(1).toLong)
      .getOrElse(Long.MaxValue)

  /** RETENTION for a versioned root — the blue/green loop's missing
    * end: every retrain/rebuild appends a `v<batch>` sibling forever,
    * so a long-lived deployment needs the old versions reclaimed.
    * Deletes all but the NEWEST `keep` versions, and NEVER the pointer
    * target (the serving version is kept even when it is older than
    * every survivor — a just-staged-but-not-repointed newer version
    * must not orphan what is live). Returns the deleted names. Call
    * AFTER consumers have re-resolved [[currentDir]] — in-flight
    * readers of a deleted version lose their files, which is why the
    * default retention everywhere else in this module is "never
    * touch old versions" and pruning is an explicit operator act. */
  def prune(session: SparkSession, root: String, keep: Int): Seq[String] = {
    require(keep >= 1, s"keep=$keep must be >= 1")
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(session.sessionState.newHadoopConf())
    val cur = current(session, root)
    val vs = versions(session, root)
    val keepSet = vs.takeRight(keep).toSet ++ cur
    val victims = vs.filterNot(keepSet)
    victims.foreach(v => fs.delete(new Path(rootPath, v), true))
    victims
  }
}
