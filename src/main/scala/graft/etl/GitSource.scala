package graft.etl

import graft.model.Meta

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.sys.process._
import scala.util.Try

/** Git-repository source: commit objects with numstat and trailer
  * extraction (reference: cubes/gitdata/commit.py:54-131).
  *
  * Extraction is a driver-side `git log` subprocess (same as the
  * reference's shellout) feeding `spark.createDataFrame`; everything
  * downstream — trailer regexes, per-file add/del totals — is Column
  * logic on the cluster.
  */
object GitSource {

  val commitSchema: StructType = StructType(Seq(
    StructField("_oid", StringType), // commit sha
    StructField("tree", StringType),
    StructField("parents", ArrayType(StringType)),
    StructField("author", StringType),
    StructField("committer", StringType),
    StructField("author_time", DoubleType), // epoch seconds
    StructField("commit_time", DoubleType),
    StructField("message", StringType),
    StructField("files", MapType(StringType,
      StructType(Seq(StructField("added", IntegerType), StructField("removed", IntegerType))))),
    StructField("added", IntegerType),
    StructField("removed", IntegerType),
    StructField("repo_uri", StringType)))

  private val Sep = ""
  private val RecSep = ""

  /** Load all commits of a local repo as a DataFrame. */
  def loadCommits(spark: SparkSession, repoPath: String, asOf: Double = 0.0): DataFrame = {
    val fmt = Seq("%H", "%T", "%P", "%an <%ae>", "%cn <%ce>", "%at", "%ct", "%B")
      .mkString(Sep)
    val out = Try(Seq(
      "git", "-C", repoPath, "log", "--all", "--numstat",
      s"--pretty=format:$RecSep$fmt$Sep").!!).getOrElse("")
    val rows = parseLog(out).map { c =>
      Row(c.sha, c.tree, c.parents, c.author, c.committer, c.authorTime,
        c.commitTime, c.message,
        c.files.map { case (f, (a, r)) => f -> Row(a, r) },
        c.files.values.map(_._1).sum, c.files.values.map(_._2).sum, repoPath)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, math.max(1, rows.size / 1000 + 1)),
      commitSchema)
    withTrailers(Meta.wrap(
      df, col(Meta.OID), asOf,
      start = Some(col("commit_time")),
      dataCols = Some(Seq("tree", "author", "committer", "message"))))
  }

  private[etl] case class Commit(
      sha: String, tree: String, parents: Seq[String], author: String,
      committer: String, authorTime: Double, commitTime: Double,
      message: String, files: Map[String, (Int, Int)])

  /** Record layout: `\x02 sha \x01 tree \x01 parents \x01 author \x01
    * committer \x01 at \x01 ct \x01 body \x01 <numstat lines>`.
    */
  private[etl] def parseLog(out: String): Seq[Commit] =
    out.split(RecSep).toSeq.filter(_.trim.nonEmpty).map { rec =>
      val parts = rec.split(Sep, -1)
      Commit(
        sha = parts(0).trim, tree = parts(1),
        parents = parts(2).split(" ").toSeq.filter(_.nonEmpty),
        author = parts(3), committer = parts(4),
        authorTime = parts(5).toDouble, commitTime = parts(6).toDouble,
        message = parts(7).trim,
        files = numstatLines(parts.lift(8).getOrElse("")))
    }

  /** numstat lines look like `added\tremoved\tpath` ('-' for binary). */
  private def numstatLines(block: String): Map[String, (Int, Int)] =
    block.split("\n").toSeq.flatMap { l =>
      l.split("\t", 3) match {
        case Array(a, r, path) if a.nonEmpty && r.nonEmpty =>
          Some(path -> (Try(a.toInt).getOrElse(0), Try(r.toInt).getOrElse(0)))
        case _ => None
      }
    }.toMap

  /** Trailer extraction as Column regexes (reference trailers
    * Acked-by/Signed-off-by/Resolves/Related, commit.py:26-30,124-127).
    */
  def withTrailers(df: DataFrame): DataFrame = {
    def all(pat: String) = regexp_extract_all(col("message"), lit(pat), lit(1))
    df.withColumn("acked_by", all("(?m)^\\s*Acked-by:\\s*(.*)$"))
      .withColumn("signed_off_by", all("(?m)^\\s*Signed-off-by:\\s*(.*)$"))
      .withColumn("resolves", all("(?mi)^\\s*Resolves:\\s*(.*)$"))
      .withColumn("related", all("(?mi)^\\s*Related:\\s*(.*)$"))
  }

  // ------------------------------------------------------ oracle fixture

  /** Where the raw-parse fixture parquet lands so the DuckDB oracle can
    * `read_parquet` it by absolute path (the shellout itself is the one
    * layer an external engine cannot replay).
    */
  val FixturePath = "/tmp/graft_fixtures/git_commits_raw.parquet"

  /** The oracle-checkable boundary of the git source: everything BELOW
    * this (subprocess + record split) is a driver-side shellout DuckDB
    * cannot replay; everything ABOVE (trailer regexes, add/del totals)
    * is engine-independent Column logic. One row per numstat file; a
    * commit with no numstat output emits a single null-path zero row so
    * `sum` stays total on both engines.
    */
  def rawNumstatRows(spark: SparkSession, repoPath: String): DataFrame = {
    val fmt = Seq("%H", "%T", "%P", "%an <%ae>", "%cn <%ce>", "%at", "%ct", "%B")
      .mkString(Sep)
    val out = Try(Seq(
      "git", "-C", repoPath, "log", "--all", "--numstat",
      s"--pretty=format:$RecSep$fmt$Sep").!!).getOrElse("")
    val rows = parseLog(out).flatMap { c =>
      val files =
        if (c.files.isEmpty) Seq((null: String, 0, 0))
        else c.files.toSeq.map { case (p, (a, r)) => (p, a, r) }
      files.map { case (p, a, r) =>
        Row(c.sha, c.author, c.committer, c.message,
          c.parents.size.toLong, p, a, r)
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, math.max(1, rows.size / 5000 + 1)),
      StructType(Seq(
        StructField("_oid", StringType),
        StructField("author", StringType),
        StructField("committer", StringType),
        StructField("message", StringType),
        StructField("n_parents", LongType),
        StructField("file_path", StringType),
        StructField("file_added", IntegerType),
        StructField("file_removed", IntegerType))))
  }

  /** Per-commit stats derived purely from the raw fixture layer —
    * trailer extraction + numstat totals as Column logic the oracle
    * replays verbatim (reference semantics: commit.py:54-131).
    */
  def commitStats(raw: DataFrame): DataFrame = {
    val agg = raw.groupBy(Meta.OID).agg(
      first(col("author")).as("author"),
      first(col("message")).as("message"),
      first(col("n_parents")).as("n_parents"),
      sum(col("file_added")).cast("long").as("added"),
      sum(col("file_removed")).cast("long").as("removed"))
    val signoffs =
      regexp_extract_all(col("message"), lit("(?m)^\\s*Signed-off-by:\\s*(.*)$"), lit(1))
    agg.select(
      col(Meta.OID), col("author"), col("added"), col("removed"),
      col("n_parents"),
      size(signoffs).cast("long").as("n_signoffs"),
      array_join(signoffs, "|").as("signoffs"))
  }
}
