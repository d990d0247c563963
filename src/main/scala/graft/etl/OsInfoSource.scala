package graft.etl

import graft.model.Meta

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.sys.process._
import scala.util.Try

/** Installed-package source (reference: cubes/osinfo/rpm.py:35-117):
  * `rpm -qa --queryformat` shellout parsed into package objects with
  * `_oid = "{host}__{nvra}"`. Driver-side process → DataFrame
  * (capability parity; the ssh/paramiko remote path maps to running
  * the same shellout against a remote host).
  */
object OsInfoSource {

  val fields: Seq[String] = Seq(
    "name", "version", "release", "arch", "nvra", "license", "os",
    "packager", "platform", "sourcepackage", "sourcerpm", "summary")

  /** The queryformat string handed to rpm (one \x01-separated line per
    * package, mirroring rpm.py:60-76).
    */
  val queryFormat: String =
    fields.map(f => s"%{$f}").mkString("") + "\n"

  val schema: StructType =
    StructType(fields.map(StructField(_, StringType)) :+ StructField("host", StringType))

  /** Query the local rpm database; empty DataFrame when rpm is absent
    * (this container has no rpm).
    */
  def loadPackages(
      spark: SparkSession,
      host: String = "localhost",
      asOf: Double = 0.0): DataFrame = {
    val out = Try(Seq("rpm", "-qa", "--queryformat", queryFormat).!!).getOrElse("")
    fromQueryOutput(spark, out, host, asOf)
  }

  /** The remote-extraction command of the reference's ssh path
    * (rpm.py:77-117 runs the same queryformat through a paramiko
    * channel; here it is one argv — no shell interpolation of the
    * host, so a hostile hostname cannot inject). BatchMode keeps a
    * scheduled extraction from hanging on a password prompt.
    */
  def sshCommand(
      host: String,
      sshOptions: Seq[String] = Seq("-o", "BatchMode=yes")): Seq[String] =
    Seq("ssh") ++ sshOptions ++ Seq(host, "rpm", "-qa", "--queryformat", queryFormat)

  /** Query a remote host's rpm database over ssh; empty DataFrame when
    * unreachable (no ssh targets exist in this environment — the
    * command construction + parse pipeline is the tested surface).
    */
  def loadPackagesRemote(
      spark: SparkSession,
      host: String,
      sshOptions: Seq[String] = Seq("-o", "BatchMode=yes"),
      asOf: Double = 0.0): DataFrame = {
    val out = Try(sshCommand(host, sshOptions).!!).getOrElse("")
    fromQueryOutput(spark, out, host, asOf)
  }

  /** Parse rpm queryformat output (testable without rpm installed). */
  def fromQueryOutput(
      spark: SparkSession,
      out: String,
      host: String,
      asOf: Double): DataFrame = {
    val rows = parseLines(out).map(vals => Row.fromSeq(vals :+ host))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1.max(rows.size / 5000)), schema)
    Meta.wrap(
      df,
      oid = concat_ws("__", col("host"), col("nvra")),
      asOf = asOf,
      dataCols = Some(fields :+ "host"))
  }

  private[etl] def parseLines(out: String): Seq[Seq[String]] =
    out.split("\n").toSeq.filter(_.nonEmpty).map { line =>
      val parts = line.split("", -1).toSeq
      val padded = parts.padTo(fields.size, "")
      // rpm renders missing tags as "(none)"
      padded.take(fields.size).map(v => if (v == "(none)") null else v)
    }
}
