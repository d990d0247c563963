package graft.model

import java.time._
import java.time.format.DateTimeFormatter

/** Datetime ⇄ epoch-seconds conversions (reference: metrique/utils.py
  * `dt2ts`/`ts2dt`, utils.py:432-457,1269-1317). All times UTC; epoch
  * seconds carried as Double to match the storage model.
  */
object TimeUtils {
  private val dateOnly = DateTimeFormatter.ISO_LOCAL_DATE

  /** Parse a datetime literal into epoch seconds (Double).
    *
    * Accepts `yyyy-MM-dd`, `yyyy-MM-dd HH:mm:ss[.SSS]`, ISO-8601 with
    * `T`, and raw numeric epochs. Like the reference's `date_range`
    * (reference: parse.py:116-122), a `T` separator is treated as a
    * space and trailing zone offsets are dropped (times are UTC).
    */
  def dt2ts(s: String): Double = {
    val trimmed0 = s.trim
    if (trimmed0.matches("[-+]?[0-9]+(\\.[0-9]+)?")) return trimmed0.toDouble
    // 'T' → space; strip trailing offset (+hh:mm / -hh:mm / Z)
    val noT = trimmed0.replace("T", " ")
    val noZone = noT
      .replaceAll("(?i)z$", "")
      .replaceAll("[+-][0-9]{2}:?[0-9]{2}$", "")
      .trim
    val ldt: LocalDateTime =
      if (noZone.matches("[0-9]{4}-[0-9]{2}-[0-9]{2}"))
        LocalDate.parse(noZone, dateOnly).atStartOfDay()
      else {
        val norm = if (noZone.contains(" ")) noZone.replace(" ", "T") else noZone
        LocalDateTime.parse(norm)
      }
    val inst = ldt.toInstant(ZoneOffset.UTC)
    inst.getEpochSecond.toDouble + inst.getNano / 1e9
  }

  /** Epoch seconds → ISO timestamp string (UTC). */
  def ts2dt(ts: Double): String = {
    val secs = math.floor(ts).toLong
    val nanos = math.round((ts - secs) * 1e9)
    Instant.ofEpochSecond(secs, nanos).toString
  }
}
