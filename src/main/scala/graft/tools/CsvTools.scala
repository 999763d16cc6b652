package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.EtlSchema

/** S6/S7 — the reference's CSV fixture dump/load tooling
  * (aux-scripts/odbc.py:72–116) plus the deterministic anonymizer
  * (aux-scripts/anonymize.py, F13).
  */
object CsvTools {

  /** S7 — table → `;`-CSV with header; the reference's "cutoff" mode
    * dumps only user rows referenced by events newer than the cutoff —
    * a collected-id IN list there, a semi join here (J5).
    */
  def cutoffUsers(users: DataFrame, eventlog: DataFrame,
      cutoff: java.sql.Timestamp): DataFrame = {
    // null-safe key parse (ConvertF.tableKeyParse): a malformed
    // table_key must drop out, not throw under ANSI mode — the
    // reference tolerates them (routes to 'F')
    val ids = eventlog
      .filter(col("event_time") > lit(cutoff))
      .select(graft.functions.ConvertF.tableKeyParse(col("table_key"))
        .cast("double").as("id"))
      .filter(col("id").isNotNull)
      .distinct()
    users.join(ids, users("pk_uniqueid") === col("id"), "left_semi")
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true").option("delimiter", ";")
      .option("emptyValue", "").option("nullValue", "")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      // the writer trims cell whitespace by default — CHAR(3) padding
      // and leading/trailing spaces in names are load-bearing (F11)
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)

  // ---- F13 — deterministic anonymizer ------------------------------
  //
  // The reference memoizes random replacements per (column, old value)
  // so re-runs are stable (anonymize.py:12–26). md5-derived values make
  // the hash itself the memo: pure, distributed, reproducible.

  private def h(c: org.apache.spark.sql.Column, salt: String) =
    md5(concat(lit(salt), lit("|"), c))

  /** Name-shaped replacement: letters derived from the value hash,
    * capitalized, length 5–10 (anonymize.py:70–104's shape without the
    * umlaut table — deterministic, collision-resistant).
    */
  def anonName(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val letters = translate(substring(h(c, "name"), 1, 10),
      "0123456789abcdef", "aeioubcdfghklmnp")
    when(c.isNull, null).otherwise(initcap(
      substring(letters, lit(1), (conv(substring(h(c, "len"), 1, 2), 16, 10)
        .cast("int") % 6) + 5)))
  }

  /** Ranged integer replacement (stable per value). */
  def anonInt(c: org.apache.spark.sql.Column, lo: Long, hi: Long) =
    when(c.isNull, null).otherwise(
      (conv(substring(h(c.cast("string"), "int"), 1, 12), 16, 10)
        .cast("long") % (hi - lo)) + lo)

  /** Obfuscated 16-hex-char id (anonymize.py:154–158 shape). */
  def anonHexId(c: org.apache.spark.sql.Column) =
    when(c.isNull, null).otherwise(substring(h(c.cast("string"), "hex"), 1, 16))

  /** Anonymize the sensitive columns of a user table. */
  def anonymizeUsers(users: DataFrame): DataFrame =
    users
      .withColumn("vorname", anonName(col("vorname")))
      .withColumn("nachname", anonName(col("nachname")))
      .withColumn("emailadresse_b",
        when(col("emailadresse_b").isNotNull,
          concat(anonName(col("emailadresse_b")), lit("@example.org"))))
      .withColumn("emailadresse_st",
        when(col("emailadresse_st").isNotNull,
          concat(anonName(col("emailadresse_st")), lit("@example.org"))))
      .withColumn("passwort",
        when(col("passwort").isNotNull, substring(h(col("passwort"), "pw"), 1, 8)))
      .withColumn("person_nr_obf", anonHexId(col("person_nr_obf")))
      .withColumn("st_person_nr_obf", anonHexId(col("st_person_nr_obf")))
      .withColumn("matrikelnummer",
        anonInt(col("matrikelnummer"), 10000000L, 100000000L).cast("string"))
}
