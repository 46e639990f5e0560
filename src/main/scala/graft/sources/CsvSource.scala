package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.spec.Dialect

/** Delimited-text source + descriptor inference — the reference's
  * native input path.
  *
  *  - S1/S2 (reference: upload accepts {csv,tsv,json} src/cattle.py:30;
  *    TSV renamed to .csv and treated identically :124-127,194-195;
  *    dialect keys delimiter/quoteChar/encoding round-tripped by the
  *    editor, src/static/ruminator/js/ruminator.js:288-290,374-392):
  *    dialect-aware distributed CSV parse via the built-in reader, all
  *    columns kept as strings — cells stay lexical until the
  *    descriptor coerces them (SURVEY.md §1.2).
  *
  *  - B1 "build" mode (reference: COW(mode='build') at
  *    src/cattle.py:206-209 emits a default descriptor inferred from
  *    the header): a driver-side job reading the header + a row sample,
  *    emitting the default descriptor JSON (one column spec per header
  *    column, default propertyUrl; integer-looking columns get
  *    xsd:integer + grouping normalization — the data/imf.csv:2 trap).
  *
  *  - C1 `{_row}` numbering (CSVW builtin): provided for small-scale
  *    CSV parity ONLY — a global row_number is a single-partition
  *    window. The web pipeline NEVER mints identity from row position
  *    (SURVEY.md §4.3); subjects come from url/content.
  */
object CsvSource {

  /** Dialect-aware CSV/TSV read; every column arrives as StringType. */
  def read(spark: SparkSession, path: String, dialect: Dialect = Dialect(),
      header: Boolean = true): DataFrame =
    spark.read
      .option("header", header)
      .option("sep", dialect.delimiter)
      .option("quote", dialect.quoteChar)
      .option("encoding", dialect.encoding)
      .option("inferSchema", false) // lexical-form discipline: strings in
      .csv(path)

  /** TSV = CSV with a tab dialect (the reference renames the file and
    * converts identically).
    */
  def readTsv(spark: SparkSession, path: String, header: Boolean = true): DataFrame =
    read(spark, path, Dialect(delimiter = "\t"), header)

  /** 1-based `{_row}` column for CSV parity fixtures. Small-scale only
    * by design: the unpartitioned window is the honest cost of global
    * physical-position identity, which the web pipeline forbids.
    */
  def withRowNum(df: DataFrame): DataFrame =
    df.withColumn("_row",
      row_number().over(Window.orderBy(monotonically_increasing_id())).cast("long"))

  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** B1 schema inference: sample `sampleRows` rows; a column whose
    * non-null sampled values all match optionally-digit-grouped
    * integers gets xsd:integer + strip-grouping; everything else stays
    * a plain string literal. Returns the default descriptor JSON
    * (edit-then-convert, the reference's decide_scheme workflow).
    * Dataset-level metadata stubs (`dc:publisher{schema:name,
    * schema:url{@id}}`, `dc:license{@id}`) are always emitted — the
    * reference's editor reads and writes exactly those paths
    * (src/static/ruminator/js/ruminator.js:289-292,396-416), so a
    * descriptor without them breaks the round-trip (VERDICT round 1,
    * "What's missing" item 1).
    */
  def inferDescriptor(df: DataFrame, base: String,
      aboutUrl: String = "row/{_row}", graph: String = "",
      dialect: Dialect = Dialect(), sampleRows: Int = 100,
      publisherName: String = "", publisherUrl: String = "",
      license: String = ""): String = {
    val cols = df.columns
    val sample = df.limit(sampleRows).collect()
    val intLike = "^-?[0-9][0-9,]*$".r
    val specs = cols.map { c =>
      val idx = df.columns.indexOf(c)
      val vals = sample.map(_.getString(idx)).filter(v => v != null && v.nonEmpty)
      val isInt = vals.nonEmpty && vals.forall(v => intLike.matches(v))
      val extra =
        if (isInt) """, "datatype": "xsd:integer", "transforms": ["strip-grouping"]"""
        else ""
      s"""    { "name": ${jstr(c)}, "propertyUrl": ${jstr(base + "vocab/" + c)}$extra }"""
    }
    val g = if (graph.nonEmpty) graph else base + "graph/default"
    s"""{
       |  "@base": ${jstr(base)},
       |  "aboutUrl": ${jstr(aboutUrl)},
       |  "graph": ${jstr(g)},
       |  "dialect": { "delimiter": ${jstr(dialect.delimiter)}, "quoteChar": ${jstr(dialect.quoteChar)}, "encoding": ${jstr(dialect.encoding)} },
       |  "dc:publisher": { "schema:name": ${jstr(publisherName)}, "schema:url": { "@id": ${jstr(publisherUrl)} } },
       |  "dc:license": { "@id": ${jstr(license)} },
       |  "tableSchema": { "columns": [
       |${specs.mkString(",\n")}
       |  ] }
       |}""".stripMargin
  }
}
