package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source/sink pair — the interchange format every data platform
  * ends up speaking even when its canonical storage is parquet.
  *
  * Both directions are schema-pinned and explicit about the lossy
  * corners of CSV so round-trips are exact:
  *  - an explicit `StructType` on read (no inference job, no silent
  *    type drift between files);
  *  - ISO-8601 timestamps written with microsecond precision
  *    (`timestampFormat`), because the default truncates to millis and
  *    would corrupt `epoch_us`-based comparisons;
  *  - `nullValue`/`emptyValue` split so empty string and NULL survive
  *    the trip distinctly (CSV's classic ambiguity);
  *  - `header=false`: column identity comes from the schema, making
  *    file order the only contract (safe to concatenate shards).
  *
  * Scale: the CSV reader splits files and prunes columns but pushes no
  * predicates and reads text — the comment a user needs is "land CSV,
  * convert to parquet once, query parquet" (see Publish); these helpers
  * are the landing/egress edge, not the query path.
  */
object Csv {

  // nullValue: a marker no data contains, so NULL and empty string stay
  // distinct (empty strings keep the default quoted-"" form on both
  // sides — overriding emptyValue breaks the reader's unquoting).
  private val opts = Map(
    "header" -> "false",
    "nullValue" -> "\\N",
    "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "timestampNTZFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")

  /** Sink: write `df` as headerless CSV shards under `dir`. */
  def write(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").options(opts).csv(dir)

  /** Source: read CSV shards under `dir` with the pinned `schema`. */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.options(opts).schema(schema).csv(dir)
}
