package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** The engine's source/sink surface: format-dispatched reads and
  * scale-aware writes for corpus tables.
  *
  * The reference keeps all data in database tables (SURVEY §1.1); on Spark
  * the equivalent contract is "a directory of columnar files with a
  * schema". Parquet is the primary format (pushdown + pruning + stats);
  * CSV/JSON/text are ingestion formats — read them once, write parquet,
  * query that.
  *
  * Write defaults that matter at 100 TB:
  *   - zstd parquet (smaller than snappy at similar scan cost);
  *   - `maxRecordsPerFile` bounds file size so a skewed task can't emit a
  *     10 GB file that later becomes one unsplittable-row-group read;
  *   - partitioned layout (`partitionBy`) turns common predicates into
  *     directory pruning before any I/O happens.
  */
object CorpusIO {

  /** Read `path`, inferring the format from its extension unless `format`
    * says otherwise (a bare directory defaults to parquet). CSV/JSON take
    * an explicit schema — inference at corpus scale means reading the data
    * twice.
    *
    * Header handling is CSV-only (other formats never see the option):
    * schema-less CSV assumes a header (it's the only way to get names);
    * schema-provided CSV defaults to header=false — a headerless file must
    * not lose its first data row — and `options("header" -> "true")` opts
    * back in for exports that carry one. */
  def read(spark: SparkSession, path: String,
      schema: Option[StructType] = None,
      format: Option[String] = None,
      options: Map[String, String] = Map.empty): DataFrame = {
    val fmt = format.getOrElse(path.toLowerCase match {
      case p if p.endsWith(".csv") || p.endsWith(".csv.gz")    => "csv"
      case p if p.endsWith(".json") || p.endsWith(".jsonl")
        || p.endsWith(".json.gz")                              => "json"
      case p if p.endsWith(".txt")                             => "text"
      case _                                                   => "parquet"
    })
    val r0 = spark.read.format(fmt)
    val r1 = schema.fold(
      if (fmt == "csv") r0.option("header", "true").option("inferSchema", "true")
      else r0)(sc => r0.schema(sc))
    r1.options(options).load(path)
  }

  /** Write a partitioned, size-bounded parquet table. `partitionCols` are
    * the predicate columns (directory pruning); pass empty for flat. */
  def writeParquet(df: DataFrame, path: String,
      partitionCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 5000000L,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
      .option("compression", "zstd")
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }

  /** Export for downstream non-Spark consumers (one header per file). */
  def writeCsv(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", "true")
      .option("compression", "gzip").csv(path)

  /** JSONL export (the interchange format most LLM-corpus tooling reads). */
  def writeJsonl(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("compression", "gzip").json(path)
}
