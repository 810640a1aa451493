package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, AsofQueries, CurationQueries, DedupQueries, EventTimeQueries, GraftQuery, HfpPipelineQueries, MultimodalQueries, RelationalQueries, RetrievalQueries, TextQueries, TpchQueries, VectorQueries, WarehouseQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Session configs every entry point needs (see GraftSession). */
  def applySessionDefaults(spark: SparkSession): Unit = {
    // null-on-error parse semantics (reference safeParse*, SURVEY §1.3)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    // the TIMESTAMP_NTZ branch of Tables.events (and every
    // unix_millis(cast(...)) pattern) interprets naive wall times in the
    // session timezone; the oracle's epoch_us treats the same stored
    // value as UTC, so a non-UTC driver session would shift every
    // event-time query. Pin it here, not just in Verify/Bench/specs.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // round-7-era events.parquet carried nanosecond timestamps; the
    // round-8 regeneration is microseconds. Tables.events normalizes
    // either to epoch-nanos long (this conf covers the nanos branch).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // native engine functions available from SQL text (graft_dot, …)
    graft.functions.GraftFunctions.register(spark)
  }

  /** Full registry: every implemented operator from SURVEY.md §2. */
  def registry: Map[String, GraftQuery] =
    RelationalQueries.all ++ HfpPipelineQueries.all ++ DedupQueries.all ++
      VectorQueries.all ++ TextQueries.all ++ EventTimeQueries.all ++
      AsofQueries.all ++ MultimodalQueries.all ++ WarehouseQueries.all ++
      RetrievalQueries.all ++ AnalyticsQueries.all ++ TpchQueries.all ++
      CurationQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    applySessionDefaults(spark)
    registry("q04_join_star").build(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (name, q) =>
      name -> { (s: SparkSession, dir: String) =>
        applySessionDefaults(s)
        q.build(s, dir)
      }
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (name, q) if q.oracle.isDefined =>
      name -> q.oracle.get.trim.replaceAll("\n\\s*", " ")
    }

  /** Headline subset benchmarked per-round (Bench.scala). */
  def headlineQueries: Seq[String] =
    registry.collect { case (name, q) if q.headline => name }.toSeq.sorted
}
