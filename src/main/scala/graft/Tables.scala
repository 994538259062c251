package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema'd readers for the fixture's parquet tables.
  *
  * Every query used to call `spark.read.parquet(...)`, which runs ONE
  * driver job per table just to re-infer a schema that never changes
  * (footer read; measured 30-90 ms + job overhead each — the cind/rdf
  * queries pay it for all 7 triple tables on every invocation, ~7 jobs
  * before any real work). Passing the schema explicitly plans with ZERO
  * driver jobs. The schemas are the driver's published fixture contract
  * (TESTDATA.md). Safety (ADVICE r13): a TYPE mismatch against a
  * regenerated file fails loudly at scan time (parquet readers verify
  * requested vs footer types per file), but a DDL column ABSENT from the
  * file is silently null-filled — TablesSchemaSpec pins every fixture
  * footer schema to the DDL below so drift is caught in t1 smoke instead
  * of surfacing as silent nulls.
  *
  * `events` is deliberately NOT pinned: its `ts` physical type has changed
  * across driver regenerations before (TESTDATA.md — TIMESTAMP(NANOS) vs
  * timestamp[us]) and EventSource.normalize tolerates all three encodings;
  * pinning one would turn the next regeneration into a scan-time failure
  * instead of a normalized read (ADVICE r13). The one inference job per
  * events read is the price of that tolerance.
  */
object Tables {

  /** Inferred-DDL snapshot of the fixture tables (sf-independent). */
  private[graft] val schemas: Map[String, String] = Map(
    "customer" -> "c_custkey BIGINT,c_name STRING,c_nationkey INT,c_acctbal DOUBLE,c_mktsegment STRING",
    "orders" -> "o_orderkey BIGINT,o_custkey BIGINT,o_orderstatus STRING,o_totalprice DOUBLE,o_orderdate TIMESTAMP_NTZ,o_orderpriority STRING",
    "supplier" -> "s_suppkey BIGINT,s_name STRING,s_nationkey INT,s_acctbal DOUBLE",
    "nation" -> "n_nationkey INT,n_name STRING,n_regionkey INT",
    "region" -> "r_regionkey INT,r_name STRING",
    "part" -> "p_partkey BIGINT,p_name STRING,p_brand STRING,p_type STRING,p_size INT,p_retailprice DOUBLE",
    "lineitem" -> "l_orderkey BIGINT,l_partkey BIGINT,l_suppkey BIGINT,l_linenumber INT,l_quantity DOUBLE,l_extendedprice DOUBLE,l_discount DOUBLE,l_tax DOUBLE,l_returnflag STRING,l_linestatus STRING,l_shipdate TIMESTAMP_NTZ",
    "documents" -> "doc_id BIGINT,text STRING,lang STRING,source STRING,n_chars BIGINT",
    "embeddings" -> "vec_id BIGINT,embedding ARRAY<FLOAT>,label INT")

  /** Read `$dir/$table.parquet` with the known schema (no inference job);
    * unknown tables fall back to plain inference. */
  def read(spark: SparkSession, dir: String, table: String): DataFrame =
    schemas.get(table) match {
      case Some(ddl) => spark.read.schema(ddl).parquet(s"$dir/$table.parquet")
      case None => spark.read.parquet(s"$dir/$table.parquet")
    }
}
