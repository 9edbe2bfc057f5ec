package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.text.TextFunctions

/** Source-format coverage beyond parquet: the same query logic over
  * JSON-lines and CSV copies of the tables must produce identical
  * results (schemas declared explicitly — schema inference is a scan
  * you don't pay twice for at 100 TB). */
class MultiFormatSpec extends AnyFunSuite with SparkSpecBase {

  test("documents via JSON lines: fingerprints identical to parquet source") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val dir = Files.createTempDirectory("docs_json").toString
    docs.write.mode("overwrite").json(s"$dir/documents.json")

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val viaJson = spark.read.schema(schema).json(s"$dir/documents.json")

    def fp(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        TextFunctions.fingerprint(TextFunctions.tokens(col("text"))).as("fp"))
        .orderBy("doc_id").collect().toSeq
    assert(fp(viaJson) === fp(docs))
  }

  test("embeddings via JSON lines: array columns survive, norms identical") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val dir = Files.createTempDirectory("emb_json").toString
    emb.write.mode("overwrite").json(s"$dir/embeddings.json")
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val viaJson = spark.read.schema(schema).json(s"$dir/embeddings.json")
    def norms(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"),
        round(graft.functions.exprs.vecNormNative(col("embedding")), 6).as("n"))
        .orderBy("vec_id").collect().toSeq
    assert(norms(viaJson) === norms(emb))
  }

  test("lineitem via CSV: aggregation identical to parquet source") {
    val li = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_returnflag")
    val dir = Files.createTempDirectory("li_csv").toString
    li.write.mode("overwrite").option("header", "true").csv(s"$dir/lineitem.csv")
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_quantity", DoubleType),
      StructField("l_returnflag", StringType)))
    val viaCsv = spark.read.schema(schema).option("header", "true")
      .csv(s"$dir/lineitem.csv")
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
        .orderBy("l_returnflag").collect().toSeq
    assert(agg(viaCsv) === agg(li))
  }

  test("embeddings via ORC: array columns survive; an index search runs unchanged") {
    // ORC is the other columnar at-rest format a lakehouse deployment
    // actually mixes with parquet; the engine's query logic must be
    // source-agnostic (predicate pushdown + column pruning work on both).
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val dir = Files.createTempDirectory("emb_orc").toString
    emb.write.mode("overwrite").orc(s"$dir/embeddings.orc")
    val viaOrc = spark.read.orc(s"$dir/embeddings.orc")
    def norms(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"),
        round(graft.functions.exprs.vecNormNative(col("embedding")), 6).as("n"))
        .orderBy("vec_id").collect().toSeq
    assert(norms(viaOrc) === norms(emb))
    // a full index lifecycle over the ORC source — train + search rows
    // identical to the parquet-sourced index (same seed)
    val q = viaOrc.orderBy("vec_id").limit(5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    def searchRows(src: org.apache.spark.sql.DataFrame) = {
      val idx = graft.ann.sq.Sq.train(src, "vec_id", "embedding")
      idx.searchAll(q, 5).orderBy("query_id", "dist", "vec_id").collect().toSeq
    }
    assert(searchRows(viaOrc) === searchRows(emb))
  }
}
