package graft

import org.scalatest.funsuite.AnyFunSuite

/** The engine's SQL surface: a user who only speaks `spark.sql` can
  * run a multi-stage pipeline — chunk documents with the registered
  * generator, embed-and-rank with the registered cosine — over plain
  * temp views.
  */
class SqlPipelineSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("chunk → filter → count pipeline runs in pure SQL") {
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("docs")
    val out = spark.sql(
      """SELECT d.doc_id, count(*) AS n_chunks
        |FROM docs d
        |LATERAL VIEW graft_chunk(d.text, 100, 20) AS chunk_idx, chunk
        |WHERE length(chunk) > 10
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin)
    assert(out.count() > 0)
    assert(out.head.getAs[Long]("n_chunks") >= 1)
  }

  test("cosine ranking over the embeddings view runs in pure SQL") {
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb")
    val out = spark.sql(
      """SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |       graft_cosine(q.embedding, c.embedding) AS sim
        |FROM emb q JOIN emb c ON q.vec_id = 0 AND c.vec_id <> 0
        |ORDER BY sim DESC LIMIT 3""".stripMargin).collect()
    assert(out.length == 3)
    assert(out(0).getDouble(2) >= out(1).getDouble(2))
  }

  test("default model-call plugin is invocable by name from pure SQL") {
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("docs")
    val out = spark.sql(
      """SELECT doc_id, graft_call('summarize', text) AS summary
        |FROM docs ORDER BY doc_id LIMIT 5""".stripMargin).collect()
    assert(out.length == 5)
    assert(out.forall(_.getString(1).startsWith("Here are the main points:")))
    // embed stand-in too: a 64-dim vector per row
    val dims = spark.sql(
      """SELECT size(graft_call('embed', text)) AS d
        |FROM docs LIMIT 3""".stripMargin).collect()
    assert(dims.forall(_.getInt(0) == 64))
  }

  test("a curation gate + split pipeline runs in pure SQL") {
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("docs")
    val out = spark.sql(
      """SELECT graft_call('hash_split', text) AS split, count(*) AS n
        |FROM docs WHERE graft_call('quality', text) >= 0.45
        |GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    assert(out.map(_.getString(0)).toSet.subsetOf(
      Set("train", "val", "test")) && out.map(_.getLong(1)).sum > 0)
    val scrubbed = spark.sql(
      "SELECT graft_call('scrub_pii', 'mail a@b.io now') AS s").head
    assert(scrubbed.getString(0) == "mail [EMAIL] now")
  }

  test("a swapped-in plugin replaces the stand-in at existing call sites") {
    import graft.functions.ColumnPlugins
    import org.apache.spark.sql.functions._
    // a "real model" arrives: register under a fresh name, call by name
    ColumnPlugins.register("shout") { args => upper(args.head) }
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("docs")
    val viaSql = spark.sql(
      "SELECT graft_call('shout', text) AS s FROM docs LIMIT 1").head.getString(0)
    val viaDf = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(ColumnPlugins("shout")(col("text")).as("s")).head.getString(0)
    assert(viaSql == viaDf && viaSql == viaSql.toUpperCase)
    // unknown names fail with the available-plugin list, not silently
    val err = intercept[Exception](
      spark.sql("SELECT graft_call('nope', 'x')").collect())
    assert(err.getMessage.contains("no ColumnPlugin 'nope'") ||
      Option(err.getCause).exists(_.getMessage.contains("no ColumnPlugin 'nope'")))
  }
}
