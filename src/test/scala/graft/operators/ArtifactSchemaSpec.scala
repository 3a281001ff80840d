package graft.operators

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Schema contract for every on-disk artifact the DuckDB oracle reads
  * (Verify substitutes `__GRAFT_IVF__`/`__GRAFT_SIMHASH__`/… path tokens
  * into raw `read_parquet` SQL): the round-8 events.ts incident showed a
  * physical-encoding drift in a parquet input silently breaking the
  * oracle replay — these artifacts are ENGINE-written parquet the oracle
  * consumes the same way, so their schemas are pinned here. A failing
  * assertion means a writer change altered the cross-engine contract:
  * update the oracle SQL together with the pin, never just the pin.
  */
class ArtifactSchemaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = {
    val rnd = new scala.util.Random(11)
    (1 to 40).map { i =>
      val base = if (i <= 20) Array(10f, 0f, 0f, 0f) else Array(0f, 10f, 0f, 0f)
      (i.toLong, base.map(_ + rnd.nextFloat() * 0.5f))
    }.toDF("vec_id", "embedding")
  }

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "entirely different content with other words here"))
    .toDF("doc_id", "text")

  private def ddl(path: String): String =
    spark.read.parquet(path).schema.toDDL

  /** No artifact may carry a timestamp column: timestamps are exactly
    * where parquet physical encodings diverge between engines (the
    * events.ts lesson), and no oracle-read artifact needs one. */
  private def assertNoTimestamps(path: String): Unit = {
    val bad = spark.read.parquet(path).schema.fields
      .filter(f => f.dataType == TimestampType || f.dataType == TimestampNTZType)
    assert(bad.isEmpty,
      s"$path carries timestamp columns: ${bad.map(_.name).mkString(",")}")
  }

  test("IVF cells + centroids schemas are pinned") {
    val base = Files.createTempDirectory("graft_schema_ivf").toString
    val idx = new IvfIndex(spark, base)
    idx.build(emb, "vec_id", "embedding", k = 2, iters = 3)
    assertResult("vec_id BIGINT,embedding ARRAY<FLOAT>,cell INT")(
      ddl(s"$base/ivf_cells"))
    assertResult("cell INT,centroid ARRAY<DOUBLE>")(
      ddl(s"$base/ivf_centroids"))
    assertNoTimestamps(s"$base/ivf_cells")
    idx.ensureSq("vec_id", "embedding")
    assertResult("vec_id BIGINT,q ARRAY<TINYINT>,cell INT")(
      ddl(s"$base/ivf_cells_sq"))
    assertResult("max_abs DOUBLE")(ddl(s"$base/ivf_sq_meta"))
  }

  test("LSH rows schema is pinned") {
    val base = Files.createTempDirectory("graft_schema_lsh").toString
    val idx = new LshIndex(spark, base, dim = 4, numTables = 2,
      bitsPerTable = 2, seed = 7L)
    idx.build(emb, "vec_id", "embedding")
    val rows = LshIndex.rowsPath(base, 4, 2, 2, 7L)
    assertResult("vec_id BIGINT,embedding ARRAY<FLOAT>,tbl INT,bucket INT")(
      ddl(rows))
    assertNoTimestamps(rows)
  }

  test("PQ rotation/codebook/codes schemas are pinned (flat and IVFPQ)") {
    val base = Files.createTempDirectory("graft_schema_pq").toString
    val idx = new PqIndex(spark, base)
    idx.build(emb, "vec_id", "embedding", m = 2, k = 4, iters = 3,
      rotate = true)
    assertResult("subspace INT,code INT,centroid ARRAY<DOUBLE>")(
      ddl(s"$base/pq_codebook"))
    assertResult("id BIGINT,codes ARRAY<TINYINT>")(ddl(s"$base/pq_codes"))
    assertResult("i INT,r ARRAY<BIGINT>")(ddl(s"$base/pq_rotation"))

    val ivfBase = Files.createTempDirectory("graft_schema_ivfpq_p").toString
    val ivf = new IvfIndex(spark, ivfBase)
    ivf.build(emb, "vec_id", "embedding", k = 2, iters = 3)
    val pqBase = Files.createTempDirectory("graft_schema_ivfpq").toString
    val comp = new IvfPq(spark, ivf, pqBase)
    comp.build("vec_id", "embedding", m = 2, k = 4, iters = 3)
    assertResult("id BIGINT,codes ARRAY<TINYINT>,cell INT")(
      ddl(s"$pqBase/pq_codes"))
    assertNoTimestamps(s"$pqBase/pq_codes")
  }

  test("simhash and media table schemas are pinned") {
    val base = Files.createTempDirectory("graft_schema_art").toString
    Dedup.simhashTable(docs, "doc_id", "text", base)
    assertResult("id BIGINT,sim BIGINT")(ddl(s"$base/simhash"))
    Multimodal.mediaTable(docs, "doc_id", "text", base)
    assertResult("media_id BIGINT,content BINARY")(ddl(s"$base/media"))
    assertNoTimestamps(s"$base/simhash")
    assertNoTimestamps(s"$base/media")
  }

  test("xxhash64 CMS probes + counters schemas are pinned") {
    val base = Files.createTempDirectory("graft_schema_cms").toString
    val df = Seq(1L, 1L, 2L, 3L).toDF("k")
    Sketches.cmsTableFast(df, "k", 4, 1024, base)
    assertResult("k BIGINT,_row INT,_bkt BIGINT")(
      ddl(s"$base/cms_d4w1024/probes"))
    assertResult("_row INT,_bkt BIGINT,cnt BIGINT")(
      ddl(s"$base/cms_d4w1024/counters"))
    assertNoTimestamps(s"$base/cms_d4w1024/probes")
    assertNoTimestamps(s"$base/cms_d4w1024/counters")
  }
}
