package graft.queries

import java.nio.file.Files

import graft.{SparkEntry, SparkSpec}

/** Degenerate-input sweep: every inventory query runs against ZERO-ROW
  * tables (same schemas as the testdata). At 100 TB empty partitions,
  * empty filter results and empty sources are routine — an operator
  * that head()s, divides, or windows its way into an exception on
  * empty input fails there, not just here. Queries are allowed to
  * return 0 rows or a defined aggregate; they may also refuse LOUDLY
  * (IllegalArgumentException with a message) where the operation is
  * undefined on empty input (e.g. training IVF centroids on nothing) —
  * what they must never do is throw an obscure internal error
  * (NoSuchElement, ArithmeticException, NPE).
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val src = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("sfempty").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      val p = s"$src/$t.parquet"
      if (new java.io.File(p).exists())
        graft.queries.table(spark, src, t).limit(0)
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def sweep(dir: String, regime: String): Unit = {
    // 8-way pool: 90 tiny queries serially is mostly per-job overhead —
    // overlapping them cuts the suite cost of each regime ~4x (and all
    // queries are read-only over the same dir, so overlap is safe)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val bad =
      try {
        val futures = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
          Future {
            try {
              val n = fn(spark, dir).count()
              assert(n >= 0)
              None
            } catch {
              case e: IllegalArgumentException if e.getMessage != null && e.getMessage.nonEmpty =>
                None // documented loud refusal — acceptable for train-on-empty ops
              case e: Throwable =>
                Some(s"$name -> ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
            }
          }
        }
        Await.result(Future.sequence(futures), 15.minutes).flatten
      } finally pool.shutdown()
    assert(bad.isEmpty,
      s"${bad.size} queries die with obscure errors on $regime input:\n${bad.mkString("\n")}")
  }

  test("every query handles zero-row tables: empty result or a LOUD refusal") {
    sweep(emptyDir, "zero-row")
  }

  test("every query handles all-NULL text/embedding payloads") {
    // rows exist but every text and embedding is NULL — the regime a
    // corrupt shard or an outer join produces; null-intolerant
    // expressions (codegen NPEs, .head on null-filtered frames) die here
    val src = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("sfnull").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      val df = graft.queries.table(spark, src, t)
      val nulled = df.columns.foldLeft(df) { (d, c) =>
        if (c == "text" || c == "embedding" || c == "props")
          d.withColumn(c, org.apache.spark.sql.functions.lit(null).cast(df.schema(c).dataType))
        else d
      }
      nulled.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    sweep(dir, "all-NULL payload")
  }

  test("every query handles empty-string text and zero-norm embeddings") {
    // text = "" (tokenizes to an empty array, not null) and embeddings
    // of all zeros (norm 0 — the divide-by-norm edge of every cosine) —
    // the regime aggressive cleaning or zero-initialized upstream
    // models produce
    val src = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("sfzero").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    import org.apache.spark.sql.functions._
    tables.foreach { t =>
      val df = graft.queries.table(spark, src, t)
      val zeroed = df.columns.foldLeft(df) { (d, c) =>
        if (c == "text") d.withColumn(c, lit(""))
        else if (c == "embedding")
          d.withColumn(c, expr("transform(embedding, x -> CAST(0.0 AS FLOAT))"))
        else d
      }
      zeroed.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    sweep(dir, "empty-text/zero-norm")
  }
}
