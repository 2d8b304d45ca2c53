package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The 100 TB layout posture (SURVEY §4: "edges bucket by src") made
  * concrete: a bucketed parquet edge table must serve src-keyed
  * aggregations and src↔src co-located self-joins WITHOUT a shuffle
  * exchange on the bucketed side — on a 1000-executor cluster this is the
  * difference between a map-side plan and re-shuffling the fact table
  * under every graph query. */
class BucketingSpec extends SparkSpec {

  private def withBucketedEdges[A](f: String => A): A = {
    val table = "edges_bucketed_spec"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val dir = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    val g = TpchGraph.build(spark, sfTiny)
    g.edges.select(col("src"), col("dst"), col("type"))
      .write.format("parquet")
      .bucketBy(8, "src").sortBy("src")
      .option("path", dir)
      .saveAsTable(table)
    try f(table)
    finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("src-keyed aggregation over a bucketed edge table has no exchange") {
    withBucketedEdges { table =>
      val plan = spark.table(table).groupBy(col("src"))
        .agg(count(lit(1)).as("odeg"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed degree count still shuffles:\n$plan")
    }
  }

  test("src-src self-join over a bucketed edge table shuffles neither side") {
    withBucketedEdges { table =>
      // at test scale the planner broadcasts the small side (bucketing
      // "disabled by query planner"); at 100 TB neither side broadcasts —
      // that regime is what this invariant is about, so scope it off
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val e = spark.table(table)
        val plan = e.join(e.withColumnRenamed("dst", "dst2")
              .withColumnRenamed("type", "type2"), Seq("src"))
          .queryExecution.executedPlan.toString
        // co-located bucketed join: sort-merge with ZERO shuffle
        // exchanges — each bucket pair joins in place
        assert(plan.contains("SortMergeJoin"), plan)
        assert(!plan.contains("ShuffleExchange"),
          s"bucketed self-join still shuffles:\n$plan")
      } finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("bucketed result matches the unbucketed computation") {
    withBucketedEdges { table =>
      val bucketed = spark.table(table).groupBy(col("src"))
        .agg(count(lit(1)).as("n")).orderBy(col("src")).collect()
      val plain = TpchGraph.build(spark, sfTiny).edges
        .select(col("src"), col("dst"), col("type"))
        .groupBy(col("src"))
        .agg(count(lit(1)).as("n")).orderBy(col("src")).collect()
      assert(bucketed.map(_.toSeq).toSeq === plain.map(_.toSeq).toSeq)
    }
  }
}
