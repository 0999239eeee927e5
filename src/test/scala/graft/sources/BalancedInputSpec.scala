package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** [[BalancedInput]]: repairs an under-split parquet layout (fewer row
  * groups than the session can use) with a post-read repartition, and
  * is a no-op when the layout already feeds every core.
  */
class BalancedInputSpec extends AnyFlatSpec with Matchers {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  behavior of "BalancedInput.parquet"

  private def write(dir: String, rows: Long, rowsPerGroup: Long): String = {
    val path = s"$dir/in.parquet"
    spark.range(rows).toDF("id")
      .coalesce(1)
      .write.mode("overwrite")
      .option("parquet.block.size", (rowsPerGroup * 8).toString) // tiny groups
      .parquet(path)
    path
  }

  it should "repartition a single-row-group file and preserve the rows" in {
    val dir = java.nio.file.Files.createTempDirectory("balspec").toString
    val path = s"$dir/one.parquet"
    spark.range(10000).toDF("id").coalesce(1).write.mode("overwrite").parquet(path)
    val df = BalancedInput.parquet(spark, path)
    df.rdd.getNumPartitions should be > 1
    df.agg(count(lit(1)), sum(col("id"))).collect()(0).toSeq shouldBe
      Seq(10000L, (0L until 10000L).sum)
  }

  it should "leave a tiny input single-task (parallelism would be pure overhead)" in {
    val dir = java.nio.file.Files.createTempDirectory("balspec").toString
    val path = s"$dir/tiny.parquet"
    spark.range(25).toDF("id").coalesce(1).write.mode("overwrite").parquet(path)
    // 25 rows / 256-row floor -> want 1 >= groups 1 -> no repartition node
    BalancedInput.parquet(spark, path).queryExecution.optimizedPlan.toString should
      not include "Repartition"
  }
}
