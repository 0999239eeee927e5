package graft.sources

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import graft.SparkTestBase

class SourceSpec extends AnyFlatSpec with Matchers {
  private lazy val spark = SparkTestBase.spark

  "TranscriptSource.fromConfig" should "parse parquet and iceberg specs" in {
    TranscriptSource.fromConfig("/data/x") shouldBe ParquetTranscriptSource("/data/x")
    TranscriptSource.fromConfig("iceberg:cat.db.t") shouldBe IcebergTranscriptSource("cat.db.t", None)
    TranscriptSource.fromConfig("iceberg:cat.db.t@42") shouldBe IcebergTranscriptSource("cat.db.t", Some(42L))
  }

  it should "reject malformed iceberg specs instead of mis-parsing them" in {
    // trailing '@' must not silently drop the snapshot pin
    an[IllegalArgumentException] should be thrownBy
      TranscriptSource.fromConfig("iceberg:db.t@")
    // non-numeric snapshot gets a contextual error, not a bare NFE
    val e = the[IllegalArgumentException] thrownBy
      TranscriptSource.fromConfig("iceberg:db.t@latest")
    e.getMessage should include("snapshot")
    an[IllegalArgumentException] should be thrownBy
      TranscriptSource.fromConfig("iceberg:@123")
  }

  "ParquetTranscriptSource" should "load data with no snapshot lineage" in {
    val src = ParquetTranscriptSource("/root/testdata/sf0.001/lineitem.parquet")
    src.load(spark).count() should be > 0L
    src.snapshotId(spark) shouldBe None
  }
}
