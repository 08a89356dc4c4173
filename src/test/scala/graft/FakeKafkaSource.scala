package graft

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** ANALYSIS-ONLY stand-in for the Kafka connector, registered under
  * the connector's short name (test classpath only — the real jar is
  * absent in this zero-egress environment). It exposes exactly the
  * connector's read schema and the MICRO_BATCH_READ capability, so
  * `readStream.format("kafka").load()` ANALYZES — which is all the
  * transport plan-equivalence gate needs: it diffs the kafka-branch
  * and file-branch logical topologies without executing either. Any
  * attempt to actually START a stream over it fails (the Scan never
  * provides a MicroBatchStream), so the stub cannot silently stand in
  * for real I/O.
  */
class FakeKafkaSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kafka"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FakeKafkaSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = new Table with SupportsRead {
    override def name(): String = "fake-kafka"
    override def schema(): StructType = FakeKafkaSource.schema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new ScanBuilder {
        override def build(): Scan = new Scan {
          override def readSchema(): StructType = FakeKafkaSource.schema
          // no toMicroBatchStream override: execution is impossible by design
        }
      }
  }
}

object FakeKafkaSource {
  /** The Kafka connector's fixed source schema. */
  val schema: StructType = StructType.fromDDL(
    "key BINARY, value BINARY, topic STRING, partition INT, offset BIGINT, " +
      "timestamp TIMESTAMP, timestampType INT")
}
