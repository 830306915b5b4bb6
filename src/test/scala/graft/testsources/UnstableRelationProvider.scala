package graft.testsources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.sources.{BaseRelation, RelationProvider, TableScan}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.{Row, SQLContext}

/** Test-only v1 relation that is NOT a HadoopFsRelation — the shape a
  * JDBC or custom-connector read plans as. Exists so IngestSpec can pin
  * that `stableForRowId` fails closed on non-file v1 relations (the
  * round-15 advisory: a LogicalRelation leaf alone says nothing about
  * re-evaluation row-order stability). The data here is deterministic;
  * the CLASS is what the gate must reject.
  */
class UnstableRelationProvider extends RelationProvider {
  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType =
        StructType(Seq(StructField("v", LongType, nullable = false)))
      override def buildScan(): RDD[Row] =
        ctx.sparkContext.parallelize((1L to 20L).map(Row(_)), 2)
    }
}
