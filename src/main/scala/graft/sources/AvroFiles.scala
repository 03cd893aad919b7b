package graft.sources

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink (reference Avro format registration —
  * /root/reference/src/Formats/registerFormats.cpp, the
  * Processors/Formats/Impl/AvroRowInputFormat.cpp reader). The spark-avro
  * DataSource module is not bundled in this distribution, but the Avro
  * core + mapreduce jars are, so the format is implemented directly over
  * `AvroKeyInputFormat`/`AvroKeyOutputFormat` — real Avro object
  * container files, splittable and readable by any Avro tooling.
  *
  * Type coverage: the flat-relational subset (long/int/double/float/
  * boolean/string/binary, each nullable via union[null, T]) — the shape
  * external Avro feeds actually deliver. Nested records would extend
  * `toAvroSchema`/converters the obvious way.
  */
object AvroFiles {

  private[sources] def toAvroSchema(schema: StructType, recordName: String): Schema = {
    val fields = SchemaBuilder.record(recordName).namespace("graft").fields()
    schema.fields.foldLeft(fields) { (fs, f) =>
      val base = f.dataType match {
        case LongType    => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case FloatType   => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType  => Schema.create(Schema.Type.STRING)
        case BinaryType  => Schema.create(Schema.Type.BYTES)
        case other => throw new IllegalArgumentException(
          s"AvroFiles: unsupported Spark type $other for field ${f.name}")
      }
      // null default is only legal when null is in the union
      if (f.nullable)
        fs.name(f.name)
          .`type`(Schema.createUnion(Schema.create(Schema.Type.NULL), base))
          .withDefault(null)
      else fs.name(f.name).`type`(base).noDefault()
    }.endRecord()
  }

  def write(df: DataFrame, path: String): Unit = {
    val sparkSchema = df.schema
    val avroSchemaStr = toAvroSchema(sparkSchema, "GraftRow").toString
    val job = Job.getInstance(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(avroSchemaStr))
    df.rdd.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(avroSchemaStr)
      rows.map { r =>
        val rec = new GenericData.Record(schema)
        sparkSchema.fields.zipWithIndex.foreach { case (f, i) =>
          val v = if (r.isNullAt(i)) null else f.dataType match {
            case BinaryType => java.nio.ByteBuffer.wrap(r.getAs[Array[Byte]](i))
            case _          => r.get(i).asInstanceOf[AnyRef]
          }
          rec.put(f.name, v)
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get)
      }
    }.saveAsNewAPIHadoopFile(path,
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]], job.getConfiguration)
  }

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val fieldNames = schema.fields.map(_.name)
    val fieldTypes = schema.fields.map(_.dataType)
    val rows = spark.sparkContext.newAPIHadoopFile(path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable])
      .mapPartitions { it =>
        // The Hadoop reader reuses the datum object; every value must be
        // extracted before the iterator advances.
        it.map { case (k, _) =>
          val rec = k.datum()
          Row.fromSeq(fieldNames.indices.map { i =>
            val v = rec.get(fieldNames(i))
            (v, fieldTypes(i)) match {
              case (null, _)           => null
              case (u, StringType)     => u.toString
              case (b: java.nio.ByteBuffer, BinaryType) =>
                val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
              case (x, _)              => x
            }
          })
        }
      }
    spark.createDataFrame(rows, schema)
  }
}
