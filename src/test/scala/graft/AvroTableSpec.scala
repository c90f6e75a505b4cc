package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.AvroTable

/** The Avro source/sink over the Hadoop InputFormat pair: full-fidelity
  * row<->record round trip (nested structs, arrays of structs, maps,
  * binary, nulls), genuine multi-file splits, and entry-level parity
  * with the ORC ingest path (same corpus, same pipeline — any
  * difference isolates the Avro source). */
class AvroTableSpec extends SparkSpec {

  private val allTypes = StructType(Seq(
    StructField("id", LongType),
    StructField("s", StringType),
    StructField("i", IntegerType),
    StructField("d", DoubleType),
    StructField("b", BooleanType),
    StructField("bin", BinaryType),
    StructField("arr", ArrayType(IntegerType)),
    StructField("m", MapType(StringType, StringType)),
    StructField("st", StructType(Seq(
      StructField("x", StringType), StructField("y", DoubleType)))),
    StructField("faces", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("inner", StructType(Seq(StructField("u", StringType))))))))))

  test("all-types round trip preserves every value including nulls") {
    val rows = Seq(
      Row(1L, "a", 7, 1.5, true, Array[Byte](1, 2, 3), Seq(1, 2, 3),
        Map("k" -> "v", "k2" -> "v2"), Row("x1", 2.25),
        Seq(Row("f1", Row("u1")), Row("f2", null))),
      Row(2L, null, null, null, null, null, null, null, null, null),
      Row(3L, "", 0, -0.0, false, Array[Byte](), Seq.empty[Int],
        Map.empty[String, String], Row(null, null), Seq.empty[Row]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), allTypes)
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_rt").toString
    AvroTable.write(df, s"$dir/t", "alltypes")
    val back = AvroTable.read(spark, s"$dir/t", allTypes, "alltypes")
    assert(back.schema == allTypes)
    assert(back.count() == 3)
    // binary columns defeat exceptAll's comparison and maps are
    // unordered (Avro hands back a HashMap); compare canonicalized
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select(col("id"), col("s"), col("i"), col("d"), col("b"),
        hex(col("bin")).as("bin"), col("arr"),
        array_sort(map_entries(col("m"))).as("m"),
        col("st"), col("faces"))
    assert(canon(df).exceptAll(canon(back)).count() == 0)
    assert(canon(back).exceptAll(canon(df)).count() == 0)
  }

  test("write produces multiple container files and the read splits across them") {
    import spark.implicits._
    val df = spark.range(0, 1000).select(col("id"),
      concat(lit("doc-"), col("id")).as("s"))
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_parts").toString
    AvroTable.write(df.repartition(4), s"$dir/t", "r")
    val parts = new java.io.File(s"$dir/t").listFiles()
      .filter(f => f.getName.endsWith(".avro"))
    assert(parts.length == 4, s"expected 4 container files, got ${parts.length}")
    val back = AvroTable.read(spark, s"$dir/t",
      StructType(Seq(StructField("id", LongType), StructField("s", StringType))), "r")
    assert(back.rdd.getNumPartitions >= 4,
      "the InputFormat should produce at least one split per container file")
    assert(back.count() == 1000)
    assert(back.agg(sum("id")).head().getLong(0) == 499500L)
  }

  test("reader-schema resolution fills fields the writer schema lacks with nulls") {
    // the evolution seam: v1 files read under the v2 reader schema must
    // surface NULL for the late column, not fail or drop rows
    val v1 = StructType(Seq(
      StructField("id", LongType), StructField("a", StringType)))
    val v2 = v1.add(StructField("b", DoubleType))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, "x"), Row(2L, "y")), 1), v1)
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_evolve").toString
    AvroTable.write(df, s"$dir/gen-0", "r")
    val v2rows = Seq(Row(3L, "z", 1.5))
    AvroTable.write(spark.createDataFrame(
      spark.sparkContext.parallelize(v2rows, 1), v2), s"$dir/gen-1", "r")
    // glob read across both generations under the v2 reader schema
    val back = AvroTable.read(spark, s"$dir/gen-*", v2, "r")
      .orderBy("id").collect()
    assert(back.length == 3)
    assert(back(0) == Row(1L, "x", null) && back(1) == Row(2L, "y", null))
    assert(back(2) == Row(3L, "z", 1.5))
  }

  test("avro ingest entry ≡ orc ingest entry (same corpus, source isolated)") {
    val avro = graft.ingest.IngestOps.qIngestAvroCards(spark, SfDir)
    val orc = graft.ingest.IngestOps.qIngestOrcCards(spark, SfDir)
    assertNonEmpty(avro, "avro ingest")
    assert(avro.exceptAll(orc).count() == 0 && orc.exceptAll(avro).count() == 0,
      "avro and orc ingest paths diverge on the identical corpus")
  }
}
