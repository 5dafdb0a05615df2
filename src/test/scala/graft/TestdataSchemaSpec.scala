package graft

import org.apache.spark.sql.types._

/** Early warning for driver testdata regeneration drift.
  *
  * Round 9 lost 37 gate queries because `events.ts` silently changed
  * physical type (parquet timestamp[ns] → timestamp[us]) and the first
  * visible symptom was 37 opaque missing CORRECTNESS rows plus a dead
  * bench. This spec pins, per table, the column names (exact, ordered)
  * and the dtype FAMILY each loader is written to handle — so the next
  * regeneration fails ONE named test with a readable actual-vs-expected
  * schema diff instead.
  *
  * Family membership is deliberately as wide as the code: events.ts may
  * be INT64 nanos or any timestamp (EventsTable.load adapts); date-ish
  * columns may be DATE or timestamp (comparisons against string literals
  * coerce either). A dtype outside the family means code changes are
  * required, which is exactly when this should go red.
  */
class TestdataSchemaSpec extends SparkSpec {

  private val tsFamily: Set[DataType] =
    Set(LongType, TimestampType, TimestampNTZType)
  private val dateFamily: Set[DataType] =
    Set(DateType, TimestampType, TimestampNTZType)

  private def exact(t: DataType): Set[DataType] = Set(t)

  /** table → ordered (column, allowed dtypes) */
  private val expected: Seq[(String, Seq[(String, Set[DataType])])] = Seq(
    "region" -> Seq(
      "r_regionkey" -> exact(IntegerType), "r_name" -> exact(StringType)),
    "nation" -> Seq(
      "n_nationkey" -> exact(IntegerType), "n_name" -> exact(StringType),
      "n_regionkey" -> exact(IntegerType)),
    "customer" -> Seq(
      "c_custkey" -> exact(LongType), "c_name" -> exact(StringType),
      "c_nationkey" -> exact(IntegerType), "c_acctbal" -> exact(DoubleType),
      "c_mktsegment" -> exact(StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> exact(LongType), "s_name" -> exact(StringType),
      "s_nationkey" -> exact(IntegerType), "s_acctbal" -> exact(DoubleType)),
    "part" -> Seq(
      "p_partkey" -> exact(LongType), "p_name" -> exact(StringType),
      "p_brand" -> exact(StringType), "p_type" -> exact(StringType),
      "p_size" -> exact(IntegerType), "p_retailprice" -> exact(DoubleType)),
    "orders" -> Seq(
      "o_orderkey" -> exact(LongType), "o_custkey" -> exact(LongType),
      "o_orderstatus" -> exact(StringType),
      "o_totalprice" -> exact(DoubleType),
      "o_orderdate" -> dateFamily, "o_orderpriority" -> exact(StringType)),
    "lineitem" -> Seq(
      "l_orderkey" -> exact(LongType), "l_partkey" -> exact(LongType),
      "l_suppkey" -> exact(LongType), "l_linenumber" -> exact(IntegerType),
      "l_quantity" -> exact(DoubleType),
      "l_extendedprice" -> exact(DoubleType),
      "l_discount" -> exact(DoubleType), "l_tax" -> exact(DoubleType),
      "l_returnflag" -> exact(StringType),
      "l_linestatus" -> exact(StringType), "l_shipdate" -> dateFamily),
    "events" -> Seq(
      "event_id" -> exact(LongType), "ts" -> tsFamily,
      "user_id" -> exact(LongType), "event_type" -> exact(StringType),
      "value" -> exact(DoubleType), "props" -> exact(StringType)),
    "documents" -> Seq(
      "doc_id" -> exact(LongType), "text" -> exact(StringType),
      "lang" -> exact(StringType), "source" -> exact(StringType),
      "n_chars" -> exact(LongType)),
    "embeddings" -> Seq(
      "vec_id" -> exact(LongType),
      "embedding" -> Set[DataType](ArrayType(FloatType),
        ArrayType(FloatType, containsNull = false)),
      "label" -> exact(IntegerType)))

  test("every embedding is exactly 64-dim (the LSH plane length, the " +
      "e6/x4/e3 oracle literals, and Vec.dot's min-len contract)") {
    import org.apache.spark.sql.functions._
    val bad = spark.read.parquet(sf("sf0.01") + "/embeddings.parquet")
      .groupBy(size(col("embedding")).as("dim")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(bad.keySet == Set(64),
      s"embedding dims drifted from 64: $bad — lshBucketsMulti fails " +
        "loudly at runtime, but e6/x4/e3 oracles embed 64-wide literals")
  }

  for ((table, cols) <- expected)
    test(s"$table schema matches the dtype families the loaders handle") {
      val schema =
        spark.read.parquet(sf("sf0.01") + s"/$table.parquet").schema
      val diag = s"ACTUAL $table schema:\n${schema.treeString}"
      assert(schema.fields.map(_.name).toSeq == cols.map(_._1),
        s"column names/order drifted — $diag")
      for ((name, allowed) <- cols) {
        val actual = schema(name).dataType
        assert(allowed.contains(actual),
          s"$table.$name is $actual, loaders handle " +
            s"${allowed.mkString("{", ", ", "}")} — $diag")
      }
    }
}
