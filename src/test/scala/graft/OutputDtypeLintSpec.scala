package graft

import org.apache.spark.sql.types.{DataType, ArrayType, StructType, MapType,
  DecimalType, FloatType}

/** Gate-dtype lint (the r6 p16/w12 lesson): the driver's hasher pushes
  * Spark-parquet DECIMAL and DuckDB-result DECIMAL through different
  * dtype paths, so a query can be value-identical yet hash-red. Same
  * risk for FLOAT (widened differently by the two engines). Policy:
  * no query may OUTPUT DecimalType or FloatType — do exact arithmetic
  * in DECIMAL internally, then ship integer units (cents/micros) or a
  * floor-rounded DOUBLE. Extended in r9 (the x14 lesson): no query may
  * output Array/Map/Struct columns AT ALL — the driver's pandas
  * `sort_values` hasher throws `unhashable type: numpy.ndarray` on
  * them, killing even the rows-only check. Explode nested results to
  * scalar rows (one row per element) before the gate. This spec is
  * plan-only (`df.schema` — no execution), so it lints every declared
  * query on every `sbt test`.
  */
class OutputDtypeLintSpec extends SparkSpec {

  private def offenders(path: String, dt: DataType): Seq[String] = dt match {
    case _: DecimalType => Seq(s"$path: $dt")
    case FloatType => Seq(s"$path: $dt")
    case _: ArrayType | _: MapType | _: StructType =>
      Seq(s"$path: ${dt.typeName} (unhashable in the driver gate — " +
        "explode to scalar rows)")
    case _ => Nil
  }

  test("no query outputs DecimalType/FloatType/Array/Map/Struct columns") {
    val d = sf("sf0.001")
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        fn(spark, d).schema.fields.toSeq
          .flatMap(f => offenders(f.name, f.dataType))
          .map(c => s"$name -> $c")
    }
    assert(bad.isEmpty,
      s"decimal/float output columns reach the gate hasher:\n  " +
        bad.mkString("\n  "))
  }
}
