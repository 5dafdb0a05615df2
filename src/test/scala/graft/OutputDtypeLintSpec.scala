package graft

import org.apache.spark.sql.types.{DataType, ArrayType, StructType, MapType,
  DecimalType, FloatType}

/** Gate-dtype lint (the r6 p16/w12 lesson): the driver's hasher pushes
  * Spark-parquet DECIMAL and DuckDB-result DECIMAL through different
  * dtype paths, so a query can be value-identical yet hash-red. Same
  * risk for FLOAT (widened differently by the two engines). Policy:
  * no query may OUTPUT DecimalType or FloatType — do exact arithmetic
  * in DECIMAL internally, then ship integer units (cents/micros) or a
  * floor-rounded DOUBLE. This spec is plan-only (`df.schema` — no
  * execution), so it lints every declared query on every `sbt test`.
  */
class OutputDtypeLintSpec extends SparkSpec {

  private def offenders(path: String, dt: DataType): Seq[String] = dt match {
    case _: DecimalType => Seq(s"$path: $dt")
    case FloatType => Seq(s"$path: $dt")
    case ArrayType(et, _) => offenders(s"$path[]", et)
    case MapType(k, v, _) =>
      offenders(s"$path.key", k) ++ offenders(s"$path.value", v)
    case st: StructType =>
      st.fields.toSeq.flatMap(f => offenders(s"$path.${f.name}", f.dataType))
    case _ => Nil
  }

  test("no query outputs DecimalType/FloatType columns") {
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
