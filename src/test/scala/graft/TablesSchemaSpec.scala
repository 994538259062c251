package graft

import org.apache.spark.sql.types.StructType

/** Pins every hardcoded Tables DDL to the fixture's actual parquet footer
  * schema (ADVICE r13): a column declared in the DDL but absent from a
  * regenerated file would be silently null-filled by the parquet reader,
  * so drift must be caught here in t1 smoke, not as silent nulls. `events`
  * is deliberately absent from the map (EventSource keeps its
  * three-encoding ts tolerance) — asserted too. */
class TablesSchemaSpec extends SparkSpec {

  private val fixture = "/root/testdata/sf0.001"

  test("every pinned DDL equals the fixture footer schema") {
    assume(new java.io.File(fixture).isDirectory)
    Tables.schemas.foreach { case (table, ddl) =>
      val declared = StructType.fromDDL(ddl)
      val footer = spark.read.parquet(s"$fixture/$table.parquet").schema
      assert(footer == declared,
        s"$table: footer ${footer.toDDL} != pinned ${declared.toDDL}")
    }
  }

  test("events is not pinned (ts encoding tolerance lives in EventSource)") {
    assert(!Tables.schemas.contains("events"))
  }
}
