package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.core.{CandleSchema, Timeframe}
import graft.lake.LakeLayout
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** The engine's analogue of the reference's spec smoke tests (reference:
  * tests/test_specs_smoke.py:3-14): the committed JSON contract
  * (docs/specs/schema_candles.json) and the code constants must agree, so a
  * schema change that forgets one side fails CI instead of silently
  * diverging readers from writers.
  */
class SpecContractSpec extends AnyFunSuite {

  private lazy val spec = new ObjectMapper()
    .readTree(new java.io.File("docs/specs/schema_candles.json"))

  private def strings(field: String): Seq[String] =
    spec.get(field).elements().asScala.map(_.asText()).toSeq

  test("primary key / dedupe key match CandleSchema.key") {
    assert(strings("primary_key") === CandleSchema.key)
    assert(strings("dedupe_on") === CandleSchema.key)
  }

  test("partition columns match LakeLayout and appear in the layout template in order") {
    val cols = strings("partition_columns")
    assert(cols === LakeLayout.partitionCols)
    val layout = spec.get("layout").asText()
    val idxs = Seq("source=", "market=", "timeframe=", "symbol=", "year=", "month=")
      .map(layout.indexOf)
    assert(idxs.forall(_ >= 0) && idxs === idxs.sorted,
      s"layout template out of order: $layout")
  }

  test("properties cover the canonical column order with matching types and nullability") {
    val props = spec.get("properties")
    assert(props.fieldNames().asScala.toSeq === CandleSchema.canonicalOrder,
      "spec property order must BE the canonical order")
    CandleSchema.schema.fields.foreach { f =>
      val p = props.get(f.name)
      assert(p != null, s"spec missing ${f.name}")
      assert(p.get("dtype").asText() === f.dataType.typeName, s"dtype of ${f.name}")
      assert(p.get("nullable").asBoolean() === f.nullable, s"nullability of ${f.name}")
    }
  }

  test("required columns are the non-defaultable core; defaults match enforce()") {
    val required = strings("required")
    assert(required.toSet.subsetOf(CandleSchema.canonicalOrder.toSet))
    // every textual default in the spec is exactly what enforce() applies
    val defaults = spec.get("textual_defaults")
    assert(defaults.fieldNames().asScala.toSeq === CandleSchema.textualDefaults.map(_._1))
    CandleSchema.textualDefaults.foreach { case (c, d) =>
      assert(defaults.get(c).asText() === d, s"default of $c")
    }
  }

  test("every driver query has a DuckDB oracle entry (hard gate, not rows-only)") {
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet,
      "queries and oracleSql must cover the same keys — a missing oracle " +
        "silently downgrades the driver's check to rows-only")
  }

  test("tf alias and default timeframe resolve through the Timeframe vocabulary") {
    val aliases = spec.get("aliases")
    assert(aliases.get("tf").asText() === "timeframe")
    val defaultTf = spec.get("textual_defaults").get("timeframe").asText()
    assert(Timeframe(defaultTf).code === defaultTf)
  }
}
