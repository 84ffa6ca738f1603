package graft

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** The conformance corpora's shared single-row table shape: the
  * tokenized-sequence columns plus map / fractional-numeric / free-text
  * columns for the official-suite keyword ports. */
object ConformanceRows {

  val rowSchema: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = true),
    StructField("tokens", ArrayType(IntegerType, containsNull = false),
      nullable = true),
    StructField("n_tok", IntegerType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("attrs", MapType(StringType, StringType), nullable = true),
    // suite-port columns: fractional numerics (multipleOf / bounds
    // float traps) and free text (unicode pattern / length)
    StructField("score", DoubleType, nullable = true),
    StructField("text", StringType, nullable = true)))

  def rowFrom(n: JsonNode): Row = Row(
    Option(n.get("doc_id")).filterNot(_.isNull).map(_.asText()).orNull,
    Option(n.get("tokens")).filterNot(_.isNull)
      .map(_.elements().asScala.map(_.asInt()).toSeq).orNull,
    Option(n.get("n_tok")).filterNot(_.isNull)
      .map(v => Int.box(v.asInt())).orNull,
    Option(n.get("source")).filterNot(_.isNull).map(_.asText()).orNull,
    Option(n.get("attrs")).filterNot(_.isNull)
      .map(o => o.properties().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap).orNull,
    Option(n.get("score")).filterNot(_.isNull)
      .map(v => Double.box(v.asDouble())).orNull,
    Option(n.get("text")).filterNot(_.isNull).map(_.asText()).orNull)
}
