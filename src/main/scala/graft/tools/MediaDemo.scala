package graft.tools

import org.apache.spark.sql.SparkSession

import graft.compile.ConstraintCompiler
import graft.exec.Validator
import graft.ops.Multimodal

/**
 * Multimodal pipeline sample: a binary-payload media table is validated
 * with the map-column object keywords (the `*Properties` family bound to
 * the `meta` map), then decoded (real header parsers (PNG/JPEG/WAV/MP4), per-task batch decode) into typed
 * features. Run: `sbt "runMain graft.tools.MediaDemo"`.
 */
object MediaDemo {
  val suiteJson: String =
    """{
      |  "id": "media-v1",
      |  "constraints": [
      |    {"kind": "isIn", "id": "known_type", "col": "media_type",
      |     "values": ["image", "audio", "video"]},
      |    {"kind": "keysIn", "id": "meta_allowlist", "col": "meta",
      |     "allowed": ["codec", "w", "h", "fps"]},
      |    {"kind": "keyCountBounds", "id": "meta_nonempty", "col": "meta",
      |     "min": 1},
      |    {"kind": "eachKey", "id": "meta_key_shape", "col": "meta",
      |     "elem": {"kind": "matches", "id": "k", "col": "$",
      |              "pattern": "^[a-z]+$"}}
      |  ]
      |}""".stripMargin

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").appName("graft-media-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val media = Multimodal.synthetic(spark, 2000L)
    val suite = ConstraintCompiler.compileJson(suiteJson)
    val report = Validator.validateWithDetails(
      media.toDF(), suite, Seq("media_type"), "doc_id")
    println("== media verdicts (map-column keywords) ==")
    report.verdicts.orderBy("media_type").show(5, truncate = false)
    println(s"violations: ${report.violations.count()}")

    // negative path: a strict allowlist (no "codec") flags every row
    val strict = ConstraintCompiler.compileJson(
      suiteJson.replace("\"codec\", ", ""))
    val strictViol = Validator.validateWithDetails(
      media.toDF(), strict, Seq("media_type"), "doc_id").violations
    println("== strict suite (codec banned): violation sample ==")
    strictViol.show(3, truncate = false)
    println(s"strict violations: ${strictViol.count()}")

    println("== decoded feature stats (real header parsers (PNG/JPEG/WAV/MP4), per-task batch decode) ==")
    Multimodal.featureStats(
      Multimodal.extractFeatures(media)).orderBy("media_type")
      .show(5, truncate = false)
    spark.stop()
  }
}
