package graft.tools
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._
object CorpusProbe {
  def main(args: Array[String]): Unit = {
    val corpus = new ObjectMapper().readTree(
      new java.io.File("src/test/resources/conformance/schema_corpus.json"))
    corpus.elements().asScala.foreach { c =>
      val desc = c.get("description").asText()
      try graft.compile.ConstraintCompiler.compile(
        graft.compile.JsonSchemaImport.translate(
          c.get("schema").toString, desc))
      catch { case e: Exception =>
        println(s"IMPORTFAIL: $desc :: ${e.getMessage.take(100)}")
      }
    }
    println("probe done")
  }
}
