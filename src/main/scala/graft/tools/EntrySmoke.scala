package graft.tools
import org.apache.spark.sql.SparkSession
object EntrySmoke { def main(a: Array[String]): Unit = {
  val s = SparkSession.builder().master("local[4]").config("spark.ui.enabled","false").getOrCreate()
  s.sparkContext.setLogLevel("ERROR")
  val df = graft.SparkEntry.entry(s)
  println("ENTRY rows=" + df.count()); df.show(5, false); s.stop() } }
