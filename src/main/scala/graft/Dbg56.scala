package graft
import org.apache.spark.sql.SparkSession
object Dbg56 {
  def main(a: Array[String]): Unit = {
    val s = SparkSession.builder.master("local[4]")
      .config("spark.sql.shuffle.partitions", 4).getOrCreate()
    val df = graft.operators.Relational.q56AbTest(s, "/root/testdata/sf0.01")
    df.explain("formatted")
    df.show(false)
    s.stop()
  }
}
