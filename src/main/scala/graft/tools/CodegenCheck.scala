package graft.tools

import org.apache.spark.sql.SparkSession

object CodegenCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("[cg] wholeStage=" + spark.conf.get("spark.sql.codegen.wholeStage"))
    println("[cg] factoryMode=" + spark.conf.get("spark.sql.codegen.factoryMode"))
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .groupBy("l_returnflag").count()
    df.collect()
    df.queryExecution.executedPlan.toString.linesIterator.take(12)
      .foreach(l => println("[cg] " + l))
    spark.stop()
  }
}
