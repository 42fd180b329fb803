package graft

import org.apache.spark.sql.execution.FormattedMode

/** Plan inspection utility: prints the formatted physical plan of the named
  * queries (or all). Usage: runMain graft.Explain [sfDir] [query ...]
  * Used to keep the §"Optimize for scale" invariants honest: pushed
  * filters, pruned read schemas, broadcast choices, codegen spans.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.core.GraftSession.local(8)
    names.foreach { n =>
      println(s"\n===== $n")
      try println(SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.explainString(FormattedMode))
      catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
