package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per suite; UTC + non-ANSI to match the engine's
  * session factory semantics.
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession =
    GraftSession.builder(getClass.getSimpleName, cores = 4).getOrCreate()

  def sf(dirName: String = "sf0.001"): String = s"/root/testdata/$dirName"
}
