package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per suite, configured like Verify/Bench. */
trait SparkSuite extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = graft.engine.GraftSession
    .builder("local[4]", 4)
    .appName(getClass.getSimpleName)
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // shared across suites in one JVM (sbt forks once); don't stop
    super.afterAll()
  }
}
