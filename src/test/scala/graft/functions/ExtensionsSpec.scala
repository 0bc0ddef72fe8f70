package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** spark.sql.extensions deployment path: a fresh session built with
  * GraftExtensions resolves the function surface without any per-session
  * registration call.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects the function surface into a new session") {
    // getOrCreate returns any existing default session untouched, so clear
    // the defaults first — the new session still reuses the SparkContext
    val base = graft.SparkTestBase.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT cosine_sim(array(1.0d, 0.0d), array(2.0d, 0.0d)) AS c,
                  simhash64(array('a', 'b')) AS s,
                  hyperplane_bucket(array(0.5d, -0.5d), 4) AS h""").collect().head
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      assert(!r.isNullAt(1) && !r.isNullAt(2))
      val agg = spark.sql(
        "SELECT locscaleb(v, 2.0, false) AS b FROM VALUES (1.0),(2.0),(3.0) AS t(v)")
        .select("b.median").collect().head.getDouble(0)
      assert(agg == 2.0)
      val txt = spark.sql(
        """SELECT strip_accents('café') AS a,
                  jaro_winkler('martha', 'marhta') AS j,
                  porter_stem('generalizations') AS p,
                  nfc_normalize('cafe' || decode(unhex('CC81'), 'UTF-8')) AS n""").collect().head
      assert(txt.getString(0) == "cafe")
      assert(math.abs(txt.getDouble(1) - 0.9611111111111111) < 1e-12)
      assert(txt.getString(2) == "gener")
      assert(txt.getString(3).length == 4) // combining acute composed away
    } finally {
      // restore the shared session as default for the other suites
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
