package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions

/** GraftExtensions: the declarative `spark.sql.extensions` path must make
  * every graft SQL function resolvable in pure SQL on a session built
  * with the injector — no imperative register call. */
class ExtensionsSpec extends SparkSpec {

  test("injector declares all seven graft functions") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; names are stable
    assert(GraftExtensions.injected.map(_._1.funcName).sorted ==
      Seq("dot_product", "jaccard_sim", "minhash_sig", "misra_gries",
        "pq_encode", "simhash64", "top_k_by_score"))
  }

  test("wrong-arity SQL calls fail with the function name and expected count") {
    for ((name, arity, sample) <- Seq(
        ("simhash64", 1, "simhash64()"),
        ("dot_product", 2, "dot_product(array(1.0D))"),
        ("jaccard_sim", 2, "jaccard_sim(array('a'), array('b'), array('c'))"),
        ("minhash_sig", 2, "minhash_sig(array('a'))"),
        ("top_k_by_score", 3, "top_k_by_score(1.0D, 1L)"),
        ("misra_gries", 2, "misra_gries('a')"))) {
      val builder = GraftExtensions.injected.find(_._1.funcName == name).get._3
      val parsed = spark.sessionState.sqlParser.parseExpression(sample)
      val args = parsed.children // the parsed call's argument expressions
      val err = intercept[IllegalArgumentException](builder(args))
      assert(err.getMessage.contains(name), s"message names the function: ${err.getMessage}")
      assert(err.getMessage.contains(s"expects $arity"), err.getMessage)
    }
  }

  test("a session built withExtensions resolves graft functions in pure SQL") {
    spark.sparkContext // force the shared context up before cloning sessions
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // getOrCreate with no default/active session reuses the live
      // SparkContext but builds a FRESH SparkSession, applying extensions
      val s2 = SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions()).getOrCreate()
      val row = s2.sql(
        """SELECT simhash64(array('alpha', 'beta')) AS h,
          |  dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
          |  jaccard_sim(array('a', 'b'), array('b', 'c')) AS j,
          |  minhash_sig(array('a', 'b'), 4) AS m,
          |  (SELECT top_k_by_score(s, i, 2) FROM VALUES (1.0D, 1L), (3.0D, 2L), (2.0D, 3L) t(s, i)) AS t
          |""".stripMargin).collect()(0)
      assert(row.getDouble(1) == 11.0)
      assert(math.abs(row.getDouble(2) - 1.0 / 3.0) < 1e-9)
      assert(row.getSeq[Long](3).size == 4)
      val top = row.getSeq[org.apache.spark.sql.Row](4)
      assert(top.map(_.getLong(0)) == Seq(2L, 3L)) // ids of the 2 best scores
      // and the SQL results match the Column-API (imperative-register) path
      val viaApi = spark.range(1)
        .select(functions.SimHash.simhash64(spark,
          org.apache.spark.sql.functions.array(
            org.apache.spark.sql.functions.lit("alpha"),
            org.apache.spark.sql.functions.lit("beta"))))
        .collect()(0).getLong(0)
      assert(row.getLong(0) == viaApi)
      // the MG sketch aggregate resolves in pure SQL too
      val mg = s2.sql(
        """SELECT misra_gries(x, 2) AS sk
          |FROM VALUES ('a'), ('a'), ('a'), ('b'), ('c') t(x)""".stripMargin)
        .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      assert(mg.head.getString(0) == "a", s"hot item not first: $mg")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
