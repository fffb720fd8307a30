package graft

import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("native vector expressions are callable from SQL text after registration") {
    GraftExtensions.register(spark)
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .createOrReplaceTempView("ext_spec_embeddings")
    // self-cosine = 1 for every vector, through the SQL surface
    val bad = spark.sql(
      """SELECT vec_id, fvec_cosine(embedding, embedding) AS c,
                fvec_dot(embedding, embedding) AS d
         FROM ext_spec_embeddings""")
      .filter(abs($"c" - 1.0) > 1e-9 || $"d" <= 0.0).count()
    assert(bad == 0)
    // SQL-text form equals the Column form bit-for-bit
    val q = spark.sql(
      """SELECT fvec_cosine(a.embedding, b.embedding) AS c
         FROM ext_spec_embeddings a JOIN ext_spec_embeddings b
           ON a.vec_id = 0 AND b.vec_id = 1""").collect().head.getDouble(0)
    val viaCol = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .filter($"vec_id" === 0).select($"embedding".as("ea"))
      .crossJoin(spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .filter($"vec_id" === 1).select($"embedding".as("eb")))
      .select(graft.expressions.VectorExpressions.cosineF($"ea", $"eb"))
      .collect().head.getDouble(0)
    assert(java.lang.Double.doubleToLongBits(q) == java.lang.Double.doubleToLongBits(viaCol))
    // registry installation works on further sessions of the same
    // context. (The spark.sql.extensions CONF path cannot be exercised
    // in-process: it is a static conf read once at the first session
    // build of the JVM — covered instead by the extension-class unit
    // test below.)
    val s2 = spark.newSession()
    GraftExtensions.register(s2)
    s2.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .createOrReplaceTempView("ext_spec_embeddings2")
    assert(s2.sql("SELECT fvec_dot(embedding, embedding) FROM ext_spec_embeddings2 LIMIT 1")
      .collect().head.getDouble(0) > 0.0)
  }

  test("extension class injects every function into SparkSessionExtensions") {
    // drive the conf-path entry point directly: apply the extensions
    // class to a fresh SparkSessionExtensions and verify each injected
    // builder constructs the right expression from SQL-shaped children
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw, registers all
    GraftExtensions.functions.foreach { case (id, _, builder) =>
      import org.apache.spark.sql.graftbridge.ColumnBridge
      val args = Seq(ColumnBridge.expression(lit(Seq(1.0f))),
        ColumnBridge.expression(lit(Seq(1.0f))))
      val built = builder(args)
      assert(built.getClass.getSimpleName.toLowerCase
        .contains(id.funcName.replace("fvec_", "floatvector").replace("_", "")),
        s"${id.funcName} built ${built.getClass.getSimpleName}")
      intercept[IllegalArgumentException](builder(args.take(1)))
    }
  }

  test("wrong arity raises a clear error, not an index failure") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT fvec_cosine(array(CAST(1.0 AS FLOAT)))").collect()
    }
    assert(e.getMessage.contains("exactly 2") || e.getMessage.contains("fvec_cosine"),
      e.getMessage)
  }

  test("type mismatch surfaces the expression's own check message") {
    GraftExtensions.register(spark)
    val err = intercept[Exception] {
      spark.sql("SELECT fvec_cosine(array(1, 2), array(1.0F, 2.0F))").collect()
    }
    assert(err.getMessage.contains("fvec_cosine") ||
      err.getMessage.toLowerCase.contains("array<float>"), err.getMessage)
  }
}
