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
      val two = Seq(ColumnBridge.expression(lit(Seq(1.0f))),
        ColumnBridge.expression(lit(Seq(1.0f))))
      val one = Seq(ColumnBridge.expression(lit(1.0)))
      // arity varies per function: exactly one of the shapes builds
      val built = try builder(two) catch {
        case _: IllegalArgumentException => builder(one)
      }
      assert(built.getClass.getSimpleName.toLowerCase
        .contains(id.funcName.replace("fvec_", "floatvector").replace("_", "")),
        s"${id.funcName} built ${built.getClass.getSimpleName}")
      intercept[IllegalArgumentException](builder(Seq.empty))
    }
  }

  test("double_sortable_bits: order-preserving over the full double line, SQL-callable") {
    GraftExtensions.register(spark)
    import graft.expressions.ScalarExpressions.sortableBits
    // a gauntlet of doubles in Spark's ascending order (NaN largest,
    // -0.0 == +0.0); the transform must be monotone non-decreasing,
    // strictly increasing between non-equal values
    val gauntlet = Seq(
      Double.NegativeInfinity, -java.lang.Double.MAX_VALUE, -1e10, -2.5,
      -1.0, -java.lang.Double.MIN_VALUE, -0.0, 0.0,
      java.lang.Double.MIN_VALUE, 1e-300, 0.5, 1.0, 2.5, 1e10,
      java.lang.Double.MAX_VALUE, Double.PositiveInfinity, Double.NaN)
    val bits = gauntlet.zipWithIndex.toDF("d", "i")
      .select(col("i"), sortableBits(col("d")).as("b"))
      .collect().sortBy(_.getInt(0)).map(_.getLong(1))
    bits.sliding(2).zipWithIndex.foreach { case (Array(a, b), i) =>
      // -0.0 and +0.0 must map EQUAL (Spark compares them equal);
      // everything else strictly increases
      if (gauntlet(i) == 0.0 && gauntlet(i + 1) == 0.0) assert(a == b)
      else assert(a < b, s"order broke between ${gauntlet(i)} and ${gauntlet(i + 1)}")
    }
    // NULL in, NULL out; SQL surface matches the Column surface
    val viaSql = spark.sql(
      "SELECT double_sortable_bits(CAST(2.5 AS DOUBLE)), double_sortable_bits(CAST(NULL AS DOUBLE))")
      .collect().head
    val viaCol = Seq(2.5).toDF("d").select(sortableBits(col("d")))
      .collect().head.getLong(0)
    assert(viaSql.getLong(0) == viaCol && viaSql.isNullAt(1))
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
