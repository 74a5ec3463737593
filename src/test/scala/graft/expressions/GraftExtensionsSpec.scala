package graft.expressions

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  test("vector_dot callable from SQL text after extension registration") {
    // inject into the shared session's registry the way withExtensions would
    val (id, info, builder) = GraftExtensions.vectorDotDescriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    val got = spark.sql(
      "SELECT vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(got == 11.0)
    // analysis error on wrong arity surfaces cleanly
    intercept[Exception] {
      spark.sql("SELECT vector_dot(array(1.0D))").collect()
    }
  }
}
