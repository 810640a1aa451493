package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.VectorSearch
import graft.queries.Tables

/** The native codegen'd dot product must be bit-identical to the
  * higher-order-function form it replaces, under BOTH evaluation modes
  * (whole-stage codegen on → doGenCode; off → nullSafeEval). */
class DoubleDotProductSpec extends SparkSuite {
  import spark.implicits._

  private def vectors =
    Tables.embeddings(spark, sf("0.01"))
      .select(col("vec_id"), VectorSearch.toDouble(col("embedding")).as("v"))

  private def hyper = typedlit(VectorSearch.hyperplanes.head)

  test("bit-identical to the HOF form on the corpus, codegen and interpreted") {
    for (codegen <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try {
        val diff = vectors.select(
          VectorSearch.dotD(col("v"), hyper).as("native"),
          VectorSearch.dotDReference(col("v"), hyper).as("hof"))
          // bitwise compare, not epsilon: the expression claims identical
          // in-order arithmetic, so NaN-safe exact equality must hold
          .filter(!(col("native") <=> col("hof")))
          .count()
        assert(diff === 0L, s"mismatch under codegen=$codegen")
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("null semantics mirror zip_with: null array, mismatched length, null element") {
    val df = Seq(
      (1L, Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),   // 11.0
      (2L, None, Some(Seq(3.0, 4.0))),                   // null array
      (3L, Some(Seq(1.0, 2.0, 9.0)), Some(Seq(3.0, 4.0))) // length mismatch
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), VectorSearch.dotD(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(out(0).getDouble(1) === 11.0)
    assert(out(1).isNullAt(1))
    assert(out(2).isNullAt(1))
    // null ELEMENT poisons the sum like the HOF's null product does
    val withNullElem = Seq((1L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)))
      .toDF("id", "a", "b")
      .select(VectorSearch.dotD(col("a"), col("b")).as("d")).head()
    assert(withNullElem.isNullAt(0))
  }

  test("graft_dot is callable from SQL text after registration") {
    GraftFunctions.register(spark)
    val v = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(v === 11.0)
    // idempotent re-registration, and arity is enforced
    GraftFunctions.register(spark)
    intercept[Exception](
      spark.sql("SELECT graft_dot(array(1.0d))").collect())
  }

  test("the expression participates in whole-stage codegen (no fallback)") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val plan = vectors.select(VectorSearch.dotD(col("v"), hyper).as("d"))
      .queryExecution.executedPlan
    // the projection containing graft_dot must sit INSIDE a codegen
    // stage — a fallback expression would evict it (the pre-fix
    // transform()-based toDouble did exactly that)
    val stages = plan.collect { case w: WholeStageCodegenExec => w }
    assert(stages.exists(_.toString.contains("graft_dot")), plan.toString)
    // and the generated code actually contains the primitive loop
    val gen = org.apache.spark.sql.execution.debug.codegenString(plan)
    assert(gen.contains(".getDouble("), gen.take(2000))
  }
}
