package graft.functions.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.PlanExec
import org.apache.spark.sql.types.{DataType, LongType}

/** SQL registration for the curation/media operators (round-9 VERDICT
  * item 5): the Tier-B arbitrary-SQL pass-through (the reference's
  * `duckdb_rest_server.py:73-78` surface) reaches the quality gate,
  * fingerprinting, chunking, and perceptual hashing the same way
  * `graft_shingles` / `graft_heavy_hitters` are already reachable —
  * `SELECT graft_gopher_pass(text) FROM ns.docs` just works through
  * `Engine.sqlQuery`.
  *
  * Three of the four are COMPOSED functions: the registry builder
  * converts its argument Expressions to Columns (PlanExec's
  * `private[sql]` bridge), calls the SAME Column-level builder the
  * Scala operators use (`QualityRules.keepColumn`,
  * `Winnowing.digestColumn`, `Cdc.cutsColumn`), and hands the
  * resulting tree back — one implementation, two surfaces, no drift.
  * Optional trailing arguments must be foldable literals (they
  * parameterize the generated tree, e.g. the CDC divisor).
  */
object CurationSql {

  val GopherPassFn = "graft_gopher_pass"
  val WinnowDigestFn = "graft_winnow_digest"
  val CdcCutsFn = "graft_cdc_cuts"
  val AHashFn = "graft_ahash64"
  val LangIdFn = "graft_lang_id"
  val QualityScoreFn = "graft_quality_score"
  val TokenCountFn = "graft_token_count"
  val FingerprintFn = "graft_fingerprint"
  val Fre100Fn = "graft_fre100"
  val Fk100Fn = "graft_fk100"
  val CleanLinesFn = "graft_clean_lines"

  /** Idempotent registry hookup for the functions above (the four
    * curation/media kernels, the four text-analysis scalars, and the
    * readability / line-cleaning scalars), plus the two SQ8
    * vector-codec functions ([[Sq8]]'s names — registered here too so
    * the SQL bridge gets them without a separate call).
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    def reg(name: String, b: Seq[Expression] => Expression): Unit = {
      val ident = FunctionIdentifier(name)
      if (!registry.functionExists(ident)) {
        registry.createOrReplaceTempFunction(name, b, "built-in")
      }
    }
    def c(e: Expression): Column = PlanExec.columnOf(e)
    def litInt(e: Expression, what: String): Int = {
      require(e.foldable, s"$what must be a literal")
      e.eval().asInstanceOf[Number].intValue()
    }
    reg(GopherPassFn, es => PlanExec.expressionOf(
      graft.operators.QualityRules.keepColumn(c(es(0)))))
    reg(WinnowDigestFn, es => PlanExec.expressionOf(
      graft.operators.Winnowing.digestColumn(c(es(0)))))
    reg(CdcCutsFn, es => PlanExec.expressionOf(
      graft.operators.Cdc.cutsColumn(c(es(0)),
        divisor =
          if (es.length > 1) litInt(es(1), "graft_cdc_cuts divisor")
          else 64)))
    reg(AHashFn, es => AHash64(es(0)))
    // the text-analysis scalars (t03/t04/t05/t06's kernels): same
    // one-builder-two-surfaces pattern
    reg(LangIdFn, es => PlanExec.expressionOf(
      graft.functions.TextFns.langIdColumn(c(es(0)))))
    reg(QualityScoreFn, es => PlanExec.expressionOf(
      graft.functions.TextFns.qualityScore(c(es(0)))))
    reg(TokenCountFn, es => PlanExec.expressionOf(
      org.apache.spark.sql.functions.size(
        graft.functions.TextFns.tokens(c(es(0)))).cast("long")))
    reg(FingerprintFn, es => PlanExec.expressionOf(
      graft.functions.TextFns.fingerprint(c(es(0)))))
    // readability (t52) and line cleaning (t53): the same
    // one-builder-two-surfaces pattern
    reg(Fre100Fn, es => PlanExec.expressionOf(
      graft.operators.QualityRules.fre100Column(c(es(0)))))
    reg(Fk100Fn, es => PlanExec.expressionOf(
      graft.operators.QualityRules.fk100Column(c(es(0)))))
    reg(CleanLinesFn, es => PlanExec.expressionOf(
      graft.operators.QualityRules.cleanedColumn(c(es(0)),
        minChars =
          if (es.length > 1) litInt(es(1), "graft_clean_lines minChars")
          else 30)))
    // the SQ8 codec (e15's kernels): raw-Expression builders, same
    // names Sq8.register installs — whichever runs first wins, both
    // build identical trees
    reg(Sq8.EncodeFnName, es => Sq8Encode(es(0)))
    reg(Sq8.DotFnName, es => Sq8Dot(es(0), es(1)))
  }
}

/** 64-bit perceptual average-hash of an encoded image (`binary` →
  * `bigint`, null when the payload does not decode): the scalar-SQL
  * face of [[graft.operators.Multimodal]]'s aHash (identical bits —
  * same 9×8 exact-area luma grid, same mean threshold).
  *
  * Deliberately an eval-only expression (CodegenFallback): the body is
  * a javax.imageio decode — JVM library work that codegen could only
  * wrap, not fuse — and preference order (b) says a native expression
  * still beats any UDF (no ScalaUDF serialization wall, null-safety
  * for free, usable from SQL text). Batch pipelines should keep using
  * `Multimodal.perceptualHashes` (mapPartitions with per-partition
  * codec init); this function exists so ad-hoc SQL can hash a frame
  * without leaving the query surface.
  */
case class AHash64(child: Expression) extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_ahash64"

  override protected def nullSafeEval(b: Any): Any = {
    val bytes = b.asInstanceOf[Array[Byte]]
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) null else graft.operators.Multimodal.aHashOf(img)
    } catch { case _: Exception => null }
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
