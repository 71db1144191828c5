package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

import graft.core.TxTable

/** SQL entry point for TxTable — injected via the session extensions
  * (`spark.sql.extensions=graft.functions.GraftExtensions`), so pure
  * SQL can address commit-logged tables the way it addresses parquet
  * path tables:
  *
  * {{{
  *   SELECT * FROM txtable.`/data/events`
  *   SELECT * FROM txtable.`/data/events` VERSION AS OF 3
  * }}}
  *
  * Design: a DELEGATING parser — every statement parses through
  * Spark's own parser first; we then splice resolved relations over
  * the `txtable.`path`` identifiers (including under the native
  * `VERSION AS OF` time-travel node). This beats the alternatives:
  * SQL-on-file refuses non-FileFormat sources
  * (UNSUPPORTED_DATASOURCE_FOR_DIRECT_QUERY), and a resolution rule
  * would run AFTER that refusal throws. The spliced plan is the same
  * parquet HadoopFsRelation the batch format uses — pushdown and
  * pruning intact. The `txtable` namespace is reserved by this
  * extension (a database literally named `txtable` would be
  * shadowed — the `parquet.`path`` precedent).
  *
  * Write verbs (MERGE INTO / DELETE) stay on the Scala API: SQL MERGE
  * resolution requires a V2 catalog with SupportsRowLevelOperations —
  * a catalog surface, not a parser one. */
final class TxSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private def isTx(id: Seq[String]): Boolean =
    id.length == 2 && id.head.equalsIgnoreCase("txtable")

  private def relationFor(path: String, version: Option[Long],
      tsMillis: Option[Long] = None): LogicalPlan = {
    val t = TxTable(session, path)
    org.apache.spark.sql.graft.StreamShims.batchLogicalPlan(
      version.map(t.readVersion)
        .orElse(tsMillis.map(t.readTimestamp))
        .getOrElse(t.read()))
  }

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    // INSERT over the spliced relation would become a direct
    // parquet-location write BYPASSING the commit log (the files
    // would land as unreferenced orphans and vacuum away) — refuse
    // with the supported path named
    case i: org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement
        if i.table.isInstanceOf[UnresolvedRelation] &&
          isTx(i.table.asInstanceOf[UnresolvedRelation].multipartIdentifier) =>
      sys.error("INSERT INTO txtable.`dir` would bypass the commit log — " +
        "write through df.write.format(\"txtable\").mode(\"append\")")
    case p => rewriteRelations(p)
  }

  private def rewriteRelations(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case RelationTimeTravel(u: UnresolvedRelation, None, Some(v))
        if isTx(u.multipartIdentifier) && v.forall(_.isDigit) =>
      relationFor(u.multipartIdentifier(1), Some(v.toLong))
    case RelationTimeTravel(u: UnresolvedRelation, Some(Literal(v, dt)), None)
        if isTx(u.multipartIdentifier) =>
      // the timestamp slot carries either grammar: an INTEGER literal
      // is a version (some grammars route VERSION AS OF here), a
      // string/timestamp literal is TIMESTAMP AS OF
      dt match {
        case org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.LongType =>
          relationFor(u.multipartIdentifier(1), Some(v.toString.toLong))
        case _ =>
          relationFor(u.multipartIdentifier(1), None,
            Some(TxTableSource.parseTsMillis(v.toString)))
      }
    case u: UnresolvedRelation if isTx(u.multipartIdentifier) =>
      relationFor(u.multipartIdentifier(1), None)
  }

  /** `DESCRIBE HISTORY txtable.`dir`` — the commit-log audit verb
    * (version, operation, n_files), newest first. Handled BEFORE the
    * delegate: Spark's grammar has no HISTORY clause to extend. */
  private val DescribeHistory =
    """(?is)\s*DESC(?:RIBE)?\s+HISTORY\s+txtable\s*\.\s*`([^`]+)`\s*;?\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case DescribeHistory(path) =>
      import session.implicits._
      TxTable(session, path).history().reverse
        .toDF("version", "operation", "n_files").queryExecution.logical
    case _ => rewrite(delegate.parsePlan(sqlText))
  }
  override def parseQuery(sqlText: String): LogicalPlan =
    rewrite(delegate.parseQuery(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
