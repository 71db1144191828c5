package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteFromTable, InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateStarAction, UpdateTable}
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
  * **Write verbs** run through the same seam, EAGERLY at parse time
  * (the DESCRIBE HISTORY discipline — each returns a one-row result
  * relation). Spark's own grammar parses the DML shapes; this parser
  * intercepts them when (and only when) the target is a
  * `txtable.`dir`` identifier and routes them onto the transactional
  * Scala API — the pragmatic alternative to a V2
  * SupportsRowLevelOperations catalog, which is the only other way
  * Spark will resolve MERGE/UPDATE/DELETE:
  *
  * {{{
  *   DELETE FROM txtable.`/t` WHERE o_totalprice < 1000
  *   UPDATE txtable.`/t` SET flag = 'X', v = v * 2 WHERE k % 5 = 0
  *   MERGE INTO txtable.`/t` USING src ON t.k = src.k
  *     WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
  *   OPTIMIZE txtable.`/t` [ZORDER BY (a, b)]
  *   VACUUM txtable.`/t` [RETAIN 168 HOURS]
  *   RESTORE TABLE txtable.`/t` TO VERSION AS OF 3
  * }}}
  *
  * MERGE supports exactly the canonical upsert form (star actions,
  * ON = equality over the table's bucket keys) — anything else errors
  * loudly with the supported shape named. Column references in
  * WHERE/SET must be unqualified (they bind against the table frame,
  * not a named alias scope). */
final class TxSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private def isTx(id: Seq[String]): Boolean =
    id.length == 2 && id.head.equalsIgnoreCase("txtable")

  private def relationFor(path: String, version: Option[Long],
      tsMillis: Option[Long] = None): LogicalPlan = {
    val t = TxTable(session, path)
    // manifest-planned + zone-map-skipping relation: the spliced scan
    // lists no directories and drops stat-excluded files before IO
    val v = version
      .orElse(tsMillis.map(ts => t.versionAt(ts).getOrElse(sys.error(
        s"$path has no snapshot committed at or before " +
          s"${java.time.Instant.ofEpochMilli(ts)} — oldest retained " +
          "commit is newer (expired history cannot be time-traveled)"))))
      .getOrElse(t.latestVersion.getOrElse(
        sys.error(s"$path has no committed snapshots")))
    org.apache.spark.sql.graft.StreamShims.relationPlan(t.scanRelation(v))
  }

  /** The `txtable.`dir`` path of a DML target, unwrapping an alias. */
  private def txPath(plan: LogicalPlan): Option[String] = plan match {
    case u: UnresolvedRelation if isTx(u.multipartIdentifier) =>
      Some(u.multipartIdentifier(1))
    case s: SubqueryAlias => txPath(s.child)
    case _                => None
  }

  /** One-row result relation of an eagerly-executed DML verb. */
  private def dmlResult(op: String, version: Long): LogicalPlan = {
    import session.implicits._
    Seq((op, version)).toDF("operation", "version").queryExecution.logical
  }

  private def column(e: Expression) =
    org.apache.spark.sql.graft.StreamShims.columnOf(e)

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
    case DeleteFromTable(t, cond) if txPath(t).isDefined =>
      dmlResult("delete",
        TxTable(session, txPath(t).get).deleteWhere(column(cond)))
    case UpdateTable(t, assignments, cond) if txPath(t).isDefined =>
      val set = assignments.map {
        case Assignment(key: UnresolvedAttribute, value) =>
          require(key.nameParts.length == 1,
            s"UPDATE txtable SET supports plain top-level columns — " +
              s"got ${key.name}")
          key.nameParts.head -> column(value)
        case a => sys.error(s"unsupported SET target ${a.key.sql}")
      }.toMap
      dmlResult("update",
        TxTable(session, txPath(t).get).updateWhere(
          cond.map(column).getOrElse(
            column(Literal.TrueLiteral)), set))
    case MergeIntoTable(t, source, onCond, matched, notMatched,
        notMatchedBySource, _) if txPath(t).isDefined =>
      val tx = TxTable(session, txPath(t).get)
      // canonical upsert only: UPDATE SET * / INSERT *, no extra
      // clauses — the shape TxTable.upsert implements
      val canonical = (matched, notMatched, notMatchedBySource) match {
        case (Seq(UpdateStarAction(None)), Seq(InsertStarAction(None)), Seq()) =>
          true
        case _ => false
      }
      require(canonical,
        "MERGE INTO txtable supports exactly: WHEN MATCHED THEN UPDATE " +
          "SET * WHEN NOT MATCHED THEN INSERT * (no clause conditions, " +
          "no NOT MATCHED BY SOURCE) — use the Scala TxTable.merge API " +
          "for custom resolution")
      // ON must be equality over the table's bucket keys — the merge
      // routing contract; qualifiers are ignored (single target, single
      // source), the NAME pairs must agree and cover the key set
      def conjuncts(e: Expression): Seq[Expression] = e match {
        case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
          conjuncts(l) ++ conjuncts(r)
        case x => Seq(x)
      }
      val onNames = conjuncts(onCond).map {
        case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
            if a.nameParts.last.equalsIgnoreCase(b.nameParts.last) =>
          a.nameParts.last.toLowerCase
        case e => sys.error("MERGE INTO txtable ON must be a conjunction " +
          s"of key equalities t.k = s.k — got ${e.sql}")
      }.toSet
      val keys = tx.bucketKeys.getOrElse(sys.error(
        s"${tx.location} is not bucketed — MERGE needs a key-bucketed " +
          "table (overwriteBucketed / bucketBy write option)"))
      require(onNames == keys.map(_.toLowerCase).toSet,
        s"MERGE INTO txtable ON keys $onNames must equal the table's " +
          s"bucket keys ${keys.mkString(", ")}")
      dmlResult("merge", tx.upsert(
        org.apache.spark.sql.graft.StreamShims.ofRows(session, source)))
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

  /** Maintenance verbs Spark's grammar lacks entirely — matched ahead
    * of the delegate like DESCRIBE HISTORY. `OPTIMIZE` = compaction
    * (with `ZORDER BY` = clustering rewrite); `VACUUM` = unreferenced
    * -file sweep with the standard RETAIN n HOURS horizon; `RESTORE
    * ... VERSION AS OF n` = metadata-only rewind commit. */
  private val Optimize =
    """(?is)\s*OPTIMIZE\s+txtable\s*\.\s*`([^`]+)`\s*(?:ZORDER\s+BY\s*\(([^)]+)\)\s*)?;?\s*""".r
  private val VacuumVerb =
    """(?is)\s*VACUUM\s+txtable\s*\.\s*`([^`]+)`\s*(?:RETAIN\s+(\d+)\s+HOURS\s*)?;?\s*""".r
  private val RestoreVerb =
    """(?is)\s*RESTORE\s+(?:TABLE\s+)?txtable\s*\.\s*`([^`]+)`\s+(?:TO\s+)?VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case DescribeHistory(path) =>
      import session.implicits._
      TxTable(session, path).history().reverse
        .toDF("version", "operation", "n_files").queryExecution.logical
    case Optimize(path, zcols) =>
      val t = TxTable(session, path)
      val v =
        if (zcols == null) t.compact()
        else t.compactZOrder(zcols.split(',').toSeq
          .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty))
      dmlResult("optimize", v)
    case VacuumVerb(path, hours) =>
      import session.implicits._
      val minAge =
        if (hours == null) 7L * 24 * 3600 * 1000 else hours.toLong * 3600 * 1000
      val n = TxTable(session, path).vacuum(minAge).length.toLong
      Seq((path, n)).toDF("location", "files_deleted").queryExecution.logical
    case RestoreVerb(path, version) =>
      dmlResult("restore", TxTable(session, path).restore(version.toLong))
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
