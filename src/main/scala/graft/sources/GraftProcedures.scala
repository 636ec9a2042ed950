package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Identifier, ProcedureCatalog}
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The SQL front door for the persisted-index LIFECYCLES — Spark 4's
  * DSv2 procedure surface (the Iceberg `CALL` pattern), so an index
  * can be built, fed, probed, erased from, and compacted from PURE
  * SQL, the way the time-travel TVFs already expose the versioned
  * tables' read side:
  *
  * {{{
  *   SET spark.sql.catalog.graft_sys = graft.sources.GraftProcedureCatalog
  *   CALL graft_sys.lex_build(root => '/x/ix', source => 'docs_view')
  *   CALL graft_sys.lex_ingest(root => '/x/ix', source => 'new_docs')
  *   SELECT * FROM ... -- or directly:
  *   CALL graft_sys.lex_probe(root => '/x/ix', source => 'query_docs')
  *   CALL graft_sys.lex_delete(root => '/x/ix', source => 'victims')
  *   CALL graft_sys.lex_compact(root => '/x/ix')
  * }}}
  *
  * `source` is a table/view name resolved against the CURRENT session
  * catalog at call time (Iceberg's convention for table-valued
  * procedure inputs — DSv2 procedures take scalar arguments only).
  * Mutations return a one-row status relation; `lex_probe` returns
  * the probe's own rows (result-bounded: queries × nArm — a
  * driver-side materialization the probe contract already bounds).
  * Every procedure delegates to the SAME [[graft.operators.LexIndex]]
  * methods the programmatic path uses, so SQL and Scala callers
  * cannot diverge — the spec drives one full lifecycle through SQL
  * only and checks the probe against the from-scratch arm. */
class GraftProcedureCatalog extends CatalogPlugin with ProcedureCatalog {
  private var catalogName: String = "graft_sys"
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName
  override def loadProcedure(ident: Identifier): UnboundProcedure =
    GraftProcedures.byName.getOrElse(ident.name().toLowerCase,
      throw new IllegalArgumentException(
        s"unknown graft procedure: ${ident.name()} " +
        s"(have: ${GraftProcedures.byName.keys.toSeq.sorted.mkString(", ")})"))
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.byName.keys.toArray.sorted.map(Identifier.of(namespace, _))
}

private[graft] object GraftProcedures {

  private def strParam(n: String) =
    ProcedureParameter.in(n, StringType).build()
  private def intParam(n: String, dflt: String) =
    ProcedureParameter.in(n, IntegerType).defaultValue(dflt).build()

  private val statusSchema = new StructType().add("result", StringType)

  private final case class RowsScan(schema: StructType,
                                    data: Array[InternalRow]) extends LocalScan {
    override def rows(): Array[InternalRow] = data
    override def readSchema(): StructType = schema
  }

  private def status(msg: String): java.util.Iterator[Scan] =
    java.util.List.of[Scan](RowsScan(statusSchema,
      Array(new GenericInternalRow(
        Array[Any](UTF8String.fromString(msg)))))).iterator()

  /** A procedure over (root, source-view[, extra ints]) delegating to
    * a LexIndex lifecycle method. `deterministic` is false: every call
    * has side effects or reads mutable index state. */
  private def proc(procName: String, params: Array[ProcedureParameter])(
      run: (SparkSession, InternalRow) => java.util.Iterator[Scan]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = s"graft $procName"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String = s"graft $procName"
          override def parameters(): Array[ProcedureParameter] = params
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] =
            run(SparkSession.active, input)
        }
    }

  import graft.operators.LexIndex

  val byName: Map[String, UnboundProcedure] = Map(
    "lex_build" -> proc("lex_build",
      Array(strParam("root"), strParam("source"))) { (spark, in) =>
      val root = in.getUTF8String(0).toString
      val src = in.getUTF8String(1).toString
      LexIndex.build(spark, root, spark.table(src))
      status(s"built lex index at $root from $src")
    },
    "lex_ingest" -> proc("lex_ingest",
      Array(strParam("root"), strParam("source"))) { (spark, in) =>
      val root = in.getUTF8String(0).toString
      val src = in.getUTF8String(1).toString
      LexIndex.ingest(spark, root, spark.table(src))
      status(s"ingested $src into $root")
    },
    "lex_delete" -> proc("lex_delete",
      Array(strParam("root"), strParam("source"))) { (spark, in) =>
      val root = in.getUTF8String(0).toString
      val src = in.getUTF8String(1).toString
      LexIndex.delete(spark, root, spark.table(src))
      status(s"deleted $src from $root")
    },
    "lex_compact" -> proc("lex_compact", Array(strParam("root"))) { (spark, in) =>
      val root = in.getUTF8String(0).toString
      LexIndex.compact(spark, root)
      status(s"compacted $root")
    },
    "lex_probe" -> proc("lex_probe",
      Array(strParam("root"), strParam("source"), intParam("n_arm", "20"))) {
      (spark, in) =>
        val root = in.getUTF8String(0).toString
        val src = in.getUTF8String(1).toString
        val nArm = in.getInt(2)
        val schema = new StructType()
          .add("q_id", LongType).add("doc_id", LongType)
          .add("lex_rank", LongType)
        val rows = LexIndex.probe(spark, root, spark.table(src), nArm)
          .orderBy("q_id", "lex_rank")
          .collect() // result-bounded: queries × nArm
          .map(r => new GenericInternalRow(Array[Any](
            r.getLong(0), r.getLong(1), r.getLong(2))): InternalRow)
        java.util.List.of[Scan](RowsScan(schema, rows)).iterator()
    })
}
