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

/** The SQL front door for ALL FIVE persisted-index LIFECYCLES —
  * Spark 4's DSv2 procedure surface (the Iceberg `CALL` pattern), so
  * every index family can be built, fed, probed, erased from, and
  * compacted from PURE SQL, the way the time-travel TVFs already
  * expose the versioned tables' read side:
  *
  * {{{
  *   SET spark.sql.catalog.graft_sys = graft.sources.GraftProcedureCatalog
  *   CALL graft_sys.lex_build(root => '/x/ix', source => 'docs_view')
  *   CALL graft_sys.lex_ingest(root => '/x/ix', source => 'new_docs')
  *   CALL graft_sys.lex_probe(root => '/x/ix', source => 'query_docs')
  *   CALL graft_sys.lex_delete(root => '/x/ix', source => 'victims')
  *   CALL graft_sys.lex_compact(root => '/x/ix')
  *   -- same verbs for the other families:
  *   CALL graft_sys.vec_build(root => ..., source => 'embeddings_view')
  *   CALL graft_sys.graph_probe(root => ..., source => ..., beam => 4)
  *   CALL graft_sys.gram_ingest(root => ..., source => 'new_docs')
  *   CALL graft_sys.band_probe(root => ..., source => ..., min_jaccard => 0.3)
  * }}}
  *
  * `source` is a table/view name resolved against the CURRENT session
  * catalog at call time (Iceberg's convention for table-valued
  * procedure inputs — DSv2 procedures take scalar arguments only).
  * Mutations return a one-row status relation; the `*_probe`
  * procedures return the probe's own rows (result-bounded — a
  * driver-side materialization each probe contract already bounds).
  * Every procedure delegates to the SAME operator methods the
  * programmatic path uses ([[graft.operators.LexIndex]],
  * [[graft.operators.VecIndex]], [[graft.operators.GraphIndex]],
  * [[graft.operators.GramIndex]], [[graft.operators.BandIndex]]), so
  * SQL and Scala callers cannot diverge — one spec per family drives
  * a full lifecycle through SQL only and checks the probe against a
  * from-scratch arm.
  *
  * Verb mapping where a family's native names differ: `*_ingest` =
  * GramIndex.append / BandIndex.ingest; `*_delete` = GramIndex.retire
  * / BandIndex.retire (tombstones); `*_compact` =
  * Gram/BandIndex.compactRetired. VecIndex has NO vec_compact —
  * its delete rewrites the victims' cell dirs physically (no
  * graveyard to purge). `cent_ids` takes a comma-separated id list
  * ('' = the default centroid grid). */
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
  private def strParamDflt(n: String, dflt: String) =
    ProcedureParameter.in(n, StringType).defaultValue(dflt).build()
  private def intParam(n: String, dflt: String) =
    ProcedureParameter.in(n, IntegerType).defaultValue(dflt).build()
  private def dblParam(n: String, dflt: String) =
    ProcedureParameter.in(n, DoubleType).defaultValue(dflt).build()

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

  /** Materialize a (result-bounded) probe frame as the procedure's
    * relation — every probe contract bounds its own output, so the
    * collect here is the same driver-side cost the Scala caller pays
    * on `.collect()`. */
  private def resultScan(df: org.apache.spark.sql.DataFrame): java.util.Iterator[Scan] = {
    val schema = df.schema
    val rows = df.collect().map { r =>
      new GenericInternalRow(schema.fields.indices.map { i =>
        if (r.isNullAt(i)) null
        else schema.fields(i).dataType match {
          case StringType  => UTF8String.fromString(r.getString(i))
          case LongType    => java.lang.Long.valueOf(r.getLong(i))
          case IntegerType => java.lang.Integer.valueOf(r.getInt(i))
          case DoubleType  => java.lang.Double.valueOf(r.getDouble(i))
          case dt => throw new IllegalStateException(
            s"unsupported probe column type $dt")
        }
      }.toArray[Any]): InternalRow
    }
    java.util.List.of[Scan](RowsScan(schema, rows)).iterator()
  }

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

  import graft.operators.{BandIndex, GramIndex, GraphIndex, LexIndex,
    Similarity, VecIndex}

  /** 'cent_ids' argument: comma-separated vec_ids, '' = the default
    * oracle-pinned centroid grid. */
  private def centIdsOf(s: String): Seq[Long] =
    if (s.trim.isEmpty) Similarity.centroidIds
    else s.split(",").map(_.trim.toLong).toSeq

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
        resultScan(LexIndex.probe(spark, root, spark.table(src), in.getInt(2))
          .orderBy("q_id", "lex_rank")) // result-bounded: queries × nArm
    },

    // ---- VecIndex (IVF): no vec_compact — delete rewrites cells ----
    "vec_build" -> proc("vec_build",
      Array(strParam("root"), strParam("source"),
            strParamDflt("cent_ids", "''"))) { (spark, in) =>
      val root = in.getUTF8String(0).toString
      val src = in.getUTF8String(1).toString
      VecIndex.build(spark, root, spark.table(src),
        centIds = centIdsOf(in.getUTF8String(2).toString))
      status(s"built vec index at $root from $src")
    },
    "vec_ingest" -> proc("vec_ingest",
      Array(strParam("root"), strParam("source"))) { (spark, in) =>
      val root = in.getUTF8String(0).toString
      val src = in.getUTF8String(1).toString
      VecIndex.ingest(spark, root, spark.table(src))
      status(s"ingested $src into $root")
    },
    "vec_probe" -> proc("vec_probe",
      Array(strParam("root"), strParam("source"),
            intParam("k", "3"), intParam("n_probe", "2"))) { (spark, in) =>
      val root = in.getUTF8String(0).toString
      val src = in.getUTF8String(1).toString
      resultScan(VecIndex.probe(spark, root, spark.table(src),
          k = in.getInt(2), nProbe = in.getInt(3))
        .orderBy("q_id", "rank")) // result-bounded: queries × k
    },
    "vec_delete" -> proc("vec_delete",
      Array(strParam("root"), strParam("source"))) { (spark, in) =>
      val root = in.getUTF8String(0).toString
      val src = in.getUTF8String(1).toString
      VecIndex.delete(spark, root, spark.table(src))
      status(s"deleted $src from $root")
    },

    // ---- GraphIndex (graph-ANN) ----
    "graph_build" -> proc("graph_build",
      Array(strParam("root"), strParam("source"),
            intParam("graph_k", "3"), intParam("n_probe", "2"),
            intParam("n_seeds", "8"), strParamDflt("cent_ids", "''"),
            intParam("with_codes", "0"), intParam("with_hier", "0"))) {
      (spark, in) =>
        val root = in.getUTF8String(0).toString
        val src = in.getUTF8String(1).toString
        val maxLevel = in.getInt(7)
        if (maxLevel > 0)
          GraphIndex.buildHier(spark, root, spark.table(src),
            graphK = in.getInt(2), nProbe = in.getInt(3),
            nSeeds = in.getInt(4), maxLevel = maxLevel,
            centIds = centIdsOf(in.getUTF8String(5).toString),
            withCodes = in.getInt(6) != 0)
        else GraphIndex.build(spark, root, spark.table(src),
          graphK = in.getInt(2), nProbe = in.getInt(3),
          nSeeds = in.getInt(4),
          centIds = centIdsOf(in.getUTF8String(5).toString),
          withCodes = in.getInt(6) != 0)
        status(s"built graph index at $root from $src" +
          (if (maxLevel > 0) s" (hier levels=$maxLevel)" else ""))
    },
    "graph_ingest" -> proc("graph_ingest",
      Array(strParam("root"), strParam("corpus"), strParam("source"),
            intParam("graph_k", "3"), intParam("n_probe", "2"),
            strParamDflt("cent_ids", "''"))) { (spark, in) =>
      val root = in.getUTF8String(0).toString
      val corpus = in.getUTF8String(1).toString
      val src = in.getUTF8String(2).toString
      GraphIndex.ingest(spark, root, spark.table(corpus), spark.table(src),
        graphK = in.getInt(3), nProbe = in.getInt(4),
        centIds = centIdsOf(in.getUTF8String(5).toString))
      status(s"ingested $src into $root against $corpus")
    },
    "graph_probe" -> proc("graph_probe",
      Array(strParam("root"), strParam("source"),
            intParam("max_query_id", "8"), intParam("k", "3"),
            intParam("beam", "4"), intParam("hops", "3"))) { (spark, in) =>
      val root = in.getUTF8String(0).toString
      val src = in.getUTF8String(1).toString
      resultScan(GraphIndex.probe(spark, root, spark.table(src),
        maxQueryId = in.getInt(2).toLong, k = in.getInt(3),
        beam = in.getInt(4), hops = in.getInt(5))) // bounded: queries × k
    },
    "graph_probe_pq" -> proc("graph_probe_pq",
      Array(strParam("root"), strParam("source"),
            intParam("max_query_id", "8"), intParam("k", "3"),
            intParam("beam", "4"), intParam("hops", "3"))) { (spark, in) =>
      val root = in.getUTF8String(0).toString
      val src = in.getUTF8String(1).toString
      resultScan(GraphIndex.probePq(spark, root, spark.table(src),
        maxQueryId = in.getInt(2).toLong, k = in.getInt(3),
        beam = in.getInt(4), hops = in.getInt(5))) // bounded: queries × k
    },
    "graph_probe_hier" -> proc("graph_probe_hier",
      Array(strParam("root"), strParam("source"),
            intParam("max_query_id", "8"), intParam("k", "3"),
            intParam("beam", "4"), intParam("hops", "3"),
            intParam("upper_beam", "1"), intParam("upper_hops", "2"))) {
      (spark, in) =>
        val root = in.getUTF8String(0).toString
        val src = in.getUTF8String(1).toString
        resultScan(GraphIndex.probeHier(spark, root, spark.table(src),
          maxQueryId = in.getInt(2).toLong, k = in.getInt(3),
          beam = in.getInt(4), hops = in.getInt(5),
          upperBeam = in.getInt(6),
          upperHops = in.getInt(7))) // bounded: queries × k
    },
    "graph_delete" -> proc("graph_delete",
      Array(strParam("root"), strParam("source"))) { (spark, in) =>
      val root = in.getUTF8String(0).toString
      val src = in.getUTF8String(1).toString
      GraphIndex.delete(spark, root, spark.table(src))
      status(s"retired $src from $root")
    },
    "graph_compact" -> proc("graph_compact",
      Array(strParam("root"))) { (spark, in) =>
      val root = in.getUTF8String(0).toString
      GraphIndex.compact(spark, root)
      status(s"compacted $root")
    },

    // ---- GramIndex (span postings): ingest=append, delete=retire ----
    "gram_build" -> proc("gram_build",
      Array(strParam("root"), strParam("source"),
            intParam("n", "8"), intParam("df_cap", "64"))) { (spark, in) =>
      val root = in.getUTF8String(0).toString
      val src = in.getUTF8String(1).toString
      GramIndex.build(spark, root, spark.table(src),
        n = in.getInt(2), dfCap = in.getInt(3))
      status(s"built gram index at $root from $src")
    },
    "gram_ingest" -> proc("gram_ingest",
      Array(strParam("root"), strParam("source"), intParam("n", "8"))) {
      (spark, in) =>
        val root = in.getUTF8String(0).toString
        val src = in.getUTF8String(1).toString
        GramIndex.append(spark, root, spark.table(src), n = in.getInt(2))
        status(s"ingested $src into $root")
    },
    "gram_probe" -> proc("gram_probe",
      Array(strParam("root"), strParam("source"),
            intParam("n", "8"), intParam("min_tokens", "16"))) { (spark, in) =>
      val root = in.getUTF8String(0).toString
      val src = in.getUTF8String(1).toString
      resultScan(GramIndex.probe(spark, root, spark.table(src),
          n = in.getInt(2), minTokens = in.getInt(3))
        .orderBy("batch_doc", "corpus_doc", "b_start", "c_start"))
    },
    "gram_delete" -> proc("gram_delete",
      Array(strParam("root"), strParam("source"))) { (spark, in) =>
      val root = in.getUTF8String(0).toString
      val src = in.getUTF8String(1).toString
      GramIndex.retire(spark, root, spark.table(src))
      status(s"retired $src from $root")
    },
    "gram_compact" -> proc("gram_compact",
      Array(strParam("root"))) { (spark, in) =>
      val root = in.getUTF8String(0).toString
      GramIndex.compactRetired(spark, root)
      status(s"compacted $root")
    },

    // ---- BandIndex (MinHash-LSH): ingest=dedup-gated, delete=retire ----
    "band_build" -> proc("band_build",
      Array(strParam("root"), strParam("source"))) { (spark, in) =>
      val root = in.getUTF8String(0).toString
      val src = in.getUTF8String(1).toString
      BandIndex.build(spark, root, spark.table(src))
      status(s"built band index at $root from $src")
    },
    "band_ingest" -> proc("band_ingest",
      Array(strParam("root"), strParam("source"),
            dblParam("min_jaccard", "0.3"))) { (spark, in) =>
      val root = in.getUTF8String(0).toString
      val src = in.getUTF8String(1).toString
      val (admitted, _) = BandIndex.ingest(spark, root, spark.table(src),
        minJaccard = in.getDouble(2))
      status(s"ingested $src into $root (admitted ${admitted.count()})")
    },
    "band_probe" -> proc("band_probe",
      Array(strParam("root"), strParam("source"),
            dblParam("min_jaccard", "0.3"))) { (spark, in) =>
      val root = in.getUTF8String(0).toString
      val src = in.getUTF8String(1).toString
      resultScan(BandIndex.probe(spark, root, spark.table(src),
          minJaccard = in.getDouble(2))
        .orderBy("batch_doc", "corpus_doc"))
    },
    "band_delete" -> proc("band_delete",
      Array(strParam("root"), strParam("source"))) { (spark, in) =>
      val root = in.getUTF8String(0).toString
      val src = in.getUTF8String(1).toString
      BandIndex.retire(spark, root, spark.table(src))
      status(s"retired $src from $root")
    },
    "band_compact" -> proc("band_compact",
      Array(strParam("root"))) { (spark, in) =>
      val root = in.getUTF8String(0).toString
      BandIndex.compactRetired(spark, root)
      status(s"compacted $root")
    },

    // ---- VersionedTable DML (the write verbs the read-side TVFs and
    // CREATE TABLE ... USING graft lack): every proc delegates to the
    // SAME VersionedTable/DataSkipping methods the Scala path uses,
    // so the reference's most important write op (the keyed merge,
    // queue_for_delta.py:741-799) is reachable from SQL alone ----
    "table_merge" -> proc("table_merge",
      Array(strParam("root"), strParam("source"), strParam("keys"),
            strParamDflt("tie_break", "''"),
            intParam("column_update", "0"))) { (spark, in) =>
      val root = in.getUTF8String(0).toString
      val src = in.getUTF8String(1).toString
      val keys = in.getUTF8String(2).toString.split(",").map(_.trim).toSeq
      val tb = in.getUTF8String(3).toString.split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq
      val v = VersionedTable.merge(spark, root, spark.table(src), keys, tb,
        columnUpdate = in.getInt(4) != 0)
      status(s"merged $src into $root as v$v")
    },
    "table_delete" -> proc("table_delete",
      Array(strParam("root"), strParam("source"), strParam("keys"))) {
      (spark, in) =>
        val root = in.getUTF8String(0).toString
        val src = in.getUTF8String(1).toString
        val keys = in.getUTF8String(2).toString.split(",").map(_.trim).toSeq
        val v = VersionedTable.deleteKeys(spark, root, spark.table(src), keys)
        status(s"deleted $src keys from $root as v$v")
    },
    "table_compact" -> proc("table_compact",
      Array(strParam("root"))) { (spark, in) =>
      val root = in.getUTF8String(0).toString
      val base = VersionedTable.currentVersion(spark, root).getOrElse(
        throw new java.io.FileNotFoundException(s"no committed version at $root"))
      val v = if (VersionedTable.partitionNative(spark, root, base))
          VersionedTable.compactPartitioned(spark, root)
        else VersionedTable.compact(spark, root)
      status(s"compacted $root as v$v")
    },
    "table_zorder" -> proc("table_zorder",
      Array(strParam("root"), strParam("c1"), strParam("c2"),
            intParam("n_dirs", "16"))) { (spark, in) =>
      val root = in.getUTF8String(0).toString
      val base = VersionedTable.currentVersion(spark, root).getOrElse(
        throw new java.io.FileNotFoundException(s"no committed version at $root"))
      val v = DataSkipping.zOrderCommit(spark, root,
        VersionedTable.readAsOf(spark, root, base),
        in.getUTF8String(1).toString, in.getUTF8String(2).toString,
        in.getInt(3), base)
      status(s"z-ordered $root as v$v")
    },
    "table_vacuum" -> proc("table_vacuum",
      Array(strParam("root"), intParam("keep_last", "1"))) { (spark, in) =>
      val root = in.getUTF8String(0).toString
      VersionedTable.vacuum(spark, root, keepLast = in.getInt(1))
      status(s"vacuumed $root keeping ${in.getInt(1)}")
    })
}
