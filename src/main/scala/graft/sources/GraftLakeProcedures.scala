package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The lake's MAINTENANCE surface as SQL stored procedures (the
  * ProcedureCatalog half of the reference's SQL-first posture — the
  * table services every lakehouse exposes as `CALL cat.system.<op>`,
  * cf. Iceberg's procedure catalog):
  *
  * {{{
  * CALL graft_lake.system.compact(`table` => 'orders_t', target_files => 4)
  * CALL graft_lake.system.vacuum(`table` => 'orders_t', keep_last => 2)
  * CALL graft_lake.system.history(`table` => 'orders_t')
  * CALL graft_lake.system.restore(`table` => 'orders_t', version => 3)
  * CALL graft_lake.system.evolve_partitioning(`table` => 'orders_t', partition_by => 'd')
  * }}}
  *
  * Each call is one transactional table-service invocation against the
  * same log every other access path uses; results come back as rows
  * (committed version, vacuum counts, the history listing). */
private[graft] object GraftLakeProcedures {

  private def in(name: String, dt: org.apache.spark.sql.types.DataType) =
    ProcedureParameter.in(name, dt).build()
  private def inDefault(name: String, dt: org.apache.spark.sql.types.DataType,
      default: String) = ProcedureParameter.in(name, dt).defaultValue(default).build()

  /** One procedure: unbound == bound (parameters are statically typed;
    * Spark aligns and coerces CALL arguments against them). */
  private final class LakeProc(procName: String,
      params: Array[ProcedureParameter], out: StructType,
      body: InternalRow => Seq[InternalRow])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = s"graftlake table service: $procName"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false // commits versions / deletes files
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val result = body(input).toArray
      java.util.Collections.singletonList[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = result
        override def readSchema(): StructType = out
      }).iterator()
    }
  }

  private[graft] val names: Seq[String] =
    Seq("compact", "vacuum", "history", "restore", "evolve_partitioning",
      "zorder", "recluster", "convert", "set_index_columns")

  def load(warehouse: String, ident: Identifier): UnboundProcedure = {
    def path(tbl: UTF8String): String =
      (warehouse +: tbl.toString.split('.').toSeq).mkString("/")
    val versionOut = new StructType().add("version", IntegerType)
    ident.name().toLowerCase(java.util.Locale.ROOT) match {
      // optional `where => 'col=value[,col=value]'` scopes the rewrite
      // to matching partition DIRECTORIES (the Delta OPTIMIZE ... WHERE
      // shape) — everything else carries by reference; empty = whole
      // table (which also heals any column mapping)
      case "compact" => new LakeProc("compact",
        Array(in("table", StringType), in("target_files", IntegerType),
          inDefault("where", StringType, "''")),
        versionOut,
        input => {
          val where = input.getUTF8String(2).toString.trim
          val v =
            if (where.isEmpty)
              LakeTable.compact(SparkSession.active,
                path(input.getUTF8String(0)), input.getInt(1))
            else {
              val eqs = where.split(',').map(_.trim).filter(_.nonEmpty)
                .map { kv =>
                  val i = kv.indexOf('=')
                  require(i > 0,
                    s"graftlake compact: cannot parse where clause '$kv' — " +
                      "expected col=value[,col=value]")
                  kv.take(i).trim -> kv.drop(i + 1).trim
                }.toMap
              LakeTable.compactWhere(SparkSession.active,
                path(input.getUTF8String(0)), eqs, input.getInt(1))
            }
          Seq(InternalRow(v))
        })
      // dry_run previews (nothing deleted); the retention guard refuses
      // to expire versions younger than the horizon unless force => true
      case "vacuum" => new LakeProc("vacuum",
        Array(in("table", StringType), inDefault("keep_last", IntegerType, "1"),
          inDefault("dry_run", BooleanType, "false"),
          inDefault("force", BooleanType, "false")),
        new StructType().add("manifests_dropped", IntegerType)
          .add("data_files_deleted", IntegerType),
        input => {
          val (dropped, deleted) =
            LakeTable.vacuum(path(input.getUTF8String(0)), input.getInt(1),
              dryRun = input.getBoolean(2), force = input.getBoolean(3))
          Seq(InternalRow(dropped, deleted))
        })
      case "history" => new LakeProc("history",
        Array(in("table", StringType)),
        new StructType().add("version", IntegerType).add("op", StringType)
          .add("n_files", IntegerType).add("n_dvs", IntegerType),
        input => LakeTable.history(path(input.getUTF8String(0))).map {
          case (v, op, nf, nd) => InternalRow(v, UTF8String.fromString(op), nf, nd)
        })
      case "restore" => new LakeProc("restore",
        Array(in("table", StringType), in("version", IntegerType)),
        versionOut,
        input => Seq(InternalRow(LakeTable.restore(
          SparkSession.active, path(input.getUTF8String(0)), input.getInt(1)))))
      // the Delta `OPTIMIZE ZORDER BY` shape: re-cluster the current
      // snapshot by the Morton key of the named columns as a forward
      // commit, so multi-column box scans prune from ANY prior layout
      case "zorder" => new LakeProc("zorder",
        Array(in("table", StringType), in("columns", StringType),
          inDefault("target_files", IntegerType, "8")),
        versionOut,
        input => Seq(InternalRow(LakeTable.rezorder(
          SparkSession.active, path(input.getUTF8String(0)),
          input.getUTF8String(1).toString.split(',').map(_.trim)
            .filter(_.nonEmpty).toSeq,
          input.getInt(2)))))
      // change a clustered table's bucket count — or cluster a table
      // post hoc — as a forward commit; SPJ and point-lookup bucket
      // pruning apply from the next read
      case "recluster" => new LakeProc("recluster",
        Array(in("table", StringType), in("buckets", IntegerType)),
        versionOut,
        input => Seq(InternalRow(LakeTable.recluster(
          SparkSession.active, path(input.getUTF8String(0)), input.getInt(1)))))
      // CONVERT TO LAKE (r17): register an existing parquet directory
      // under the warehouse as a lake table in place — zero data I/O,
      // footer-only stats; the converted table is then a full citizen
      case "convert" => new LakeProc("convert",
        Array(in("table", StringType), in("keys", StringType)),
        versionOut,
        input => Seq(InternalRow(LakeTable.convert(
          SparkSession.active, path(input.getUTF8String(0)),
          input.getUTF8String(1).toString.split(',').map(_.trim)
            .filter(_.nonEmpty).toSeq))))
      // declare secondary INDEX columns (r18): a header-only commit —
      // new writes collect per-file bloom bits for them, compact
      // backfills; surfaced as TBLPROPERTIES 'index_columns'
      case "set_index_columns" => new LakeProc("set_index_columns",
        Array(in("table", StringType), in("columns", StringType)),
        versionOut,
        input => Seq(InternalRow(LakeTable.setIndexColumns(
          path(input.getUTF8String(0)),
          input.getUTF8String(1).toString.split(',').map(_.trim)
            .filter(_.nonEmpty).toSeq))))
      case "evolve_partitioning" => new LakeProc("evolve_partitioning",
        Array(in("table", StringType), in("partition_by", StringType)),
        versionOut,
        input => Seq(InternalRow(LakeTable.evolvePartitioning(
          path(input.getUTF8String(0)),
          input.getUTF8String(1).toString.split(',').map(_.trim)
            .filter(_.nonEmpty).toSeq))))
      case other => throw new IllegalArgumentException(
        s"graftlake catalog: unknown procedure $other — " +
          s"available: ${names.mkString(", ")}")
    }
  }
}
