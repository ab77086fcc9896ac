package graft.sources

import java.util

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Read-only `TableCatalog` plugin exposing the synthetic documents
  * generator to pure SQL — the catalog API surface of the engine:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
  *   spark.sql("SELECT count(*) FROM graft.docs.docs_1000000_16")
  *   spark.sql("SELECT lang, count(*) FROM graft.docs.docs_100000 GROUP BY lang")
  * }}}
  *
  * Table names are `docs_<rows>[_<partitions>]` under the single `docs`
  * namespace (partitions default to 8). Resolution is pure — no metastore,
  * no files; the identifier IS the table definition, so every capability
  * of [[DocsTable]] (pushdown, runtime filtering, statistics, streaming)
  * composes with SQL planning unchanged. DDL mutations are rejected: the
  * catalog is a read-only view of a generated keyspace.
  *
  * Scale note: a real warehouse catalog resolves names to storage + stats
  * the same way — the planner consumes `Table`/`Scan` contracts only, so
  * swapping this for a metastore-backed implementation changes resolution,
  * never planning.
  */
class GraftCatalog extends TableCatalog {

  private var catalogName: String = "graft"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  private val Ns = Array("docs")
  private val TableName = """docs_(\d+)(?:_(\d+))?""".r

  /** Parse `docs_<rows>[_<parts>]`; None for anything malformed — an
    * unparseable numeral (overflow) or parts=0 is a table that does not
    * EXIST, never an internal error surfacing from planning. */
  private def parse(name: String): Option[(Long, Int)] = name match {
    case TableName(rows, parts) =>
      try {
        val r = rows.toLong
        val p = if (parts == null) 8 else parts.toInt
        if (r >= 0 && p >= 1) Some((r, p)) else None
      } catch { case _: NumberFormatException => None }
    case _ => None
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Ns))
      Array(Identifier.of(Ns, "docs_1000")) // representative; the space is infinite
    else throw new NoSuchNamespaceException(namespace)

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace.sameElements(Ns) && parse(ident.name).isDefined

  override def loadTable(ident: Identifier): Table =
    if (ident.namespace.sameElements(Ns)) parse(ident.name) match {
      case Some((rows, parts)) => new DocsTable(rows, parts)
      case None => throw new NoSuchTableException(ident)
    } else throw new NoSuchTableException(ident)

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")
}
