package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Named-table registry for the txtable SQL seam — the metastore role
  * the reference fills with the session catalog for its Delta tables
  * (`resources/spark.py:65-67`): BI-style SQL addresses tables by NAME
  * (`events`, `db.events`), not by path. The registry is one JSON file
  * under the session's warehouse dir mapping lowercase
  * `[db.]name` → table location; every parser verb resolves names
  * through it before falling back to Spark's own catalog (unregistered
  * names pass through untouched, so temp views and managed tables are
  * unaffected).
  *
  * Registration is `CREATE TABLE name USING txtable LOCATION '/dir'`
  * — external-table semantics: DROP TABLE unregisters the NAME and
  * leaves the commit-logged data untouched (the Delta external-table
  * rule). Writes are atomic (tmp + rename, the commit-log discipline)
  * so concurrent sessions never read a torn registry; lookups cache on
  * the file's modification time, so steady-state resolution costs zero
  * IO. */
final class TxCatalog private (spark: SparkSession) {

  private val fileP: Path = {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    new Path(new Path(wh), "_graft_catalog.json")
  }
  private lazy val fs = fileP.getFileSystem(
    spark.sessionState.newHadoopConf())

  @volatile private var cache: (Long, Map[String, String]) = (-1L, Map.empty)

  private def norm(name: String): String = name.toLowerCase

  /** The current name → location map (mtime-cached). */
  def tables: Map[String, String] = {
    val mtime =
      try { if (fs.exists(fileP)) fs.getFileStatus(fileP).getModificationTime else -1L }
      catch { case scala.util.control.NonFatal(_) => -1L }
    val (cachedAt, m) = cache
    if (mtime == cachedAt) m
    else {
      val fresh: Map[String, String] =
        if (mtime < 0) Map.empty
        else try {
          val in = fs.open(fileP)
          val bytes = try {
            val buf = new java.io.ByteArrayOutputStream()
            val tmp = new Array[Byte](8192)
            var n = in.read(tmp)
            while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
            buf.toByteArray
          } finally in.close()
          val node = new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(bytes)
          val it = node.fields()
          val b = Map.newBuilder[String, String]
          while (it.hasNext) {
            val e = it.next(); b += e.getKey -> e.getValue.asText()
          }
          b.result()
        } catch { case scala.util.control.NonFatal(_) => Map.empty }
      cache = (mtime, fresh)
      fresh
    }
  }

  def lookup(name: String): Option[String] = tables.get(norm(name))

  def register(name: String, location: String,
      ifNotExists: Boolean = false): Unit = {
    val key = norm(name)
    val cur = tables
    cur.get(key) match {
      case Some(loc) if loc == location => () // idempotent re-register
      case Some(loc) if ifNotExists    => ()
      case Some(loc) =>
        sys.error(s"table $name is already registered at $loc — " +
          "DROP TABLE it first to re-point the name")
      case None => write(cur + (key -> location))
    }
  }

  /** Unregister `name`; returns whether it existed. Data is untouched
    * (external-table semantics). */
  def drop(name: String): Boolean = {
    val key = norm(name)
    val cur = tables
    if (!cur.contains(key)) false
    else { write(cur - key); true }
  }

  private def write(m: Map[String, String]): Unit = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.createObjectNode()
    m.toSeq.sortBy(_._1).foreach { case (k, v) => node.put(k, v) }
    val dir = fileP.getParent
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val tmp = new Path(dir, s".tmp-catalog-${java.util.UUID.randomUUID()}.json")
    val out = fs.create(tmp, false)
    try out.write(om.writeValueAsString(node)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, fileP)) {
      // a racing writer published first: re-read, merge, retry once
      fs.delete(fileP, false)
      if (!fs.rename(tmp, fileP)) {
        fs.delete(tmp, false)
        sys.error(s"could not publish catalog update to $fileP")
      }
    }
    cache = (-1L, Map.empty) // invalidate
  }
}

object TxCatalog {
  private val instances =
    new java.util.concurrent.ConcurrentHashMap[String, TxCatalog]()
  def apply(spark: SparkSession): TxCatalog = {
    val key = spark.conf.get("spark.sql.warehouse.dir")
    instances.computeIfAbsent(key, _ => new TxCatalog(spark))
  }
}
