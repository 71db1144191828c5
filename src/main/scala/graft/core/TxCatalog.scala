package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Named-table registry for the txtable SQL seam — the metastore role
  * the reference fills with the session catalog for its Delta tables
  * (`resources/spark.py:65-67`): BI-style SQL addresses tables by NAME
  * (`events`, `db.events`), not by path. The registry is one JSON file
  * under the session's warehouse dir mapping lowercase
  * `[db.]name` → (location, managed); every parser verb resolves names
  * through it before falling back to Spark's own catalog (unregistered
  * names pass through untouched, so temp views and managed tables are
  * unaffected).
  *
  * Managed vs external (the SQL-standard split Delta follows):
  * `CREATE TABLE name USING txtable LOCATION '/dir'` is EXTERNAL —
  * DROP TABLE unregisters the name and leaves the commit-logged data.
  * Created WITHOUT a location, the table is MANAGED at the
  * warehouse-derived path and DROP TABLE deletes its directory.
  * A registration whose location no longer holds a txtable (a wiped
  * scratch dir) is stale and silently re-points — names never wedge
  * on vanished data.
  *
  * Reads are atomic (tmp + rename publish — never a torn registry)
  * and mutations are serialized through an exclusive lock file
  * (put-if-absent create, the commit-log discipline) with a fresh
  * read-merge inside the critical section, so two sessions
  * registering different names both land. Lookups cache on the
  * file's modification time, so steady-state resolution costs
  * zero IO. */
final class TxCatalog private (spark: SparkSession) {

  import TxCatalog.Entry

  private val fileP: Path = {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    new Path(new Path(wh), "_graft_catalog.json")
  }
  private lazy val fs = fileP.getFileSystem(
    spark.sessionState.newHadoopConf())

  @volatile private var cache: (Long, Map[String, Entry]) = (-1L, Map.empty)

  private def norm(name: String): String = name.toLowerCase

  /** The current name → entry map (mtime-cached). */
  def tables: Map[String, Entry] = {
    val mtime =
      try { if (fs.exists(fileP)) fs.getFileStatus(fileP).getModificationTime else -1L }
      catch { case scala.util.control.NonFatal(_) => -1L }
    val (cachedAt, m) = cache
    if (mtime == cachedAt) m
    else {
      val fresh: Map[String, Entry] =
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
          val b = Map.newBuilder[String, Entry]
          while (it.hasNext) {
            val e = it.next()
            val v = e.getValue
            b += e.getKey -> (
              if (v.isTextual) Entry(v.asText(), managed = false)
              else Entry(v.get("location").asText(),
                v.get("managed").asBoolean(false)))
          }
          b.result()
        } catch { case scala.util.control.NonFatal(_) => Map.empty }
      cache = (mtime, fresh)
      fresh
    }
  }

  def entry(name: String): Option[Entry] = tables.get(norm(name))
  def lookup(name: String): Option[String] = entry(name).map(_.location)

  def register(name: String, location: String, managed: Boolean = false,
      ifNotExists: Boolean = false): Unit = mutate { cur =>
    val key = norm(name)
    cur.get(key) match {
      case Some(e) if e.location == location => None // idempotent re-register
      case Some(_) if ifNotExists            => None
      case Some(e) if !TxTable.isTable(spark, e.location) =>
        // stale: the registered location no longer holds a txtable
        Some(cur + (key -> Entry(location, managed)))
      case Some(e) =>
        sys.error(s"table $name is already registered at ${e.location} — " +
          "DROP TABLE it first to re-point the name")
      case None => Some(cur + (key -> Entry(location, managed)))
    }
  }

  /** Unregister `name`; a MANAGED table's directory is deleted
    * (SQL-managed semantics), an external table's data stays. Returns
    * whether the name existed. */
  def drop(name: String): Boolean = {
    var dropped: Option[Entry] = None
    mutate { cur =>
      val key = norm(name)
      dropped = cur.get(key)
      dropped.map(_ => cur - key)
    }
    dropped match {
      case None => false
      case Some(e) =>
        if (e.managed) {
          val p = new Path(e.location)
          try { p.getFileSystem(spark.sessionState.newHadoopConf())
            .delete(p, true); () }
          catch { case scala.util.control.NonFatal(_) => () }
        }
        true
    }
  }

  /** Re-point `oldName`'s registration to `newName` (same location,
    * same managed flag — the data does not move). False if `oldName`
    * is not registered; refuses to clobber an existing `newName`. */
  def rename(oldName: String, newName: String): Boolean = {
    var ok = false
    mutate { cur =>
      cur.get(norm(oldName)) match {
        case None => None
        case Some(e) =>
          require(!cur.contains(norm(newName)),
            s"$newName is already registered — DROP TABLE it first")
          ok = true
          Some(cur - norm(oldName) + (norm(newName) -> e))
      }
    }
    ok
  }

  /** Run one atomic read-modify-write of the registry. The transform
    * sees the CURRENT on-disk map (cache bypassed) and returns the new
    * map, or None for a no-op. Mutations are serialized by an exclusive
    * lock file (`fs.create(…, overwrite=false)` is atomic — the commit
    * log's put-if-absent discipline) so two sessions registering
    * DIFFERENT names both land; a plain last-write-wins publish would
    * silently drop one. In-JVM threads additionally serialize on the
    * per-warehouse singleton. A lock older than 60 s is presumed
    * abandoned (crashed session) and broken. */
  private def mutate(f: Map[String, Entry] => Option[Map[String, Entry]])
      : Unit = this.synchronized {
    val dir = fileP.getParent
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val lock = new Path(dir, "_graft_catalog.lock")
    var acquired = false
    var attempts = 0
    while (!acquired) {
      try { fs.create(lock, false).close(); acquired = true }
      catch {
        case _: java.io.IOException =>
          attempts += 1
          try {
            val st = fs.getFileStatus(lock)
            if (System.currentTimeMillis() - st.getModificationTime > 60000L)
              fs.delete(lock, false)
          } catch { case scala.util.control.NonFatal(_) => () }
          if (attempts > 3000)
            sys.error(s"could not acquire catalog lock $lock")
          Thread.sleep(10)
      }
    }
    try {
      cache = (-1L, Map.empty) // force a fresh read under the lock
      f(tables).foreach(write)
    } finally {
      try { fs.delete(lock, false); () }
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  private def write(m: Map[String, Entry]): Unit = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.createObjectNode()
    m.toSeq.sortBy(_._1).foreach { case (k, e) =>
      val o = node.putObject(k)
      o.put("location", e.location); o.put("managed", e.managed); ()
    }
    val dir = fileP.getParent
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val tmp = new Path(dir, s".tmp-catalog-${java.util.UUID.randomUUID()}.json")
    val out = fs.create(tmp, false)
    try out.write(om.writeValueAsString(node)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, fileP)) {
      // dest exists (rename won't clobber); we hold the mutation lock,
      // so this is the PREVIOUS registry version, not a racing writer —
      // safe to replace
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
  /** One registered table: its location and whether the catalog OWNS
    * the data (managed — created without LOCATION). */
  final case class Entry(location: String, managed: Boolean)

  private val instances =
    new java.util.concurrent.ConcurrentHashMap[String, TxCatalog]()
  def apply(spark: SparkSession): TxCatalog = {
    val key = spark.conf.get("spark.sql.warehouse.dir")
    instances.computeIfAbsent(key, _ => new TxCatalog(spark))
  }
}
