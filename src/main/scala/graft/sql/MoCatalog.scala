package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.concurrent.TrieMap

/** A thin emulation of the reference's `mo_catalog` system schema —
  * the slice the BVT corpus introspects: `mo_tables` (rel_id lookup),
  * `mo_indexes` (index algo/table-type rows + the hidden internal
  * table names), `mo_columns` (layout of an index's entries table).
  * Reference: `pkg/catalog/` table definitions; BVT
  * `vector_ivfflat_include_*`, `vector_index_plugin_smoke`.
  *
  * Vector-index DDL registers rows here; the IVF *entries* internal
  * table surfaces as a LIVE temp view over the base table with cell
  * assignment against the index's frozen centroids — the same
  * "centroids freeze at build, entries follow DML" contract the
  * reference maintains with its synced entries table, without a second
  * copy of the data.
  */
object MoCatalog {

  final case class IndexRow(name: String, tableId: Long, algo: String,
      tableType: String, indexTableName: String, algoParams: String = "",
      idxType: String = "MULTIPLE", columns: Seq[String] = Seq.empty)

  private val nextId = new java.util.concurrent.atomic.AtomicLong(100000L)
  private def sk(spark: SparkSession) = System.identityHashCode(spark.sharedState)
  private val tableIds = TrieMap[(Int, String), Long]()
  private val indexRows = TrieMap[(Int, String), Vector[IndexRow]]() // key (sess, idxName-table)
  private val entriesViews = TrieMap[(Int, String), String]() // view → owning db
  private val sessionDb = TrieMap[Int, String]()

  /** Databases the reference pre-creates (`pkg/frontend/predefined.go`):
    * always valid `use` targets, never really created here.
    */
  val SystemDbs: Set[String] =
    Set("mo_catalog", "system", "system_metrics", "information_schema",
      "mysql", "mo_task", "mo_debug")

  private val allDbs = TrieMap[(Int, String), Unit]()
  // once a session has selected ANY db, dropping the current one leaves
  // it in MySQL's "No database selected" error state
  private val everUsed = TrieMap[Int, Boolean]()
  def dbEverSelected(spark: SparkSession): Boolean =
    everUsed.getOrElse(sk(spark), false)
  def useDb(spark: SparkSession, db: String): Unit = {
    sessionDb.put(sk(spark), db)
    everUsed.put(sk(spark), true)
    allDbs.put((sk(spark), db), ())
  }
  def seenDbs(spark: SparkSession): Seq[String] =
    allDbs.keys.filter(_._1 == sk(spark)).map(_._2).toSeq
  /** Every db name this session could legally qualify a table with:
    * `use`d names plus created-but-never-used ones (bare, account
    * prefix stripped) — the flat-storage qualifier strip needs both
    * (`create table db.t (...)` right after `create database db`).
    */
  def knownDbs(spark: SparkSession): Seq[String] = {
    val k = sk(spark)
    // ANY account's created dbs count: the strip is flat-storage text
    // normalization, not an existence check (account-scoped existence
    // stays with dbExists) — a subscriber's qualified read must resolve
    // regardless of which account bound the name
    val created = createdDbs.keys.filter(_._1 == k).map(_._2)
      .map { n => val i = n.indexOf(' '); if (i >= 0) n.substring(i + 1) else n }
    (allDbs.keys.filter(_._1 == k).map(_._2) ++ created).toSeq.distinct
  }
  def currentDb(spark: SparkSession): Option[String] =
    sessionDb.get(sk(spark))
  /** Harness hook: leave the session db-less (a fresh tenant session). */
  def clearSessionDb(spark: SparkSession): Unit =
    sessionDb.remove(sk(spark))
  // ------------------------------------------------------------------
  // Multi-account sessions (reference tenants, `pkg/frontend/
  // authenticate.go`): the conformance harness switches the CURRENT
  // account around `-- @session` brackets; databases are scoped per
  // account so two tenants can both own a `sub_db1`. The default (and
  // only account most callers ever see) is `sys`.
  // ------------------------------------------------------------------
  private val sessionAccount = TrieMap[Int, String]()
  def currentAccount(spark: SparkSession): String =
    sessionAccount.getOrElse(sk(spark), "sys")
  def setAccount(spark: SparkSession, acct: String): Unit =
    sessionAccount.put(sk(spark), acct.toLowerCase)
  def accountExists(spark: SparkSession, name: String): Boolean =
    accountList(sk(spark)).exists(_._1 == name.toLowerCase)
  def accountSuspended(spark: SparkSession, name: String): Boolean =
    accountList(sk(spark)).exists(a =>
      a._1 == name.toLowerCase && a._3 == "suspend")
  private def dbKey(spark: SparkSession, db: String): (Int, String) = {
    val a = currentAccount(spark)
    (sk(spark),
      if (a == "sys") db.toLowerCase else a + " " + db.toLowerCase)
  }

  /** The account-scoped db identity string (`db` for sys, `acct db`
    * otherwise) — the key [[Namespaces]] scopes table names by.
    */
  def scopedDbKey(spark: SparkSession, db: String): String =
    dbKey(spark, db)._2

  /** Like [[scopedDbKey]] but a subscription database resolves to its
    * PUBLISHER's key — the published tables are the publisher's.
    */
  def resolvedDbKey(spark: SparkSession, db: String): String =
    subOf(spark, db) match {
      case Some((owner, pubName)) =>
        val pubDb = pubs.get((sk(spark), owner, pubName)).map(_.db)
          .getOrElse(db.toLowerCase)
        if (owner == "sys") pubDb else owner + " " + pubDb
      case None => scopedDbKey(spark, db)
    }

  private val createdDbs = TrieMap[(Int, String), Unit]()
  def createDb(spark: SparkSession, db: String): Unit =
    createdDbs.put(dbKey(spark, db), ())
  def dbExists(spark: SparkSession, db: String): Boolean =
    createdDbs.contains(dbKey(spark, db))
  def dropDb(spark: SparkSession, db: String): Unit = {
    val k = sk(spark)
    createdDbs.remove(dbKey(spark, db))
    subscriptions.remove((k, currentAccount(spark), db.toLowerCase))
    if (sessionDb.get(k).exists(_.equalsIgnoreCase(db)))
      sessionDb.remove(k)
    statRows.keys.filter(key => key._1 == k && key._2 == db.toLowerCase)
      .foreach(statRows.remove)
    declaredCols.keys.filter(key => key._1 == k && key._2 == db.toLowerCase)
      .foreach(declaredCols.remove)
    viewNames.keys.filter(key => key._1 == k && key._2 == db.toLowerCase)
      .foreach(viewNames.remove)
  }

  // ------------------------------------------------------------------
  // Publications & subscriptions (reference `pkg/frontend/publication
  // _subscription.go`; BVT publication_subscription/): a publication
  // exposes one database (optionally a table subset) to listed accounts
  // or `all`; a subscriber binds it as a read-only database. Error
  // texts follow the reference verbatim.
  // ------------------------------------------------------------------

  final case class Pub(db: String, tables: Option[Seq[String]],
      accounts: Option[Set[String]], comment: String)
  // (session, ownerAccount, pubName) → Pub
  private val pubs = TrieMap[(Int, String, String), Pub]()
  // (session, subscriberAccount, subDb) → (ownerAccount, pubName)
  private val subscriptions = TrieMap[(Int, String, String), (String, String)]()

  def createPublication(spark: SparkSession, name0: String, db: String,
      tables: Option[Seq[String]], accounts: Option[Seq[String]],
      comment: String): Unit = {
    val k = sk(spark); val owner = currentAccount(spark)
    val name = name0.toLowerCase
    if (SystemDbs.contains(db.toLowerCase))
      throw new IllegalStateException("internal error: Unknown database " +
        s"name '${db.toLowerCase}', not support publishing system database")
    if (subOf(spark, db).isDefined)
      throw new IllegalStateException(
        s"internal error: database '$db' is not a user database")
    if (!dbExists(spark, db))
      throw new IllegalArgumentException(s"Unknown database $db")
    if (pubs.contains((k, owner, name)))
      throw new IllegalStateException(
        s"internal error: the publication $name exists")
    accounts.toSeq.flatten.foreach { a =>
      if (a.equalsIgnoreCase(owner))
        throw new IllegalStateException("internal error: can't publish to self")
      if (!accountExists(spark, a))
        throw new IllegalStateException(
          s"internal error: not existed account name '${a.toLowerCase}'")
    }
    pubs.put((k, owner, name),
      Pub(db.toLowerCase, tables.map(_.map(_.toLowerCase)),
        accounts.map(_.map(_.toLowerCase).toSet), comment))
  }

  /** `accounts`: None = clause absent (unchanged); a list containing
    * `all` opens the publication to every account.
    */
  def alterPublication(spark: SparkSession, name0: String,
      db: Option[String], tables: Option[Seq[String]],
      accounts: Option[Seq[String]]): Unit = {
    val k = sk(spark); val owner = currentAccount(spark)
    val name = name0.toLowerCase
    val p = pubs.getOrElse((k, owner, name),
      throw new IllegalStateException(
        s"internal error: there is no publication $name"))
    accounts.toSeq.flatten.foreach { a =>
      if (a.equalsIgnoreCase(owner))
        throw new IllegalStateException("internal error: can't publish to self")
      if (!a.equalsIgnoreCase("all") && !accountExists(spark, a))
        throw new IllegalStateException(
          s"internal error: not existed account name '${a.toLowerCase}'")
    }
    db.foreach { d =>
      if (!dbExists(spark, d))
        throw new IllegalArgumentException(s"Unknown database $d")
    }
    val newAccounts = accounts match {
      case None => p.accounts // clause absent
      case Some(l) if l.exists(_.equalsIgnoreCase("all")) => None
      case Some(l) => Some(l.map(_.toLowerCase).toSet)
    }
    pubs.put((k, owner, name), Pub(
      db.map(_.toLowerCase).getOrElse(p.db),
      tables.map(_.map(_.toLowerCase)).orElse(p.tables),
      newAccounts, p.comment))
  }

  def dropPublication(spark: SparkSession, name0: String,
      ifExists: Boolean): Unit = {
    val k = sk(spark); val owner = currentAccount(spark)
    val name = name0.toLowerCase
    if (!pubs.contains((k, owner, name)) && !ifExists)
      throw new IllegalStateException(
        s"internal error: there is no publication $name")
    pubs.remove((k, owner, name))
  }

  /** The publication a given (bare) db name of the CURRENT account is
    * subscribed to, if any.
    */
  def subOf(spark: SparkSession, db: String): Option[(String, String)] =
    subscriptions.get((sk(spark), currentAccount(spark), db.toLowerCase))

  /** Resolve a live subscription to its publication (use-time check:
    * a dropped publication makes the subscription db unusable).
    */
  def subPublication(spark: SparkSession, db: String): Option[Pub] =
    subOf(spark, db).flatMap { case (owner, pub) =>
      pubs.get((sk(spark), owner, pub))
    }

  def isPublishing(spark: SparkSession, db: String): Boolean = {
    val k = sk(spark); val owner = currentAccount(spark)
    pubs.exists { case ((s, o, _), p) =>
      s == k && o == owner && p.db == db.toLowerCase }
  }

  def createSubscription(spark: SparkSession, subDb: String,
      fromAcct0: String, pubName0: String): Unit = {
    val k = sk(spark); val me = currentAccount(spark)
    val fromAcct = fromAcct0.toLowerCase; val pubName = pubName0.toLowerCase
    if (fromAcct == me)
      throw new IllegalStateException(
        "internal error: can not subscribe to self")
    if (!accountExists(spark, fromAcct))
      throw new IllegalStateException(
        s"internal error: there is no publication account $fromAcct")
    if (accountSuspended(spark, fromAcct))
      throw new IllegalStateException(
        s"internal error: the account $fromAcct is suspended")
    val p = pubs.getOrElse((k, fromAcct, pubName),
      throw new IllegalStateException(
        s"internal error: there is no publication $pubName"))
    if (p.accounts.exists(as => !as.contains(me)))
      throw new IllegalStateException(s"internal error: the account $me " +
        s"is not allowed to subscribe the publication $pubName")
    if (subscriptions.exists { case ((s, a, _), (o, pn)) =>
        s == k && a == me && o == fromAcct && pn == pubName })
      throw new IllegalStateException(
        s"internal error: publication $pubName can only be subscribed once")
    if (dbExists(spark, subDb))
      throw new IllegalStateException(s"database $subDb already exists")
    createDb(spark, subDb)
    subscriptions.put((k, me, subDb.toLowerCase), (fromAcct, pubName))
  }
  /** Test-harness hook: forget this session's catalog state. */
  def clear(spark: SparkSession): Unit = {
    val k = sk(spark)
    Seq(tableIds, tableDb, indexRows, entriesViews, createdDbs)
      .foreach(m => m.keys.filter(_._1 == k).foreach(m.remove))
    statRows.keys.filter(_._1 == k).foreach(statRows.remove)
    declaredCols.keys.filter(_._1 == k).foreach(declaredCols.remove)
    viewNames.keys.filter(_._1 == k).foreach(viewNames.remove)
    sessionDb.remove(k)
    everUsed.remove(k)
    users.remove(k); accounts.remove(k); roles.remove(k)
    sessionAccount.remove(k)
    pubs.keys.filter(_._1 == k).foreach(pubs.remove)
    subscriptions.keys.filter(_._1 == k).foreach(subscriptions.remove)
    allDbs.keys.filter(_._1 == k).foreach(allDbs.remove)
  }

  // ------------------------------------------------------------------
  // RBAC registry — mo_user / mo_account / mo_role introspection rows
  // (`pkg/frontend/predefined.go` table defs + authenticate.go built-ins:
  // users root/dump, roles moadmin/public, account sys). Names store
  // LOWERCASED like the reference; duplicate creates throw its exact
  // "internal error: the {user|tenant|role} X exists" text.
  // ------------------------------------------------------------------

  private val users = TrieMap[Int, Vector[String]]()
  private val accounts = TrieMap[Int, Vector[(String, String, String, String)]]() // name, admin, status, comments
  private val roles = TrieMap[Int, Vector[String]]()
  private def userList(k: Int) = users.getOrElseUpdate(k, Vector("root", "dump"))
  private def accountList(k: Int) =
    accounts.getOrElseUpdate(k, Vector(("sys", "root", "open", "system account")))
  private def roleList(k: Int) = roles.getOrElseUpdate(k, Vector("moadmin", "public"))

  def createUser(spark: SparkSession, name0: String): Unit = {
    val k = sk(spark); val name = name0.toLowerCase
    if (userList(k).contains(name))
      throw new IllegalStateException(s"internal error: the user $name exists")
    users.put(k, userList(k) :+ name)
  }
  def dropUser(spark: SparkSession, name0: String): Unit = {
    val k = sk(spark)
    users.put(k, userList(k).filterNot(_ == name0.toLowerCase))
  }
  def createAccount(spark: SparkSession, name0: String, admin: String,
      status: String, comments: String): Unit = {
    val k = sk(spark); val name = name0.toLowerCase
    if (accountList(k).exists(_._1 == name))
      throw new IllegalStateException(s"internal error: the tenant $name exists")
    accounts.put(k, accountList(k) :+ ((name, admin, status, comments)))
  }
  def alterAccount(spark: SparkSession, name0: String,
      status: Option[String], comments: Option[String]): Unit = {
    val k = sk(spark); val name = name0.toLowerCase
    accounts.put(k, accountList(k).map {
      case (n, a, st, cm) if n == name =>
        (n, a, status.getOrElse(st), comments.getOrElse(cm))
      case r => r
    })
  }
  def dropAccount(spark: SparkSession, name0: String): Unit = {
    val k = sk(spark); val name = name0.toLowerCase
    accounts.put(k, accountList(k).filterNot(_._1 == name))
    // the tenant's databases, publications and subscriptions die with it
    subscriptions.keys.filter(key => key._1 == k && key._2 == name)
      .foreach(subscriptions.remove)
    pubs.keys.filter(key => key._1 == k && key._2 == name)
      .foreach(pubs.remove)
    createdDbs.keys.filter(key =>
      key._1 == k && key._2.startsWith(name + " "))
      .foreach(createdDbs.remove)
  }
  def createRole(spark: SparkSession, name0: String): Unit = {
    val k = sk(spark); val name = name0.toLowerCase
    if (roleList(k).contains(name))
      throw new IllegalStateException(s"internal error: the role $name exists")
    roles.put(k, roleList(k) :+ name)
  }
  def dropRole(spark: SparkSession, name0: String): Unit = {
    val k = sk(spark)
    roles.put(k, roleList(k).filterNot(_ == name0.toLowerCase))
  }

  private val tableDb = TrieMap[(Int, String), String]()
  def tableId(spark: SparkSession, table: String): Long = {
    tableDb.putIfAbsent((sk(spark), table.toLowerCase),
      currentDb(spark).getOrElse("default"))
    tableIds.getOrElseUpdate((sk(spark), table.toLowerCase),
      nextId.incrementAndGet())
  }

  def isEntriesView(spark: SparkSession, name: String): Boolean =
    entriesViews.contains((sk(spark), name.toLowerCase))

  def dropTable(spark: SparkSession, table: String): Unit = {
    val k = sk(spark)
    tableIds.remove((k, table.toLowerCase))
    tableDb.remove((k, table.toLowerCase))
    dropViewMeta(spark, table)
    indexRows.keys.filter(key => key._1 == k &&
      key._2.endsWith(s"-${table.toLowerCase}")).foreach(indexRows.remove)
    clearStatIndexes(spark, table)
    dropDeclaredColumns(spark, table)
  }

  def dropIndex(spark: SparkSession, idxName: String, table: String): Unit = {
    indexRows.remove((sk(spark), s"${idxName.toLowerCase}-${table.toLowerCase}"))
    dropStatIndex(spark, table, idxName)
  }
  /** Drop an index by name alone (DROP INDEX without ON table). */
  def dropIndexByName(spark: SparkSession, idxName: String): Unit = {
    val k = sk(spark)
    indexRows.keys.filter(key => key._1 == k &&
      key._2.startsWith(s"${idxName.toLowerCase}-")).foreach(indexRows.remove)
    statRows.keys.filter(_._1 == k).foreach { key =>
      statRows.get(key).foreach { v =>
        if (v.exists(_.index.equalsIgnoreCase(idxName)))
          statRows.put(key, v.filterNot(_.index.equalsIgnoreCase(idxName)))
      }
    }
  }

  /** Register a vector index's mo_indexes rows and (for ivfflat) its
    * live entries view. `includeCols` are the DDL's include(...) carry
    * columns.
    */
  def registerVectorIndex(spark: SparkSession, idxName: String, table: String,
      method: String, vecCol: String, pkCols: Seq[String],
      includeCols: Seq[String], centroids: Array[Array[Double]]): Unit = {
    val tid = tableId(spark, table)
    // mirrors the reference's algo_params JSON closely enough for the
    // goldens' LIKE probes ('%included_columns%')
    val params =
      if (includeCols.isEmpty) ""
      else s"""{"included_columns":[${includeCols.map(c => "\"" + c + "\"").mkString(",")}]}"""
    val db = currentDb(spark).getOrElse("default")
    val rows = method.toLowerCase match {
      case "ivfflat" =>
        val base = s"__mo_index_secondary_${tid}_${idxName.toLowerCase}"
        val entries = s"${base}_entries"
        // live entries view: base rows assigned to the FROZEN centroids.
        // Built as SQL TEXT over a registered assign function so the
        // base table resolves by NAME at every query — the view then
        // follows UPDATE/DELETE overwrites instead of pinning the file
        // listing of the build-time snapshot.
        val cents = centroids
        val assignName = s"__mo_assign_${tid}_${idxName.toLowerCase}"
        spark.udf.register(assignName, (v: Seq[Double]) =>
          if (v == null) null
          else {
            var best = 0; var bd = Double.MaxValue; var i = 0
            while (i < cents.length) {
              val c = cents(i); var s = 0.0; var j = 0
              val n = math.min(c.length, v.length)
              while (j < n) { val d = c(j) - v(j); s += d * d; j += 1 }
              if (s < bd) { bd = s; best = i }
              i += 1
            }
            java.lang.Integer.valueOf(best)
          })
        val pkSql =
          if (pkCols.length == 1) s"`${pkCols.head}`"
          else pkCols.map(c => s"CAST(`$c` AS STRING)")
            .mkString("concat_ws('', ", ", ", ")")
        val selCols = Seq(
          "CAST(0 AS BIGINT) AS __mo_index_centroid_fk_version",
          s"CAST($assignName(CAST(`$vecCol` AS ARRAY<DOUBLE>)) AS BIGINT) " +
            "AS __mo_index_centroid_fk_id",
          s"$pkSql AS __mo_index_pri_col",
          s"`$vecCol` AS __mo_index_centroid_fk_entry") ++
          includeCols.map(c => s"`$c` AS __mo_index_include_$c")
        spark.sql(s"CREATE OR REPLACE TEMP VIEW $entries AS " +
          s"SELECT ${selCols.mkString(", ")} FROM `$table`")
        entriesViews.put((sk(spark), entries.toLowerCase), db)
        Vector(
          IndexRow(idxName, tid, "ivfflat", "metadata", s"${base}_meta", params),
          IndexRow(idxName, tid, "ivfflat", "centroids", s"${base}_centroids", params),
          IndexRow(idxName, tid, "ivfflat", "entries", entries, params))
      case "hnsw" =>
        val base = s"__mo_index_secondary_${tid}_${idxName.toLowerCase}"
        Vector(
          IndexRow(idxName, tid, "hnsw", "hnsw_index", s"${base}_index"),
          IndexRow(idxName, tid, "hnsw", "hnsw_meta", s"${base}_meta"))
      case other =>
        Vector(IndexRow(idxName, tid, other, "metadata",
          s"__mo_index_secondary_${tid}_${idxName.toLowerCase}_meta"))
    }
    indexRows.put((sk(spark), s"${idxName.toLowerCase}-${table.toLowerCase}"),
      rows.map(_.copy(columns = Seq(vecCol))))
  }

  /** A non-vector secondary index (plain KEY / UNIQUE / SPATIAL): its
    * physical layout is Catalyst's business, but the mo_indexes rows are
    * real introspection surface — func_geometry reads
    * type/algo/column_name; the reference emits one row per covered
    * column, the pk carried as its `__mo_alias_<col>` hidden alias
    * (`pkg/sql/compile/util.go` indexMetadataType + the secondary-index
    * table layout in `pkg/catalog/secondary_index_utils.go`).
    */
  def registerPlainIndex(spark: SparkSession, idxName: String, table: String,
      idxType: String, algo: String, cols: Seq[String],
      pkCols: Seq[String]): Unit = {
    val tid = tableId(spark, table)
    val columns = cols ++ pkCols
      .filterNot(p => cols.exists(_.equalsIgnoreCase(p)))
      .map(p => s"__mo_alias_$p")
    val prefix =
      if (idxType == "UNIQUE") "__mo_index_unique_" else "__mo_index_secondary_"
    val base = s"$prefix${tid}_${idxName.toLowerCase}"
    indexRows.put((sk(spark), s"${idxName.toLowerCase}-${table.toLowerCase}"),
      Vector(IndexRow(idxName, tid, algo, "", base, "", idxType, columns)))
  }

  // ------------------------------------------------------------------
  // information_schema.statistics / SHOW INDEX — one row per covered
  // column per index (reference `pkg/frontend/self_handle.go`
  // information_schema view + mysql's STATISTICS contract). Pure
  // metadata: rows are keyed (db, table) so namesake tables in two
  // databases keep independent entries.
  // ------------------------------------------------------------------

  /** (indexName, nonUnique, (column, nullable) per position). */
  final case class StatIndex(index: String, nonUnique: Int,
    cols: Seq[(String, Boolean)])

  private val statRows = TrieMap[(Int, String, String), Vector[StatIndex]]()

  /** Replaces any previous registration of the same index name on the
    * (db, table).
    */
  /** The db a (physical) table displays under: its namespace owner when
    * tracked, else the session's current db.
    */
  private def displayDbOf(spark: SparkSession, table: String): String =
    Namespaces.logicalOf(spark, table)
      .map(l => Namespaces.displayDb(l._1))
      .orElse(currentDb(spark)).getOrElse("default").toLowerCase

  def registerStatIndex(spark: SparkSession, table: String,
      index: String, nonUnique: Int, cols: Seq[(String, Boolean)]): Unit = {
    val db = displayDbOf(spark, table)
    val key = (sk(spark), db, table.toLowerCase)
    val prev = statRows.getOrElse(key, Vector.empty)
    statRows.put(key,
      prev.filterNot(_.index.equalsIgnoreCase(index)) :+
        StatIndex(index, nonUnique, cols))
  }

  def clearStatIndexes(spark: SparkSession, table: String): Unit = {
    val db = displayDbOf(spark, table)
    statRows.remove((sk(spark), db, table.toLowerCase))
  }

  def dropStatIndex(spark: SparkSession, table: String, index: String): Unit = {
    val db = displayDbOf(spark, table)
    val key = (sk(spark), db, table.toLowerCase)
    statRows.get(key).foreach(v =>
      statRows.put(key, v.filterNot(_.index.equalsIgnoreCase(index))))
  }

  /** (Re)materialize `_graft_is_statistics` — the rewrite target for
    * `information_schema.statistics`. Driver-side metadata only.
    */
  def ensureStatisticsView(spark: SparkSession): Unit = {
    val k = sk(spark)
    val rows = statRows.toSeq.filter(_._1._1 == k).flatMap {
      case ((_, db, table), idxs) =>
        // a mangled physical name displays as its logical (db, name)
        val t = Namespaces.logicalOf(spark, table).map(_._2).getOrElse(table)
        idxs.flatMap { ix =>
        ix.cols.zipWithIndex.map { case ((c, nullable), i) =>
          org.apache.spark.sql.Row("def", db, t, ix.nonUnique,
            db, ix.index, i + 1, c, "A", 0L, null, null,
            if (nullable) "YES" else "", "", "", "", "YES", null)
        }
      }
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "table_catalog STRING, table_schema STRING, table_name STRING, " +
        "non_unique INT, index_schema STRING, index_name STRING, " +
        "seq_in_index INT, column_name STRING, collation STRING, " +
        "cardinality BIGINT, sub_part STRING, packed STRING, " +
        "nullable STRING, index_type STRING, comment STRING, " +
        "index_comment STRING, is_visible STRING, expression STRING")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .createOrReplaceTempView("_graft_is_statistics")
  }

  /** SHOW INDEX FROM t — MySQL's 16-column layout over the same
    * registry (Expression mirrors the column name, the reference's
    * rendering).
    */
  def showIndexRows(spark: SparkSession, table: String)
      : org.apache.spark.sql.DataFrame = {
    val k = sk(spark)
    // SHOW INDEX names the LOGICAL table; the registry keys physical
    val phys = GraftSql.resolveTableName(spark, None, table)
    val db = displayDbOf(spark, phys)
    val rows = statRows.getOrElse((k, db, phys.toLowerCase), Vector.empty)
      .flatMap { ix =>
        ix.cols.zipWithIndex.map { case ((c, nullable), i) =>
          org.apache.spark.sql.Row(table, ix.nonUnique, ix.index, i + 1, c,
            "A", 0L, null, null, if (nullable) "YES" else "", "", "", "",
            "", "YES", c)
        }
      }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "Table STRING, Non_unique INT, Key_name STRING, Seq_in_index INT, " +
        "Column_name STRING, Collation STRING, Cardinality BIGINT, " +
        "Sub_part STRING, Packed STRING, Null STRING, Index_type STRING, " +
        "Comment STRING, Index_comment STRING, Index_params STRING, " +
        "Visible STRING, Expression STRING")
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  // ------------------------------------------------------------------
  // information_schema.tables / .columns / referential-constraint views
  // (metadata BVT category). mo_catalog's internal tables are a pinned
  // contract (the reference's bootstrap catalog); user tables come from
  // the declared-DDL registry below.
  // ------------------------------------------------------------------

  /** mo_catalog base tables as the reference bootstraps them
    * (metadata/information_schema.result:24-77 pins the full list).
    */
  private val MoCatalogTables = Vector(
    "mo_account", "mo_branch_metadata", "mo_ccpr_dbs", "mo_ccpr_log",
    "mo_ccpr_tables", "mo_cdc_task", "mo_cdc_watermark", "mo_columns",
    "mo_data_key", "mo_database", "mo_feature_limit", "mo_feature_registry",
    "mo_foreign_keys", "mo_iceberg_catalogs", "mo_iceberg_maintenance_jobs",
    "mo_iceberg_orphan_files", "mo_iceberg_principal_map",
    "mo_iceberg_publish_jobs", "mo_iceberg_refs",
    "mo_iceberg_residency_policy", "mo_iceberg_tables", "mo_index_update",
    "mo_indexes", "mo_iscp_log", "mo_merge_settings",
    "mo_mongodb_connections", "mo_mongodb_tables",
    "mo_mysql_compatibility_mode", "mo_partition_metadata",
    "mo_partition_tables", "mo_pitr", "mo_pubs", "mo_role", "mo_role_grant",
    "mo_role_privs", "mo_role_rule", "mo_shards", "mo_shards_metadata",
    "mo_snapshots", "mo_stages", "mo_stored_procedure", "mo_subs",
    "mo_table_partitions", "mo_table_stats_alpha", "mo_tables",
    "mo_upgrade", "mo_upgrade_tenant", "mo_user",
    "mo_user_defined_function", "mo_user_grant", "mo_version")

  /** (db, table) → declared (column, MySQL type text, notNull) in DDL
    * order.
    */
  private val declaredCols =
    TrieMap[(Int, String, String), Vector[(String, String, Boolean)]]()

  def registerDeclaredColumns(spark: SparkSession, db: Option[String],
      table: String, cols: Seq[(String, String, Boolean)]): Unit = {
    val d = Namespaces.logicalOf(spark, table)
      .map(l => Namespaces.displayDb(l._1))
      .orElse(db).orElse(currentDb(spark)).getOrElse("default").toLowerCase
    declaredCols.put((sk(spark), d, table.toLowerCase), cols.toVector)
  }

  /** Declared (name, declType, notNull) triples of a table, any db
    * (MoTypeInfer resolves view-body column types through it).
    */
  def declaredColumnsOf(spark: SparkSession,
      table: String): Vector[(String, String, Boolean)] = {
    val k = sk(spark)
    declaredCols.toSeq.find(e => e._1._1 == k &&
        e._1._3 == table.toLowerCase)
      .map(_._2).getOrElse(Vector.empty)
  }

  // views surface in information_schema.tables with table_type=VIEW
  // (hint/remap_db_objects obj probes; ddl/drop_table_multiple)
  private val viewNames = TrieMap[(Int, String, String), Unit]()
  def registerView(spark: SparkSession, phys: String): Unit =
    viewNames.put((sk(spark), displayDbOf(spark, phys), phys.toLowerCase), ())
  def dropViewMeta(spark: SparkSession, phys: String): Unit = {
    val k = sk(spark)
    viewNames.keys.filter(key => key._1 == k && key._3 == phys.toLowerCase)
      .foreach(viewNames.remove)
  }

  /** ALTER TABLE ADD [COLUMN]: keep the declared layout in sync for a
    * table information_schema already knows (no-op otherwise).
    */
  def appendDeclaredColumn(spark: SparkSession, table: String,
      col: String, ty: String): Unit = {
    val k = sk(spark)
    declaredCols.toSeq.find(e => e._1._1 == k &&
        e._1._3 == table.toLowerCase).foreach { case (key, cols) =>
      if (!cols.exists(_._1.equalsIgnoreCase(col)))
        declaredCols.put(key, cols :+ ((col, ty, false)))
    }
  }

  def renameDeclaredColumn(spark: SparkSession, table: String,
      old: String, nw: String, newType: Option[String]): Unit = {
    val k = sk(spark)
    declaredCols.toSeq.find(e => e._1._1 == k &&
        e._1._3 == table.toLowerCase).foreach { case (key, cols) =>
      declaredCols.put(key, cols.map { case (n, ty, nn) =>
        if (n.equalsIgnoreCase(old)) (nw, newType.getOrElse(ty), nn)
        else (n, ty, nn)
      })
    }
  }

  /** Whether the declared DDL marked a column NOT NULL (enum/set null
    * rejection reads it — Spark storage dropped the constraint).
    */
  def declaredNotNull(spark: SparkSession, table: String,
      col: String): Boolean = {
    val k = sk(spark)
    declaredCols.toSeq.find(e => e._1._1 == k &&
        e._1._3 == table.toLowerCase)
      .exists(_._2.exists(c => c._1.equalsIgnoreCase(col) && c._3))
  }

  def removeDeclaredColumn(spark: SparkSession, table: String,
      col: String): Unit = {
    val k = sk(spark)
    declaredCols.toSeq.find(e => e._1._1 == k &&
        e._1._3 == table.toLowerCase).foreach { case (key, cols) =>
      declaredCols.put(key, cols.filterNot(_._1.equalsIgnoreCase(col)))
    }
  }

  /** RENAME bookkeeping: declared layout, index stats and view rows
    * follow the new physical name.
    */
  def renameTableMeta(spark: SparkSession, from: String, to: String): Unit = {
    val k = sk(spark)
    val toDb = displayDbOf(spark, to)
    declaredCols.toSeq.filter(e => e._1._1 == k &&
        e._1._3 == from.toLowerCase).foreach { case (key, cols) =>
      declaredCols.remove(key)
      declaredCols.put((k, toDb, to.toLowerCase), cols)
    }
    statRows.toSeq.filter(e => e._1._1 == k &&
        e._1._3 == from.toLowerCase).foreach { case (key, v) =>
      statRows.remove(key)
      statRows.put((k, toDb, to.toLowerCase), v)
    }
    viewNames.keys.filter(key => key._1 == k && key._3 == from.toLowerCase)
      .foreach { key =>
        viewNames.remove(key)
        viewNames.put((k, toDb, to.toLowerCase), ())
      }
  }

  /** `CREATE TABLE ... LIKE src`: the copy inherits the source's
    * declared layout; a pk-less source ALSO materializes its hidden
    * `__mo_fake_pk_col` as a visible column (reference behavior pinned
    * by publication_subscription/prepare_publication_change.result:55).
    */
  def copyDeclaredLike(spark: SparkSession, fromPhys: String,
      toPhys: String, srcHasPk: Boolean): Unit = {
    val k = sk(spark)
    declaredCols.toSeq.find(e => e._1._1 == k &&
        e._1._3 == fromPhys.toLowerCase).foreach { case (_, cols) =>
      val withFake =
        if (srcHasPk) cols
        else cols :+ (("__mo_fake_pk_col", "BIGINT", false))
      registerDeclaredColumns(spark, None, toPhys, withFake)
    }
  }

  def dropDeclaredColumns(spark: SparkSession, table: String): Unit = {
    val k = sk(spark)
    declaredCols.keys.filter(key => key._1 == k && key._3 == table.toLowerCase)
      .foreach(declaredCols.remove)
  }

  /** MySQL's DATA_TYPE (bare family name) for a declared type text. */
  private def mysqlDataType(decl: String): String = {
    val base = decl.trim.split("[\\s(]")(0).toLowerCase
    base match {
      case "bool" | "boolean" => "tinyint"
      case "dec" | "numeric" => "decimal"
      case "integer" => "int"
      case "character" => "char"
      case b => b
    }
  }

  /** MO's COLUMN_TYPE rendering — pinned for the unsigned/bool probes
    * (`TINYINT UNSIGNED(8)`, `BOOL(0)`).
    */
  private def moColumnType(decl: String): String = {
    val base = mysqlDataType(decl)
    val unsigned = decl.toLowerCase.contains("unsigned")
    val bits = base match {
      case "tinyint" => 8
      case "smallint" => 16
      case "int" | "mediumint" => 32
      case "bigint" => 64
      case _ => 0
    }
    if (decl.trim.split("[\\s(]")(0).equalsIgnoreCase("bool") ||
      decl.trim.split("[\\s(]")(0).equalsIgnoreCase("boolean")) "BOOL(0)"
    // an already-width-annotated UNSIGNED decl is pinned verbatim
    // (__mo_fake_pk_col renders BIGINT UNSIGNED(0) — CTAS goldens)
    else if (decl.trim.matches("(?i).*unsigned\\(\\d+\\)$"))
      decl.trim.toUpperCase
    else if (unsigned && bits > 0) s"${base.toUpperCase} UNSIGNED($bits)"
    // integer widths render in the MO convention (INT(32), BIGINT(64) —
    // dtype/set golden `id ¦ int ¦ INT(32)`)
    else if (bits > 0) s"${base.toUpperCase}($bits)"
    // enum/set re-render their declared member list verbatim, comma
    // packed, label case preserved (dtype/set golden
    // SET('red','green','blue'))
    else if (base == "enum" || base == "set") {
      val inner = decl.substring(decl.indexOf('(') + 1, decl.lastIndexOf(')'))
      base.toUpperCase + "(" +
        graft.sql.GraftSql.splitTop(inner).map(_.trim).mkString(",") + ")"
    }
    else decl.trim.toUpperCase
  }

  def ensureInfoSchemaViews(spark: SparkSession): Unit = {
    import spark.implicits._
    val k = sk(spark)
    val moRows = MoCatalogTables
      .map(t => ("def", "mo_catalog", t, "BASE TABLE", "Tae"))
    def logicalName(t: String): String =
      Namespaces.logicalOf(spark, t).map(_._2).getOrElse(t)
    val userRows = declaredCols.toSeq.filter(_._1._1 == k).map {
      case ((_, db, t), _) => ("def", db, logicalName(t), "BASE TABLE", "Tae")
    }
    val viewRows = viewNames.keys.toSeq.filter(_._1 == k).map {
      case (_, db, v) => ("def", db, logicalName(v), "VIEW", "Tae")
    }
    (moRows ++ userRows ++ viewRows)
      .toDF("table_catalog", "table_schema", "table_name", "table_type",
        "engine")
      .createOrReplaceTempView("_graft_is_tables")
    // char-length / numeric-precision metadata from the declared type
    // (charset_collation_basic pins char(8)→8/32, text→0/0 — MO renders
    // TEXT lengths as 0)
    def declSize(decl: String): Option[Int] =
      """\(\s*(\d+)""".r.findFirstMatchIn(decl).map(_.group(1).toInt)
    def charMeta(decl: String): (Option[String], Option[Long], Option[Long]) =
      mysqlDataType(decl) match {
        case "char" | "varchar" =>
          val n = declSize(decl).getOrElse(1)
          (Some("utf8"), Some(n.toLong), Some(n.toLong * 4))
        case "text" | "tinytext" | "mediumtext" | "longtext" =>
          (Some("utf8"), Some(0L), Some(0L))
        case _ => (None, None, None)
      }
    def numMeta(decl: String): (Option[Long], Option[Long]) =
      mysqlDataType(decl) match {
        case "decimal" =>
          val m = """\(\s*(\d+)\s*(?:,\s*(\d+))?\s*\)""".r
            .findFirstMatchIn(decl)
          (Some(m.map(_.group(1).toLong).getOrElse(38L)),
            Some(m.flatMap(x => Option(x.group(2))).map(_.toLong).getOrElse(0L)))
        case "tinyint" => (Some(3L), Some(0L))
        case "smallint" => (Some(5L), Some(0L))
        case "int" | "mediumint" => (Some(10L), Some(0L))
        case "bigint" => (Some(19L), Some(0L))
        case "float" => (Some(12L), None)
        case "double" => (Some(22L), None)
        case _ => (None, None)
      }
    val colRows = declaredCols.toSeq.filter(_._1._1 == k).flatMap {
      case ((_, db, t), cols) =>
        cols.zipWithIndex.map { case ((c, ty, notNull), i) =>
          val (cs, cml, col) = charMeta(ty)
          val (np, ns) = numMeta(ty)
          ("def", db, logicalName(t), c, i + 1, mysqlDataType(ty),
            moColumnType(ty), if (notNull) "NO" else "YES",
            cs.orNull, cml.map(Long.box).orNull, col.map(Long.box).orNull,
            np.map(Long.box).orNull, ns.map(Long.box).orNull)
        }
    }
    // view columns carry their MO-inferred types (expression/case_when
    // pins the full union-type rendering through this surface)
    val viewColRows = MoTypeInfer.allViews(spark).flatMap {
      case (db, v, cols) =>
        cols.zipWithIndex.map { case ((c, t), i) =>
          val cml = MoTypeInfer.charMaxLen(t)
          val (np, ns) = MoTypeInfer.numMeta(t)
          ("def", db, logicalName(v), c, i + 1, MoTypeInfer.dataType(t),
            MoTypeInfer.render(t), if (t.nullable) "YES" else "NO",
            null: String, cml.map(Long.box).orNull, null: java.lang.Long,
            np.map(Long.box).orNull, ns.map(Long.box).orNull)
        }
    }
    (colRows ++ viewColRows)
      .toDF("table_catalog", "table_schema", "table_name", "column_name",
        "ordinal_position", "data_type", "column_type", "is_nullable",
        "character_set_name", "character_maximum_length",
        "character_octet_length", "numeric_precision", "numeric_scale")
      .createOrReplaceTempView("_graft_is_columns")
    // FK introspection from the live registry (MySQL column contract)
    val fkRows = graft.sql.GraftSql.fkIntrospection
    fkRows.map { case (name, fdb, child, _, _, parent, _, delRule,
        updRule, refIdx, _, _) =>
      ("def", fdb, name, "def", fdb, refIdx, "NONE", updRule, delRule,
        child, parent)
    }.distinct
      .toDF("constraint_catalog", "constraint_schema", "constraint_name",
        "unique_constraint_catalog", "unique_constraint_schema",
        "unique_constraint_name", "match_option", "update_rule",
        "delete_rule", "table_name", "referenced_table_name")
      .createOrReplaceTempView("_graft_is_referential_constraints")
    val fkKcu = fkRows.map { case (name, fdb, child, cc, i, parent, pc,
        _, _, _, _, _) =>
      ("def", fdb, name, "def", fdb, child, cc, i, i,
        fdb, parent, pc)
    }
    // FK rows ONLY: the reference's key_column_usage carries no
    // PRIMARY/unique rows (window.result:4556 expects NULL for a
    // pk-only table; fk_information_schema_key_column_usage block 11
    // lists just the FK constraints)
    fkKcu
      .toDF("constraint_catalog", "constraint_schema", "constraint_name",
        "table_catalog", "table_schema", "table_name", "column_name",
        "ordinal_position", "position_in_unique_constraint",
        "referenced_table_schema", "referenced_table_name",
        "referenced_column_name")
      .createOrReplaceTempView("_graft_is_key_column_usage")
    // information_schema.table_constraints: PRIMARY/UNIQUE rows from the
    // index-stats registry + FK constraints (temporary_table_basic's
    // leak checks and visibility probes)
    val tcRows = statRows.toSeq.filter(_._1._1 == k).flatMap {
      case ((_, db, table), idxs) =>
        val t = Namespaces.logicalOf(spark, table).map(_._2).getOrElse(table)
        idxs.filter(_.nonUnique == 0).map { ix =>
          ("def", db, ix.index, db, t,
            if (ix.index.equalsIgnoreCase("PRIMARY")) "PRIMARY KEY"
            else "UNIQUE")
        }
    } ++ fkRows.map { case (name, fdb, child, _, _, _, _, _, _, _, _, _) =>
      ("def", fdb, name, fdb,
        Namespaces.logicalOf(spark, child).map(_._2).getOrElse(child),
        "FOREIGN KEY")
    }.distinct
    tcRows
      .toDF("constraint_catalog", "constraint_schema", "constraint_name",
        "table_schema", "table_name", "constraint_type")
      .createOrReplaceTempView("_graft_is_table_constraints")
    // information_schema.partitions: one row per declared partition of
    // a registered partitioned table (ddl/alter_table_add_partition)
    val partRows = Partitions.all(spark).flatMap { spec =>
      val db = declaredCols.keys.collectFirst {
        case (kk, d, t) if kk == k && t == spec.table.toLowerCase => d
      }.orElse(currentDb(spark)).getOrElse("default")
      val method =
        if (spec.methodSql.nonEmpty) spec.methodSql else spec.method.toUpperCase
      val expr0 = spec.exprSql.replace("`", "")
      spec.parts.zipWithIndex.map { case (p, i) =>
        ("def", db, spec.table, p.name, (i + 1).toLong, method, expr0)
      }
    }
    partRows
      .toDF("table_catalog", "table_schema", "table_name", "partition_name",
        "partition_ordinal_position", "partition_method",
        "partition_expression")
      .createOrReplaceTempView("_graft_is_partitions")
    // information_schema.schemata: predefined system dbs + this
    // session's created ones (tenant-scoped names excluded)
    val schemaRows = (SystemDbs.toSeq ++
      createdDbs.keys.filter(_._1 == k).map(_._2).filterNot(_.contains(" ")))
      .distinct.sorted.map(d => ("def", d))
    schemaRows.toDF("catalog_name", "schema_name")
      .createOrReplaceTempView("_graft_is_schemata")
    // information_schema.character_sets: the reference's supported sets
    // (`pkg/frontend/predefined.go` character_sets rows)
    Seq(
      ("binary", "binary", "Binary pseudo charset", 1),
      ("utf8", "utf8_bin", "UTF-8 Unicode", 4),
      ("utf8mb4", "utf8mb4_bin", "UTF-8 Unicode", 4))
      .toDF("character_set_name", "default_collate_name", "description",
        "maxlen")
      .createOrReplaceTempView("_graft_is_character_sets")
  }

  /** `system_metrics.metric` — the telemetry table purge_log maintains.
    * One live synthetic sample is enough for the goldens' max/limit
    * probes (the pinned-value block is wall-clock and skipped).
    */
  def ensureMetricsView(spark: SparkSession): Unit = {
    import spark.implicits._
    Seq(("process_cpu_percent",
      new java.sql.Timestamp(System.currentTimeMillis()),
      "7c4dccb4-4d3c-41f8-b482-5251dc7a41bf", 0.0, "sys", "internal"))
      .toDF("metric_name", "collecttime", "node", "value", "account", "type")
      .createOrReplaceTempView("_graft_sm_metric")
    // system.statement_info: the audit log — empty here (we record no
    // statement telemetry); probes select by statement text
    Seq.empty[(String, String, String, String)]
      .toDF("statement", "status", "account", "user")
      .createOrReplaceTempView("_graft_sys_statement_info")
  }

  /** (Re)materialize the `_graft_mo_*` views the mo_catalog rewrite
    * targets. Driver-side metadata only — tiny.
    */
  def ensureViews(spark: SparkSession, primaryKeyed: String => Boolean): Unit = {
    import spark.implicits._
    val k = sk(spark)
    val db = currentDb(spark).getOrElse("default")
    val tids = tableIds.toSeq.filter(_._1._1 == k)
      .map { case ((_, t), id) =>
        Namespaces.logicalOf(spark, t) match {
          case Some((dbKey, l)) => (id, l, Namespaces.displayDb(dbKey))
          case None => (id, t, tableDb.getOrElse((k, t), db))
        }
      }
    // the reference's catalog also lists each index's INTERNAL tables
    // (array_index.result counts base + metadata/centroids/entries)
    val internal = indexRows.toSeq.filter(_._1._1 == k).flatMap(_._2)
      .map { r =>
        val baseDb = tableIds.toSeq.filter(_._1._1 == k)
          .find(_._2 == r.tableId)
          .map { case ((_, t), _) => tableDb.getOrElse((k, t), db) }
          .getOrElse(db)
        (r.tableId * 1000 + r.indexTableName.hashCode.abs % 997,
          r.indexTableName, baseDb)
      }
    // every DECLARED table is a catalog row too, not just the indexed
    // ones (temporary_table_basic probes mo_tables for permanent
    // tables named like temp internals); synthetic rel_ids — goldens
    // only join rel_id for indexed tables, which live in `tids`
    val have = (tids.map(r => (r._2.toLowerCase, r._3.toLowerCase)) ++
      internal.map(r => (r._2.toLowerCase, r._3.toLowerCase))).toSet
    def logicalN(t: String): String =
      Namespaces.logicalOf(spark, t).map(_._2).getOrElse(t)
    val declared = declaredCols.toSeq.filter(_._1._1 == k)
      .map { case ((_, d, t), _) => (2000000L + t.hashCode.abs % 999983,
        logicalN(t), d) }
      .filterNot(r => have.contains((r._2.toLowerCase, r._3.toLowerCase)))
    (tids ++ internal ++ declared).map { case (id, n, d) => (id, n, d, "r") }
      .toDF("rel_id", "relname", "reldatabase", "relkind")
      .createOrReplaceTempView("_graft_mo_tables")
    // mo_subs: one row per (publication, allowed account) with the
    // subscriber's binding when one exists (pub_sub3.result:71 —
    // ids/timestamps are run-specific and @ignore-masked by the goldens)
    locally {
      val subsByPub = subscriptions.toSeq.filter(_._1._1 == k)
        .map { case ((_, a, subDb), (o, pn)) => ((o, pn, a), subDb) }.toMap
      val rows = pubs.toSeq.filter(_._1._1 == k)
        .flatMap { case ((_, owner, pn), p) =>
          val allowed = p.accounts.map(_.toSeq.sorted).getOrElse(
            subsByPub.keys.filter(x => x._1 == owner && x._2 == pn)
              .map(_._3).toSeq.distinct.sorted)
          allowed.map { a =>
            val sub = subsByPub.get((owner, pn, a))
            (0L, a, sub.orNull,
              sub.map(_ => "2024-01-01 00:00:00").orNull,
              0L, owner, pn, p.db,
              p.tables.map(_.mkString(",")).getOrElse("*"),
              "2024-01-01 00:00:00", p.comment, 0)
          }
        }
      rows.toDF("sub_account_id", "sub_account_name", "sub_name",
          "sub_time", "pub_account_id", "pub_account_name", "pub_name",
          "pub_database", "pub_tables", "pub_time", "pub_comment", "status")
        .createOrReplaceTempView("_graft_mo_subs")
    }
    // a primary key surfaces as a nameless index row (plugin_smoke's
    // golden leads with an empty algo/algo_table_type row); one
    // mo_indexes row per covered column, like the reference
    val pkRows = tids.filter(t => primaryKeyed(t._2))
      .map(t => ("", t._1, "", "", "", "", "", "", 1))
    val idxRows = indexRows.toSeq.filter(_._1._1 == k).flatMap(_._2)
      .flatMap { r =>
        val cols = if (r.columns.isEmpty) Seq("") else r.columns
        cols.zipWithIndex.map { case (c, i) =>
          (r.name, r.tableId, r.algo, r.tableType, r.indexTableName,
            r.algoParams, r.idxType, c, i + 1)
        }
      }
    (pkRows ++ idxRows)
      .toDF("name", "table_id", "algo", "algo_table_type",
        "index_table_name", "algo_params", "type", "column_name",
        "ordinal_position")
      .createOrReplaceTempView("_graft_mo_indexes")
    // the stage registry's deterministic columns (ids/created_time are
    // run-specific in the reference and stay unverifiable)
    Stages.list(spark).zipWithIndex
      .map { case (st, i) =>
        (i + 1L, st.name, st.url,
          st.credentials.map { case (ck, cv) => s"$ck=$cv" }.mkString(","),
          "in_use", st.comment)
      }
      .toDF("stage_id", "stage_name", "url", "stage_credentials",
        "stage_status", "comment")
      .createOrReplaceTempView("_graft_mo_stages")
    val colRows = entriesViews.toSeq.filter(_._1._1 == k).flatMap {
      case ((_, v), vdb) =>
        try {
          val visible = spark.table(v).schema.fields.zipWithIndex.map {
            case (f, i) => (f.name, i + 1, 0, v, vdb)
          }.toSeq
          // the reference's storage appends two HIDDEN columns
          // (entries_layout golden rows 7-8)
          visible ++ Seq(
            ("__mo_cpkey_col", visible.length + 1, 1, v, vdb),
            ("__mo_rowid", visible.length + 2, 1, v, vdb))
        } catch { case _: Exception => Seq.empty[(String, Int, Int, String, String)] }
    }
    colRows.toDF("attname", "attnum", "att_is_hidden", "att_relname", "att_database")
      .createOrReplaceTempView("_graft_mo_columns")
    // RBAC slices — ids are insertion order; timestamps are run-specific
    // in the reference too, so the deterministic columns carry the tests
    userList(k).zipWithIndex
      .map { case (u, i) => (i + 1, "localhost", u, "unlock", "password", 0, 0, 1) }
      .toDF("user_id", "user_host", "user_name", "status", "login_type",
        "creator", "owner", "default_role")
      .createOrReplaceTempView("_graft_mo_user")
    accountList(k).zipWithIndex
      .map { case ((n, a, st, cm), i) => (i + 1, n, a, st, cm, "1.2.0") }
      .toDF("account_id", "account_name", "admin_name", "status",
        "comments", "create_version")
      .createOrReplaceTempView("_graft_mo_account")
    roleList(k).zipWithIndex
      .map { case (r, i) => (i + 1, r, 0, 0, "") }
      .toDF("role_id", "role_name", "creator", "owner", "comments")
      .createOrReplaceTempView("_graft_mo_role")
    // FK metadata (fk_information_schema_metadata reads
    // mo_catalog.mo_foreign_keys)
    graft.sql.GraftSql.fkIntrospection.map {
      case (name, fdb, child, cc, i, parent, pc, delRule, updRule,
          refIdx, delOrigin, updOrigin) =>
        (name, i, fdb, child, cc, fdb, parent, pc,
          delRule, updRule, refIdx, delOrigin, updOrigin)
    }.toDF("constraint_name", "constraint_id", "db_name", "table_name",
      "column_name", "refer_db_name", "refer_table_name",
      "refer_column_name", "on_delete", "on_update",
      "referenced_index_name", "on_delete_origin", "on_update_origin")
      .createOrReplaceTempView("_graft_mo_foreign_keys")
    // the one live session (func_datetime_now reads `... from
    // mo_catalog.mo_sessions limit 1`)
    Seq((1L, "sys", "dump", "moadmin", currentDb(spark).getOrElse("")))
      .toDF("conn_id", "account", "user", "role", "db")
      .createOrReplaceTempView("_graft_mo_sessions")
  }
}
