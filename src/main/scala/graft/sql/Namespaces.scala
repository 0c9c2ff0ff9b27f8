package graft.sql

import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Per-database TABLE namespacing over flat physical storage.
  *
  * The reference scopes tables per (account, database)
  * (`pkg/frontend/authenticate.go` session db + `pkg/catalog` relations
  * keyed by database id); Spark-side storage here is a single flat
  * namespace. This registry assigns every TRACKED table a physical name:
  * the bare logical name when it is globally unused (the overwhelmingly
  * common case — behavior is then byte-identical to flat storage), or a
  * mangled `__gns_<dbkey>__<name>` when another database already owns
  * the bare name. GraftSql's resolution pass rewrites statement text
  * logical→physical; display surfaces (information_schema, mo_catalog)
  * map physical→logical back through [[logicalOf]].
  *
  * A "db key" is the account-scoped database identity MoCatalog uses:
  * `db` under the sys account, `acct db` otherwise; a subscription
  * database resolves to its PUBLISHER's key (the published tables ARE
  * the publisher's — reference `pkg/frontend/publication_subscription.go`).
  */
object Namespaces {

  private def sk(spark: SparkSession): Int =
    System.identityHashCode(spark.sharedState)

  // (session, dbKey, logicalLower) → physical name
  private val logToPhys = TrieMap[(Int, String, String), String]()
  // (session, physicalLower) → (dbKey, logicalLower)
  private val physToLog = TrieMap[(Int, String), (String, String)]()

  def displayDb(dbKey: String): String = {
    val i = dbKey.indexOf(' ')
    if (i >= 0) dbKey.substring(i + 1) else dbKey
  }

  private def mangle(dbKey: String, t: String): String =
    "__gns_" + dbKey.replaceAll("\\W", "_") + "__" + t

  /** The physical name a reference `[db.]t` resolves to: the recorded
    * mapping, else the bare name (untracked tables stay flat).
    */
  def resolve(spark: SparkSession, dbKey: String, t: String): String =
    logToPhys.getOrElse((sk(spark), dbKey, t.toLowerCase), t)

  /** Physical-name decision at CREATE: reuse the recorded mapping, else
    * claim the bare name if no OTHER database owns it, else mangle.
    */
  def createName(spark: SparkSession, dbKey: String, t: String): String = {
    val k = sk(spark)
    val tl = t.toLowerCase
    logToPhys.get((k, dbKey, tl)) match {
      case Some(p) => p
      case None =>
        val phys =
          if (physToLog.get((k, tl)).forall(_._1 == dbKey)) t
          else mangle(dbKey, t)
        logToPhys.put((k, dbKey, tl), phys)
        physToLog.put((k, phys.toLowerCase), (dbKey, tl))
        phys
    }
  }

  /** Forget a table by its PHYSICAL name (drop/rename bookkeeping). */
  def forget(spark: SparkSession, physical: String): Unit = {
    val k = sk(spark)
    physToLog.remove((k, physical.toLowerCase)).foreach { case (dbKey, tl) =>
      logToPhys.remove((k, dbKey, tl))
    }
  }

  /** (dbKey, logical) of a tracked physical name, for display demangle. */
  def logicalOf(spark: SparkSession, physical: String): Option[(String, String)] =
    physToLog.get((sk(spark), physical.toLowerCase))

  /** All tracked (logical, physical) pairs of one database. */
  def tablesOf(spark: SparkSession, dbKey: String): Seq[(String, String)] = {
    val k = sk(spark)
    logToPhys.toSeq.collect {
      case ((s, d, l), p) if s == k && d == dbKey => (l, p)
    }
  }

  /** Logical names of the effective current db whose physical name
    * differs (the set the bare-name rewrite must touch — usually empty).
    */
  def mangledOf(spark: SparkSession, dbKey: String): Seq[(String, String)] = {
    val k = sk(spark)
    logToPhys.toSeq.collect {
      case ((s, d, l), p) if s == k && d == dbKey && p.toLowerCase != l =>
        (l, p)
    }
  }

  /** Db keys owned by an account (drop-account cleanup). */
  def accountDbKeys(spark: SparkSession, acct: String): Seq[String] = {
    val k = sk(spark)
    val prefix = acct.toLowerCase + " "
    logToPhys.keys.collect {
      case (s, d, _) if s == k && d.startsWith(prefix) => d
    }.toSeq.distinct
  }

  def dropDbEntries(spark: SparkSession, dbKey: String): Unit = {
    val k = sk(spark)
    logToPhys.keys.filter(key => key._1 == k && key._2 == dbKey)
      .foreach { key =>
        logToPhys.remove(key).foreach(p => physToLog.remove((k, p.toLowerCase)))
      }
  }

  def clear(spark: SparkSession): Unit = {
    val k = sk(spark)
    logToPhys.keys.filter(_._1 == k).foreach(logToPhys.remove)
    physToLog.keys.filter(_._1 == k).foreach(physToLog.remove)
  }
}
