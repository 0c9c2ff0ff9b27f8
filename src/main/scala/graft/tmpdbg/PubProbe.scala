package graft.tmpdbg
object PubProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(4)
    def run(s: String) = { println("STMT: " + s.take(100)); graft.sql.GraftSql.sql(spark, s) }
    run("create database if not exists remap_db")
    run("use remap_db")
    run("create database rdb_dst")
    run("create table rdb_dst.t(id int, v int)")
    run("insert into rdb_dst.t values (1,10),(2,20),(3,30)")
    run("set enable_remap_hint = 1")
    run("""set remap_rewrites = '{"remapdb": {"rdb_src": "rdb_dst"}, "rewrites": {"rdb_dst.t": "select * from rdb_dst.t where id >= 2"}}'""")
    run("select * from rdb_src.t order by id").show()
    spark.stop()
  }
}
