package graft

import org.scalatest.funsuite.AnyFunSuite

class ScratchEnumSpec extends AnyFunSuite {
  test("enum probe") {
    val spark = SparkTestSession.spark
    import graft.sql.{GraftSql, EnumSet}
    GraftSql.sql(spark, "drop table if exists insert01")
    GraftSql.sql(spark, "create table insert01 (id int, order_number VARCHAR(20), status enum('Pending', 'Processing', 'Completed', 'Cancelled'))")
    GraftSql.sql(spark, "insert into insert01 values(1,'111',1),(2,'222',2),(3,'333',3),(4,'444','Cancelled')")
    println("ROWS: " + GraftSql.sql(spark, "select * from insert01").collect().mkString(" | "))
    println("RW1: " + EnumSet.exprRewrite(spark, "select id from insert01 where status in ('Pending', 4) order by id"))
    println("RW2: " + EnumSet.exprRewrite(spark, "select * from insert01 where status in ('Pending','Cancelled')"))
    println("Q1: " + GraftSql.sql(spark, "select id from insert01 where status in ('Pending', 4) order by id").collect().mkString(" | "))
    println("Q2: " + GraftSql.sql(spark, "select * from insert01 where status in ('Pending','Cancelled')").collect().mkString(" | "))
    GraftSql.sql(spark, "drop table insert01")
  }
}
