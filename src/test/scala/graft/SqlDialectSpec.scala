package graft

import java.sql.SQLException

import org.apache.spark.sql.functions._
import graft.core._

/** The [[SqlDialect]] seam of the JDBC store: the live Derby dialect
  * carries the full store contract (the same path `KVIndexSpec`'s
  * 3-backend matrix exercises), and the DORMANT networked dialects —
  * PostgreSQL/YugabyteDB and the Cassandra CQL twin of the reference's
  * `cassandra_keyspace.cql` — are pinned at the level the zero-egress
  * sandbox allows: schema completeness against the store's four durable
  * tables, idempotent-bootstrap form, and CAS-loss classification.
  */
class SqlDialectSpec extends SparkSuite {
  import spark.implicits._

  test("Derby dialect carries the live store: bootstrap, CAS loss classified, reopen") {
    val url = s"jdbc:derby:memory:graft-dialect-${java.util.UUID.randomUUID()};create=true"
    val store = new JdbcSnapshotStore(url, spark, SqlDialect.Derby)
    try {
      val ix = KVIndex.bootstrap(store, "d1",
        (1L to 50L).map(k => k -> k * 2).toDF("k", "x"), Seq("k"))
        .fold(e => fail(e.message), identity)
      assert(ix.count == 50L)
      assert(ix.get(Seq(7L)).collect().map(_.getLong(1)).toSeq == Seq(14L))
      // two handles race one version: the loser's commit INSERT hits the
      // control PK — the dialect must classify it into the CAS-loss error
      // (ContextAlreadyUsed), never leak a raw SQLException
      val h1 = KVIndex.open(store, "d1").toOption.get
      val h2 = KVIndex.open(store, "d1").toOption.get
      assert(h1.execute(Seq(Command.Insert(
        Seq(100L -> 1L).toDF("k", "x")))).success)
      val lost = h2.execute(Seq(Command.Insert(
        Seq(101L -> 1L).toDF("k", "x"))))
      assert(!lost.success &&
        lost.error.exists(_.isInstanceOf[GraftError.ContextAlreadyUsed]),
        lost.toString)
      // dialect DDL replay on a shared URL is idempotent; latest holds
      // the 50 bootstrap rows + the CAS winner's insert, not the loser's
      val again = new JdbcSnapshotStore(url, spark, SqlDialect.Derby)
      try {
        val latest = KVIndex.open(again, "d1").toOption.get
        assert(latest.count == 51L)
        assert(latest.get(Seq(100L)).count() == 1L)
        assert(latest.get(Seq(101L)).count() == 0L)
      } finally again.close()
    } finally store.close()
  }

  test("dormant Postgres/YugabyteDB dialect: schema complete, idempotent form, SQLSTATE classification") {
    val pg = SqlDialect.Postgres
    val tables = Seq("control", "control_appends", "filelists", "datafiles")
    assert(pg.ddl.size == tables.size)
    tables.zip(pg.ddl).foreach { case (t, ddl) =>
      assert(ddl.contains(s"IF NOT EXISTS $t"), s"$t: not idempotent-form")
      assert(ddl.contains("PRIMARY KEY"), s"$t: CAS needs the PK")
    }
    // the text plane is TEXT, the parquet blob plane BYTEA
    assert(pg.ddl.count(_.contains(" TEXT")) == 3)
    assert(pg.ddl.exists(d => d.startsWith("CREATE TABLE IF NOT EXISTS datafiles")
      && d.contains("BYTEA")))
    // 23505 unique_violation = commit CAS loss; 42P07 duplicate_table =
    // bootstrap replay; anything else must propagate
    assert(pg.duplicateKey(new SQLException("dup", "23505")))
    assert(!pg.duplicateKey(new SQLException("serialization", "40001")))
    assert(pg.tableExists(new SQLException("exists", "42P07")))
    assert(!pg.tableExists(new SQLException("dup", "23505")))
  }

  test("dormant Cassandra CQL twin mirrors the four durable tables + LWT CAS") {
    val cql = SqlDialect.CassandraCql
    assert(cql.keyspace.contains("CREATE KEYSPACE IF NOT EXISTS graft"))
    val tables = Seq("control", "control_appends", "filelists", "datafiles")
    assert(cql.tables.size == tables.size)
    tables.zip(cql.tables).foreach { case (t, ddl) =>
      assert(ddl.contains(s"graft.$t"), s"missing table $t")
      assert(ddl.contains("PRIMARY KEY"), s"$t: needs a PK for the CAS/point reads")
    }
    // the append log keys (rel, seq) so appends stay O(line), reads ordered
    assert(cql.tables(1).contains("PRIMARY KEY (rel, seq)"))
    // the commit CAS is the LWT insert — the reference's applied-flag shape
    assert(cql.casInsert.contains("IF NOT EXISTS") &&
      cql.casInsert.contains("graft.control"))
  }
}
