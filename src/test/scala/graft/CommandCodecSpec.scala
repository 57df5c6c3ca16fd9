package graft

import org.apache.spark.sql.functions._
import graft.core._

/** IO5 wire-format round-trip (reference `GrpcSpec` over
  * `GrpcCommandSerializer.scala:9-85`): a serialized batch decodes to
  * commands that execute identically to the originals, across types
  * (longs, strings, nulls, doubles, binary) and command kinds.
  */
class CommandCodecSpec extends SparkSuite {
  import spark.implicits._

  test("insert/update/remove round-trip the wire format, types preserved") {
    val ins = Seq((1L, "a", 1.5), (2L, null.asInstanceOf[String], 2.5))
      .toDF("k", "s", "v")
    val upd = Seq((1L, "a2", 9.9)).toDF("k", "s", "v")
      .withColumn("expectedVersion", lit(null).cast("string"))
    val rem = Seq(Tuple1(2L)).toDF("k")
    val wire = CommandCodec.toJson(Seq(
      Command.Insert(ins, upsert = true), Command.Update(upd), Command.Remove(rem)))
    val back = CommandCodec.fromJson(wire, spark)
    assert(back.length == 3)
    val Command.Insert(insB, upsertB) = back(0): @unchecked
    assert(upsertB)
    // decoded columns are nullable (JSON carries no nullability) — compare
    // names + types, which is what execution depends on
    assert(insB.schema.map(f => (f.name, f.dataType)) ==
      ins.schema.map(f => (f.name, f.dataType)))
    assert(insB.collect().map(_.toSeq).toSet == ins.collect().map(_.toSeq).toSet)
    val Command.Update(updB) = back(1): @unchecked
    assert(updB.columns.contains("expectedVersion"))
    val Command.Remove(remB) = back(2): @unchecked
    assert(remB.as[Long].collect().toSeq == Seq(2L))
  }

  test("binary columns survive the wire (base64 via Spark's JSON codec)") {
    val df = Seq(
      (Array[Byte](0x00, 0x7f, 0x80.toByte, 0xff.toByte), 1L),
      (Array[Byte](), 2L)).toDF("bk", "v")
    val back = CommandCodec.fromJson(
      CommandCodec.toJson(Seq(Command.Insert(df))), spark)
    val Command.Insert(rows, _) = back.head: @unchecked
    assert(rows.schema("bk").dataType.sql == "BINARY")
    val got = rows.orderBy("v").select("bk").collect().map(_.getAs[Array[Byte]](0).toSeq)
    assert(got.toSeq == Seq(Seq[Byte](0x00, 0x7f, 0x80.toByte, 0xff.toByte), Seq[Byte]()))
  }

  test("fuzz: random batches round-trip across types, unicode, and nulls") {
    val rnd = new scala.util.Random(4242)
    def rndString(): String = {
      // bias toward the characters that break naive JSON paths: quotes,
      // backslashes, control chars, non-BMP unicode, whitespace
      val pool = "ab\"\\\n\t\ré漢🎯 /{}[]:,"
      Seq.fill(rnd.nextInt(12))(pool(rnd.nextInt(pool.length))).mkString
    }
    (1 to 20).foreach { trial =>
      val rows = Seq.fill(rnd.nextInt(8) + 1)((
        rnd.nextLong(),
        if (rnd.nextInt(5) == 0) null else rndString(),
        rnd.nextDouble(),
        if (rnd.nextInt(5) == 0) null
        else Array.fill(rnd.nextInt(6))(rnd.nextInt(256).toByte)))
      val df = rows.toDF("k", "s", "v", "b")
      val cmd: Command =
        rnd.nextInt(3) match {
          case 0 => Command.Insert(df, upsert = rnd.nextBoolean())
          case 1 => Command.Update(df)
          case _ => Command.Remove(df.select("k"))
        }
      val back = CommandCodec.fromJson(CommandCodec.toJson(Seq(cmd)), spark).head
      assert(back.getClass == cmd.getClass, s"trial $trial kind")
      def canon(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(_.toSeq.map {
          case a: Array[Byte] => a.toSeq
          case x => x
        }).toSet
      assert(canon(back.rows) == canon(cmd.rows), s"trial $trial rows")
    }
  }

  test("decoded batch executes identically to the original batch") {
    val store = new MemorySnapshotStore(spark)
    val base = (1 to 20).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    def freshIx(id: String) = KVIndex.bootstrap(store, id, base, Seq("k"))
      .fold(e => fail(e.message), identity)
    val batch = Seq(
      Command.Insert(Seq((21L, "new"), (5L, "upserted")).toDF("k", "v"), upsert = true),
      Command.Remove(Seq(Tuple1(1L)).toDF("k")))
    val direct = freshIx("direct").execute(batch, "tx-wire")
    val decoded = CommandCodec.fromJson(CommandCodec.toJson(batch), spark)
    val viaWire = freshIx("wire").execute(decoded, "tx-wire")
    assert(direct.success && viaWire.success)
    def dump(id: String) = KVIndex.open(store, id).toOption.get
      .df.select("k", "v").as[(Long, String)].collect().toMap
    assert(dump("direct") == dump("wire"))
    assert(dump("wire")(5L) == "upserted" && !dump("wire").contains(1L))
  }

  test("encode caps the batch: typed BATCH_TOO_LARGE instead of a driver OOM") {
    val big = spark.range(0, 500).selectExpr("id AS k", "CAST(id AS STRING) AS v")
    val ex = intercept[GraftException] {
      CommandCodec.toJson(Seq(Command.Insert(big)), maxRows = 100L)
    }
    assert(ex.error.code == "BATCH_TOO_LARGE")
    // at the cap is fine; the encoder streams rather than collecting
    val ok = CommandCodec.toJson(Seq(Command.Insert(big.limit(100))), maxRows = 100L)
    assert(CommandCodec.fromJson(ok, spark).head.rows.count() == 100L)
  }

}
