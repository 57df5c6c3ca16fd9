package graft.core

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** IO5 — command-batch wire format (reference `GrpcCommandSerializer.scala:9-85`,
  * `index.proto:92-114`: InsertCommand/UpdateCommand/RemoveCommand envelopes
  * over serialized tuples). The reference ships protobuf+LZ4; here the
  * envelope is JSON and each row rides as one Spark-JSON line, with the exact
  * schema carried alongside so decode restores types bit-for-bit (binary as
  * base64, timestamps in UTC micros — Spark's own JSON codec both ways, no
  * hand-rolled row parsing).
  *
  * A wire command batch is by nature BOUNDED (the reference caps batches at
  * ~1000 tuples, `MainSpec.scala:63`): encoding collects the batch rows —
  * this is a front-end RPC surface, not a bulk-data path. Bulk loads go
  * through `KVIndex.bootstrap`, which never leaves the cluster. The bound
  * is ENFORCED: encode drains each command through `toLocalIterator` (one
  * partition of rows on the driver at a time, never the whole batch) and
  * throws the typed `BATCH_TOO_LARGE` error the moment a command exceeds
  * `maxRows` — a misrouted bulk DataFrame fails fast instead of OOMing
  * the driver.
  */
object CommandCodec {

  /** default encode cap — mirrors the reference's ~1000-tuple batches with
    * headroom; override per call for bigger authorized envelopes */
  val DefaultMaxRows: Long = 100000L

  def toJson(cmds: Seq[Command], maxRows: Long = DefaultMaxRows): String = {
    val arr = cmds.map {
      case Command.Insert(rows, upsert) => obj("insert", rows, Some(upsert), maxRows)
      case Command.Update(rows) => obj("update", rows, None, maxRows)
      case Command.Remove(rows) => obj("remove", rows, None, maxRows)
    }
    JsonMethods.compact(JsonMethods.render(
      JObject("commands" -> JArray(arr.toList))))
  }

  private def obj(typ: String, rows: DataFrame, upsert: Option[Boolean],
                  maxRows: Long): JObject = {
    val it = rows.toJSON.toLocalIterator()
    val lines = List.newBuilder[JValue]
    var n = 0L
    while (it.hasNext) {
      n += 1
      if (n > maxRows) throw GraftException(GraftError.BatchTooLarge(n, maxRows))
      lines += JString(it.next())
    }
    val base: List[(String, JValue)] = List(
      "type" -> JString(typ),
      "schema" -> JString(rows.schema.json),
      "rows" -> JArray(lines.result()))
    JObject(upsert.fold(base)(u => ("upsert" -> (JBool(u): JValue)) :: base))
  }

  def fromJson(s: String, spark: SparkSession): Seq[Command] = {
    val j = JsonMethods.parse(s)
    (j \ "commands").asInstanceOf[JArray].arr.map { cj =>
      val schema = DataType.fromJson(
        (cj \ "schema").asInstanceOf[JString].s).asInstanceOf[StructType]
      val lines = (cj \ "rows").asInstanceOf[JArray].arr.map(_.asInstanceOf[JString].s)
      val rows = spark.read.schema(schema)
        .json(spark.createDataset(lines)(Encoders.STRING))
      (cj \ "type").asInstanceOf[JString].s match {
        case "insert" =>
          val upsert = (cj \ "upsert") match {
            case JBool(b) => b
            case _ => false
          }
          Command.Insert(rows, upsert)
        case "update" => Command.Update(rows)
        case "remove" => Command.Remove(rows)
        case other => throw new IllegalArgumentException(s"unknown command type: $other")
      }
    }
  }
}
