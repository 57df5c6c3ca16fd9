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
  * through `KVIndex.bootstrap`, which never leaves the cluster.
  */
object CommandCodec {

  def toJson(cmds: Seq[Command]): String = {
    val arr = cmds.map {
      case Command.Insert(rows, upsert) => obj("insert", rows, Some(upsert))
      case Command.Update(rows) => obj("update", rows, None)
      case Command.Remove(rows) => obj("remove", rows, None)
    }
    JsonMethods.compact(JsonMethods.render(
      JObject("commands" -> JArray(arr.toList))))
  }

  private def obj(typ: String, rows: DataFrame, upsert: Option[Boolean]): JObject = {
    val base: List[(String, JValue)] = List(
      "type" -> JString(typ),
      "schema" -> JString(rows.schema.json),
      "rows" -> JArray(rows.toJSON.collect().map(JString(_): JValue).toList))
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
