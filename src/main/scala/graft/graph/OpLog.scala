package graft.graph

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** Mutation op-log: the time-travel backbone (SURVEY.md §2.1 C8, §2.4 M11).
  *
  * The reference records every *mutating* Cypher query + params in a backlog
  * (`/root/reference/api/graph.py:92-171`) and replays them verbatim to move
  * a graph between commits (`api/graph.py:540-545`,
  * `api/git_utils/git_utils.py:260-333`). We have no Cypher, so backlog
  * entries are a serializable ADT of *our* mutation ops — semantically
  * identical, since the reference only ever logs its own fixed query set
  * (MERGE-by-key upserts and delete-by-key cascades).
  *
  * Replay fidelity (SURVEY §7.4): ops that reference node IDs (edge
  * connects, metadata updates) replay correctly because ID assignment is
  * deterministic (sorted-batch sequential assignment in
  * [[Mutations.assignIds]]) — replaying the same ops from the same start
  * state reproduces identical IDs.
  */
sealed trait GraphOp
object GraphOp {
  final case class FileKey(path: String, name: String, ext: String)

  final case class AddEntity(label: String, name: String, path: String,
      srcStart: Long, srcEnd: Long, doc: String,
      props: Map[String, String]) extends GraphOp
  final case class AddFile(path: String, name: String, ext: String) extends GraphOp
  final case class ConnectEntities(src: Long, dst: Long, relType: String,
      props: Map[String, String]) extends GraphOp
  final case class AddCall(callerId: Long, calleeId: Long, pos: Long) extends GraphOp
  final case class SetNodesMetadata(ids: Seq[Long],
      values: Seq[Map[String, String]]) extends GraphOp
  final case class SetFileCoverage(path: String, name: String, ext: String,
      coverage: Double) extends GraphOp
  final case class DeleteFiles(files: Seq[FileKey]) extends GraphOp
  final case class AddCommit(hash: String, author: String, message: String,
      date: Long) extends GraphOp
  final case class ConnectCommits(childHash: String, parentHash: String) extends GraphOp
  final case class SetTransition(fromHash: String, toHash: String,
      relType: String, queries: Seq[String], params: Seq[String]) extends GraphOp

  // ---- batch rows (history re-analysis capture; SURVEY §2.6 F5) --------
  // The reference backlogs one Cypher query per entity during the history
  // walk (`api/graph.py:141-150`); we backlog one op per ingest BATCH —
  // replay fidelity is identical (deterministic ID assignment) at a
  // fraction of the op count. Row payloads are small by construction: a
  // transition covers one commit's diff.
  final case class EntityRow(label: String, name: String, path: String,
      srcStart: Long, srcEnd: Long, doc: String, props: Map[String, String])
  final case class EdgeRow(src: Long, dst: Long, relType: String,
      props: Map[String, String])
  final case class CallRow(src: Long, dst: Long, pos: Long, text: String)

  final case class AddEntitiesBatch(rows: Seq[EntityRow]) extends GraphOp
  final case class AddFilesBatch(rows: Seq[FileKey]) extends GraphOp
  final case class ConnectEntitiesBatch(rows: Seq[EdgeRow]) extends GraphOp
  final case class AddCallsBatch(rows: Seq[CallRow]) extends GraphOp

  /** M6 batch row: one tracefile record's file percentage. */
  final case class FileCoverageRow(path: String, name: String, ext: String,
      coverage: Double)
  /** M6 batch (lcov writeback, F1–F3): every file percentage of one
    * tracefile in a single nodes rewrite — `process_lcov` issues one
    * `set_file_coverage` per SF record (`lcov.py:127-213`); at batch
    * granularity a thousand-record CI drop is one Spark job, not a
    * thousand sequential ones. */
  final case class SetFilesCoverage(rows: Seq[FileCoverageRow]) extends GraphOp
}

object OpLog {
  import GraphOp._

  val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  def readStringMap(json: String): Map[String, String] = {
    val t = mapper.readTree(json)
    val it = t.fields()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue.asText()) }
    b.result()
  }

  /** Encode with an explicit discriminator — mirrors the reference logging
    * (query, params) pairs (`api/graph.py:141-150`). */
  def encode(op: GraphOp): String = {
    val node = mapper.createObjectNode()
    node.put("op", op.getClass.getSimpleName)
    node.set[com.fasterxml.jackson.databind.JsonNode]("data", mapper.valueToTree(op))
    mapper.writeValueAsString(node)
  }

  def decode(json: String): GraphOp = {
    val tree = mapper.readTree(json)
    val data = tree.get("data")
    tree.get("op").asText() match {
      case "AddEntity" => mapper.treeToValue(data, classOf[AddEntity])
      case "AddFile" => mapper.treeToValue(data, classOf[AddFile])
      case "ConnectEntities" => mapper.treeToValue(data, classOf[ConnectEntities])
      case "AddCall" => mapper.treeToValue(data, classOf[AddCall])
      case "SetNodesMetadata" => mapper.treeToValue(data, classOf[SetNodesMetadata])
      case "SetFileCoverage" => mapper.treeToValue(data, classOf[SetFileCoverage])
      case "DeleteFiles" => mapper.treeToValue(data, classOf[DeleteFiles])
      case "AddCommit" => mapper.treeToValue(data, classOf[AddCommit])
      case "ConnectCommits" => mapper.treeToValue(data, classOf[ConnectCommits])
      case "SetTransition" => mapper.treeToValue(data, classOf[SetTransition])
      case "AddEntitiesBatch" => mapper.treeToValue(data, classOf[AddEntitiesBatch])
      case "AddFilesBatch" => mapper.treeToValue(data, classOf[AddFilesBatch])
      case "ConnectEntitiesBatch" => mapper.treeToValue(data, classOf[ConnectEntitiesBatch])
      case "AddCallsBatch" => mapper.treeToValue(data, classOf[AddCallsBatch])
      case "SetFilesCoverage" => mapper.treeToValue(data, classOf[SetFilesCoverage])
      case other => throw new IllegalArgumentException(s"unknown op: $other")
    }
  }
}
