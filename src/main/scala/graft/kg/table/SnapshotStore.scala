package graft.kg.table

import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import scala.util.Try

/** Per-bucket lineage row written with every snapshot commit
  * (the north rule's "per-partition lineage rows and extraction-count
  * metrics"; semantics mirror the reference checkpoint stats,
  * run_iltur.py:625-695). */
final case class BucketLineage(
    bucket: Int,
    stage: String,
    inputRows: Long,
    outputRows: Map[String, Long],
    extractionCounts: Map[String, Long],
    contentHash: String
)

final case class Snapshot(
    id: Long,
    parentId: Long, // -1 for first
    buckets: Seq[Int],
    lineage: Seq[BucketLineage],
    committedAt: String
)

/** Iceberg-semantics-emulating snapshot/manifest commit log over a local or
  * DFS path (no Iceberg jars exist in this sandbox — SURVEY.md §4.3).
  *
  * Layout:
  * {{{
  *   <root>/<table>/bucket=<n>/part-....parquet  -- data, partition-pruned reads
  *   <root>/_graft_log/snapshot-<id>.json     -- atomic tmp+rename manifests
  * }}}
  *
  * Guarantees re-expressed from the reference's checkpoint protocol
  * (run_iltur.py:581-740): atomic manifest writes (tmp + rename), corrupt
  * manifests skipped on load (self-healing recovery), resume = the set
  * difference of all buckets minus committed buckets. A real Iceberg catalog
  * can replace this class behind the same method surface.
  */
final class SnapshotStore(root: String) {

  private val mapper = new ObjectMapper()
  private def logDir: Path = Paths.get(root, "_graft_log")

  def snapshots: Seq[Snapshot] = {
    if (!Files.isDirectory(logDir)) return Nil
    val files = Files.list(logDir).iterator().asScala
      .filter(_.getFileName.toString.matches("snapshot-\\d+\\.json"))
      .toList.sortBy(_.getFileName.toString.stripPrefix("snapshot-").stripSuffix(".json").toLong)
    files.flatMap { f =>
      // corrupt manifest → skip (reference drops corrupt case JSONs and
      // recomputes, run_iltur.py:592-605)
      Try(parseSnapshot(new String(Files.readAllBytes(f), "UTF-8"))).toOption
    }
  }

  def completedBuckets: Set[Int] = snapshots.flatMap(_.buckets).toSet

  /** Next id counts every manifest file, valid or corrupt — a corrupt
    * manifest's id is never reused, so a half-written file can't be silently
    * replaced and history stays append-only. */
  def nextId: Long = {
    if (!Files.isDirectory(logDir)) return 0L
    val ids = Files.list(logDir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.matches("snapshot-\\d+\\.json"))
      .map(_.stripPrefix("snapshot-").stripSuffix(".json").toLong)
      .toList
    if (ids.isEmpty) 0L else ids.max + 1
  }

  /** Atomically commit a snapshot covering `lineage.map(_.bucket)`. */
  def commit(lineage: Seq[BucketLineage]): Snapshot = {
    Files.createDirectories(logDir)
    val snap = Snapshot(
      id = nextId,
      parentId = snapshots.lastOption.map(_.id).getOrElse(-1L),
      buckets = lineage.map(_.bucket),
      lineage = lineage,
      committedAt = java.time.Instant.now().toString)
    val tmp = logDir.resolve(s".snapshot-${snap.id}.json.tmp")
    val dst = logDir.resolve(s"snapshot-${snap.id}.json")
    Files.write(tmp, renderSnapshot(snap).getBytes("UTF-8"))
    Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
    snap
  }

  // --- JSON (hand-rolled via Jackson trees: no scala module needed) ---------

  private def renderSnapshot(s: Snapshot): String = {
    val rootNode = mapper.createObjectNode()
    rootNode.put("id", s.id)
    rootNode.put("parentId", s.parentId)
    rootNode.put("committedAt", s.committedAt)
    val bucketsArr = rootNode.putArray("buckets")
    s.buckets.foreach(bucketsArr.add)
    val linArr = rootNode.putArray("lineage")
    for (l <- s.lineage) {
      val n = linArr.addObject()
      n.put("bucket", l.bucket)
      n.put("stage", l.stage)
      n.put("inputRows", l.inputRows)
      n.put("contentHash", l.contentHash)
      val outN = n.putObject("outputRows")
      l.outputRows.toList.sortBy(_._1).foreach { case (k, v) => outN.put(k, v) }
      val cntN = n.putObject("extractionCounts")
      l.extractionCounts.toList.sortBy(_._1).foreach { case (k, v) => cntN.put(k, v) }
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(rootNode)
  }

  private def parseSnapshot(json: String): Snapshot = {
    val n = mapper.readTree(json)
    require(n.has("id") && n.has("buckets") && n.has("lineage"), "malformed snapshot")
    Snapshot(
      id = n.get("id").asLong(),
      parentId = n.get("parentId").asLong(),
      buckets = n.get("buckets").elements().asScala.map(_.asInt()).toSeq,
      lineage = n.get("lineage").elements().asScala.map { l =>
        BucketLineage(
          bucket = l.get("bucket").asInt(),
          stage = l.get("stage").asText(),
          inputRows = l.get("inputRows").asLong(),
          outputRows = l.get("outputRows").properties().asScala
            .map(e => e.getKey -> e.getValue.asLong()).toMap,
          extractionCounts = l.get("extractionCounts").properties().asScala
            .map(e => e.getKey -> e.getValue.asLong()).toMap,
          contentHash = l.get("contentHash").asText())
      }.toSeq,
      committedAt = n.get("committedAt").asText())
  }
}
