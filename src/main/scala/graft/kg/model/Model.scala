package graft.kg.model

/** A bare character span (schema_v2_1.py secondary_spans entries). */
final case class SpanRef(startChar: Int, endChar: Int)

/** Evidence anchor: exact char span into the assembled conversation document
  * plus optional secondary spans (schema_v2_1.py:205-231). */
final case class Anchor(
    docId: String,
    startChar: Int,
    endChar: Int,
    textHash: String,
    displayLocation: String,
    surfaceText: String,
    secondarySpans: Seq[SpanRef] = Nil
)

/** Extraction provenance (schema_v2_1.py:233-257). The rule engine stamps
  * method + promptId only; timestamps stay null for determinism (the
  * reference's own test canonicalizer nulls them too). */
final case class Provenance(
    extractionMethod: String,   // rule|regex|inference|llm
    modelId: String,            // null for the deterministic engine
    promptId: String,           // rule/grammar identifier
    runId: String,
    temperature: java.lang.Double,
    timestamp: String
)

/** One typed graph node, flattened across the 8 reference node kinds
  * (schema_v2_1.py:263-508) with a `nodeType` discriminator. Per-kind fields
  * are nullable. */
final case class Node(
    convId: String,
    id: String,
    nodeType: String,        // fact|concept|issue|argument|holding|precedent|outcome
    text: String,
    conceptId: String,       // concepts: ontology id; null otherwise
    kind: String,            // concepts: ConceptKind
    actor: String,           // arguments: ActorType
    factType: String,        // facts: FactType
    relevance: String,
    isRatio: Boolean,        // holdings
    resolvesIssue: String,   // holdings → issue id
    disposition: String,     // outcome
    caseName: String,        // precedents
    citation: String,        // precedents
    citationType: String,    // precedents
    caseYear: Integer,       // precedents (nullable)
    confidence: String,
    anchor: Anchor,          // nullable
    method: String,          // regex|rule
    // reference-schema fields carried for parity (schema_v2_1.py:263-508);
    // the v1 rule extractor leaves them null — they are populated when
    // graphs are loaded from the reference's published JSON format
    courtFinding: String = null,  // facts: accepted|rejected|not_decided
    courtResponse: String = null, // arguments: accepted|rejected|not_addressed
    treatment: String = null,     // precedents: followed|applied|distinguished|cited|…
    claim: String = null,         // arguments: bare claim text (text may be a composite)
    schemes: Seq[String] = null,  // arguments: ArgumentScheme values (schema_v2_1.py:90-110)
    provenance: Provenance = null
)

/** One typed edge — the (subj, pred, obj) triple carrier
  * (schema_v2_1.py:509-549). */
final case class EdgeRow(
    convId: String,
    id: String,
    source: String,
    target: String,
    relation: String,
    confidence: String,
    strength: String,
    isCritical: Boolean,
    supportGroupIds: Seq[String],
    explanation: String,     // nullable
    anchor: Anchor,          // nullable
    method: String,
    repairNote: String,      // nullable; "ok" edges carry null
    provenance: Provenance = null
)

/** A justification set node (schema_v2_1.py:488-508; built per
  * extractor.py:4194-4276). */
final case class JustificationSetRow(
    convId: String,
    id: String,
    targetId: String,
    logic: String,           // and|or
    label: String,
    isPrimary: Boolean,
    confidence: String
)

/** A reasoning chain (schema_v2_1.py:555-585; built per
  * extractor.py:4290-4369). */
final case class ChainRow(
    convId: String,
    id: String,
    issueId: String,
    holdingId: String,
    factIds: Seq[String],
    conceptIds: Seq[String],
    argumentIds: Seq[String],
    edgeIds: Seq[String],
    justificationSetId: String, // nullable
    criticalNodes: Seq[String],
    narrative: String
)

/** Cluster membership row (extractor.py:1409-1637). */
final case class ClusterMemberRow(
    convId: String,
    clusterId: String,
    clusterLabel: String,
    logic: String,
    nodeId: String,
    nodeType: String
)

/** Requirement-satisfaction row (extractor.py:1600-1629). */
final case class RequirementRow(
    convId: String,
    clusterId: String,
    requirement: String,
    satisfiedBy: String // fact id, nullable
)

/** Per-conversation extraction summary (the checkpoint-stats analog,
  * run_iltur.py:748-797). */
final case class ConvSummary(
    convId: String,
    docId: String,
    docChars: Int,
    nTurns: Int,
    nParagraphs: Int,
    nSentences: Int,
    nFacts: Int,
    nConcepts: Int,
    nIssues: Int,
    nArguments: Int,
    nHoldings: Int,
    nPrecedents: Int,
    nOutcomes: Int,
    nEdges: Int,
    nJustificationSets: Int,
    nChains: Int,
    nWarnings: Int,
    qualityTier: String
)

/** The complete per-conversation extraction result. */
final case class ConvGraph(
    summary: ConvSummary,
    nodes: Vector[Node],
    edges: Vector[EdgeRow],
    justificationSets: Vector[JustificationSetRow],
    chains: Vector[ChainRow],
    clusterMembers: Vector[ClusterMemberRow],
    requirements: Vector[RequirementRow],
    warnings: Vector[String]
)

/** The input row shape (BASELINE.json input_hint). */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: java.sql.Timestamp
)

/** A (subj, pred, obj) triple row. */
final case class Triple(convId: String, subj: String, pred: String, obj: String)
