package graft.model

/** Core data model of the validation engine.
  *
  * The instance corpus is a fixed-schema table of interleaved text+media
  * documents (BASELINE.json `input_hint`):
  *
  * {{{
  * doc_id: string,
  * spans:  array<struct<kind: string, text: string, media_ref: string, offset: int>>,
  * part:   int      -- partition column; verdicts/checkpoints are per part
  * }}}
  *
  * One row of `Dataset[Doc]` plays the role of one YAML instance document in
  * the reference (`/root/reference/src/engine.rs:37-59` parses exactly one
  * document per run); a `Violation` row plays the role of the reference's
  * `ValidationError { path, marker, error }`
  * (`/root/reference/src/validation.rs:23-31`) with `doc_id` + JSON-pointer
  * style `path` replacing the single-file `line:col` marker.
  */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

final case class Doc(doc_id: String, spans: Seq[Span], part: Int)

/** Violation row — the engine's error sink, set-at-a-time.
  *
  * `path` is dot-joined like the reference's `Context.current_path`
  * (`/root/reference/src/validation/context.rs:61-63`), e.g. `spans.3.kind`.
  * `rule` names the keyword that fired (type/enum/pattern/minimum/...).
  * `message` preserves the reference's exact message strings (SURVEY.md §2.8).
  */
final case class Violation(doc_id: String, path: String, rule: String, message: String)

/** Per-partition verdict row — the distributed analogue of the reference
  * CLI's process exit code (0 pass / 1 fail, `/root/reference/src/bin/ys.rs:215-243`).
  */
final case class Verdict(part: Int, docs: Long, failed_docs: Long, violations: Long, pass: Boolean)

/** Media catalog row for referential-integrity checks (FIXTURES.md §1). */
final case class MediaAsset(media_ref: String, mime: String, bytes: Long)
