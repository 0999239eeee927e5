package graft.compile

/** Shared schema fixtures. */
object Fixtures {
  /** FIXTURES.md §2 flagship constraint schema over the transcripts table. */
  val flagshipSchema: String = """
  {
    "$schema": "http://json-schema.org/draft-04/schema#",
    "id": "http://graft.local/transcripts#",
    "type": "object",
    "required": ["conv_id", "turn_idx", "role", "text", "ts"],
    "properties": {
      "conv_id":  { "type": "string", "minLength": 1, "pattern": "^c[0-9]+$" },
      "turn_idx": { "type": "integer", "minimum": 0, "maximum": 4096 },
      "role":     { "type": "string", "enum": ["system", "user", "assistant", "tool"] },
      "text":     { "type": "string", "minLength": 0, "maxLength": 65536 },
      "tool":     { "$ref": "#/definitions/toolName" },
      "ts":       { "type": "string", "format": "date-time" }
    },
    "definitions": {
      "toolName": { "type": "string", "pattern": "^[a-z][a-z0-9_]*$" }
    },
    "dependencies": { "tool": ["role"] }
  }"""
}
