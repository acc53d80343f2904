package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Referential-integrity-preserving pseudonymization — the anonymized-
  * export path of the privacy tier (sits beside the k-anonymity census
  * and the right-to-be-forgotten cascade in QualityQueries).
  *
  * A key is replaced by a deterministic KEYED hash token
  * `hex60(md5(salt:key))`. Because the token is a pure function of
  * (salt, key), every table stamps its own foreign keys independently —
  * a map-only pass per table with NO mapping-table join and no
  * coordination — yet joins across the pseudonymized tables still line
  * up exactly (same key ⇒ same token). Rotating the salt produces a new
  * unlinkable epoch, which is the standard re-identification defence:
  * tokens from different epochs cannot be joined.
  *
  * At 100 TB this matters: the naive design (generate a mapping table,
  * join it into every fact table) costs one shuffle join per table and
  * makes the mapping table itself a skew/secret-handling liability. The
  * keyed hash costs one codegen'd md5 per row and the salt travels as a
  * literal in the plan.
  *
  * The 60-bit token space makes accidental collision (two keys → one
  * token, which would SILENTLY MERGE two identities) a birthday-bound
  * event: ~N²/2⁶¹, i.e. ~10⁻⁶ at 50M distinct keys. The audit query
  * (q_dq_pseudonym) counts distinct tokens against distinct keys per
  * partition-of-interest so a collision is observed, not assumed absent.
  *
  * Reference scope note: the reference ETL (src/index.ts runPipeline)
  * ships rows to SaaS sinks verbatim; pseudonymized export is the
  * warehouse-side capability a compliance pipeline adds on top.
  */
object Pseudonym {

  /** Deterministic keyed pseudonym of `key` under `salt`: a 60-bit
    * non-negative long, identical across tables and engines (DuckDB
    * spelling: `hex60(md5(salt || ':' || key))`).
    */
  def token(key: Column, salt: String): Column =
    Dedup.hex60(md5(concat(lit(salt), lit(":"), key.cast("string")).cast("binary")))
}
