package graft.meta

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Metadata-column convention shared by every write pattern.
 *
 * Mirrors the reference's `METADATA_COLUMNS` map and hash recipe
 * (reference: projectoneflow/src/projectoneflow/core/execution/write.py:15-24,
 * hash construction write.py:103-134): every hash is
 * `md5(concat_ws("|", coalesce(cast(col as string), '') ...))`, and all
 * metadata column names are renameable per-output via
 * `extra_options.rename_metadata_columns`
 * (reference: core/schemas/sources.py:151-154).
 */
object Meta {
  val KeyHash       = "__metadata_key_hash__"
  val DataHash      = "__metadata_data_hash__"
  val ValidToTs     = "__metadata_valid_to_ts__"
  val ValidFromTs   = "__metadata_valid_from_ts__"
  val Active        = "__metadata_active__"
  val InsertTs      = "__metadata_insert_ts__"
  val UpdateTs      = "__metadata_update_ts__"
  val ColumnKeyHash = "__metadata_column_key_hash__"

  val All: Seq[String] =
    Seq(KeyHash, DataHash, ValidToTs, ValidFromTs, Active, InsertTs, UpdateTs, ColumnKeyHash)

  /** The end-of-time sentinel used for open SCD2 rows (write.py:680-682). */
  val HighDate = "9999-12-31"

  /** Resolved (possibly renamed) metadata column names for one output. */
  final case class Names(rename: Map[String, String] = Map.empty) {
    def apply(canonical: String): String = rename.getOrElse(canonical, canonical)
    def keyHash: String       = apply(KeyHash)
    def dataHash: String      = apply(DataHash)
    def validToTs: String     = apply(ValidToTs)
    def validFromTs: String   = apply(ValidFromTs)
    def active: String        = apply(Active)
    def insertTs: String      = apply(InsertTs)
    def updateTs: String      = apply(UpdateTs)
    def columnKeyHash: String = apply(ColumnKeyHash)
  }

  /** `coalesce(cast(col as string), '')` — the hash input normalization. */
  def hashInput(c: Column): Column = coalesce(c.cast("string"), lit(""))

  /** `md5(concat_ws("|", ...))` over already-normalized inputs. */
  def rowHash(cols: Seq[Column]): Column = md5(concat_ws("|", cols: _*))

  /** Hash of named columns of the current scope. */
  def hashOf(colNames: Seq[String]): Column =
    rowHash(colNames.map(n => hashInput(col(n))))

  /** Hash of named columns under a dataframe alias (e.g. "target"). */
  def hashOfAliased(alias: String, colNames: Seq[String]): Column =
    rowHash(colNames.map(n => hashInput(col(s"$alias.$n"))))

  /** Active-flag values, remappable via `active_record_value_mapping`
    * (reference: sources.py:155-158, write.py:616-624). */
  final case class ActiveValues(yes: String = "Y", no: String = "N")
}
