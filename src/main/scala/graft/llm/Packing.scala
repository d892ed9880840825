package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Sequence packing: assign documents to fixed-budget training shards
 * ("pack ~N tokens per context window / output file").
 *
 * Policy is FIXED-BOUNDARY packing: documents are laid on a line in a
 * deterministic order and a document belongs to the bin where its first
 * token falls (`floor(exclusive_prefix_sum / budget)`). A document may
 * straddle a boundary — the consumer that concatenates bins back-to-back
 * sees the identical token stream either way, and unlike best-fit/greedy
 * bin packing this is (a) a pure window expression any engine can
 * recompute, and (b) embarrassingly parallel: one shuffle on `groupCols`,
 * one running sum — no sequential packer on the driver.
 *
 * Bins are per group (e.g. per language), sized within ~1 document of
 * `budget`, and stable under append-only growth when `orderCols` is an
 * append-monotonic key.
 */
object Packing {

  private def orderable(dt: DataType): Boolean = dt match {
    case _: NumericType | StringType | BooleanType | DateType |
         TimestampType | TimestampNTZType | BinaryType => true
    case _ => false
  }

  /** Adds `bin` (0-based long per group) and `offset` (the document's
    * exclusive running-size start within its group).
    *
    * Determinism: the running sum is only well-defined under a TOTAL
    * per-group order, so the window ordering is `orderCols` extended by
    * `sizeCol` and every remaining orderable (atomic-typed) column as
    * tie-breaks. Rows identical across ALL those columns share a size,
    * so every OFFSET and the multiset of (bin, offset) slots is
    * deterministic even when `orderCols` alone has ties — but which of
    * two such rows lands in which slot is only pinned down to the
    * orderable columns: rows that differ solely in NON-orderable columns
    * (arrays/maps/structs, which Spark cannot sort by) may swap slots
    * across runs. Callers needing full row-level determinism should put
    * a unique id in `orderCols`. */
  def packSequences(df: DataFrame, groupCols: Seq[String],
                    orderCols: Seq[String], sizeCol: String,
                    budget: Long,
                    binCol: String = "bin", offsetCol: String = "offset"): DataFrame = {
    require(groupCols.nonEmpty && orderCols.nonEmpty, "packSequences needs group and order columns")
    require(budget > 0, s"budget must be positive, got $budget")
    val explicit = (groupCols ++ orderCols).toSet
    val tieBreaks = (Seq(sizeCol).filterNot(explicit.contains) ++
      df.schema.fields
        .filter(f => !explicit.contains(f.name) && f.name != sizeCol &&
          orderable(f.dataType))
        .map(_.name).sorted)
    val w = Window.partitionBy(groupCols.map(c => col(s"`$c`")): _*)
      .orderBy((orderCols ++ tieBreaks).map(c => col(s"`$c`")): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix: Column = coalesce(sum(col(s"`$sizeCol`").cast("long")).over(w), lit(0L))
    // prefix is a non-negative long well under 2^53, so the double
    // division in floor() is exact for the bin index.
    df.withColumn(offsetCol, prefix)
      .withColumn(binCol, floor(col(offsetCol) / lit(budget.toDouble)).cast("long"))
  }

  /** The standing pack state behind [[packSequencesFrom]]: per-group
    * packed size so far, `(groupCols…, packed_total)`. Persist after
    * each epoch; it is all the next epoch needs — group-count-sized,
    * not corpus-sized. */
  def packTotals(df: DataFrame, groupCols: Seq[String],
                 sizeCol: String, totalCol: String = "packed_total"): DataFrame =
    df.groupBy(groupCols.map(c => col(s"`$c`")): _*)
      .agg(sum(col(s"`$sizeCol`").cast("long")).as(totalCol))

  /** INCREMENTAL [[packSequences]]: pack a new batch onto the end of a
    * standing corpus given only its persisted [[packTotals]] — each
    * group's line continues from `packed_total`, so day N's cost is
    * O(batch) and the result equals re-packing the full corpus with
    * epochs concatenated in order (SamplingSpec pins the equivalence;
    * groups unseen in the state start at offset 0). The totals side is
    * group-count-sized, so its join broadcasts. */
  def packSequencesFrom(batch: DataFrame, baseTotals: DataFrame,
                        groupCols: Seq[String], orderCols: Seq[String],
                        sizeCol: String, budget: Long,
                        binCol: String = "bin", offsetCol: String = "offset",
                        totalCol: String = "packed_total"): DataFrame = {
    val local = packSequences(batch, groupCols, orderCols, sizeCol, budget,
      binCol, offsetCol)
    local
      .join(broadcast(baseTotals.select(
        (groupCols.map(c => col(s"`$c`")) :+ col(s"`$totalCol`")): _*)),
        groupCols, "left")
      .withColumn(offsetCol,
        col(s"`$offsetCol`") + coalesce(col(s"`$totalCol`"), lit(0L)))
      .withColumn(binCol,
        floor(col(s"`$offsetCol`") / lit(budget.toDouble)).cast("long"))
      .drop(totalCol)
  }

  /** Materialize packed bins as TRAINING SHARDS: one row per
    * (group, bin) with the member documents concatenated in pack order
    * around `sep` — the terminal "write the pretraining files" step.
    * In-shard order is pinned by (offset, text): offsets strictly
    * increase for positive sizes, and zero-size rows (which share an
    * offset) fall back to the text itself, so the shard string is
    * deterministic in any engine. One shuffle on (group, bin), and the
    * aggregate state per key is bounded by the pack budget plus
    * separators — safe at any corpus size because [[packSequences]]
    * already capped what lands in a bin. */
  def exportShards(packed: DataFrame, groupCols: Seq[String],
                   textCol: String = "text", sep: String = "<|eos|>",
                   binCol: String = "bin",
                   offsetCol: String = "offset"): DataFrame = {
    val gcols = (groupCols :+ binCol).map(c => col(s"`$c`"))
    packed.groupBy(gcols: _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col(s"`$textCol`")).cast("long")).as("n_chars_total"),
        array_join(
          transform(
            array_sort(collect_list(
              struct(col(s"`$offsetCol`").as("o"), col(s"`$textCol`").as("t")))),
            x => x.getField("t")),
          sep).as("shard_text"))
  }

  /** Materialize [[exportShards]] as ACTUAL FILES under `dir` — the
    * step a pretraining data-loader consumes: one UTF-8 text file per
    * (group, bin), deterministically named
    * `shard-<urlenc(group…)>-<bin>.txt` (URL-encoding keeps arbitrary
    * group values filesystem-safe and injective; the returned manifest
    * is the authoritative file ↔ (group, bin) map). Returns the
    * manifest — the [[exportShards]] columns plus `shard_file` and
    * `shard_bytes` — materialized eagerly, so when this method returns
    * every file is on disk.
    *
    * Scale shape: the write IS the shard aggregation's output pass —
    * each executor writes its own shards straight to the shared
    * FileSystem (fresh per-executor Hadoop conf, same convention as
    * [[graft.sources.RemoteFileClient.fetchFilesDistributed]]); no
    * driver collection, no repartition beyond exportShards' one
    * (group, bin) shuffle, and per-file bytes are bounded by the pack
    * budget. Deterministic names + byte-identical content make task
    * retries idempotent (publish is write-tmp-then-rename, last
    * writer wins with identical bytes). */
  def writeShards(packed: DataFrame, dir: String, groupCols: Seq[String],
                  textCol: String = "text", sep: String = "<|eos|>",
                  binCol: String = "bin",
                  offsetCol: String = "offset"): DataFrame = {
    import org.apache.spark.sql.Row
    val shards = exportShards(packed, groupCols, textCol, sep, binCol, offsetCol)
    val gIdx = groupCols.map(shards.schema.fieldIndex)
    val binIdx = shards.schema.fieldIndex(binCol)
    val textIdx = shards.schema.fieldIndex("shard_text")
    val outSchema = shards.schema
      .add("shard_file", StringType).add("shard_bytes", LongType)
    val manifest = shards.mapPartitions { rows =>
      // fresh per-executor conf: resolves the same shared FS from
      // core-site on a cluster (see fetchFilesDistributed)
      val conf = new org.apache.hadoop.conf.Configuration()
      val target = new org.apache.hadoop.fs.Path(dir)
      val fs = target.getFileSystem(conf)
      // a shard dir is consumed by plain data loaders — no Hadoop-local
      // .crc sidecar litter (no-op on filesystems with internal checksums)
      fs.setWriteChecksum(false)
      fs.mkdirs(target)
      rows.map { r =>
        val enc = gIdx.map(i =>
          java.net.URLEncoder.encode(String.valueOf(r.get(i)), "UTF-8"))
        val name = (("shard" +: enc) :+ String.valueOf(r.get(binIdx)))
          .mkString("-") + ".txt"
        val bytes = r.getString(textIdx)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val tmp = new org.apache.hadoop.fs.Path(target,
          s".$name.${java.util.UUID.randomUUID.toString.take(8)}.tmp")
        val os = fs.create(tmp, true)
        try os.write(bytes) finally os.close()
        val fin = new org.apache.hadoop.fs.Path(target, name)
        fs.delete(fin, false)
        if (!fs.rename(tmp, fin))
          throw new java.io.IOException(s"could not publish shard $fin")
        Row.fromSeq(r.toSeq :+ name :+ bytes.length.toLong)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    // eager: a lazy manifest would defer (or repeat) the side-effecting
    // write with every downstream action
    manifest.localCheckpoint()
  }
}
