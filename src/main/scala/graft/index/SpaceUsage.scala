package graft.index

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Space-usage introspection (reference `src/space_usage/mod.rs`:
  * `SearcherSpaceUsage` / `SegmentSpaceUsage` / `PerFieldSpaceUsage`).
  *
  * The reference attributes exact on-disk bytes per (segment, component,
  * field) because each segment owns one file per component. Here segments
  * share batch-partitioned Parquet files, so the accounting is two-level
  * and honest about which is which:
  *  - per-COMPONENT on-disk bytes are EXACT (file sums over the manifest's
  *    live batch directories — dead batches awaiting GC are excluded);
  *  - per-(segment, field) figures are LOGICAL units read from the index
  *    tables (terms, postings, positions, docs), plus an estimated byte
  *    share = component bytes x the segment's row share.
  */
object SpaceUsage {

  final case class ComponentUsage(component: String, bytes: Long, files: Int)

  final case class FieldUsage(segId: Int, field: String, numTerms: Long,
      totalDocFreq: Long, totalPositions: Long, estPostingsBytes: Long)

  final case class SegmentUsage(segId: Int, numDocs: Long,
      estStoreBytes: Long, perField: Seq[FieldUsage]) {
    def totalEstBytes: Long = estStoreBytes + perField.map(_.estPostingsBytes).sum
  }

  final case class IndexUsage(components: Seq[ComponentUsage],
      segments: Seq[SegmentUsage]) {
    /** `SearcherSpaceUsage::total` — exact on-disk total. */
    def totalBytes: Long = components.map(_.bytes).sum
    def component(name: String): Option[ComponentUsage] =
      components.find(_.component == name)
  }

  private def dirBytes(dir: java.io.File): (Long, Int) = {
    if (!dir.exists()) return (0L, 0)
    var bytes = 0L; var files = 0
    def walk(f: java.io.File): Unit =
      // listFiles() returns null if the directory vanished mid-walk (a
      // concurrent dead-batch GC, which this accounting deliberately
      // excludes) or is unreadable — tolerate the race, don't NPE
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(walk)
      else if (f.getName.endsWith(".parquet")) { bytes += f.length(); files += 1 }
    walk(dir)
    (bytes, files)
  }

  /** Full usage report for the manifest-pinned snapshot at `indexDir`. */
  def of(spark: SparkSession, indexDir: String): IndexUsage = {
    import spark.implicits._
    val meta = Manifest.read(indexDir)
    val liveBatches = meta.segments.map(_.batch).distinct.sorted
    val liveSegs = meta.segments.map(_.segId)

    val components = Seq("postings", "docmap", "termdict", "stats", "deletes").map {
      case "deletes" =>
        val (b, f) = dirBytes(new java.io.File(s"$indexDir/deletes"))
        ComponentUsage("deletes", b, f)
      case comp =>
        val sums = liveBatches.map(b =>
          dirBytes(new java.io.File(s"$indexDir/$comp/batch=$b")))
        ComponentUsage(comp, sums.map(_._1).sum, sums.map(_._2).sum)
    }
    val postingsBytes = components.find(_.component == "postings").map(_.bytes).getOrElse(0L)
    val storeBytes = components.find(_.component == "docmap").map(_.bytes).getOrElse(0L)

    // logical per-(segment, field) accounting from the postings table: one
    // aggregate over the pruned scan, tiny output (#segments x #fields rows)
    val postings = spark.read.parquet(s"$indexDir/postings")
      .where($"segId".isin(liveSegs: _*))
    val posCol =
      if (postings.columns.contains("positions"))
        sum(aggregate($"positions", lit(0), (acc, p) => acc + size(p)))
      else sum(lit(0L)) // index built withPositions=false
    val perField = postings
      .groupBy($"segId", $"field")
      .agg(count_distinct($"term").as("numTerms"),
        sum(size($"docIds")).as("totalDocFreq"),
        posCol.as("totalPositions"))
      .as[(Int, String, Long, Long, Long)].collect()
    val totalDf = math.max(perField.map(_._4).sum, 1L)
    val totalRows = math.max(meta.segments.map(_.rows).sum, 1L)

    val segments = meta.segments.sortBy(_.segId).map { s =>
      val fields = perField.filter(_._1 == s.segId).sortBy(_._2).map {
        case (seg, fld, terms, df, posn) =>
          FieldUsage(seg, fld, terms, df, posn,
            estPostingsBytes = postingsBytes * df / totalDf)
      }
      SegmentUsage(s.segId, s.rows,
        estStoreBytes = storeBytes * s.rows / totalRows, fields.toSeq)
    }
    IndexUsage(components, segments)
  }
}
