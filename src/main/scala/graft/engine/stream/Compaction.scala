package graft.engine.stream

import org.apache.spark.sql.{DataFrame, SparkSession}

/** s_sink_compact: OPTIMIZE-style bin-packing compaction for a streaming
  * parquet landing ([[Streams.parquetSink]]).
  *
  * At production cadence the exactly-once file sink writes a few files
  * per micro-batch — thousands of tiny files per day, the classic
  * small-files problem (reference `K:41`'s 5 s cadence would land 17k
  * files/day): scan parallelism collapses into per-file open overhead and
  * the NameNode/listing cost grows without bound. This operator rewrites
  * the landed small files into target-size files WITHOUT breaking the
  * landing's exactly-once story:
  *
  *  - The sink's own `_spark_metadata` manifest stays untouched and keeps
  *    committing new batches while compaction runs.
  *  - Compaction reads a snapshot of the committed file list, greedily
  *    bin-packs files into ≤ `targetBytes` bins (first-fit over a
  *    size-descending order — the Delta OPTIMIZE shape), and rewrites
  *    each multi-file bin as ONE file under `_graft_compaction/`. Each
  *    bin is an independent Spark job (at cluster scale they run
  *    concurrently; no shuffle — a coalesced read-write per bin).
  *  - Visibility flips via an OVERLAY manifest: `MANIFEST-<gen>.json`
  *    records which sink files are `replaced` and which `compacted`
  *    files stand in for them. The commit point is an ATOMIC RENAME of
  *    the manifest itself, `MANIFEST-<gen>.json.tmp → MANIFEST-<gen>
  *    .json` — a FRESH destination every generation, so the rename
  *    never needs to overwrite (rename-over-existing is exactly what
  *    the HDFS contract forbids and S3A degrades to copy+delete; a
  *    mutable CURRENT pointer swapped by rename would break on the
  *    storage this feature targets). Readers resolve the HIGHEST
  *    committed manifest — `max(gen) → (sink-committed ∖ replaced) ∪
  *    compacted` — so a reader sees either the old generation or the
  *    new one, never a half-compacted mix, and a crash at any point
  *    leaves either no new manifest (old generation stays current) or
  *    a complete one (new generation is current). Replaced files are
  *    NOT deleted by [[compact]] (a reader holding the old file list
  *    keeps working); [[vacuum]] reclaims them later, after which the
  *    directory is readable through [[read]] only.
  *  - Batches the sink lands DURING compaction are invisible to the
  *    snapshot, land in `_spark_metadata` as usual, and are picked up by
  *    [[read]] immediately (they are committed and not in `replaced`).
  *
  * Deterministic: bins depend only on the (path-sorted) snapshot and
  * sizes, so a re-run plans the same bins.
  */
object Compaction {
  private val MetaDir = "_graft_compaction"

  /** One planned rewrite: the small files a bin replaces. */
  final case class Bin(files: Seq[String], bytes: Long)

  final case class Result(gen: Long, binsRewritten: Int,
                          filesBefore: Int, filesAfter: Int)

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())

  private val ManifestName = """MANIFEST-(\d+)\.json""".r

  /** Generations committed so far, ascending — each `MANIFEST-<gen>.json`
    * is immutable once renamed into place, so the listing IS the log. */
  private def committedGens(f: org.apache.hadoop.fs.FileSystem,
                            dir: String): Seq[Long] = {
    val meta = new org.apache.hadoop.fs.Path(s"$dir/$MetaDir")
    if (!f.exists(meta)) Seq.empty
    else f.listStatus(meta).toSeq.flatMap(_.getPath.getName match {
      case ManifestName(g) => Some(g.toLong)
      case _               => None
    }).sorted
  }

  /** The sink's committed data files (manifest-aware — orphans from torn
    * writes are excluded, exactly as a metadata-aware read would). With a
    * schema hint, resolution touches ONLY the `_spark_metadata` log (no
    * data-file footer read) — required after [[vacuum]] has deleted
    * replaced files the sink log still lists. */
  private def sinkFiles(spark: SparkSession, dir: String,
      schemaHint: Option[org.apache.spark.sql.types.StructType] = None): Seq[String] =
    (schemaHint match {
      case Some(sc) => spark.read.schema(sc).parquet(dir)
      case None     => spark.read.parquet(dir)
    }).inputFiles.toSeq.sorted

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** Overlay manifest: generation + replaced sink files + their
    * stand-ins + the full resolved file SNAPSHOT as of commit time (what
    * makes a generation a pinnable point-in-time view — without it, a
    * "past" read would leak every sink batch landed since). */
  final case class Manifest(gen: Long, replaced: Set[String],
                            compacted: Seq[String], snapshot: Seq[String])

  private def writeManifest(spark: SparkSession, dir: String, m: Manifest): Unit = {
    val f = fs(spark, dir)
    val p = new org.apache.hadoop.fs.Path(s"$dir/$MetaDir/MANIFEST-${m.gen}.json")
    val body =
      s"""{"gen":${m.gen},""" +
      s""""replaced":[${m.replaced.toSeq.sorted.map("\"" + esc(_) + "\"").mkString(",")}],""" +
      s""""compacted":[${m.compacted.sorted.map("\"" + esc(_) + "\"").mkString(",")}],""" +
      s""""snapshot":[${m.snapshot.sorted.map("\"" + esc(_) + "\"").mkString(",")}]}"""
    // commit point: the manifest rename itself. The destination is a
    // fresh, monotonically named file, so the rename never overwrites —
    // safe on HDFS (rename-to-existing fails) and S3A (copy+delete)
    // alike. A crash before the rename leaves only the .tmp, which
    // readers ignore; after it, the generation is fully committed.
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/$MetaDir/MANIFEST-${m.gen}.json.tmp")
    val out = f.create(tmp, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    require(f.rename(tmp, p), s"manifest commit failed for gen ${m.gen} (already exists?)")
  }

  private def readSmallJson(f: org.apache.hadoop.fs.FileSystem,
                            p: org.apache.hadoop.fs.Path): String = {
    val in = f.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val b = new Array[Byte](8192)
      var n = in.read(b)
      while (n >= 0) { buf.write(b, 0, n); n = in.read(b) }
      new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  private def parseManifest(f: org.apache.hadoop.fs.FileSystem,
                            p: org.apache.hadoop.fs.Path): Manifest = {
    val json = org.json4s.jackson.JsonMethods.parse(readSmallJson(f, p))
    import org.json4s._
    implicit val fmts: Formats = DefaultFormats
    Manifest((json \ "gen").extract[Long],
      (json \ "replaced").extract[Seq[String]].toSet,
      (json \ "compacted").extract[Seq[String]],
      (json \ "snapshot").extract[Seq[String]])
  }

  /** The live overlay manifest, if a compaction has committed: the
    * HIGHEST `MANIFEST-<gen>.json` in the metadata dir. No pointer file
    * to fall out of sync — the listing is the source of truth, so a
    * directory with manifests can never silently resolve to the raw
    * sink list. */
  def currentManifest(spark: SparkSession, dir: String): Option[Manifest] = {
    val f = fs(spark, dir)
    committedGens(f, dir).lastOption.map { g =>
      parseManifest(f, new org.apache.hadoop.fs.Path(s"$dir/$MetaDir/MANIFEST-$g.json"))
    }
  }

  /** A specific PAST generation's manifest, if its file still exists —
    * every compaction leaves its predecessor manifests in place, so
    * generations form a cheap time-travel log. */
  def manifestAt(spark: SparkSession, dir: String, gen: Long): Option[Manifest] = {
    val f = fs(spark, dir)
    val p = new org.apache.hadoop.fs.Path(s"$dir/$MetaDir/MANIFEST-$gen.json")
    if (f.exists(p)) Some(parseManifest(f, p)) else None
  }

  /** The committed file list a reader resolves RIGHT NOW: sink-committed
    * minus replaced, plus compacted stand-ins. One generation,
    * atomically — the list is derived from a single CURRENT read. */
  def committedFiles(spark: SparkSession, dir: String): Seq[String] =
    currentManifest(spark, dir) match {
      case None => sinkFiles(spark, dir)
      case Some(m) =>
        val hint = m.compacted.headOption.map(p => spark.read.parquet(p).schema)
        (sinkFiles(spark, dir, hint).filterNot(m.replaced) ++ m.compacted).sorted
    }

  /** The partition subpath of a file relative to the landing root —
    * `"lang=en"` for a hive-partitioned sink file, `""` for a root file.
    * Compacted files encode the subpath in their own path
    * (`gen=N/<subpath>/bin=i/part-…`), so both kinds resolve. */
  private[stream] def partSubpath(dir: String, file: String): String = {
    val root = new org.apache.hadoop.fs.Path(dir).toUri.getPath
    val p = new org.apache.hadoop.fs.Path(file).toUri.getPath
    val rel = p.stripPrefix(root).stripPrefix("/")
    val comps = rel.split("/").dropRight(1).toSeq // drop the filename
    if (comps.headOption.contains(MetaDir))
      // _graft_compaction / gen=N [ / partition dirs … ] / bin=i
      comps.drop(2).takeWhile(!_.startsWith("bin=")).mkString("/")
    else comps.mkString("/")
  }

  /** Read an explicit committed-file list with partition columns intact:
    * SINK files read with `basePath` (their partition values are
    * directory-encoded), compacted files read plain (their partition
    * values were materialized INTO the data at rewrite time — reading
    * them under basePath would misparse `gen=N` as a partition). The
    * two sides union by name; on an unpartitioned landing both reads
    * are the trivial identical one. */
  private def readFiles(spark: SparkSession, dir: String,
                        files: Seq[String]): DataFrame = {
    val (meta, sink) = files.partition(_.contains(s"/$MetaDir/"))
    val parts = Seq(
      if (sink.nonEmpty) Some(spark.read.option("basePath", dir).parquet(sink: _*)) else None,
      if (meta.nonEmpty) Some(spark.read.parquet(meta: _*)) else None).flatten
    require(parts.nonEmpty, s"empty landing at $dir")
    parts.reduce(_.unionByName(_))
  }

  /** Manifest-aware read of the landing — the reader every downstream
    * batch job should use once compaction is in play. */
  def read(spark: SparkSession, dir: String): DataFrame =
    readFiles(spark, dir, committedFiles(spark, dir))

  /** Greedy first-fit-decreasing bin-packing; only bins that merge ≥2
    * files are worth a rewrite. Pure — unit-testable without I/O. */
  def plan(files: Seq[(String, Long)], targetBytes: Long): Seq[Bin] = {
    val bins = scala.collection.mutable.ArrayBuffer[(scala.collection.mutable.ArrayBuffer[(String, Long)], Long)]()
    files.sortBy { case (p, sz) => (-sz, p) }.foreach { case (p, sz) =>
      bins.indexWhere(_._2 + sz <= targetBytes) match {
        case -1 => bins += ((scala.collection.mutable.ArrayBuffer((p, sz)), sz))
        case i  => bins(i)._1 += ((p, sz)); bins(i) = (bins(i)._1, bins(i)._2 + sz)
      }
    }
    bins.filter(_._1.size >= 2)
      .map { case (fs0, tot) => Bin(fs0.map(_._1).sortBy(identity).toSeq, tot) }.toSeq
  }

  /** Rewrite the current generation's small files into target-size files
    * and commit the new generation. Readers are never blocked and never
    * see a mix; the operation is idempotent on a layout that is already
    * compact (zero bins → no new generation).
    *
    * `sortCols` (the OPTIMIZE … ORDER BY shape): each bin's rewrite
    * sorts within its single output partition, so the compacted file
    * carries tight per-column min/max footer stats — a downstream
    * filtered read prunes whole compacted files instead of scanning the
    * micro-batch interleaving the stream landed. No extra shuffle: the
    * sort rides the same one-task coalesced write. */
  def compact(spark: SparkSession, dir: String, targetBytes: Long,
              sortCols: Seq[String] = Nil): Result = {
    val f = fs(spark, dir)
    val prior = currentManifest(spark, dir)
    val view = committedFiles(spark, dir)
    val sized = view.map { p =>
      p -> f.getFileStatus(new org.apache.hadoop.fs.Path(p)).getLen
    }
    // PARTITION-AWARE planning: bins never cross a hive partition dir —
    // a bin mixing lang=en with lang=de would destroy the layout's
    // pruning story AND lose the directory-encoded partition values.
    // Each bin's rewrite reads its inputs partition-correctly
    // ([[readFiles]]) so the partition columns are materialized INTO
    // the compacted file (constant per file → tight min/max footer
    // stats, whole-file pruning preserved), and the output lands under
    // `gen=N/<subpath>/bin=i` so a later generation can re-group it.
    val bins = sized.groupBy { case (p, _) => partSubpath(dir, p) }
      .toSeq.sortBy(_._1)
      .flatMap { case (sub, fsz) => plan(fsz, targetBytes).map(b => (sub, b)) }
    val gen = prior.map(_.gen + 1).getOrElse(1L)
    if (bins.isEmpty) return Result(prior.map(_.gen).getOrElse(0L), 0, view.size, view.size)
    val rewrittenInputs = bins.flatMap(_._2.files).toSet
    // each bin: one coalesced read→write job, no shuffle; the output
    // lands under a generation dir so an aborted compaction leaves only
    // unreferenced files (the manifest swap below is the commit point)
    val outputs = bins.zipWithIndex.map { case ((sub, bin), i) =>
      val subSeg = if (sub.isEmpty) "" else s"$sub/"
      val outDir = s"$dir/$MetaDir/gen=$gen/${subSeg}bin=$i"
      val one = readFiles(spark, dir, bin.files).coalesce(1)
      val clustered =
        if (sortCols.isEmpty) one
        else one.sortWithinPartitions(sortCols.map(org.apache.spark.sql.functions.col): _*)
      clustered.write.mode("overwrite").parquet(outDir)
      val part = f.listStatus(new org.apache.hadoop.fs.Path(outDir))
        .map(_.getPath).filter(_.getName.startsWith("part-"))
      require(part.length == 1, s"expected one part file in $outDir")
      part.head.toString
    }
    // replaced accumulates across generations (a sink file once replaced
    // stays replaced); compacted = prior stand-ins that survived this
    // round + the new outputs
    val priorReplaced = prior.map(_.replaced).getOrElse(Set.empty)
    val priorCompacted = prior.map(_.compacted).getOrElse(Seq.empty)
    val m = Manifest(
      gen,
      priorReplaced ++ rewrittenInputs.filterNot(priorCompacted.contains),
      priorCompacted.filterNot(rewrittenInputs) ++ outputs,
      (view.filterNot(rewrittenInputs) ++ outputs).sorted)
    writeManifest(spark, dir, m)
    Result(gen, bins.size, view.size, committedFiles(spark, dir).size)
  }

  /** Read the landing AS OF a past compaction generation — the
    * time-travel face of the overlay log: every compaction leaves its
    * predecessor manifests in place, and each manifest pins the full
    * resolved file snapshot it committed, so generation N stays
    * byte-for-byte reproducible (audits, debugging a downstream
    * regression against "what the reader saw yesterday") until
    * [[vacuum]] reclaims files newer generations replaced. Batches the
    * sink landed AFTER the generation committed are NOT visible — that
    * is the point of a snapshot. */
  def readAt(spark: SparkSession, dir: String, gen: Long): DataFrame = {
    val m = manifestAt(spark, dir, gen).getOrElse(
      throw new IllegalArgumentException(s"no generation $gen at $dir"))
    readFiles(spark, dir, m.snapshot)
  }

  /** Threshold policy: compact only when the resolved view carries at
    * least `minSmallFiles` files under `targetBytes` — the knob that
    * lets a scheduler call this after every batch without paying a
    * rewrite for a landing that is already healthy. Returns None when
    * below threshold (no new generation, no I/O beyond the listing). */
  def maybeCompact(spark: SparkSession, dir: String, targetBytes: Long,
                   minSmallFiles: Int, sortCols: Seq[String] = Nil): Option[Result] = {
    val f = fs(spark, dir)
    val small = committedFiles(spark, dir).count { p =>
      f.getFileStatus(new org.apache.hadoop.fs.Path(p)).getLen < targetBytes
    }
    if (small >= minSmallFiles) Some(compact(spark, dir, targetBytes, sortCols))
    else None
  }

  /** Delete data files the retained generations no longer reference:
    * replaced sink files and superseded older-generation outputs.
    *
    * Two guards make this safe to run while readers and a compactor are
    * active:
    *  - `retainGenerations` (≥ 1): every file in the snapshot of the
    *    newest `retainGenerations` manifests survives, so a reader
    *    pinned to [[readAt]] within the retention window can never have
    *    its snapshot deleted out from under it. Files referenced ONLY
    *    by older generations are reclaimed (their [[readAt]] then
    *    fails on missing files — the documented end of time travel).
    *  - In-flight protection: generation output dirs NEWER than the
    *    current manifest (`gen=N+1/…` written by a concurrently running
    *    [[compact]] whose manifest has not yet committed) are never
    *    touched — they are the next generation's commit in progress,
    *    not orphans.
    *
    * AFTER vacuum the directory is readable only through [[read]] (the
    * sink's `_spark_metadata` still lists the deleted originals), so
    * run it once downstream consumers are manifest-aware. Returns
    * #deleted. */
  def vacuum(spark: SparkSession, dir: String, retainGenerations: Int = 1): Int = {
    require(retainGenerations >= 1, "retainGenerations must be >= 1")
    currentManifest(spark, dir) match {
      case None => 0
      case Some(m) =>
        val f = fs(spark, dir)
        val retainedGens = committedGens(f, dir).takeRight(retainGenerations)
        val live: Set[String] = retainedGens.flatMap { g =>
          manifestAt(spark, dir, g).toSeq.flatMap(mm => mm.snapshot ++ mm.compacted)
        }.toSet
        val GenDir = """/gen=(\d+)/""".r.unanchored
        // recursive listing (not a fixed-depth glob): partitioned
        // landings nest partition dirs between gen=N and bin=i
        val allGenParts = {
          val buf = scala.collection.mutable.ArrayBuffer[String]()
          val meta = new org.apache.hadoop.fs.Path(s"$dir/$MetaDir")
          if (f.exists(meta)) {
            val it = f.listFiles(meta, true)
            while (it.hasNext) {
              val st = it.next()
              val p = st.getPath.toString
              if (st.getPath.getName.startsWith("part-") && p.contains("/gen=")) buf += p
            }
          }
          buf.toSeq
        }
        val genOrphans = allGenParts
          .filter {
            case GenDir(g) => g.toLong <= m.gen // never touch in-flight gens
            case _         => false
          }
          .filterNot(live)
        val victims = m.replaced.toSeq.filterNot(live) ++ genOrphans
        victims.count(p => f.delete(new org.apache.hadoop.fs.Path(p), false))
    }
  }
}
