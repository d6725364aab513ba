package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** RIGHT-TO-BE-FORGOTTEN maintenance for the persisted partitioned
  * index families — the ONE copy of the victim-partition rewrite
  * protocol behind `CopyIndex.forget`, `Phrase.forget`, `Ivf.forget`
  * (and through it the IVF-PQ shelf) and `Bm25Index.forget`. The
  * reference's serving store deletes a document by `_id` natively
  * (README.md:455-457, the OpenSearch DELETE walkthrough); an
  * engine-owned index has to express the same request as a partition
  * rewrite.
  *
  * Cost model (the 100 TB posture): ONE column-pruned scan of
  * (idCol, partCol) finds the victim partitions — parquet reads two
  * small columns, never payloads — then ONLY those partitions rewrite.
  * A single document's rows live in 1 cell (IVF), |terms| buckets
  * (postings) or |selections| buckets (winnow fingerprints) — bounded
  * by the VICTIM's size, not the index's. Deleting most of an index
  * this way degenerates to a full rewrite; delete-heavy deployments
  * should batch ids into one forget() call (one scan, one rewrite per
  * touched partition — NOT one pass per id).
  *
  * Crash safety: partition swaps cannot be atomic as a group, so a
  * `_FORGET_INPROGRESS` marker fences the whole operation — every
  * probe choke point ([[assertClean]]) refuses a marked index LOUDLY
  * instead of silently serving half-forgotten answers. Each partition
  * swap is recoverable at every window (write tmp → retire dir to
  * trash → publish tmp → drop trash); re-running forget first heals
  * any leftovers ([[repair]]) and then re-filters, so the retry is
  * idempotent. */
object IndexForget {

  /** Operation fence: exists while (or after a crash of) a forget().
    * Probes refuse an index carrying it. */
  val Marker = "_FORGET_INPROGRESS"

  private val TmpPrefix = ".forget_tmp."
  private val TrashPrefix = ".forget_trash."
  // staged bulk-forget siblings (dot-prefixed: invisible to partition
  // discovery and to every `batch_id=`/`consol_id=` listing). The
  // staging's commit point is its own dot-file, NOT the rebuild job's
  // `_SUCCESS`: sidecar entries (a CopyIndex `_FANOUT`, any family
  // metadata living beside the partition dirs) copy into the staging
  // AFTER the job commit, and a staging missing them must never count
  // as publishable.
  private val StagePrefix = ".forget_stage."
  private val OldPrefix = ".forget_old."
  private val StageComplete = ".stage_complete"

  /** Victim-partition fraction at or above which [[forget]] switches
    * from victim-by-victim dir swaps to the STAGED survivors rebuild:
    * one whole-index rewrite job + one publish swap instead of 2+
    * Spark jobs and 3 metadata round-trips PER victim partition. Pass
    * `stagedFraction <= 0` to force the staged path, or `> 1` to pin
    * the per-dir path, regardless of the victim fraction. */
  val StagedRebuildFraction = 0.3

  /** Absolute victim-dir floor for the AUTOMATIC staged switch: below
    * this many victim partitions the sequential path is a handful of
    * small jobs whatever the fraction reads (a 3-split corpus batch
    * dir with one victim split is "33% of partitions" but one cheap
    * rewrite), while the staged path always pays a whole-index read +
    * write. Only past both gates — many victim dirs AND a large
    * fraction — does the full rebuild win. */
  val StagedMinVictimParts = 33

  /** Composition fence for MULTI-STEP forgets (the streaming tenants,
    * the BM25 sidecar family): the caller plants the marker at its own
    * root BEFORE the first step and clears it after the last, so a
    * crash BETWEEN steps — where every per-dir marker has already
    * cleared — still fences the whole surface. Pair with
    * [[assertClean]] at the family's read choke points. */
  def fence(spark: SparkSession, root: String): Unit = {
    val (fs, p) = fsPath(spark, root)
    touch(fs, new Path(p, Marker))
  }

  /** Clear a [[fence]] — only after every step of the composition
    * committed. */
  def unfence(spark: SparkSession, root: String): Unit = {
    val (fs, p) = fsPath(spark, root)
    fs.delete(new Path(p, Marker), false): Unit
  }

  /** Probe-side guard: refuse to read an index a forget() died on —
    * a half-rewritten index would silently serve partial answers (the
    * "no copies found" failure mode the fan-out marker exists for,
    * now for deletions). Re-running forget with the same ids heals
    * the layout and clears the fence. */
  def assertClean(spark: SparkSession, root: String): Unit = {
    val (fs, p) = fsPath(spark, root)
    require(!fs.exists(new Path(p, Marker)),
      s"a forget() is in progress (or died mid-rewrite) under $root — " +
        "re-run forget with the same ids to heal before probing")
  }

  /** Delete every row of `ids` from the `partCol=`-partitioned index
    * rooted at `root`, rewriting only the partitions that hold victim
    * rows. Returns the rewritten partition values (empty = no victim
    * rows existed; nothing was touched). Idempotent: a re-run finds no
    * victims and returns empty.
    *
    * `holdFence` mirrors [[forgetWhere]]'s: a caller that FENCED this
    * same root for a multi-step composition passes true, and none of
    * the return paths below drop the root marker — without it, the
    * no-victim early returns would silently clear the composition
    * fence mid-forget (the caller's other steps are not done). No
    * production composition currently fences the same root it passes
    * here (every tenant's fence lives one level up), so the parameter
    * is a guard for FUTURE compositions — ForgetSpec exercises all
    * three return paths under a held fence. */
  def forget(spark: SparkSession, root: String, partCol: String,
             idCol: String, ids: Seq[Long],
             holdFence: Boolean = false,
             stagedFraction: Double = StagedRebuildFraction): Seq[String] = {
    require(ids.nonEmpty, "forget needs at least one id")
    val (fs, rootP) = fsPath(spark, root)
    // staged-swap heal FIRST: a crash between the staged path's two
    // publish renames leaves the root itself MISSING (retired to its
    // .forget_old. sibling) — the existence check below must see the
    // restored/published root, not refuse a healable layout
    repairStaged(fs, rootP)
    require(fs.exists(rootP), s"no index at $root")
    // a marker at entry means an earlier forget TORE here: the fence
    // must stay up through repair AND the victim re-scan — dropping it
    // early would let a concurrent probe silently read a
    // partially-forgotten index before this heal confirms the layout.
    // It clears on every return path below, once the re-filter proves
    // the index whole (or the rewrite completes).
    val torn = fs.exists(new Path(rootP, Marker))
    repair(fs, rootP, keepMarker = holdFence || torn)
    // ONE root listing serves the fileless check here, the staged-switch
    // partition count below, AND the victim-value → dir-name resolution
    // (metadata round-trips are billed calls on object stores)
    val partDirVals = fs.listStatus(rootP).iterator
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(partCol + "="))
      .map(_.getPath.getName.stripPrefix(partCol + "=")).toSeq
    val partCount = partDirVals.size
    // a FILELESS root (an empty batch's committed dir: markers only, no
    // partition dirs) holds zero rows — return before the victim scan,
    // whose schema inference would throw and strand any caller-held
    // fence (the streaming tenants iterate forget over batch dirs)
    if (partCount == 0) {
      if (!holdFence) fs.delete(new Path(rootP, Marker), false): Unit
      return Nil
    }
    // batch-forget plan note: isin over thousands of ids is SAFE —
    // Catalyst's OptimizeIn rewrites In(col, >10 literals) to InSet, a
    // single hash-set expression node (no codegen-budget growth, O(1)
    // per row), so one batched call over 50k ids keeps the lean
    // filter-only plan a join-based victim test would trade for an
    // extra broadcast stage per partition rewrite
    // victim partitions: one column-pruned (idCol, partCol) scan — the
    // only whole-index read; everything below touches victim dirs only.
    // Parameter-sized collect: ≤ P partition values by construction.
    val victimVals = spark.read.option("basePath", root).parquet(root)
      .filter(col(idCol).isin(ids: _*))
      .select(col(partCol).cast("string")).distinct()
      .collect().map(r => Option(r.getString(0))).toSeq
    // Resolve inferred partition VALUES back to on-disk dir names (r18
    // ADVICE fix, widened r19): partition discovery CANONICALIZES
    // values ("00" → int 0 → "0"), PATH-ESCAPES special characters on
    // write (':' → '%3A' in the dir name, unescaped at discovery), and
    // maps a NULL partition value to the __HIVE_DEFAULT_PARTITION__ dir
    // — so regenerating `partCol=<value>` from the scan would miss such
    // dirs outright. A value claims every dir whose suffix matches it
    // raw or UNESCAPED (Hive unescapePathName — discovery's own
    // inverse), exactly or as the same number; a null value claims the
    // default-partition dir. Every victim value MUST claim ≥ 1 dir: its
    // rows were just scanned from under this root, so an unresolved
    // value means the resolution itself is wrong, and returning it as
    // "no victims" would silently RETAIN victim rows in a compliance
    // operator (r18 ADVICE medium) — fail loudly instead.
    def sameVal(a: String, b: String): Boolean = a == b || {
      (scala.util.Try(BigDecimal(a)).toOption,
        scala.util.Try(BigDecimal(b)).toOption) match {
        case (Some(x), Some(y)) => x == y
        case _ => false
      }
    }
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val resolved = victimVals.map { v =>
      v -> partDirVals.filter { raw =>
        val un = ExternalCatalogUtils.unescapePathName(raw)
        v match {
          case None => un == ExternalCatalogUtils.DEFAULT_PARTITION_NAME
          case Some(value) => sameVal(raw, value) || sameVal(un, value)
        }
      }
    }
    val unresolvedVals = resolved.collect { case (v, Nil) => v }
    require(unresolvedVals.isEmpty,
      s"forget could not resolve victim partition value(s) " +
        unresolvedVals.map(_.getOrElse("NULL")).mkString("[", ", ", "]") +
        s" to any on-disk '$partCol=' dir under $root — refusing to " +
        "return as if no victim rows existed (victim rows WERE found " +
        "under these values)")
    val victims = resolved.flatMap(_._2).distinct.sorted
    if (victims.isEmpty) {
      if (!holdFence) fs.delete(new Path(rootP, Marker), false): Unit
      return Nil
    }
    // MASS-DELETE path: when victims span a large share of the
    // partitions, the per-dir loop below degenerates into thousands of
    // sequential job launches (2+ jobs + 3 renames per victim dir) —
    // a survivors rebuild at a staging sibling plus ONE publish swap
    // is both faster past the crossover and a smaller crash surface
    // (one committed dir swap vs V interleaved windows)
    val useStaged = stagedFraction <= 0.0 ||
      (victims.size >= StagedMinVictimParts &&
        victims.size.toDouble >= stagedFraction * partCount)
    // operation fence: up before the first mutation on either path
    touch(fs, new Path(rootP, Marker))
    if (useStaged)
      forgetStaged(spark, fs, rootP, root, partCol, idCol, ids,
          holdFence, victims) match {
        case Some(done) => return done
        case None => () // canonicalization mismatch — fall through to the
                        // per-dir path, which preserves names verbatim
      }
    victims.foreach { v =>
      val dirName = s"$partCol=$v"
      val dir = new Path(rootP, dirName)
      val trash = new Path(rootP, TrashPrefix + dirName)
      // pin the survivors BEFORE the swap: the write must not lazily
      // re-open files that are mid-rename
      val cleaned = spark.read.parquet(dir.toString)
        .filter(!col(idCol).isin(ids: _*))
        .localCheckpoint()
      if (cleaned.isEmpty) {
        // every row was a victim — absence of the dir IS zero rows for
        // every prober, while a published fileless dir would crash
        // explicit-path schema inference
        require(fs.rename(dir, trash), s"could not retire $dir")
        fs.delete(trash, true)
      } else {
        val tmp = new Path(rootP, TmpPrefix + dirName)
        fs.delete(tmp, true)
        cleaned.write.mode("overwrite").parquet(tmp.toString)
        require(fs.rename(dir, trash), s"could not retire $dir")
        require(fs.rename(tmp, dir), s"could not publish rewritten $dir")
        fs.delete(trash, true)
      }
    }
    if (!holdFence) fs.delete(new Path(rootP, Marker), false): Unit
    victims
  }

  /** STAGED survivors rebuild — [[forgetFlat]]'s whole-dir sibling
    * swap generalized to the partitioned layout (the VersionedState
    * build-then-swap shape): survivors rewrite ONCE into the
    * dot-prefixed sibling `.forget_stage.<name>` under the same
    * `partCol=` layout — its `.stage_complete` dot-file, touched after
    * the rebuild job AND the sidecar carry-over, is the staging's
    * commit point — then the live root retires to `.forget_old.<name>`
    * and the staging publishes under the root's name. Crash windows —
    * every victim-retaining state is marker-covered, the per-dir
    * path's invariant: before the staging's commit point, the root is
    * intact and fenced (marker); between the two publish renames the
    * root is MISSING — loud to any read — with a committed staging
    * that [[repairStaged]] finishes; after the publish, the root is
    * published WITH the marker (it rides the staging) and stays
    * fenced until the retired old sibling — every victim byte — is
    * deleted, so a crash there refuses probes until a re-run heals
    * and clears. The same riding marker makes the holdFence contract
    * hold on this path through every window. CONSTRAINT, now ENFORCED
    * (r18 ADVICE fix): partition dir names are regenerated from
    * inferred partition values here, so `partCol` values must be
    * canonically formatted (ints, or strings that don't parse as
    * numbers) — a zero-padded numeric string would silently
    * canonicalize (`part=00` → `part=0`), merging partitions and
    * flipping the inferred column type. After the rebuild and BEFORE
    * anything touches the live root, the staging's regenerated
    * `partCol=` dir names are checked against the root's: any name
    * outside the original set aborts the staging (returns None) and
    * the caller falls back to the per-dir path, which preserves names
    * verbatim. Every current family passes the check (int
    * buckets/cells, non-numeric splits); the guard is for future
    * callers. */
  private def forgetStaged(spark: SparkSession, fs: FileSystem,
                           rootP: Path, root: String, partCol: String,
                           idCol: String, ids: Seq[Long],
                           holdFence: Boolean,
                           victims: Seq[String]): Option[Seq[String]] = {
    val parent = rootP.getParent
    val stage = new Path(parent, StagePrefix + rootP.getName)
    val old = new Path(parent, OldPrefix + rootP.getName)
    fs.delete(stage, true)
    // ONE whole-index job; reads the still-live root, writes the same
    // partition layout. No checkpoint needed: the write completes
    // before any rename touches what it reads.
    spark.read.option("basePath", root).parquet(root)
      .filter(!col(idCol).isin(ids: _*))
      .write.partitionBy(partCol).mode("overwrite").parquet(stage.toString)
    // canonicalization guard (scaladoc CONSTRAINT): regenerated dir
    // names must all be names the root already had — one staging
    // listing, checked while the live root is still untouched, so the
    // abort is free of crash windows (the staging is uncommitted junk
    // repairStaged already reaps)
    def partDirs(p: Path): Set[String] =
      fs.listStatus(p).iterator
        .filter(st => st.isDirectory &&
          st.getPath.getName.startsWith(partCol + "="))
        .map(_.getPath.getName).toSet
    if (!partDirs(stage).subsetOf(partDirs(rootP))) {
      fs.delete(stage, true)
      return None
    }
    // carry the family's SIDECAR entries (a CopyIndex _FANOUT, any
    // metadata beside the partition dirs) into the staging — the swap
    // replaces the whole root, so anything not copied is lost. Skip
    // the partition dirs (just rebuilt), this protocol's own marker
    // and debris, and names the job already wrote.
    fs.listStatus(rootP).foreach { st =>
      val n = st.getPath.getName
      val skip = n.startsWith(partCol + "=") || n == Marker ||
        n.startsWith(TrashPrefix) || n.startsWith(TmpPrefix) ||
        fs.exists(new Path(stage, n))
      if (!skip)
        require(org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath, fs,
          new Path(stage, n), false,
          spark.sparkContext.hadoopConfiguration),
          s"could not carry sidecar $n into $stage")
    }
    // the marker ALWAYS rides the staging (the sidecar loop above
    // skipped the root's copy): the published root then stays fenced
    // until the retired old sibling — the full pre-forget index, every
    // victim byte — is deleted. Without this, a crash after the
    // publish rename but before the old delete would look complete to
    // every probe while `.forget_old.` retained victim bytes with
    // nothing demanding a heal (the unmarked-retention class). A held
    // composition fence survives the same way, through every window.
    touch(fs, new Path(stage, Marker))
    touch(fs, new Path(stage, StageComplete)) // the staging commit point
    require(fs.rename(rootP, old), s"could not retire $rootP")
    require(fs.rename(stage, rootP), s"could not publish $stage")
    // checked like the publish renames (r18 ADVICE fix): a silently
    // failed delete here would leave the full pre-forget victim bytes
    // on disk while the SAME code path clears the marker below — the
    // unmarked-retention state the riding marker exists to prevent
    require(fs.delete(old, true) || !fs.exists(old),
      s"could not delete retired $old — victim bytes would outlive an " +
        "unfenced index")
    fs.delete(new Path(rootP, StageComplete), false)
    if (!holdFence) fs.delete(new Path(rootP, Marker), false): Unit
    Some(victims)
  }

  /** Heal the staged swap's crash windows. Root MISSING + committed
    * staging (its `.stage_complete` exists): the crash hit between the
    * two publish renames — finish the publish (the staging holds the
    * whole survivor set AND the sidecars) and drop the retired root.
    * Root MISSING + no
    * committed staging: restore the retired root (the re-run redoes
    * the rebuild). Root PRESENT: any staging/old sibling is an
    * uncommitted rebuild or an already-superseded retired root — both
    * physically retain victim bytes and delete. The root-internal
    * marker is not touched here. */
  private def repairStaged(fs: FileSystem, rootP: Path): Unit = {
    val parent = rootP.getParent
    if (parent == null) return
    val stage = new Path(parent, StagePrefix + rootP.getName)
    val old = new Path(parent, OldPrefix + rootP.getName)
    if (!fs.exists(rootP)) {
      if (fs.exists(new Path(stage, StageComplete))) {
        require(fs.rename(stage, rootP), s"could not publish $stage")
        fs.delete(new Path(rootP, StageComplete), false)
        // checked for the same reason as forgetStaged's delete: the
        // re-run that invoked this heal goes on to clear the fence
        // after its re-filter — retired victim bytes must not survive
        // that unfencing
        require(fs.delete(old, true) || !fs.exists(old),
          s"could not delete retired $old after finishing its publish")
      } else if (fs.exists(old)) {
        require(fs.rename(old, rootP), s"could not restore $rootP")
        fs.delete(stage, true): Unit
      }
    } else {
      // a stray in-root staging-commit marker (crash between the
      // publish rename and its cleanup) is junk — drop it with the
      // sibling debris
      fs.delete(new Path(rootP, StageComplete), false)
      fs.delete(stage, true)
      fs.delete(old, true): Unit
    }
  }

  /** Multi-column variant for relations where the victim test is not a
    * single id column (the copy-detect ALERT dirs: a victim may sit on
    * either side of a pair): rewrite every partition dir whose rows
    * match `victim`, under the same fence + swap + repair protocol.
    * Dir-level, not partition-value-level — callers pass the dirs a
    * commit protocol already resolved (alert dirs are batch-scoped, so
    * "which partitions can hold victims" has no cheap answer; each dir
    * pays one column-pruned predicate scan instead). */
  def forgetWhere(spark: SparkSession, root: String,
                  dirs: Seq[(String, org.apache.spark.sql.types.StructType)],
                  victim: org.apache.spark.sql.Column,
                  holdFence: Boolean = false): Unit = {
    val (fs, rootP) = fsPath(spark, root)
    require(fs.exists(rootP), s"no state at $root")
    // as in [[forget]]: a torn earlier run's fence stays up through the
    // heal and the re-filter, clearing only once the layout is proven
    // whole (the caller's own composition fence clears separately)
    val torn = fs.exists(new Path(rootP, Marker))
    repair(fs, rootP, keepMarker = holdFence || torn)
    val dirty = dirs.filter { case (d, schema) =>
      val p = new Path(rootP, d)
      fs.exists(p) &&
        !spark.read.schema(schema).parquet(p.toString).filter(victim).isEmpty
    }
    if (dirty.isEmpty) {
      if (!holdFence) fs.delete(new Path(rootP, Marker), false): Unit
      return
    }
    touch(fs, new Path(rootP, Marker))
    dirty.foreach { case (dirName, schema) =>
      val dir = new Path(rootP, dirName)
      val trash = new Path(rootP, TrashPrefix + dirName)
      val cleaned = spark.read.schema(schema).parquet(dir.toString)
        .filter(!victim).localCheckpoint()
      if (cleaned.isEmpty) {
        require(fs.rename(dir, trash), s"could not retire $dir")
        fs.delete(trash, true)
      } else {
        val tmp = new Path(rootP, TmpPrefix + dirName)
        fs.delete(tmp, true)
        cleaned.write.mode("overwrite").parquet(tmp.toString)
        require(fs.rename(dir, trash), s"could not retire $dir")
        require(fs.rename(tmp, dir), s"could not publish rewritten $dir")
        fs.delete(trash, true)
      }
    }
    if (!holdFence) fs.delete(new Path(rootP, Marker), false): Unit
  }

  /** FLAT-LAYOUT forget, for the unpartitioned index families (the
    * NearDup signature relation, the Spans substring index, SimJoin's
    * prefix/fp relations): no partition bound exists, so the rewrite is
    * O(index) by layout — acceptable because these are per-document
    * DERIVED relations, rebuildable from the corpus. The swap is
    * whole-dir via SIBLINGS (`<name>.forget_tmp` / `.forget_trash` /
    * the `<name>._FORGET_INPROGRESS` marker file): survivors commit to
    * tmp BEFORE the live dir retires, so no crash window loses rows —
    * mid-swap the dir is missing or marked, both loud; a re-run heals.
    * Returns true iff victim rows existed. Refuses to forget EVERY row
    * (an empty flat dir has no footers and would crash later reads —
    * delete or rebuild the index instead). */
  def forgetFlat(spark: SparkSession, path: String,
                 victim: org.apache.spark.sql.Column): Boolean = {
    val (fs, p) = fsPath(spark, path)
    val parent = p.getParent
    val tmp = new Path(parent, p.getName + ".forget_tmp")
    val trash = new Path(parent, p.getName + ".forget_trash")
    val marker = flatMarker(p)
    repairFlat(spark, path)
    require(fs.exists(p), s"no index at $path")
    val df = spark.read.parquet(p.toString)
    if (df.filter(victim).isEmpty) {
      fs.delete(marker, false)
      return false
    }
    val cleaned = df.filter(!victim).localCheckpoint()
    // refuse BEFORE planting the marker: nothing has been touched yet,
    // and a marker here would fence an intact index with a "heal" that
    // deterministically re-throws the same refusal
    require(!cleaned.isEmpty,
      s"forget would delete every row of $path — drop or rebuild the " +
        "index instead (an empty flat dir breaks later reads)")
    // INVARIANT assertCleanFlat rides on: the marker plants BEFORE the
    // live dir retires and clears only AFTER the rewrite publishes —
    // every mid-swap state (dir missing, trash present, tmp half-moved)
    // is marker-covered. Do not reorder these lines.
    touch(fs, marker)
    cleaned.write.mode("overwrite").parquet(tmp.toString)
    require(fs.rename(p, trash), s"could not retire $path")
    require(fs.rename(tmp, p), s"could not publish rewritten $path")
    fs.delete(trash, true)
    fs.delete(marker, false)
    true
  }

  /** Probe-side guard for [[forgetFlat]] surfaces: refuses a sibling
    * marker (torn run) — heal by re-running forget. This check alone
    * also covers the mid-swap crash window WITHOUT a second existence
    * probe, because [[forgetFlat]] plants the marker BEFORE retiring
    * the live dir and clears it only AFTER the rewrite publishes: any
    * state where the dir is missing (or half-swapped) carries the
    * marker. A dir deleted outside the protocol fails the caller's own
    * read loudly (FileNotFoundException), never silently. */
  def assertCleanFlat(spark: SparkSession, path: String): Unit = {
    val (fs, p) = fsPath(spark, path)
    require(!fs.exists(flatMarker(p)),
      s"a forget() is in progress (or died mid-rewrite) on $path — " +
        "re-run forget with the same ids to heal before probing")
  }

  private def flatMarker(p: Path): Path =
    new Path(p.getParent, p.getName + "._FORGET_INPROGRESS")

  /** Heal the leftovers of a torn [[forgetFlat]] swap: a dir retired to
    * its trash sibling restores (re-filtering is the re-run's job),
    * uncommitted tmp drops. The marker does NOT clear here — only a
    * victim re-scan proves the layout whole. PUBLIC because any caller
    * that GUARDS its forgetFlat call (skip when the dir is absent or
    * holds no victims) must heal FIRST: the guard would otherwise skip
    * the only code path that repairs, stranding the trash/marker
    * forever behind a heal instruction that provably does nothing. */
  def repairFlat(spark: SparkSession, path: String): Unit = {
    val (fs, p) = fsPath(spark, path)
    val parent = p.getParent
    val tmp = new Path(parent, p.getName + ".forget_tmp")
    val trash = new Path(parent, p.getName + ".forget_trash")
    if (!fs.exists(p) && fs.exists(trash))
      require(fs.rename(trash, p), s"could not restore $path from trash")
    fs.delete(trash, true)
    fs.delete(tmp, true): Unit
  }

  /** Pre-listing heal for COMPOSITION callers of [[forgetWhere]]: the
    * tenant forgets enumerate their dir list (committed batch/consol
    * names) BEFORE calling forgetWhere, but forgetWhere's own repair
    * runs AFTER — so a dir a crashed earlier run retired to its
    * `.forget_trash.` sibling is absent from the list at enumeration
    * time, gets restored by the repair, and then silently skips the
    * rewrite: the heal re-run "succeeds", every fence clears, and the
    * victim's rows survive in the restored dir forever (the silent
    * compliance no-op class). Callers MUST heal the root FIRST, then
    * list. Keeps the root marker untouched — the caller's composition
    * fence is its own to clear. */
  def heal(spark: SparkSession, root: String): Unit = {
    val (fs, p) = fsPath(spark, root)
    repairStaged(fs, p)
    if (fs.exists(p)) {
      // a CHILD dir retired mid-staged-publish (the per-dir forget of
      // a batch-dir tenant can take the staged path): its
      // `.forget_old.<name>` sibling sits INSIDE this root, invisible
      // to the caller's committed-dir listing exactly like the trash
      // window above — repair each such original before the list
      fs.listStatus(p).map(_.getPath.getName).foreach { n =>
        val orig =
          if (n.startsWith(StagePrefix)) Some(n.stripPrefix(StagePrefix))
          else if (n.startsWith(OldPrefix)) Some(n.stripPrefix(OldPrefix))
          else None
        orig.foreach(o => repairStaged(fs, new Path(p, o)))
      }
      repair(fs, p, keepMarker = true)
    }
  }

  /** Heal the leftovers of a forget() that died mid-swap, window by
    * window: a trash dir whose original is missing restores (the swap
    * hadn't published — the original rows must come back before the
    * re-filter); a trash dir whose original exists is the already-
    * published window's debris; tmp dirs are always uncommitted. Runs
    * before every forget, so the retry sees a consistent layout. */
  private def repair(fs: FileSystem, root: Path,
                     keepMarker: Boolean = false): Unit = {
    val entries = fs.listStatus(root).map(_.getPath).toSeq
    val names = entries.map(_.getName).toSet
    entries.filter(_.getName.startsWith(TrashPrefix)).foreach { t =>
      val orig = t.getName.stripPrefix(TrashPrefix)
      if (!names.contains(orig))
        require(fs.rename(t, new Path(root, orig)),
          s"could not restore $orig from trash")
      else fs.delete(t, true)
    }
    entries.filter(_.getName.startsWith(TmpPrefix))
      .foreach(fs.delete(_, true))
    // under a caller-held composition fence the marker stays up even
    // though THIS dir is consistent again — the other steps may not be
    if (!keepMarker) fs.delete(new Path(root, Marker), false): Unit
  }

  private def touch(fs: FileSystem, p: Path): Unit = {
    val out = fs.create(p, true)
    out.close()
  }

  private def fsPath(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }
}
