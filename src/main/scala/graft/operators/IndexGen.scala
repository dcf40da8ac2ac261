package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reader-safe publication for the durable index directories (IVF /
  * IVF-PQ lists, SQ8/BQ sidecars, BM25 postings, decontamination gram
  * postings) — the round-10 verdict #1 machinery that retires every
  * "QUIESCE SERVING FIRST" constraint.
  *
  * Two layers, both resolved by readers ONCE per probe/batch:
  *
  *  1. WHOLE-INDEX GENERATIONS for the multi-sublayout swaps (builds,
  *     compactions, delta folds). A generation is a complete internal
  *     layout under `dir/gen-<N>/`; `_gen/ptr-<N>` markers publish it
  *     (create-then-rename to a NEW name — atomic on every Hadoop FS,
  *     so a lister sees ptr-N or not, never a half state). A reader
  *     resolves the highest pointer once and reads that root for its
  *     whole batch: a publication mid-read is invisible (its old root
  *     stays on disk — `graft.index.retainGenerations` prior
  *     generations are retained, default 1, the [[VersionedState]]
  *     retention discipline), and a reader arriving after sees the
  *     new root. Old-or-new, never mixes sublayouts from two
  *     generations. SCOPE of the never-fails claim: a lazy reader
  *     must complete within `retainGenerations` publication
  *     intervals of the root it resolved — a probe that overlaps
  *     MORE publications of the same index (e.g. compactEvery=1 with
  *     a probe slower than a whole maintenance cycle) can find its
  *     root pruned mid-read. Raise retainGenerations for long
  *     analytical probes over actively-compacted indexes.
  *
  *  2. SUBLAYOUT VERSIONS (`<sub>_v<k>`) for the single-dim swaps the
  *     plain append paths make per batch (BM25 df/stats merge, IVF
  *     stats merge) — a generation advance there would copy the
  *     corpus-scale postings per append. The swap stages the new dim,
  *     renames it to the NEXT version (atomic, new name), and prunes
  *     versions older than the prior one; readers resolve the highest
  *     version. Per-dim old-or-new; cross-dim staleness is bounded by
  *     one batch and one-sided (the documented plain-append
  *     idf-staleness class), never a torn read.
  *
  * A directory with no ladder resolves to itself (the flat
  * pre-generation layout): all builders are ladder-native, so flat
  * dirs only arise from hand-built layouts, which keep working and
  * migrate to generations on their first compaction (their flat
  * files are left behind for any in-flight reader — disk-only,
  * legacy-only cost).
  *
  * Single-writer assumption, now ENFORCED rather than documented
  * (round-11 verdict #3, tightened round 13): [[stage]] takes a
  * create-exclusive lease marker (`_gen/.lease-<n>` carrying a
  * per-writer NONCE) and stages into a writer-unique root
  * (`.staging-gen-<n>-<nonce>`) — a second concurrent writer staging
  * the same generation fails loudly at the seam with
  * [[ConcurrentMaintenanceException]], index intact. [[publish]]
  * then verifies LEASE OWNERSHIP (lease nonce == staging nonce)
  * before touching anything, and re-verifies the pointer it is
  * superseding is still the maximum (pointer CAS) as the second
  * belt. A lease left by a CRASHED writer is broken after
  * `graft.index.leaseTimeoutMs` (default 15 min); a STALLED (not
  * crashed) writer that resumes after its lease was broken cannot
  * publish a rival's half-built staging — the paths are disjoint
  * per writer and its ownership check fails first — closing the
  * round-12 ADVICE hole where a shared staging path let the
  * straggler rename the rival's in-progress build into place.
  * [[Curation.startCorpusMaintenance]] remains the intended
  * one-actor structure; the lease turns a misconfiguration into a
  * named error instead of a corrupt index.
  */
private[graft] object IndexGen {
  import org.apache.hadoop.fs.{FileSystem, Path}

  /** Raised when a second maintenance writer tries to stage a
    * generation another writer currently holds the lease for — the
    * loud-loser half of the single-writer enforcement. The index is
    * intact: the loser never touched staging or the pointer ladder.
    */
  final class ConcurrentMaintenanceException(msg: String)
      extends IllegalStateException(msg)

  private val Ptr = "^ptr-(\\d+)$".r

  private def confInt(spark: SparkSession, key: String,
                      dflt: Long): Long =
    spark.conf.getOption(key).map(_.toLong).getOrElse(dflt)

  /** Prior generations kept on disk after a publish (the lazy-reader
    * safety window). */
  private def retainGens(spark: SparkSession): Int =
    confInt(spark, "graft.index.retainGenerations", 1L).toInt

  private def leaseTimeoutMs(spark: SparkSession): Long =
    confInt(spark, "graft.index.leaseTimeoutMs", 15L * 60 * 1000)

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def currentGen(fs: FileSystem, dir: String): Option[Int] = {
    val g = new Path(dir, "_gen")
    if (!fs.exists(g)) None
    else {
      val ns = fs.listStatus(g).toSeq.flatMap(_.getPath.getName match {
        case Ptr(n) => Some(n.toInt)
        case _ => None
      })
      if (ns.isEmpty) None else Some(ns.max)
    }
  }

  /** Resolve the CURRENT readable root of an index directory — the
    * highest published generation, else the directory itself.
    * Idempotent (a generation root carries no ladder), so nested
    * resolution through composed entry points is harmless; but each
    * public operation resolves ONCE and uses that root throughout,
    * so one logical read never spans a publication.
    */
  def root(spark: SparkSession, dir: String): String = {
    val fs = fsOf(spark, dir)
    currentGen(fs, dir) match {
      case Some(n) => new Path(dir, s"gen-$n").toString
      case None => dir
    }
  }

  /** Begin a new generation: (number, cleared staging root). Takes
    * the single-writer LEASE for generation `n` first
    * (create-exclusive `_gen/.lease-<n>` — atomic on every Hadoop
    * FS): a concurrent writer staging the same generation raises
    * [[ConcurrentMaintenanceException]] here, before touching any
    * index state. A lease older than `graft.index.leaseTimeoutMs`
    * is presumed crashed and broken.
    *
    * The staging root is WRITER-UNIQUE (`.staging-gen-<n>-<nonce>`,
    * the nonce recorded in the lease file): a writer that loses its
    * lease to a stale-break can never have ITS half-built staging
    * renamed into place by the rival (paths differ), and its own
    * [[publish]] fails the lease-ownership check before touching the
    * pointer ladder. Stagings left by prior (dead or stale-broken)
    * writers of this generation are cleared here, under the fresh
    * lease.
    */
  def stage(spark: SparkSession, dir: String): (Int, String) = {
    val fs = fsOf(spark, dir)
    val n = currentGen(fs, dir).map(_ + 1).getOrElse(0)
    val nonce = java.util.UUID.randomUUID().toString
      .replace("-", "").take(12)
    acquireLease(spark, fs, dir, n, nonce)
    val orphans = fs.globStatus(new Path(dir, s".staging-gen-$n-*"))
    if (orphans != null)
      orphans.foreach(s => fs.delete(s.getPath, true))
    val staging = new Path(dir, s".staging-gen-$n-$nonce")
    fs.mkdirs(staging)
    (n, staging.toString)
  }

  private def leasePath(dir: String, n: Int): Path =
    new Path(new Path(dir, "_gen"), s".lease-$n")

  /** The nonce recorded in generation `n`'s lease file, if the lease
    * exists and parses. Lease body is `<millis> <nonce>`. */
  private def leaseNonce(fs: FileSystem, dir: String,
                         n: Int): Option[String] = {
    val lease = leasePath(dir, n)
    if (!fs.exists(lease)) None
    else {
      val in = fs.open(lease)
      val body =
        try {
          val buf = new Array[Byte](256)
          val read = in.read(buf)
          if (read <= 0) "" else new String(buf, 0, read, "UTF-8")
        } finally in.close()
      body.split("\\s+").drop(1).headOption
    }
  }

  private def acquireLease(spark: SparkSession, fs: FileSystem,
                           dir: String, n: Int, nonce: String): Unit = {
    val gdir = new Path(dir, "_gen")
    fs.mkdirs(gdir)
    val lease = leasePath(dir, n)
    if (fs.exists(lease)) {
      val age = System.currentTimeMillis() -
        fs.getFileStatus(lease).getModificationTime
      if (age > leaseTimeoutMs(spark)) { fs.delete(lease, false); () }
    }
    val os =
      try fs.create(lease, false)
      catch { case _: java.io.IOException =>
        throw new ConcurrentMaintenanceException(
          s"index maintenance lease held: another writer is staging " +
            s"gen-$n of $dir ($lease). One maintenance actor per " +
            "index — see IndexGen scaladoc.")
      }
    try os.write(
      s"${System.currentTimeMillis()} $nonce".getBytes("UTF-8"))
    finally os.close()
  }

  /** Release generation `n`'s lease without publishing — the failure
    * path [[buildFresh]]/[[advance]] take when `build` throws, so a
    * failed build does not hold the lease for the timeout. */
  def releaseLease(spark: SparkSession, dir: String, n: Int): Unit = {
    val fs = fsOf(spark, dir)
    fs.delete(leasePath(dir, n), false)
    ()
  }

  /** Publish staged generation `n` from `staging` (the path
    * [[stage]] returned): verify LEASE OWNERSHIP (the lease's nonce
    * must match this staging's — a writer whose stale lease was
    * broken by a rival fails here, before touching the pointer
    * ladder or anyone's staging), rename the staging root into
    * place, flip the pointer (create-then-rename, atomic), prune
    * generations older than the immediately prior one. A crash
    * before the pointer rename leaves a complete-but-unpublished
    * gen dir the next stage() of the same number clears; readers
    * never resolve it.
    */
  def publish(spark: SparkSession, dir: String, n: Int,
              staging: String): Unit = {
    val fs = fsOf(spark, dir)
    // A lease-ownership loser must NOT delete the lease — it belongs
    // to the rival writer. Any OTHER publish failure releases this
    // writer's lease: a transient FS error here would otherwise lock
    // the index's maintenance against the writer's OWN retry for the
    // whole lease timeout (stage() of the same n finds the orphaned
    // lease and refuses). The CAS-loser case is covered too — the
    // winner already deleted lease-n at its own publish, so the
    // extra delete is a no-op.
    verifyLeaseOwnership(fs, dir, n, staging)
    try publishInner(spark, fs, dir, n, staging)
    catch { case e: Throwable =>
      fs.delete(leasePath(dir, n), false); throw e
    }
  }

  private val StagingNonce = "^\\.staging-gen-\\d+-([0-9a-f]+)$".r

  private def verifyLeaseOwnership(fs: FileSystem, dir: String, n: Int,
                                   staging: String): Unit = {
    val mine = new Path(staging).getName match {
      case StagingNonce(x) => Some(x)
      case _ => None
    }
    val held = leaseNonce(fs, dir, n)
    if (mine.isEmpty || held != mine)
      throw new ConcurrentMaintenanceException(
        s"index publish lease-ownership check failed for gen-$n of " +
          s"$dir: lease ${held.fold("is gone")(x => s"carries nonce $x")}, " +
          s"this writer staged ${mine.getOrElse("(no nonce)")} — a rival " +
          "writer broke this writer's stale lease; this staging is " +
          "abandoned, the rival's generation is untouched.")
  }

  private def publishInner(spark: SparkSession, fs: FileSystem,
                           dir: String, n: Int,
                           stagingPath: String): Unit = {
    // pointer CAS (second belt under the lease-ownership check): the
    // generation this writer staged against must still be the
    // published maximum — catches a rival that published and
    // released the lease before this writer's ownership read.
    val cur = currentGen(fs, dir)
    if (cur != (if (n == 0) None else Some(n - 1)))
      throw new ConcurrentMaintenanceException(
        s"index publish CAS failed for gen-$n of $dir: published " +
          s"generation is ${cur.fold("none")(m => s"gen-$m")}, " +
          s"expected ${if (n == 0) "none" else s"gen-${n - 1}"} — " +
          "another writer published first; this staging is abandoned.")
    val staging = new Path(stagingPath)
    val target = new Path(dir, s"gen-$n")
    fs.delete(target, true)
    require(fs.rename(staging, target),
      s"index publish: failed to land $target")
    val gdir = new Path(dir, "_gen")
    val ptr = new Path(gdir, s"ptr-$n")
    val tmp = new Path(gdir, s".ptr-$n.tmp")
    fs.mkdirs(gdir)
    val os = fs.create(tmp, true)
    try os.write(s"gen-$n".getBytes("UTF-8")) finally os.close()
    fs.delete(ptr, false)
    require(fs.rename(tmp, ptr), s"index publish: failed to flip $ptr")
    val keep = retainGens(spark)
    val Lease = "^\\.lease-(\\d+)$".r
    fs.listStatus(gdir).foreach(_.getPath.getName match {
      case Ptr(m) if m.toInt < n - keep =>
        fs.delete(new Path(dir, s"gen-${m.toInt}"), true)
        fs.delete(new Path(gdir, s"ptr-${m.toInt}"), false)
        ()
      // leases at or below the just-published generation are spent
      // (their publication happened or was abandoned) — prune them so
      // a crash between pointer flip and lease delete cannot leave a
      // permanent marker
      case Lease(m) if m.toInt <= n =>
        fs.delete(new Path(gdir, s".lease-${m.toInt}"), false)
        ()
      case _ => ()
    })
    // stagings of this or older generations left by dead or
    // lease-broken rivals are garbage now — their publish can never
    // succeed (ownership check) and no future stage() reuses them
    val Stg = "^\\.staging-gen-(\\d+)-[0-9a-f]+$".r
    val stale = fs.globStatus(new Path(dir, ".staging-gen-*"))
    if (stale != null) stale.foreach { s =>
      s.getPath.getName match {
        case Stg(m) if m.toInt <= n => fs.delete(s.getPath, true); ()
        case _ => ()
      }
    }
    // in-JVM cache entries for every generation of this index drop:
    // the next reader re-resolves and reloads against the new root
    IndexCache.invalidate(dir)
  }

  /** Build a FRESH generation (writeXxxIndex rebuild semantics):
    * `build` writes the complete layout into the staging root;
    * nothing carries forward — in particular no stale `_commits`
    * markers, which under the flat layout would have silently
    * over-counted a rebuilt index's composite stats.
    */
  def buildFresh(spark: SparkSession, dir: String)
                (build: String => Unit): Unit = {
    val (n, staging) = stage(spark, dir)
    try build(staging)
    catch { case e: Throwable =>
      releaseLease(spark, dir, n); throw e
    }
    publish(spark, dir, n, staging)
  }

  /** Advance a generation by REWRITING some sublayouts (compaction's
    * shape): `build` reads from the resolved old root and writes the
    * rewritten subs into the staging root; every sublayout it did not
    * write is copied forward unchanged (tiny by construction — dims,
    * meta, `_commits` markers; the corpus-scale subs are exactly the
    * ones compaction rewrites). A `<sub>_v<k>` version whose base sub
    * WAS rewritten is dropped, not copied — the fresh generation
    * normalizes swapped dims back to their plain form.
    */
  def advance(spark: SparkSession, dir: String)
             (build: (String, String) => Unit): Unit = {
    val oldRoot = root(spark, dir)
    val (n, staging) = stage(spark, dir)
    try {
      build(oldRoot, staging)
      copyMissing(spark, oldRoot, staging)
    } catch { case e: Throwable =>
      releaseLease(spark, dir, n); throw e
    }
    publish(spark, dir, n, staging)
  }

  private def internalName(name: String): Boolean =
    name == "_gen" || name == "_source_fingerprint" ||
      name.startsWith("gen-") || name.startsWith(".")

  private val SubVer = "^(.*)_v(\\d+)$".r

  private def copyMissing(spark: SparkSession, oldRoot: String,
                          staging: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val src = new Path(oldRoot)
    val fs = src.getFileSystem(conf)
    val dst = new Path(staging)
    if (!fs.exists(src)) return
    val written = fs.listStatus(dst).map(_.getPath.getName).toSet
    val names = fs.listStatus(src).map(_.getPath.getName)
      .filterNot(internalName).toSeq
    // normalize swapped dims: the fresh generation carries each sub's
    // NEWEST version as its plain base — older versions and a stale
    // plain base are folded away, version ladders restart per gen
    val newest: Map[String, Int] = names
      .collect { case SubVer(base, k) => (base, k.toInt) }
      .groupBy(_._1).map { case (b, ks) => (b, ks.map(_._2).max) }
    names.foreach { name =>
      val (copyAs, skip) = name match {
        case SubVer(base, k) =>
          (base, written.contains(base) || k.toInt != newest(base))
        case _ =>
          (name, written.contains(name) || newest.contains(name))
      }
      if (!skip && !written.contains(copyAs)) {
        org.apache.hadoop.fs.FileUtil.copy(fs, new Path(src, name), fs,
          new Path(dst, copyAs), false, conf)
        ()
      }
    }
  }

  private def subVersions(fs: FileSystem, root: String,
                          sub: String): Seq[Int] = {
    val g = fs.globStatus(new Path(root, s"${sub}_v*"))
    (if (g == null) Array.empty[org.apache.hadoop.fs.FileStatus] else g)
      .toSeq.flatMap(_.getPath.getName match {
        case SubVer(b, k) if b == sub => Some(k.toInt)
        case _ => None
      }).sorted
  }

  /** Resolve ONE sublayout under an already-resolved root: the
    * highest `<sub>_v<k>` version if any swap published one, else
    * the plain `<sub>` the build wrote.
    */
  def subPath(spark: SparkSession, root: String, sub: String): String = {
    val fs = fsOf(spark, root)
    subVersions(fs, root, sub).lastOption match {
      case Some(k) => new Path(root, s"${sub}_v$k").toString
      case None => new Path(root, sub).toString
    }
  }

  /** Reader-atomic swap of one sublayout dim under a RESOLVED root:
    * materialize `df` fully into a staging dir (its lazy read of the
    * CURRENT dim executes while that dim is intact), rename it to the
    * next version (atomic — new name), prune versions older than the
    * prior one (and the plain base once two versions exist). An
    * in-flight reader that resolved the prior version keeps a
    * complete dim; one resolving after the rename sees the new dim;
    * none ever lists a half-renamed directory.
    */
  def swapSub(spark: SparkSession, root: String, sub: String,
              df: DataFrame): Unit = {
    val fs = fsOf(spark, root)
    val vs = subVersions(fs, root, sub)
    val next = vs.lastOption.getOrElse(0) + 1
    val staging = new Path(root, s".$sub-swap-staging")
    fs.delete(staging, true)
    df.write.mode("overwrite").parquet(staging.toString)
    val target = new Path(root, s"${sub}_v$next")
    fs.delete(target, true)
    require(fs.rename(staging, target),
      s"dim swap: failed to publish $target")
    vs.filter(_ < next - 1).foreach { k =>
      fs.delete(new Path(root, s"${sub}_v$k"), true)
      ()
    }
    if (next >= 2) {
      fs.delete(new Path(root, sub), true)
      ()
    }
    IndexCache.invalidate(root)
  }
}
