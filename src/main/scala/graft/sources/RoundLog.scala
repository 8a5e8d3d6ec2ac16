package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

import scala.jdk.CollectionConverters._

/** ONE manifest + ONE CURRENT per crawl round, covering all four state
  * tables — round 5, r4 verdict #6 (an Iceberg multi-table-transaction /
  * catalog-commit analogue).
  *
  * The per-round fixed cost used to include FOUR manifest writes + FOUR
  * CURRENT tmp+ATOMIC_MOVE publishes + four already-committed probes (tiny
  * local-FS ops here; eight PUTs and four GETs per round on the object
  * store a real deployment mounts). A round now publishes one JSON naming
  * every table's version payload and advances one pointer:
  *
  * {{{
  * <stateDir>/_round_log/<v>.json   # {"version":v,"round":r,"tables":{
  *                                  #   "frontier":{<StateTable manifest>},
  *                                  #   "url_seen":{...}, ...}}
  * <stateDir>/_round_log/CURRENT    # atomic pointer "<v>"
  * }}}
  *
  * The per-TABLE layout on disk (snap-<v>/, dels-<v>/, bloom sidecars) is
  * unchanged — only the commit points collapse. [[StateTable]] resolves
  * every manifest/version/CURRENT lookup through BOTH logs (per-table first,
  * then the parent state dir's round log), so readers, gates, compaction
  * policy and retention GC are layout-agnostic and MIXED chains just work:
  * seed commits (v0) and maintenance operations (Recrawl) stay per-table —
  * maintenance must keep its table-by-table publish ORDER because a crashed
  * maintenance op is only detectable/resumable through its partial per-table
  * markers (Resume.requireSameWriter); an atomic round publish has no
  * partial states to guard, which is exactly why the round can use it.
  *
  * Resume's min rule is now effectively one pointer: all four tables'
  * `currentVersion` resolve to the same round CURRENT (reconciled with any
  * newer per-table commits by taking the max — see
  * [[StateTable.currentVersion]]).
  *
  * Crash window: the round JSON lands via tmp + ATOMIC_MOVE and CURRENT
  * advances after it, so a kill leaves either no trace (data orphans only —
  * invisible, overwritten on replay) or a fully-committed round.
  */
object RoundLog {

  final case class RoundManifest(
      version: Long,
      round: Long,
      tables: Map[String, StateTable.Manifest])

  private def logDir(stateDir: String): Path = Paths.get(stateDir, "_round_log")
  private def currentFile(stateDir: String): Path = logDir(stateDir).resolve("CURRENT")
  private def manifestFile(stateDir: String, v: Long): Path =
    logDir(stateDir).resolve(s"$v.json")

  /** Whether `stateDir` has ever committed at round level (cheap existence
    * probe — the [[StateTable]] indirection's fast path for the many table
    * dirs that never do).
    */
  def exists(stateDir: String): Boolean = Files.exists(logDir(stateDir))

  /** Driver-side cache of parsed round manifests: committed manifests are
    * immutable except under [[expireTable]] (which invalidates), so chain
    * resolution — which consults O(chain) manifests several times per round —
    * parses each file once per JVM instead of once per lookup (each parse is
    * a GET on the object store a real deployment mounts).
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), RoundManifest]()

  /** Test hook: crash simulations delete commit points externally and must
    * then model a FRESH driver (the cache is sound in production — single
    * writer, immutable manifests, [[expireTable]] invalidates).
    */
  private[graft] def clearCache(): Unit = cache.clear()

  def currentVersion(stateDir: String): Option[Long] = {
    val f = currentFile(stateDir)
    if (Files.exists(f)) Some(Files.readString(f).trim.toLong) else None
  }

  def manifest(stateDir: String, v: Long): Option[RoundManifest] = {
    val key = (Paths.get(stateDir).toAbsolutePath.normalize.toString, v)
    Option(cache.get(key)).orElse {
      val f = manifestFile(stateDir, v)
      if (!Files.exists(f)) None
      else {
        val m = parse(Files.readString(f))
        cache.put(key, m)
        Some(m)
      }
    }
  }

  /** Round-committed version numbers that INCLUDE `table`, ascending —
    * table-aware because [[expireTable]] retires tables from a round file
    * independently (each table has its own retention cutoff), so a listing
    * that ignored sections would resurrect expired versions into
    * [[StateTable.versions]] chains.
    */
  def versionsFor(stateDir: String, table: String): Seq[Long] = {
    val d = logDir(stateDir)
    if (!Files.exists(d)) Seq.empty
    else {
      val s = Files.list(d)
      val listed =
        try s.iterator.asScala
          .map(_.getFileName.toString)
          .filter(n => n.endsWith(".json") && !n.startsWith("."))
          .map(_.stripSuffix(".json").toLong)
          .toSeq.sorted
        finally s.close()
      listed.filter(v => manifest(stateDir, v).exists(_.tables.contains(table)))
    }
  }

  /** The per-table manifest of `table` at round version `v`, if round-
    * committed.
    */
  def tableManifest(stateDir: String, table: String, v: Long): Option[StateTable.Manifest] =
    manifest(stateDir, v).flatMap(_.tables.get(table))

  /** Publish one round-level manifest + advance the one CURRENT pointer.
    * Idempotent per version: an already-logged version is returned as-is
    * (with CURRENT repaired forward, mirroring
    * [[StateTable.alreadyCommitted]]'s stale-pointer repair).
    */
  def publish(
      stateDir: String,
      version: Long,
      round: Long,
      tables: Map[String, StateTable.Manifest]): RoundManifest =
    alreadyCommitted(stateDir, version).getOrElse {
      require(tables.nonEmpty, "a round manifest must name at least one table")
      val m = RoundManifest(version, round, tables)
      Files.createDirectories(logDir(stateDir))
      // manifest via tmp + ATOMIC_MOVE: a reader (or a concurrent idempotent
      // replay) must never parse a half-written commit point
      val tmp = logDir(stateDir).resolve(s".${version}.json.tmp")
      Files.writeString(tmp, render(m), StandardCharsets.UTF_8,
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      Files.move(tmp, manifestFile(stateDir, version),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      cache.put((Paths.get(stateDir).toAbsolutePath.normalize.toString, version), m)
      advanceCurrent(stateDir, version)
      m
    }

  /** The round manifest for `version` when already logged (idempotent
    * replay), repairing a stale CURRENT left by a crash between the manifest
    * move and the pointer move.
    */
  def alreadyCommitted(stateDir: String, version: Long): Option[RoundManifest] =
    manifest(stateDir, version).map { m =>
      if (currentVersion(stateDir).forall(_ < version)) advanceCurrent(stateDir, version)
      m
    }

  private def advanceCurrent(stateDir: String, version: Long): Unit = {
    Files.createDirectories(logDir(stateDir))
    val tmp = logDir(stateDir).resolve(s"CURRENT.tmp.$version")
    Files.writeString(tmp, version.toString, StandardCharsets.UTF_8,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, currentFile(stateDir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Retention GC for round-committed versions of ONE table: rewrite each
    * dead version's round manifest without that table's section (atomic
    * move, same discipline as publish) and delete the file once no table
    * references it. Keeps manifest-existence semantics identical to the
    * per-table log — [[StateTable.expire]] computes each table's own cutoff
    * (chain-aware for append tables) and expires tables independently, so
    * one round file can be half-expired while another table still needs it.
    */
  def expireTable(stateDir: String, table: String, deadVersions: Seq[Long]): Unit =
    deadVersions.foreach { v =>
      manifest(stateDir, v).foreach { m =>
        if (m.tables.contains(table)) {
          val key = (Paths.get(stateDir).toAbsolutePath.normalize.toString, v)
          val rest = m.tables - table
          if (rest.isEmpty) {
            Files.deleteIfExists(manifestFile(stateDir, v))
            cache.remove(key)
          } else {
            val next = m.copy(tables = rest)
            val tmp = logDir(stateDir).resolve(s".${v}.json.tmp")
            Files.writeString(tmp, render(next), StandardCharsets.UTF_8,
              StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
            Files.move(tmp, manifestFile(stateDir, v),
              StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
            cache.put(key, next)
          }
        }
      }
    }

  // --- minimal JSON (same no-external-lib constraint as StateTable) ---

  private def render(m: RoundManifest): String = {
    val ts = m.tables.toSeq.sortBy(_._1)
      .map { case (name, tm) => s""""$name":${StateTable.renderManifest(tm)}""" }
      .mkString("{", ",", "}")
    s"""{"version":${m.version},"round":${m.round},"tables":$ts}"""
  }

  private[graft] def parse(s: String): RoundManifest = {
    def num(key: String): Long = {
      val p = ("\"" + key + "\":").r.pattern
      val mtch = p.matcher(s)
      if (!mtch.find()) 0L
      else {
        var i = mtch.end
        val sb = new StringBuilder
        while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '-')) {
          sb.append(s.charAt(i)); i += 1
        }
        sb.toString.toLong
      }
    }
    // tables: balanced-brace extraction (manifests nest a counters object;
    // no string value ever contains a brace — keys and counter names are
    // [a-z0-9_] by construction)
    val tables = {
      val anchor = "\"tables\":{"
      val start = s.indexOf(anchor)
      if (start < 0) Map.empty[String, StateTable.Manifest]
      else {
        val open = start + anchor.length - 1
        val close = matchBrace(s, open)
        val body = s.substring(open + 1, close)
        val out = scala.collection.mutable.LinkedHashMap.empty[String, StateTable.Manifest]
        var i = 0
        while (i < body.length) {
          val q1 = body.indexOf('"', i)
          if (q1 < 0) i = body.length
          else {
            val q2 = body.indexOf('"', q1 + 1)
            val name = body.substring(q1 + 1, q2)
            val objStart = body.indexOf('{', q2)
            val objEnd = matchBrace(body, objStart)
            out += name -> StateTable.parseManifest(body.substring(objStart, objEnd + 1))
            i = objEnd + 1
          }
        }
        out.toMap
      }
    }
    RoundManifest(num("version"), num("round"), tables)
  }

  /** Index of the '}' matching the '{' at `open`. */
  private def matchBrace(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '{') depth += 1
      else if (c == '}') { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced braces from offset $open in: $s")
  }
}
