package graft.lake

import java.nio.file.{Files, Path}
import java.util.UUID

/** The ONE storage primitive the commit protocol needs: an atomic
  * create-if-absent publish. [[MergeTable.tryCommit]] funnels every
  * version publish (and checkpoint publish) through this seam, so the
  * optimistic-concurrency story is exactly as strong as this method's
  * atomicity on the deployment's storage — the same factoring as
  * Delta's `LogStore` API (reference behavior: the Glue jobs assume
  * S3-side atomic catalog commits; here the contract is explicit).
  *
  * Deployment paths:
  *   - POSIX (this repo's default, [[LogStore.Posix]]): hard-link
  *     publish — `Files.createLink` fails with
  *     `FileAlreadyExistsException` iff the target exists, making the
  *     existence check and the publish one syscall.
  *   - S3: implement with a conditional `PutObject` (`If-None-Match: *`
  *     — atomic create-if-absent, available on S3 since late 2024), or
  *     Delta's classic pattern: an external arbiter (DynamoDB
  *     conditional write) owning name claims, with the object body
  *     written after the claim. Plain `PutObject` is last-writer-wins
  *     and MUST NOT back this method — two writers would both "win" a
  *     version and one delta would vanish.
  *   - HDFS / ABFS / GCS: atomic `rename` WITHOUT overwrite (their
  *     rename contracts fail on an existing destination, unlike
  *     Linux rename(2), which silently replaces). Implemented as
  *     [[LogStore.RenameNoOverwrite]] with the filesystem's rename as
  *     the pluggable primitive; [[LogStore.Rename]] is the local
  *     conformance mock. Select per table via `spark.graft.logStore`
  *     (see [[LogStore.forConf]]).
  */
trait LogStore {

  /** Atomically publish `body` at `target` iff `target` does not
    * exist. Returns true iff THIS call created the file; false means a
    * concurrent writer already published the name (the caller must
    * recompute from the fresh snapshot, never re-publish a stale
    * delta). Implementations must guarantee that a reader never
    * observes a partially-written `target` — publish via a
    * temporary + atomic-link/rename, not a direct streaming write. */
  def putIfAbsent(target: Path, body: String): Boolean

  /** Read the full published content at `target` (None when absent) —
    * the read half of the seam, so sidecar verification
    * ([[MergeTable.verifyChecksum]]'s `compareCrc`) consults the SAME
    * store the committer published through: an implementation whose
    * writes do not immediately materialize to the local filesystem
    * would otherwise publish sidecars that never verify (r14 ADVICE).
    * The default delegates to the filesystem, which every bundled
    * implementation (hard-link, rename, and the in-memory conditional
    * fake — all of which materialize to disk on success) satisfies;
    * bulk LOG reads ([[MergeTable]]'s delta/checkpoint folds) still go
    * straight to the filesystem by contract — a LogStore impl MUST
    * leave published files POSIX-visible. */
  def read(target: Path): Option[String] =
    if (!Files.exists(target)) None
    else Some(new String(Files.readAllBytes(target), "UTF-8"))
}

object LogStore {

  /** POSIX hard-link implementation: write a same-directory temp file,
    * then `Files.createLink(target, tmp)` — unlike `Files.move`, whose
    * Linux rename(2) silently REPLACES, createLink atomically fails
    * when the target exists, so two writers can never both win. */
  object Posix extends LogStore {
    override def putIfAbsent(target: Path, body: String): Boolean = {
      val tmp = target.resolveSibling(s".tmp-${UUID.randomUUID()}")
      Files.writeString(tmp, body)
      try { Files.createLink(target, tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
      finally Files.deleteIfExists(tmp)
    }
  }

  /** Rename-no-overwrite implementation — the HDFS / ABFS / GCS
    * deployment shape (`LogStore.scala:26-28`'s documented contract,
    * now implemented): write a same-directory temp file, then publish
    * it with an atomic rename that FAILS when the destination already
    * exists. Those filesystems guarantee exactly that contract
    * natively (HDFS `FileSystem.rename` without the OVERWRITE flag is
    * checked under the NameNode's namespace lock; ABFS/GCS renames are
    * single metadata operations) — so on a real cluster the protocol
    * below is safe across processes with `renamePrimitive` delegating
    * straight to the filesystem.
    *
    * The primitive is pluggable so the PROTOCOL (temp write → rename →
    * loser-cleanup; no reader ever sees a partial file; exactly one
    * winner per name) is conformance-testable without a cluster:
    * [[RenameNoOverwrite.local]] mocks the namespace-lock contract
    * with a JVM-wide claim table — the same single-JVM arbiter
    * trade-off as Delta's `S3SingleDriverLogStore` — because Linux
    * rename(2) itself silently replaces and cannot back the contract
    * directly (the round-1 lost-update bug; see [[Posix]]).
    *
    * Crash safety matches the POSIX impl: a writer dying before the
    * rename leaves only an invisible `.tmp-*` file (readers resolve
    * `*.txt` names only), and the rename is all-or-nothing, so the
    * version name is never burned by a partial publish. */
  class RenameNoOverwrite(
      renamePrimitive: (Path, Path) => Boolean) extends LogStore {
    override def putIfAbsent(target: Path, body: String): Boolean = {
      val tmp = target.resolveSibling(s".tmp-${UUID.randomUUID()}")
      Files.writeString(tmp, body)
      // the primitive reports an existing destination as `false`, never
      // as an exception — but a racing filesystem may surface the
      // collision as FileAlreadyExists anyway; both mean "lost". The
      // cleanup is a finally (not an if-lost) so an unexpected
      // primitive failure — disk full, permissions, a real HDFS
      // IOException — can't leak `.tmp-*` debris into the log dir; a
      // successful move leaves nothing at tmp, so deleteIfExists is a
      // no-op on the win path (mirrors [[Posix]]).
      try renamePrimitive(tmp, target)
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
      finally Files.deleteIfExists(tmp)
    }
  }

  /** The local mock of the rename-no-overwrite contract: an in-JVM
    * claim table serializes the exists-check with the (itself atomic)
    * `ATOMIC_MOVE`, standing in for the NameNode namespace lock that
    * makes the check-and-rename one operation on real HDFS. Readers
    * can never observe a partial file (the move is atomic); two
    * writers can never both win (the claim admits one checker at a
    * time, and the loser of an interleaved claim reports false —
    * callers treat false as "recompute from the fresh snapshot", so a
    * spurious false under contention costs a retry, never
    * correctness). Single-JVM only, like Delta's
    * S3SingleDriverLogStore — the multi-process guarantee belongs to
    * the real filesystem's rename, not to this mock. */
  object Rename extends RenameNoOverwrite(RenameArbiter.lockedMove)

  /** The claim table behind [[Rename]] — separate from the object so
    * the primitive reference passed to the superclass constructor never
    * touches the under-construction module. */
  private object RenameArbiter {
    private val claims =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    def lockedMove(src: Path, dst: Path): Boolean = {
      val key = dst.toAbsolutePath.normalize.toString
      if (!claims.add(key)) false // another writer is mid-publish
      else try {
        if (Files.exists(dst)) false
        else {
          Files.move(src, dst,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          true
        }
      } finally claims.remove(key)
    }
  }

  /** In-memory fake of the S3 conditional-PUT deployment shape
    * (`PutObject` + `If-None-Match: *`, the post-2024 S3 primitive this
    * trait's scaladoc names) — the test double that pins the SEMANTICS
    * so the real S3 impl is a client call, not design work (r14
    * verdict #5). Faithful to the service contract in the two ways
    * that matter to the protocol:
    *
    *   1. The condition is evaluated at COMMIT time, not at upload
    *      start: two writers may both be mid-"upload" (here: both past
    *      the method entry) and the service admits exactly ONE — the
    *      loser's fully-streamed bytes are DISCARDED atomically (the
    *      409-after-partial-write case: a 409 response never leaves a
    *      partial or replaced object visible). Modeled by the atomic
    *      `putIfAbsent` on the object map being the single commit
    *      point; a loser's body never reaches `target`.
    *   2. Reads of published names go through the store's own view
    *      ([[LogStore.read]] override), so a sidecar published here
    *      verifies here even before (or without) filesystem
    *      materialization.
    *
    * The winner ALSO materializes to the local filesystem, because the
    * engine's bulk log folds read POSIX directly (the trait contract);
    * like [[Rename]], the cross-PROCESS guarantee belongs to the real
    * service — this is a single-JVM arbiter (Delta's
    * S3SingleDriverLogStore trade-off), which is exactly what a
    * contract suite needs. */
  object Memory extends LogStore {
    private val objects =
      new java.util.concurrent.ConcurrentHashMap[String, String]()
    private def keyOf(target: Path): String =
      target.toAbsolutePath.normalize.toString
    override def putIfAbsent(target: Path, body: String): Boolean = {
      // pre-fake history published by another store (or a prior JVM —
      // the map is process-lifetime) still owns the name: without the
      // filesystem check, the later ATOMIC_MOVE would silently REPLACE
      // an existing target (Linux rename(2)) — a lost update
      if (Files.exists(target)) return false
      val won = objects.putIfAbsent(keyOf(target), body) == null
      if (won) {
        val tmp = target.resolveSibling(s".tmp-${UUID.randomUUID()}")
        try {
          Files.writeString(tmp, body)
          // hard-link publish (the Posix technique), NOT a rename: a
          // rename(2) silently REPLACES a target another process
          // created between the exists-check and here — the exact
          // lost update the check guards. A materialization failure
          // rolls the map reservation back, so read() never serves a
          // body whose publish threw (r15 review).
          Files.createLink(target, tmp)
        } catch {
          case e: Throwable =>
            objects.remove(keyOf(target), body)
            e match {
              case _: java.nio.file.FileAlreadyExistsException =>
                return false
              case _ => throw e
            }
        } finally Files.deleteIfExists(tmp)
      }
      won
    }
    override def read(target: Path): Option[String] =
      Option(objects.get(keyOf(target))).orElse(super.read(target))
    /** Test hook: forget every in-memory object (a "service restart" —
      * the filesystem materializations survive, as S3 objects would). */
    private[lake] def reset(): Unit = objects.clear()
  }

  /** The implementation selected by the `spark.graft.logStore` conf:
    * `posix` (default — hard-link create-if-absent), `rename`
    * (temp-write + atomic rename-no-overwrite), or `memory` (the
    * conditional-PUT fake — single-JVM, test/dev only). Every
    * [[MergeTable.apply]] overload resolves through here, so a
    * deployment swaps the commit protocol's storage primitive with one
    * conf line and no code change. */
  def forConf(spark: org.apache.spark.sql.SparkSession): LogStore =
    spark.conf.get("spark.graft.logStore", "posix") match {
      case "posix"  => Posix
      case "rename" => Rename
      case "memory" => Memory
      case other => throw new IllegalArgumentException(
        s"spark.graft.logStore: unknown store '$other' " +
          "(expected 'posix', 'rename' or 'memory')")
    }
}
