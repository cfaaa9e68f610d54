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
  *     Linux rename(2), which silently replaces).
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
}
