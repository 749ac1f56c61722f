package graft.ext

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

/** The one store-replacement discipline shared by every rewriting
  * maintenance pass ([[IvfIndex.rewrite]], [[Dedup.compactNearDupIndex]],
  * [[Ledger.compact]]): the new store is fully written to `<dir>.compact`
  * (or `.rewrite`) FIRST, then two atomic renames swap it in, so a
  * concurrent reader never observes a half-written store. The previous
  * store is retained under `<dir>.old` for the caller's retention
  * policy (roll back, archive, delete); a STALE `.old` from an earlier
  * pass is deleted before the swap — maintenance must be re-runnable,
  * and only ever one generation of rollback is kept.
  */
private[ext] object StoreSwap {

  /** Replace the store at `dir` with the fully-written store at `tmp`.
    * Atomic per rename; deletes a stale `<dir>.old` first.
    */
  def swap(dir: String, tmp: String): Unit = {
    val old = Paths.get(s"$dir.old")
    deleteRecursively(old)
    Files.move(Paths.get(dir), old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), Paths.get(dir), StandardCopyOption.ATOMIC_MOVE)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => { Files.delete(f); () })
}
