package graft.git

import scala.sys.process._

/** Thin driver-side wrapper over the `git` CLI — the Spark-native stand-in
  * for the reference's pygit2 bindings (`/root/reference/api/git_utils/
  * git_utils.py:1-10`). History walking is inherently sequential
  * orchestration; the distributed work (re-analysis, graph rewrites)
  * happens in Spark, so a subprocess per git operation on the driver is the
  * right cost model (one `git` call per commit, not per file).
  */
object GitCli {

  /** Commit metadata — mirrors the pygit2 fields the reference reads
    * (`git_graph.py:45-57`): short_id, author.name, commit_time, message. */
  final case class CommitInfo(hash: String, author: String, date: Long,
      message: String)

  private def run(repoDir: String, args: String*): String = {
    val cmd = Seq("git", "-C", repoDir) ++ args
    val out = new StringBuilder
    val err = new StringBuilder
    val code = Process(cmd).!(ProcessLogger(l => out.append(l).append('\n'),
      l => err.append(l).append('\n')))
    require(code == 0, s"git ${args.mkString(" ")} failed ($code): $err")
    out.toString
  }

  /** First-parent history, newest first — the same linear walk as the
    * reference (`git_utils.py:113-114`: `child_commit.parents[0]`). */
  def firstParentLog(repoDir: String): Seq[CommitInfo] =
    run(repoDir, "log", "--first-parent", "--format=%h%x09%an%x09%at%x09%s")
      .linesIterator.filter(_.nonEmpty).map { line =>
        val f = line.split('\t')
        CommitInfo(f(0), f(1), f(2).toLong, if (f.length > 3) f(3) else "")
      }.toSeq

  def headCommit(repoDir: String): CommitInfo = firstParentLog(repoDir).head

  /** `git diff --name-status from to` → (status letter, path). Rename
    * detection is disabled so renames surface as ADD+DELETE pairs, matching
    * the reference's pygit2 delta statuses (`git_utils.py:53-68`). */
  def diffNameStatus(repoDir: String, from: String, to: String): Seq[(String, String)] =
    run(repoDir, "diff", "--no-renames", "--name-status", from, to)
      .linesIterator.filter(_.nonEmpty).map { line =>
        val f = line.split('\t')
        (f(0).take(1), f(1))
      }.toSeq

  /** Force-checkout a commit (detached) — `checkout_tree(…, FORCE)`
    * (`git_utils.py:141`). */
  def checkout(repoDir: String, hash: String): Unit = {
    run(repoDir, "checkout", "-f", "-q", hash); ()
  }

  /** `git clone <url> <dest>` (`api/project.py:30-38` `_clone_source`).
    * Driver-side orchestration like every other git call; the clone's
    * working tree is then read by the distributed ingest. */
  def clone(url: String, destDir: String): Unit = {
    val err = new StringBuilder
    val code = Process(Seq("git", "clone", "-q", url, destDir))
      .!(ProcessLogger(_ => (), l => err.append(l).append('\n')))
    require(code == 0, s"git clone $url failed ($code): $err")
  }
}
