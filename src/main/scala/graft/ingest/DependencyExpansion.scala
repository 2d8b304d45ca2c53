package graft.ingest

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** F9 dependency expansion (`/root/reference/api/analyzers/python/
  * analyzer.py:21-37`): extend the ingest file list with the sources of the
  * repo's declared Python dependencies, so cross-package references resolve
  * against real definitions instead of stubs.
  *
  * The reference creates a venv and pip-installs the manifest before
  * globbing the top-level `.py` files of `venv/lib/…/site-packages/<pkg>`.
  * Installation is an
  * environment side effect, not a data operation — this engine only does
  * the declarative part: parse the manifest (`pyproject.toml`
  * `[tool.poetry.dependencies]` table or `requirements.txt`), then list
  * each declared package's top-level `*.py` under any `site-packages` dir
  * already present in `venv/lib` (same direct-children glob the reference
  * uses). If no venv exists the expansion is empty — mirroring the
  * reference, which also contributes nothing when installation failed.
  *
  * Deviation noted: the reference's requirements.txt branch globs with the
  * *list* `[name, version]` interpolated into the pattern (never matches —
  * `analyzer.py:35-37`); we implement the evident intent, the package name.
  */
object DependencyExpansion {

  /** Package names declared by the repo's Python manifest, in file order:
    * `pyproject.toml` wins over `requirements.txt` like the reference. */
  def declaredDependencies(repoRoot: Path): Seq[String] = {
    val pyproject = repoRoot.resolve("pyproject.toml")
    val requirements = repoRoot.resolve("requirements.txt")
    if (Files.isRegularFile(pyproject)) poetryDependencies(pyproject)
    else if (Files.isRegularFile(requirements)) {
      Files.readAllLines(requirements).asScala.toSeq
        .map(_.trim).filter(_.nonEmpty).filterNot(_.startsWith("#"))
        .map(_.split("==|>=|<=|~=|!=|>|<|;|\\[").head.trim)
        .filter(_.nonEmpty)
    } else Seq.empty
  }

  /** Minimal TOML table scan: keys of `[tool.poetry.dependencies]` until
    * the next `[section]`. */
  private def poetryDependencies(pyproject: Path): Seq[String] = {
    val lines = Files.readAllLines(pyproject).asScala.toSeq.map(_.trim)
    val start = lines.indexOf("[tool.poetry.dependencies]")
    if (start < 0) Seq.empty
    else lines.drop(start + 1)
      .takeWhile(l => !l.startsWith("["))
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains("="))
      .map(_.split("=").head.trim.stripPrefix("\"").stripSuffix("\""))
      .filter(_.nonEmpty)
  }

  /** Source paths of every declared dependency: the top-level `.py` files
    * of `<repo>/venv/lib/…/site-packages/<pkg>` (direct children, matching
    * the reference's glob). */
  def expand(repoRoot: Path): Seq[Path] = {
    val venvLib = repoRoot.resolve("venv").resolve("lib")
    if (!Files.isDirectory(venvLib)) return Seq.empty
    val deps = declaredDependencies(repoRoot)
    if (deps.isEmpty) return Seq.empty
    val walk = Files.walk(venvLib)
    val sitePackages =
      try walk.iterator().asScala
        .filter(p => Files.isDirectory(p) &&
          p.getFileName.toString == "site-packages")
        .toSeq
      finally walk.close()
    for {
      sp <- sitePackages
      dep <- deps
      pkgDir = sp.resolve(dep)
      if Files.isDirectory(pkgDir)
      listing = Files.list(pkgDir)
      f <- (try listing.iterator().asScala.toSeq.sortBy(_.toString)
            finally listing.close())
      if f.getFileName.toString.endsWith(".py")
    } yield f
  }

  /** [[expand]] materialized as ingest inputs, paths repo-relative.
    * Decoding replaces malformed UTF-8 instead of aborting: one latin-1
    * source in a dependency must not kill the whole ingest. */
  def sourceFiles(repoRoot: Path): Seq[Ingestor.SourceFile] =
    expand(repoRoot).map { p =>
      Ingestor.SourceFile(repoRoot.relativize(p).toString,
        new String(Files.readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8))
    }
}
