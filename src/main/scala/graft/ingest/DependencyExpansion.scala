package graft.ingest

import java.nio.file.{Files, Path, Paths => JavaPaths}
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

  // ---- Java half (`api/analyzers/java/analyzer.py:22-38`): pom.xml deps →
  // `<artifact>-<version>-sources.jar` under the local Maven repository.

  /** C# leg (`api/analyzers/csharp/analyzer.py:26-30`): when the repo root
    * holds a `.csproj`/`.sln`, run `dotnet restore` in it. A pure
    * environment side effect — NuGet populates its cache; the ingest file
    * list is never extended — mirrored here for parity. Skipped (false)
    * when `temp_deps_cs` already exists (the reference's marker), no
    * project file is present, or the dotnet CLI is unavailable — this
    * engine's containers routinely lack it, and a missing toolchain must
    * degrade to a no-op, not kill the ingest. */
  def dotnetRestore(repoRoot: Path): Boolean = {
    import scala.sys.process._
    if (Files.isDirectory(repoRoot.resolve("temp_deps_cs"))) return false
    val listing = Files.list(repoRoot)
    val hasProj =
      try listing.iterator().asScala.exists { p =>
        val n = p.getFileName.toString
        n.endsWith(".csproj") || n.endsWith(".sln")
      } finally listing.close()
    if (!hasProj) return false
    if (!dotnetAvailable) return false
    Process(Seq("dotnet", "restore"), repoRoot.toFile)
      .!(ProcessLogger(_ => ())) == 0
  }

  /** True when a `dotnet` CLI answers on this machine. */
  def dotnetAvailable: Boolean = {
    import scala.sys.process._
    try Process(Seq("dotnet", "--version")).!(ProcessLogger(_ => ())) == 0
    catch { case _: java.io.IOException => false }
  }

  /** (groupId, artifactId, version) triples of `pom.xml`'s
    * `<dependencies>` section, in file order. Line-oriented scan — enough
    * for the flat structure the reference reads with ElementTree. */
  def declaredMavenDependencies(repoRoot: Path): Seq[(String, String, String)] = {
    val pom = repoRoot.resolve("pom.xml")
    if (!Files.isRegularFile(pom)) return Seq.empty
    val xml = new String(Files.readAllBytes(pom),
      java.nio.charset.StandardCharsets.UTF_8)
    val dep = "(?s)<dependency>(.*?)</dependency>".r
    def tag(body: String, t: String): Option[String] =
      s"(?s)<$t>\\s*(.*?)\\s*</$t>".r.findFirstMatchIn(body).map(_.group(1))
    dep.findAllMatchIn(xml).toSeq.flatMap { m =>
      for {
        g <- tag(m.group(1), "groupId")
        a <- tag(m.group(1), "artifactId")
        v <- tag(m.group(1), "version")
      } yield (g, a, v)
    }
  }

  /** `.java` entry names of each declared dependency's sources jar found in
    * `m2Repo` (default `~/.m2/repository`) — the reference unzips these
    * next to the repo; we read entries straight from the jar. Returns
    * (jarPath, entryName, source) rows ready for the JSONL/Java frontend. */
  /** The analyzers' whole dependency pass, as the ingest entry points run
    * it: `dotnet restore` for its NuGet-cache side effect (C# leg), then
    * pip site-packages + Maven sources-jar files, deduped by path against
    * the repo sources already read (a non-ignored `venv/` walk will have
    * picked the pip files up itself — expansion must stay idempotent). */
  def expandAll(repoRoot: Path,
      already: Seq[Ingestor.SourceFile]): Seq[Ingestor.SourceFile] = {
    dotnetRestore(repoRoot)
    val seen = already.map(_.path).toSet
    (sourceFiles(repoRoot) ++ mavenSourceFiles(repoRoot))
      .filterNot(s => seen(s.path))
  }

  def mavenSourceFiles(repoRoot: Path,
      m2Repo: Option[Path] = None): Seq[Ingestor.SourceFile] = {
    val repo = m2Repo.getOrElse(
      JavaPaths.get(System.getProperty("user.home"), ".m2", "repository"))
    declaredMavenDependencies(repoRoot).flatMap { case (g, a, v) =>
      val jar = repo.resolve(g.replace('.', '/')).resolve(a).resolve(v)
        .resolve(s"$a-$v-sources.jar")
      if (!Files.isRegularFile(jar)) Seq.empty
      else {
        val zf = new java.util.zip.ZipFile(jar.toFile)
        try zf.entries().asScala.toSeq
          .filter(e => !e.isDirectory && e.getName.endsWith(".java"))
          .sortBy(_.getName)
          .map { e =>
            val bytes = zf.getInputStream(e).readAllBytes()
            Ingestor.SourceFile(s"$a-$v/${e.getName}",
              new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
          }
        finally zf.close()
      }
    }
  }
}
