package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Read-path operators over a PropertyGraph (SURVEY.md §2.2/§2.3/§2.5/§2.7).
  *
  * Each function is the DataFrame program for one Cypher query the
  * reference issues; Catalyst provides pushdown/pruning/broadcast
  * selection. ID-list probes (tiny) against the edge table are
  * broadcast-hash-join shaped by construction.
  */
object GraphQueries {

  /** S1 `get_sub_graph(limit)` (`api/graph.py:173-194`):
    * `MATCH (src) OPTIONAL MATCH (src)-[e]->(dest) RETURN src,e,dest LIMIT n`
    * — left-outer join nodes→edges→nodes + limit. */
  def getSubGraph(g: PropertyGraph, limit: Int): DataFrame = {
    val src = g.nodes.select(col("id").as("src_id"), col("labels").as("src_labels"),
      col("name").as("src_name"))
    val dst = g.nodes.select(col("id").as("dst_id"), col("labels").as("dst_labels"),
      col("name").as("dst_name"))
    src.join(g.edges.select(col("src"), col("dst"), col("type")),
        col("src_id") === col("src"), "left_outer")
      .join(dst, col("dst") === col("dst_id"), "left_outer")
      .select(col("src_id"), col("src_labels"), col("src_name"), col("type"),
        col("dst_id"), col("dst_labels"), col("dst_name"))
      .limit(limit)
  }

  /** S2/S4/S6 point lookup by (label, name), LIMIT 1
    * (`api/graph.py:269-276`, `:315-322`, `:518-538`). */
  def getByName(g: PropertyGraph, label: String, name: String): DataFrame =
    g.nodes.filter(array_contains(col("labels"), label) &&
      col("name") === lit(name)).limit(1)

  /** S3/S5 point lookup by public ID (`api/graph.py:278-288`). */
  def getById(g: PropertyGraph, id: Long): DataFrame =
    g.nodes.filter(col("id") === lit(id))

  /** S7 `get_file` — exact composite key (path, name, ext)
    * (`api/graph.py:428-466`). */
  def getFile(g: PropertyGraph, path: String, name: String, ext: String): DataFrame =
    g.nodes.filter(array_contains(col("labels"), "File") &&
      col("path") <=> lit(path) && col("name") <=> lit(name) &&
      col("ext") <=> lit(ext))

  /** J1 `get_neighbors(ids, rel?, lbl?)` (`api/graph.py:197-241`): 1-hop
    * expansion with optional edge-type and destination-label filters.
    * The ID list is tiny → Catalyst broadcasts the filtered probe side. */
  def getNeighbors(g: PropertyGraph, ids: Seq[Long],
      relType: Option[String] = None, label: Option[String] = None): DataFrame = {
    val e0 = g.edges.filter(col("src").isin(ids: _*))
    val e = relType.fold(e0)(t => e0.filter(col("type") === lit(t)))
    val dest = g.nodes.select(col("id").as("_nid"), col("labels"), col("name"),
      col("path"))
    val n0 = e.join(dest, col("dst") === col("_nid"))
    label.fold(n0)(l => n0.filter(array_contains(col("labels"), l)))
      .select(col("src"), col("type"), col("_nid").as("id"), col("labels"),
        col("name"), col("path"))
  }

  /** J2 `function_calls` (`api/graph.py:372-380`): callees of the function
    * named `name`, gathered with collect (A2). */
  def functionCalls(g: PropertyGraph, name: String): DataFrame = {
    val fns = g.nodes.filter(array_contains(col("labels"), "Function") &&
      col("name") === lit(name)).select(col("id").as("fid"))
    val callees = g.edges.filter(col("type") === "CALLS")
      .join(fns, col("src") === col("fid"), "left_semi")
      .join(g.nodes.select(col("id").as("_nid"), col("name").as("_nname")),
        col("dst") === col("_nid"))
    callees.agg(sort_array(collect_set(col("_nname"))).as("callees"))
  }

  /** J3 `function_called_by` (`api/graph.py:382-390`): callers of the
    * function named `name` — the incoming-neighbor join (probe on dst). */
  def functionCalledBy(g: PropertyGraph, name: String): DataFrame = {
    val fns = g.nodes.filter(array_contains(col("labels"), "Function") &&
      col("name") === lit(name)).select(col("id").as("fid"))
    val callers = g.edges.filter(col("type") === "CALLS")
      .join(fns, col("dst") === col("fid"), "left_semi")
      .join(g.nodes.select(col("id").as("_nid"), col("name").as("_nname")),
        col("src") === col("_nid"))
    callers.agg(sort_array(collect_set(col("_nname"))).as("callers"))
  }

  /** J4 `get_functions_in_file` (`api/graph.py:306-313`). */
  def getFunctionsInFile(g: PropertyGraph, path: String, name: String,
      ext: String): DataFrame = {
    val fileIds = getFile(g, path, name, ext).select(col("id").as("fid"))
    val fns = g.nodes.filter(array_contains(col("labels"), "Function"))
      .select(col("id").as("_nid"), col("name").as("_nname"),
        col("src_start").as("_nss"), col("src_end").as("_nse"))
    g.edges.filter(col("type") === "DEFINES")
      .join(fileIds, col("src") === col("fid"), "left_semi")
      .join(fns, col("dst") === col("_nid"))
      .select(col("_nid").as("id"), col("_nname").as("name"),
        col("_nss").as("src_start"), col("_nse").as("src_end"))
  }

  /** J5 `get_child_commit` (`api/git_utils/git_graph.py:87-97`). */
  def getChildCommit(g: PropertyGraph, hash: String): DataFrame = {
    val c = g.nodes.filter(array_contains(col("labels"), "Commit") &&
      col("name") === lit(hash)).select(col("id").as("cid"))
    val dest = g.nodes.select(col("id").as("_nid"), col("name").as("_nname"),
      col("doc").as("_ndoc"), col("src_start").as("_nss"))
    g.edges.filter(col("type") === "CHILD")
      .join(c, col("src") === col("cid"), "left_semi")
      .join(dest, col("dst") === col("_nid"))
      .select(col("_nid").as("id"), col("_nname").as("hash"),
        col("_ndoc").as("message"), col("_nss").as("date"))
  }

  /** J8 `unreachable_entities(lbl?, rel?)` (`api/graph.py:612-628`): nodes
    * with no incoming edge of a type — the left-anti join. */
  def unreachableEntities(g: PropertyGraph, label: Option[String] = None,
      relType: Option[String] = None): DataFrame = {
    val n0 = label.fold(g.nodes)(l => g.nodes.filter(array_contains(col("labels"), l)))
    val e0 = relType.fold(g.edges)(t => g.edges.filter(col("type") === lit(t)))
    n0.join(e0.select(col("dst").as("id")), Seq("id"), "left_anti")
  }

  /** A1 `stats` (`api/graph.py:593-610`): node + edge counts. */
  def stats(g: PropertyGraph): DataFrame = {
    val spark = g.nodes.sparkSession
    import spark.implicits._
    Seq(("nodes", g.nodes.count()), ("edges", g.edges.count()))
      .toDF("entity", "n")
  }

  /** S8 `get_commits(hashes)` (`api/git_utils/git_graph.py:69-85`). */
  def getCommits(g: PropertyGraph, hashes: Seq[String]): DataFrame =
    g.nodes.filter(array_contains(col("labels"), "Commit") &&
        col("name").isin(hashes: _*))
      .select(col("id"), col("name").as("hash"), col("doc").as("message"),
        col("src_start").as("date"),
        element_at(col("props"), "author").as("author"))

  /** S9 `list_commits` (`api/git_utils/git_graph.py:59-67`) — the only
    * ORDER BY in the reference. */
  def listCommits(g: PropertyGraph): DataFrame =
    g.nodes.filter(array_contains(col("labels"), "Commit"))
      .select(col("id"), col("name").as("hash"), col("doc").as("message"),
        col("src_start").as("date"),
        element_at(col("props"), "author").as("author"))
      .orderBy(col("date"))

  /** T1 prefix autocomplete (`api/graph.py:324-357`; semantics pinned by
    * `tests/endpoints/test_auto_complete.py:44-50` — startswith on name,
    * LIMIT 10). `startsWith` pushes to the parquet scan as a
    * StringStartsWith filter. */
  def autoComplete(g: PropertyGraph, prefix: String, limit: Int = 10): DataFrame =
    g.nodes.filter(array_contains(col("labels"), GraphSchema.SEARCHABLE) &&
        col("name").startsWith(prefix))
      .select(col("id"), col("labels"), col("name"), col("path"))
      .limit(limit)

  /** T1 scored fulltext twin of [[autoComplete]] — the semantics a real
    * RediSearch `prefix*` query gives the reference (`api/graph.py:324-357`:
    * a TOKENIZED fulltext index, so "re" finds "red widget" by its token,
    * not by the string head) with idf relevance ranking on top. The plain
    * prefix scan above stays the default path because the reference's own
    * tests pin startswith semantics (`tests/endpoints/test_auto_complete
    * .py:44-50`); this is the optional scored path.
    *
    * Shape: names → distinct lowercase tokens (the posting list of an
    * inverted index); only postings matching the prefix survive the filter
    * — so df and scores are computed over the MATCHING postings alone, not
    * the corpus. Score = Σ idf(tok) over a node's matching tokens, idf in
    * the +1-inside-log form (ln(1 + (N−df+0.5)/(df+0.5)), t15's BM25
    * convention) from exact integer aggregates only.
    *
    * Determinism (gate q28): the per-node Σ runs in sorted-token order via
    * `aggregate(array_sort(collect_list(...)))` — one fixed float dataflow,
    * mirrored by DuckDB's ordered aggregate `SUM(... ORDER BY tok)` — and
    * the final rank orders by the ROUNDED score, so the top-k is
    * engine-exact.
    *
    * Scale: tokenize is a map-side explode; the prefix filter cuts postings
    * before any shuffle; df is a grouped count of the survivors; N is a
    * 1-row broadcast aggregate; top-k compiles to TakeOrderedAndProject and
    * only then joins names back (broadcast of ≤ limit rows). At 100 TB the
    * posting list would be a persisted name-bucketed table (build once,
    * probe per keystroke) — same plan minus the tokenize. */
  def autoCompleteScored(g: PropertyGraph, prefix: String,
      limit: Int = 10): DataFrame = {
    val searchable = g.nodes
      .filter(array_contains(col("labels"), GraphSchema.SEARCHABLE))
      .select(col("id"), col("name"))
    val toks = searchable.select(col("id"),
      explode(array_distinct(filter(
        split(lower(col("name")), "[^a-z0-9]+"), t => t =!= lit("")))).as("tok"))
    val corpus = searchable.agg(count(lit(1)).as("n_docs"))
    // tokens are case-folded above, so fold the prefix too — an uppercase
    // query ("Re") must find "red widget", not silently return nothing
    val matches = toks.filter(col("tok").startsWith(prefix.toLowerCase))
    val dfreq = matches.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val scored = matches.join(broadcast(dfreq), "tok")
      .crossJoin(broadcast(corpus))
      .withColumn("idf", idf)
      .groupBy(col("id"))
      .agg(
        round(aggregate(array_sort(collect_list(struct(col("tok"), col("idf")))),
          lit(0.0), (acc, x) => acc + x.getField("idf")), 4).as("score"),
        count(lit(1)).as("n_match"))
    val top = scored.orderBy(col("score").desc, col("id")).limit(limit)
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("score").desc, col("id"))
    broadcast(top).join(searchable, "id")
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("rnk"), col("id"), col("name"), col("score"), col("n_match"))
      .orderBy(col("rnk"))
  }

  /** T2/T3 — the `CONTAINS` + `size()` surface the reference's
    * LLM-generated Cypher leans on (`api/prompts.py:16-23`): searchable
    * nodes whose name contains `needle`, with the name length —
    * `WHERE n.name CONTAINS $x RETURN n, size(n.name)`. Both functions are
    * codegen'd Spark built-ins; `contains` cannot push to parquet as a
    * range but prunes columns. */
  def searchContains(g: PropertyGraph, needle: String): DataFrame =
    g.nodes.filter(array_contains(col("labels"), GraphSchema.SEARCHABLE) &&
        col("name").contains(needle))
      .select(col("id"), col("labels"), col("name"),
        length(col("name")).as("name_len"), size(col("labels")).as("n_labels"))
      .orderBy(col("id"))
}
