package graft.config

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Monitoring-object tree templating — the engine's `xemoclone`
  * (reference xemoclone.c:1-386): clone a monitoring-object config
  * directory tree, substituting `${MACRO}` values on lines carrying
  * the `//!tmpl` marker. The operational pattern: one hand-written
  * template MO tree (filters with `${NET}`, limits with `${LIMIT}`)
  * is stamped out per customer/network, and RE-cloning over a
  * previously materialized tree refreshes the generated lines in
  * place.
  *
  * Line semantics, mirrored from the reference:
  *  - a line containing `//!tmpl` is a TEMPLATE line: it is copied
  *    through verbatim (the template must survive re-cloning), then
  *    its materialization is appended — the marker stripped (first
  *    occurrence, xemoclone.c str_replace:52) and each `${KEY}`
  *    replaced by its value (FIRST occurrence per key per line, in
  *    replacement-list order — the same single-shot str_replace);
  *  - the line FOLLOWING a successfully materialized template is
  *    consumed (it is the stale materialization from the previous
  *    clone, xemoclone.c conf_process:146-152);
  *  - if any `${...}` survives substitution the template is preserved
  *    but NOT materialized (a warning names the unknown macro, or the
  *    malformed one when the brace never closes) and the following
  *    line is kept — the previous materialization outlives a bad
  *    replacement list rather than being destroyed
  *    (xemoclone.c line_process:85-105);
  *  - every other line copies through untouched; directory entries
  *    starting with '.' are skipped (process_recur:201).
  *
  * Documented deviation: the reference's fgets/feof loop silently
  * drops a final line that lacks a trailing newline
  * (xemoclone.c:133-138); that is data loss with no semantic intent,
  * so it is NOT replicated (same stance as the mfreq double-increment
  * bug, SURVEY §7.3).
  *
  * Driver-side utility by design — config trees are files on the
  * operator's machine, not datasets; the runtime half of the MO story
  * (parsing, hierarchical filters, hot-reload) lives in [[MoConfig]]
  * and [[Reloadable]].
  */
object MoClone {

  val TemplateMark = "//!tmpl"

  final case class Warning(file: String, lineNo: Long, msg: String)

  /** First-occurrence literal replace (the reference's str_replace). */
  private def replaceFirst(s: String, find: String,
                           rep: String): String = {
    val at = s.indexOf(find)
    if (at < 0) s
    else s.substring(0, at) + rep + s.substring(at + find.length)
  }

  /** `"A=B;C=D"` → ordered pairs; mirrors replacement_list_parse
    * (xemoclone.c:232-303): keys/values whitespace-trimmed, the FIRST
    * '=' splits, parsing stops (with whatever was parsed so far) at a
    * malformed tail — missing '=' or empty value. */
  def parseReplacements(repl: String): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    var rest = repl.trim
    var done = rest.isEmpty
    while (!done) {
      val eq = rest.indexOf('=')
      if (eq < 0) done = true // "missing '='"
      else {
        val key = rest.substring(0, eq).trim
        val tail = rest.substring(eq + 1)
        if (tail.isEmpty) done = true // "no value"
        else {
          val semi = tail.indexOf(';')
          val (v, next) =
            if (semi >= 0) (tail.substring(0, semi).trim,
              tail.substring(semi + 1))
            else (tail.trim, "")
          out += key -> v
          rest = next
          done = rest.isEmpty
        }
      }
    }
    out.result()
  }

  /** Materialize one template line: marker stripped, first occurrence
    * of each `${key}` substituted in list order; Left(warning) when an
    * unresolved or malformed `${` survives (the caller then keeps the
    * previous materialization). */
  def processLine(line: String,
                  repl: Seq[(String, String)]): Either[String, String] = {
    var s = replaceFirst(line, TemplateMark, "")
    repl.foreach { case (k, v) => s = replaceFirst(s, "${" + k + "}", v) }
    val at = s.indexOf("${")
    if (at < 0) Right(s)
    else {
      val end = s.indexOf('}', at + 2)
      if (end < 0) Left("malformed macro")
      else Left(s"macro $${${s.substring(at + 2, end)}} is not in " +
        "replacements list")
    }
  }

  /** The per-file pass (conf_process), pure over line sequences. */
  def processLines(lines: Seq[String], repl: Seq[(String, String)],
                   file: String): (Seq[String], Seq[Warning]) = {
    val out = Seq.newBuilder[String]
    val warns = Seq.newBuilder[Warning]
    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      i += 1
      if (line.contains(TemplateMark)) {
        out += line // the template survives re-cloning
        processLine(line, repl) match {
          case Right(mat) =>
            out += mat
            if (i < lines.length) i += 1 // consume the stale line
          case Left(msg) =>
            warns += Warning(file, i.toLong, msg)
            warns += Warning(file, i.toLong,
              s"skipping template '${line.trim}'")
          // stale materialization NOT consumed: it copies through on
          // the next iteration, preserving the previous values
        }
      } else out += line
    }
    (out.result(), warns.result())
  }

  /** Recursive tree clone (process_recur): mirror directories, process
    * every regular file, skip dot-entries. Returns all warnings. */
  def cloneTree(src: File, dst: File,
                repl: Seq[(String, String)]): Seq[Warning] = {
    require(src.isDirectory, s"not a directory: $src")
    require(dst.isDirectory || dst.mkdirs(), s"cannot create $dst")
    val warns = Seq.newBuilder[Warning]
    Option(src.listFiles()).getOrElse(Array.empty)
      .filterNot(_.getName.startsWith("."))
      .sortBy(_.getName) // deterministic walk (readdir order is not)
      .foreach { f =>
        val out = new File(dst, f.getName)
        if (f.isDirectory) warns ++= cloneTree(f, out, repl)
        else if (f.isFile) {
          val lines = Files.readAllLines(f.toPath,
            StandardCharsets.UTF_8)
          val (processed, w) = processLines(
            scala.jdk.CollectionConverters.ListHasAsScala(lines)
              .asScala.toSeq,
            repl, f.getPath)
          warns ++= w
          Files.write(out.toPath,
            processed.mkString("", "\n", "\n")
              .getBytes(StandardCharsets.UTF_8))
        }
      }
    warns.result()
  }

  /** CLI parity: `-i SRC_DIR -o DST_DIR [-r "A=B[;C=D[;...]]"]`. */
  def main(args: Array[String]): Unit = {
    def opt(flag: String): Option[String] =
      args.sliding(2).collectFirst {
        case Array(`flag`, v) => v }
    val in = opt("-i").getOrElse {
      System.err.println("Input dir required (-i ...)"); sys.exit(1) }
    val outDir = opt("-o").getOrElse {
      System.err.println("Output dir required (-o ...)"); sys.exit(1) }
    val repl = opt("-r").map(parseReplacements).getOrElse {
      System.err.println("WARN: Empty replacements list"); Seq.empty }
    cloneTree(new File(in), new File(outDir), repl).foreach { w =>
      System.err.println(
        s"WARN: file '${w.file}', line ${w.lineNo}: ${w.msg}")
    }
  }
}
