package graft

import graft.config.{MoClone, MoConfig}
import org.scalatest.funsuite.AnyFunSuite

/** xemoclone parity: template-marked lines materialize below the
  * preserved template, re-cloning refreshes in place, failed
  * substitution keeps the previous materialization. */
class MoCloneSpec extends AnyFunSuite {

  private val repl = Seq("NET" -> "10.0.0.0/8", "LIMIT" -> "5000000")

  test("parseReplacements: trim, first '=', malformed tail stops") {
    assert(MoClone.parseReplacements(" A = B ; C=D ") ==
      Seq("A" -> "B", "C" -> "D"))
    // missing '=' in the tail: keep what parsed so far
    assert(MoClone.parseReplacements("A=B;garbage") == Seq("A" -> "B"))
    // empty value: same
    assert(MoClone.parseReplacements("A=B;C=") == Seq("A" -> "B"))
    assert(MoClone.parseReplacements("") == Seq.empty)
    // first '=' splits; later '=' belongs to the value
    assert(MoClone.parseReplacements("K=a=b") == Seq("K" -> "a=b"))
  }

  test("processLine: marker stripped, FIRST occurrence per key, " +
    "unknown/malformed macros refuse") {
    assert(MoClone.processLine(
      """  "filter": "net ${NET}", //!tmpl""", repl) ==
      Right("""  "filter": "net 10.0.0.0/8", """))
    // single-shot substitution — the reference's str_replace quirk:
    // the SECOND ${NET} survives, so the line refuses to materialize
    assert(MoClone.processLine("${NET} ${NET} //!tmpl", repl)
      .left.exists(_.contains("${NET}")))
    assert(MoClone.processLine("x ${NOPE} //!tmpl", repl)
      .left.exists(_.contains("${NOPE}")))
    assert(MoClone.processLine("x ${broken //!tmpl", repl)
      .left.exists(_.contains("malformed")))
  }

  test("processLines: materialization follows the template; the stale " +
    "line is consumed on success, preserved on failure") {
    val in = Seq(
      "plain line",
      """"filter": "net ${NET}", //!tmpl""",
      """"filter": "net 172.16.0.0/12",""", // stale materialization
      "tail")
    val (out, warns) = MoClone.processLines(in, repl, "f")
    assert(out == Seq(
      "plain line",
      """"filter": "net ${NET}", //!tmpl""",
      """"filter": "net 10.0.0.0/8", """, // marker strip keeps the space
      "tail"))
    assert(warns.isEmpty)

    // unknown macro: template kept, previous materialization survives
    val (out2, warns2) = MoClone.processLines(in,
      Seq("OTHER" -> "x"), "f")
    assert(out2 == Seq(
      "plain line",
      """"filter": "net ${NET}", //!tmpl""",
      """"filter": "net 172.16.0.0/12",""",
      "tail"))
    assert(warns2.exists(_.msg.contains("${NET}")))

    // first-time clone (no stale line yet): template at EOF is fine
    val (out3, _) = MoClone.processLines(
      Seq("""net ${NET} //!tmpl"""), repl, "f")
    assert(out3 == Seq("""net ${NET} //!tmpl""", "net 10.0.0.0/8 "))
  }

  test("re-cloning a cloned tree refreshes the generated lines in place") {
    val (once, _) = MoClone.processLines(
      Seq("""limit ${LIMIT} //!tmpl"""), repl, "f")
    val (twice, _) = MoClone.processLines(once,
      Seq("LIMIT" -> "9000000"), "f")
    assert(twice == Seq("""limit ${LIMIT} //!tmpl""", "limit 9000000 "))
    // idempotent under the same replacements
    val (again, _) = MoClone.processLines(once, repl, "f")
    assert(again == once)
  }

  test("cloneTree: recursion, dot-entries skipped, and the cloned " +
    "mo.conf is a working MoConfig") {
    val src = java.nio.file.Files.createTempDirectory("moclone_src")
    val dst = java.nio.file.Files.createTempDirectory("moclone_dst")
    val moDir = new java.io.File(src.toFile, "customer_template")
    moDir.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(moDir, "mo.conf").toPath,
      // the line under a template is ALWAYS its materialization slot
      // (consumed and rewritten on every clone) — template trees ship
      // with a placeholder there, exactly like the reference's
      """{
        |"filter": "dst net ${NET}", //!tmpl
        |"filter": "dst net 0.0.0.0/0",
        |"fwm": [ { "name": "w", "fields": ["octets"], "time": 30 } ]
        |}""".stripMargin.getBytes("UTF-8"))
    java.nio.file.Files.write(
      new java.io.File(src.toFile, ".hidden").toPath,
      "nope".getBytes("UTF-8"))
    val warns = MoClone.cloneTree(src.toFile, dst.toFile, repl)
    assert(warns.isEmpty)
    assert(!new java.io.File(dst.toFile, ".hidden").exists())
    val cloned = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dst.toFile,
        "customer_template/mo.conf").toPath), "UTF-8")
    // the template line carries the marker; MoConfig's comment
    // stripping ('//' to EOL) makes the materialized line win the
    // JSON parse — exactly how the reference's generated configs load
    val mo = MoConfig.parse("c1", cloned)
    assert(mo.filter == "dst net 10.0.0.0/8")
    assert(mo.fwm.head.name == "w")
  }
}
