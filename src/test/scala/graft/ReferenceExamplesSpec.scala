package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.config.PipelineConfig
import graft.core.{DagCompiler, Registry}

/** Config-compatibility proof: every example pipeline TOML the reference
  * ships (reference examples directory, read-only) must parse through our
  * TOML front-end, validate (ids, inputs, cycles), and resolve every stage
  * function in our registry — i.e. a reference user's pipeline files work
  * here unchanged.
  */
class ReferenceExamplesSpec extends AnyFunSuite {
  private val dir = new java.io.File("/root/reference/examples")
  private val reg = Registry.withDefaults

  private def tomls(d: java.io.File): Seq[java.io.File] =
    Option(d.listFiles()).getOrElse(Array.empty).toSeq.flatMap { f =>
      if (f.isDirectory) tomls(f)
      else if (f.getName.endsWith(".toml") && f.getName != "Cargo.toml") Seq(f)
      else Seq.empty
    }.filterNot(_.getPath.contains("plugin-template"))

  test("every reference example pipeline parses, validates, and resolves") {
    val files = tomls(dir)
    assert(files.nonEmpty, "no reference examples found")
    val failures = files.flatMap { f =>
      try {
        val pc = PipelineConfig.fromFile(f.getPath)
        DagCompiler.default.toposortCheck(pc)
        val unknown = pc.stages.map(_.function).filterNot(reg.contains)
        if (unknown.nonEmpty) Seq(s"${f.getName}: unknown functions ${unknown.mkString(", ")}")
        else Seq.empty
      } catch {
        case e: Exception => Seq(s"${f.getName}: ${e.getClass.getSimpleName} ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    info(s"${files.size} reference example pipelines parse + resolve")
  }
}
