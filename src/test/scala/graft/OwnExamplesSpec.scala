package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.config.PipelineConfig
import graft.core.{DagCompiler, Registry}

/** Every TOML shipped in OUR examples/ directory must parse, validate, and
  * resolve against the registry (the reference's examples are covered by
  * ReferenceExamplesSpec; these are the graft-native showcases the README
  * points at). */
class OwnExamplesSpec extends AnyFunSuite {
  private val reg = Registry.withDefaults

  test("all graft example pipelines parse, validate, and resolve") {
    val dir = new java.io.File("examples")
    val tomls = dir.listFiles().filter(_.getName.endsWith(".toml")).sortBy(_.getName)
    assert(tomls.nonEmpty, "examples/ has no TOML files?")
    tomls.foreach { f =>
      val cfg = PipelineConfig.fromString(
        new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
      DagCompiler.default.toposortCheck(cfg)
      cfg.stages.foreach { st =>
        assert(reg.contains(st.function),
          s"${f.getName}: unknown function '${st.function}'")
      }
    }
    info(s"${tomls.length} graft example pipelines resolve")
  }
}
