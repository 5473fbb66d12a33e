package graft.core

import scala.jdk.CollectionConverters._
import graft.config.GraftConfigError

/** Runtime-extensibility SPI — the JVM-idiomatic equivalent of the
  * reference's plugin system (FFI dylib loader src/plugin_loader.rs:1-393,
  * WASM component loader src/wasm_plugin_loader.rs:1-413, published ABI
  * conveyor-plugin-api/src/lib.rs, discovery via registry.json).
  *
  * Where the reference needs a C ABI + handshake because its plugins cross
  * a language boundary, a Spark engine's natural boundary is the CLASSPATH:
  * third-party stages are ordinary JVM classes discovered through
  * `java.util.ServiceLoader` — the same mechanism Spark itself uses for
  * DataSourceRegister — so a plugin jar works identically on a laptop and
  * on a 1000-executor cluster (`spark-submit --jars` ships it; stages are
  * plan-builders that run on the DRIVER, so executors only ever see the
  * closures/expressions the plan already carries).
  *
  * A pipeline opts in via
  * {{{
  * [global]
  * plugins = ["/path/to/my-stages.jar", "com.example.MyPlugin"]
  * }}}
  * Each entry is either a jar path (ServiceLoader discovery of
  * `graft.core.GraftPlugin` providers via META-INF/services) or a fully
  * qualified class name already on the classpath (a `GraftPlugin` bundle
  * or a single `Stage`; Scala `object`s resolve through MODULE$).
  */
trait GraftPlugin {
  /** Stages this plugin contributes. `java.util.List` keeps the SPI
    * implementable from plain Java without scala-library imports. */
  def stages: java.util.List[Stage]
}

/** Java-friendly base class for plugin stages: implement `name()` and
  * `apply(ctx)`; override `kindName` ("source" | "transform" | "sink",
  * default "transform") instead of touching Scala's StageKind objects.
  */
abstract class PluginStage extends Stage {
  def kindName: String = "transform"
  final def kind: StageKind = kindName match {
    case "source"    => StageKind.Source
    case "sink"      => StageKind.Sink
    case "transform" => StageKind.Transform
    case other => throw new GraftConfigError(
      s"plugin stage '$name': kindName must be source|transform|sink, got '$other'")
  }
}

object PluginLoader {

  /** Resolve `global.plugins` entries to (stage, provenance) pairs.
    * Fails loud on a missing jar, an empty services file, or a class that
    * is neither a GraftPlugin nor a Stage — a silently-skipped plugin is a
    * pipeline that runs the wrong stages. */
  def load(specs: Seq[String]): Seq[(Stage, String)] = specs.flatMap { spec =>
    if (spec.endsWith(".jar")) loadJar(spec)
    else loadClass(spec).map(s => s -> s"class ${spec}")
  }

  private def loadJar(path: String): Seq[(Stage, String)] = {
    val f = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.isRegularFile(f))
      throw new GraftConfigError(s"plugin jar not found: $path")
    // parent-last is NOT wanted here: the plugin must share graft.core and
    // Spark classes with the engine, so the jar URL extends the app loader
    val cl = new java.net.URLClassLoader(Array(f.toUri.toURL), getClass.getClassLoader)
    val providers = java.util.ServiceLoader.load(classOf[GraftPlugin], cl)
      .iterator().asScala.toSeq
    if (providers.isEmpty)
      throw new GraftConfigError(s"plugin jar $path declares no providers — add " +
        "META-INF/services/graft.core.GraftPlugin listing your GraftPlugin implementations")
    providers.flatMap(p => p.stages.asScala.map(s => s -> s"$path (${p.getClass.getName})"))
  }

  private def loadClass(fqcn: String): Seq[Stage] = {
    // a Scala `object` compiles to <name>$ with a static MODULE$ (the
    // plain <name> class only carries static forwarders, no constructor).
    // A MODULE$ that is itself no plugin may just be the COMPANION of a
    // perfectly valid plugin class — fall through to instantiating the
    // class in that case instead of rejecting it.
    val scalaObject: Option[Any] =
      try {
        val c = Class.forName(if (fqcn.endsWith("$")) fqcn else fqcn + "$")
        Some(c.getField("MODULE$").get(null))
      } catch { case _: Exception => None }
    def fromClass(): Any = {
      val cls =
        try Class.forName(fqcn)
        catch { case _: ClassNotFoundException =>
          throw new GraftConfigError(s"plugin class '$fqcn' not found on the classpath — " +
            "give the jar path instead, or ship the class via spark.jars / --jars")
        }
      try cls.getDeclaredConstructor().newInstance()
      catch { case e: ReflectiveOperationException =>
        throw new GraftConfigError(s"plugin class '$fqcn' could not be instantiated " +
          s"(needs a public no-arg constructor): $e")
      }
    }
    val inst = scalaObject match {
      case Some(o) if o.isInstanceOf[GraftPlugin] || o.isInstanceOf[Stage] => o
      case _ => fromClass()
    }
    inst match {
      case p: GraftPlugin => p.stages.asScala.toSeq
      case s: Stage       => Seq(s)
      case _ => throw new GraftConfigError(s"plugin class '$fqcn' implements neither " +
        "graft.core.GraftPlugin nor graft.core.Stage")
    }
  }
}
