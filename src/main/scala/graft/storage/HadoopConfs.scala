package graft.storage

import org.apache.hadoop.conf.Configuration

/** Process-wide parsed-once default Hadoop Configuration.
  *
  * `new Configuration()` looks core-default.xml up in the classpath
  * (jar-entry probe), inflates and XML-parses it — ~10-30 ms of driver
  * or task CPU — on its FIRST property read. The engine built one per
  * file-partition reader (twice in the vectorized reader), per DV
  * sidecar load and per writer bridge; sampled on the warm q102
  * lifecycle this was ~6 % of wall in `Configuration.loadResource`
  * alone. The copy constructor clones the loaded property table without
  * re-parsing, so one eagerly-loaded template amortizes the parse to
  * once per JVM (once per executor at scale).
  *
  * Semantics identical to `new Configuration()`: the template is a
  * plain default-resource Configuration, copies are freely mutable and
  * never shared.
  */
object HadoopConfs {
  // ONE parsed template per JVM...
  private lazy val parsed: Configuration = {
    val c = new Configuration()
    c.size() // force the default-resource parse NOW, once per JVM
    c
  }
  // ...copied once per thread: Configuration's copy constructor
  // synchronizes on its SOURCE, so per-call copies from one process-wide
  // template would serialize every concurrent task through a single
  // lock. Each thread pays the global lock exactly once (its own
  // template copy) and every later fresh() locks only the thread's own
  // object — uncontended by construction.
  private val template: ThreadLocal[Configuration] =
    ThreadLocal.withInitial(() => new Configuration(parsed))

  /** A mutable copy of the defaults — drop-in for `new Configuration()`. */
  def fresh(): Configuration = new Configuration(template.get())
}
