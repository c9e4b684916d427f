package graft

/** Per-JVM-unique scratch directories for the roundtrip/mover queries.
  *
  * A fixed `/tmp/graft_q02_csv`-style path lets two concurrent sessions
  * (e.g. a Verify run next to a Bench run) overwrite each other's files
  * mid-read; suffixing the root with a per-JVM nonce isolates runs while
  * still letting repeated executions INSIDE one run reuse their dir
  * (every writer uses SaveMode.Overwrite).
  */
object RunTmp {
  private val root: String = {
    val r = s"${System.getProperty("java.io.tmpdir")}/graft_" +
      java.util.UUID.randomUUID().toString.take(8)
    val f = new java.io.File(r)
    f.mkdirs()
    // recursive cleanup at JVM exit (File.deleteOnExit cannot remove
    // non-empty directories — without this every run leaks its outputs)
    sys.addShutdownHook {
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles()).foreach(_.foreach(rm))
        p.delete(): Unit
      }
      rm(f)
    }
    r
  }

  /** Absolute path of a named scratch dir under this run's root. */
  def dir(name: String): String = s"$root/$name"
}
