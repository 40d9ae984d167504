package graft

/** Phase timing for operator internals, printed only when GRAFT_PROF
  * is set (bench/verify runs never pay or print it) — the
  * measure-first hook the optimization rounds drive. */
object Prof {
  val enabled: Boolean = sys.env.contains("GRAFT_PROF")
  def timed[A](label: => String)(f: => A): A =
    if (!enabled) f
    else {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
}
