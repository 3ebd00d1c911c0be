package graft.tools

/** Hypervisor-steal / iowait meter over `/proc/stat`, so a timing
  * artifact can say WHICH host pathology degraded its window instead
  * of inferring it from gauge ratios alone: high steal = the
  * hypervisor gave this VM's cycles to a neighbor (the CPU never ran
  * at all — wall inflates uniformly, shuffle-light and shuffle-heavy
  * alike); high iowait = the documented writeback-storm signature
  * (shuffle-heavy queries degrade MORE than kernel-bound ones); both
  * ~0 while wall still inflates = in-process contention, look at the
  * suite, not the host. Fractions are of total cpu ticks summed over
  * all cores across the sampled window, read from the aggregate
  * first line of /proc/stat (user nice system idle iowait irq
  * softirq steal).
  */
object HostMeter {
  /** (steal, iowait, total) cumulative ticks, or None off-Linux. */
  private def sample(): Option[(Long, Long, Long)] =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = src.getLines().next().trim.split("\\s+").drop(1)
          .map(_.toLong)
        if (f.length < 8) None else Some((f(7), f(4), f.take(8).sum))
      } finally src.close()
    } catch { case _: Throwable => None }

  /** Open a measurement window; the returned thunk closes it and
    * yields (stealFraction, iowaitFraction) over the window. */
  def start(): () => Option[(Double, Double)] = {
    val s0 = sample()
    () =>
      for {
        (st0, io0, t0) <- s0
        (st1, io1, t1) <- sample()
        if t1 > t0
      } yield ((st1 - st0).toDouble / (t1 - t0),
               (io1 - io0).toDouble / (t1 - t0))
  }

  /** "steal=3.1% iowait=0.4%" (or "" when /proc/stat is absent) —
    * the shared human format for TimeQuery lines. */
  def describe(w: Option[(Double, Double)]): String = w match {
    case Some((st, io)) =>
      f"steal=${st * 100}%.1f%% iowait=${io * 100}%.1f%%"
    case None => ""
  }
}
