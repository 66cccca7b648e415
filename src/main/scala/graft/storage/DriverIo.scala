package graft.storage

/** Bounded-parallel map for driver-side METADATA IO (footer opens,
  * directory listings) — the per-item latency is a filesystem RPC, so
  * serial walks turn O(files) into seconds at commit sizes a 100 TB
  * table actually produces. Order-preserving; a fresh pool per call
  * (these are plan/commit-time paths, not hot loops); failures
  * propagate as the first exception, matching serial behavior.
  */
private[graft] object DriverIo {
  def parMap[A, B](xs: Seq[A])(f: A => B): Seq[B] = {
    if (xs.sizeIs <= 1) return xs.map(f)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(32, xs.size))
    try {
      import scala.concurrent.{Await, ExecutionContext, Future}
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutor(pool)
      Await.result(Future.traverse(xs)(x => Future(f(x))),
        scala.concurrent.duration.Duration.Inf)
    } finally pool.shutdown()
  }
}
