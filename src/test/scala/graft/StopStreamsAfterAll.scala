package graft

import org.scalatest.{BeforeAndAfterAll, Suite}
import scala.util.control.NonFatal

/** Stops every still-active streaming query on the shared session when
  * a suite finishes. The suites share one SparkSession for the whole
  * JVM (TestSpark), so a stray query left running by a timed-out
  * `awaitTermination` keeps planning micro-batches until the session's
  * own JVM-exit teardown races it (round-8 close: dedup_fs logged an
  * INTERNAL_ERROR "phase planning" AFTER all tests had passed). Each
  * suite's tests use AvailableNow/awaitTermination and normally leave
  * nothing behind — this afterAll is the backstop that keeps the suite
  * log clean when they don't.
  */
trait StopStreamsAfterAll extends BeforeAndAfterAll { this: Suite =>
  override def afterAll(): Unit = {
    try TestSpark.spark.streams.active.foreach { q =>
      try q.stop() catch { case NonFatal(_) => () }
    } finally super.afterAll()
  }
}
