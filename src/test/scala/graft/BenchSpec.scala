package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench harness's contention self-diagnosis (CONTENTION.md
  * protocol, promoted into BENCH_out.json in r11): a per-query record
  * is flagged `contended` iff ANY of its passes started while the
  * 1-minute loadavg exceeded this JVM's core count.
  */
class BenchSpec extends AnyFunSuite {

  test("contended: any pass above the core count flags the query") {
    // quiet host: loadavg well under 32 cores on every pass
    assert(!Bench.contended(Seq(1.2, 2.8, 3.0), 32))
    // synthetic load: one pass lands while another job saturates the
    // host — that single pass is enough to flag the record
    assert(Bench.contended(Seq(1.2, 33.5, 3.0), 32))
    assert(Bench.contended(Seq(64.0, 64.0, 64.0), 32))
    // boundary: loadavg == cores is full-but-not-oversubscribed — the
    // flag marks EXTERNAL pressure, so equality does not trip it
    assert(!Bench.contended(Seq(32.0), 32))
    assert(Bench.contended(Seq(32.01), 32))
    // the /proc read-failure sentinel (-1.0) must never flag
    assert(!Bench.contended(Seq(-1.0, -1.0), 32))
    // empty pass list (a query filtered from every run) never flags
    assert(!Bench.contended(Nil, 32))
  }
}
