package graft

import org.scalatest.Tag

/** Wall-clock-heavy tests (ADVICE r7: the TTL test sleeps ~65 s of real
  * time to dominate processing-time trigger jitter). Tagged, not
  * excluded: the default `sbt test` gate still runs them; local
  * iteration skips them with
  *   sbt "testOnly graft.* -- -l graft.SlowTest"
  * A controllable clock would be the real fix, but TTL expiry runs
  * against the state store's processing-time batch timestamps and the
  * manual-clock harness lives in Spark's internal test jars, which
  * this environment does not ship.
  */
object SlowTest extends Tag("graft.SlowTest")
