package graft

/** Tag for scale-sized fixtures excluded from the default `sbt test` gate
  * (build.sbt filters `-l graft.SlowTest`). The build-level exclusion also
  * applies to testOnly, so run them explicitly with
  * `sbt 'set Test / testOptions := Seq(Tests.Argument(TestFrameworks.ScalaTest, "-n", "graft.SlowTest"))' 'testOnly <Suite>'`
  * or via the ScaleSmoke harness rows that cover the same contracts.
  */
object SlowTest extends org.scalatest.Tag("graft.SlowTest")
