package graft

import graft.core.CheckUtils.makeCondition
import graft.rules.{CheckFn, CheckProvider, RowCheckFn}

/** Fixture for FQCN-based check loading (MetadataSpec). */
object SampleCheckProvider extends CheckProvider {
  override def checks: Map[String, CheckFn] = Map(
    "sample_is_even" -> RowCheckFn(a =>
      makeCondition(a.column() % 2 =!= 0, "value is odd")))
}
