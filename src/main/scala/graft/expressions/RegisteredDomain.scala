package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.Psl

/** Host → registered domain (eTLD+1) under a compiled
  * Public-Suffix-List rule table ([[graft.ops.Psl.Rules]]) — the
  * column every per-domain cap / blocklist / source-mix groups by.
  *
  * The rule table is part of the expression (compiled once on the
  * driver, serialized with the task closure — a few hundred to ~9k
  * rules, closure-sized either way); per row the lookup is ≤
  * maxLabels hash probes over the host's label suffixes, no regex.
  * Literal IPv4/IPv6 hosts and hosts that ARE a public suffix map to
  * themselves (see [[graft.ops.Psl]] for the deliberate divergence
  * from the strict published algorithm). NULL/empty → NULL.
  */
case class RegisteredDomain(child: Expression, rules: Psl.Rules)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "registered_domain"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"registered_domain requires string, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val out = rules.registeredDomain(v.asInstanceOf[UTF8String].toString)
    if (out == null) null else UTF8String.fromString(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): RegisteredDomain = copy(child = newChild)
}

object RegisteredDomain {
  def registered_domain(host: Column, rules: Psl.Rules): Column =
    ColumnShim.column(RegisteredDomain(ColumnShim.expression(host), rules))
}
